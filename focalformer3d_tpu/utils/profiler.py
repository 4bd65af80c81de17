"""Section timers + device-sync profiling.

Counterpart of the reference's `time_utils` profiler
(/root/reference/projects/mmdet3d_plugin/models/utils/time_utils.py:32-77):
a nestable context-manager timer with running averages in a global registry,
where the reference's `torch.cuda.synchronize()` becomes
`jax.block_until_ready` on the values produced by the timed section (pass
them to `.sync(x)`), plus a thin wrapper around `jax.profiler` traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

global_timer: Dict[str, Dict[str, float]] = {}
_prefix: list = []


class _Timer:
    def __init__(self, name: str, record: bool = True):
        self.name = name
        self.record = record
        self._sync_val: Any = None

    def sync(self, value: Any) -> Any:
        """Register device values to block on before stopping the clock."""
        self._sync_val = value
        return value

    def __enter__(self):
        _prefix.append(self.name)
        self.key = "/".join(_prefix)
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync_val is not None:
            # On remote-TPU backends block_until_ready may not actually wait;
            # a 1-element host fetch of each leaf is the reliable sync.
            import jax
            import jax.numpy as jnp

            for leaf in jax.tree_util.tree_leaves(self._sync_val):
                if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0:
                    float(jnp.ravel(leaf)[0])
        dt = time.perf_counter() - self.t0
        _prefix.pop()
        if self.record:
            e = global_timer.setdefault(
                self.key, {"total": 0.0, "count": 0.0}
            )
            e["total"] += dt
            e["count"] += 1
        return False


@contextlib.contextmanager
def _null():
    yield None


def T(name: str, enable: bool = True, record: bool = True):
    """Timer factory; returns a null context when disabled (reference
    time_utils.T semantics)."""
    if not enable:
        return _null()
    return _Timer(name, record)


def timer_summary(reset: bool = False) -> str:
    lines = []
    for k in sorted(global_timer):
        e = global_timer[k]
        avg = e["total"] / max(e["count"], 1)
        lines.append(f"{k}: avg {avg * 1000:.2f} ms over {int(e['count'])}")
    if reset:
        global_timer.clear()
    return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
