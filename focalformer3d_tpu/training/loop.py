"""Epoch-based training loop: data feeding, Fading, logging, checkpointing.

The runtime counterpart of mmcv's EpochBasedRunner + hooks as used by the
reference (/root/reference/tools/train.py:295-302; hooks configured at
projects/configs/focalformer3d/FocalFormer3D_L.py:344-369):
  - cyclic LR / momentum (folded into the optax schedule, training/optim.py)
  - grad clip (optax chain)
  - Fading: drop the ObjectSample GT-paste transform at `fade_epoch`
    (core/hook/fading.py:6-16)
  - per-epoch checkpointing with auto-resume
  - text logging every `log_interval` iters
"""
from __future__ import annotations

import json
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from . import checkpoint as ckpt
from ..data.prefetch import prefetch


class Fading:
    """Removes the ObjectSample stage from a Compose at fade_epoch."""

    def __init__(self, fade_epoch: int):
        self.fade_epoch = fade_epoch

    def before_train_epoch(self, epoch: int, pipeline) -> None:
        if pipeline is None or epoch < self.fade_epoch:
            return
        from ..data.nuscenes import ObjectSample

        pipeline.transforms = [
            t for t in pipeline.transforms if not isinstance(t, ObjectSample)
        ]


def run_training(
    train_step: Callable,
    state,
    batch_iter_fn: Callable[[int], Iterable[Dict[str, np.ndarray]]],
    *,
    epochs: int,
    start_epoch: int = 0,
    rng: Optional[jax.Array] = None,
    work_dir: Optional[str] = None,
    keep_last: Optional[int] = None,
    log_interval: int = 50,
    log_fn: Callable[[str], None] = print,
    hooks: Iterable = (),
    shard_fn: Optional[Callable] = None,
    json_log_path: Optional[str] = None,
    save_checkpoints: bool = True,
    tensorboard_dir: Optional[str] = None,
):
    """Generic epoch loop. `batch_iter_fn(epoch)` yields host batches."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    step_fn = jax.jit(train_step)
    jlog = None
    if json_log_path:
        import os

        os.makedirs(os.path.dirname(json_log_path) or ".", exist_ok=True)
        jlog = open(json_log_path, "a")
    tb = None
    if tensorboard_dir:
        # reference parity: TensorboardLoggerHook
        # (FocalFormer3D_L.py:356-359); optional — torch's pure-python
        # SummaryWriter, no GPU dependency
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb = SummaryWriter(tensorboard_dir)
        except Exception as e:  # pragma: no cover - env without tb
            print(f"tensorboard unavailable: {e}")

    def jwrite(rec):
        if jlog is not None:
            jlog.write(json.dumps(rec) + "\n")
            jlog.flush()
        if tb is not None and rec.get("mode") == "train":
            gstep = rec["epoch"] * 1000000 + rec["iter"]
            for k, v in rec.items():
                if isinstance(v, float):
                    tb.add_scalar(f"train/{k}", v, gstep)
    for epoch in range(start_epoch, epochs):
        for h in hooks:
            h.before_train_epoch(epoch, getattr(h, "pipeline", None))
        t_ep = time.time()
        n_iter = 0
        running = {}
        t_it = time.time()
        for batch in prefetch(batch_iter_fn(epoch)):
            if shard_fn is not None:
                batch = shard_fn(batch)
            state, metrics = step_fn(state, batch, rng)
            n_iter += 1
            if n_iter % log_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = (time.time() - t_it) / log_interval
                t_it = time.time()
                msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(
                    metrics.items()
                ))
                log_fn(
                    f"epoch {epoch} iter {n_iter} ({dt:.2f}s/it) {msg}"
                )
                jwrite({"mode": "train", "epoch": epoch, "iter": n_iter,
                        "time": dt, **metrics})
        log_fn(
            f"epoch {epoch} done in {(time.time() - t_ep) / 60:.1f} min "
            f"({n_iter} iters)"
        )
        jwrite({"mode": "epoch", "epoch": epoch, "iters": n_iter,
                "minutes": (time.time() - t_ep) / 60})
        if work_dir and save_checkpoints:
            path = ckpt.save_checkpoint(
                work_dir, state, epoch + 1, keep_last=keep_last
            )
            log_fn(f"saved {path}")
    if jlog is not None:
        jlog.close()
    if tb is not None:
        tb.close()
    return state
