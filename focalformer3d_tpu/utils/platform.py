"""Runtime platform selection + persistent compile cache.

This image auto-registers a remote-TPU PJRT plugin ("axon") and pins
jax_platforms="axon,cpu"; plain env vars are applied before that pin, so the
CLIs call `setup(platform=...)` right after importing jax to (a) force a
platform when asked (e.g. --platform cpu for host-only smokes) and (b) turn
on the persistent XLA compilation cache (first compiles of the full models
are minutes; cached reloads are seconds).
"""
from __future__ import annotations

import os


def setup(platform: str | None = None,
          cache_dir: str = "/root/.cache/jax_comp_cache",
          host_devices: int | None = None) -> None:
    if host_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={host_devices}"
            ).strip()
    import jax

    if platform:
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
        try:  # drop any backend initialized before the pin change
            jax.clear_backends()
        except Exception:
            pass
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
