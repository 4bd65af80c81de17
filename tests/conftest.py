import os
import sys

# Tests run on a virtual 8-device CPU mesh (JAX-native fake cluster) so that
# sharding/collective code paths are exercised without TPU hardware.
#
# Note: this image auto-registers a remote-TPU PJRT plugin ("axon") via
# sitecustomize and pins jax_platforms="axon,cpu", so setting the env var is
# not enough — we must update the config after import and drop any
# already-initialized backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # pragma: no cover - defensive: only needed if a backend already exists
    jax.clear_backends()
except Exception:
    pass

assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compilation cache: the model graphs are large and CPU XLA
# compiles are slow; cache across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
