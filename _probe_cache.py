import time, sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
x = jnp.ones((4096, 2048), jnp.bfloat16)
t0=time.time()
f = jax.jit(lambda x: jnp.tanh(x @ x.T @ x).sum())
print("compile+run", float(f(x)), f"{time.time()-t0:.2f}s", flush=True)
