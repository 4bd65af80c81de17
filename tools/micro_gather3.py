"""Microbenchmark 3: gather rate vs table size (VMEM residency effect),
and int32-packed meta-row gathers for rulebook builds."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    s = jnp.zeros((), jnp.float32)
    out = fn(*args, s)
    s = (jnp.ravel(out)[0] * 0).astype(jnp.float32)
    out = fn(*args, s)
    s = (jnp.ravel(out)[0] * 0).astype(jnp.float32)
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, s)
        s = (jnp.ravel(out)[0] * 0).astype(jnp.float32)
    _ = float(s)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    N_ROWS = 3_240_000

    print("== gather rate vs table size (C=16) ==", flush=True)
    for V in (60_000, 120_000, 240_000, 500_000, 1_000_000, 2_000_000):
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.randn(V, 16), dt)
            idx = jnp.asarray(rng.randint(0, V, size=N_ROWS).astype(np.int32))

            @jax.jit
            def g(x, idx, chain):
                return x[idx] + chain.astype(x.dtype)

            t = timeit(g, x, idx)
            mb = V * 16 * x.dtype.itemsize / 1e6
            print(f"V={V:8d} ({mb:6.1f} MB) {np.dtype(dt).name:8s}: "
                  f"{t*1e3:8.2f} ms ({N_ROWS/t/1e6:6.0f} Mrows/s)",
                  flush=True)

    print("== gather rate vs table size (C=128 bf16) ==", flush=True)
    NR2 = 1_080_000
    for V in (40_000, 80_000, 160_000, 320_000):
        x = jnp.asarray(rng.randn(V, 128), jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, V, size=NR2).astype(np.int32))

        @jax.jit
        def g(x, idx, chain):
            return x[idx] + chain.astype(x.dtype)

        t = timeit(g, x, idx)
        mb = V * 128 * 2 / 1e6
        print(f"V={V:8d} ({mb:6.1f} MB): {t*1e3:8.2f} ms "
              f"({NR2/t/1e6:6.0f} Mrows/s, {NR2*256/t/1e9:6.1f} GB/s)",
              flush=True)

    print("== meta-row gathers (int32 x4 rows) vs table size ==", flush=True)
    NR3 = 1_080_000  # 120k sites x 9 bev taps
    for ncol in (32_400, 129_600, 518_400, 2_073_600):
        m = jnp.asarray(rng.randint(0, 2**30, size=(ncol, 4)).astype(np.int32))
        idx = jnp.asarray(rng.randint(0, ncol, size=NR3).astype(np.int32))

        @jax.jit
        def g(m, idx, chain):
            return m[idx] + chain.astype(jnp.int32)

        t = timeit(g, m, idx)
        print(f"ncol={ncol:8d} ({ncol*16/1e6:6.1f} MB): {t*1e3:8.2f} ms "
              f"({NR3/t/1e6:6.0f} Mrows/s)", flush=True)

    print("== fused gather+matmul at bf16, small tables ==", flush=True)
    for V, C in ((120_000, 16), (90_000, 32), (60_000, 64), (40_000, 128)):
        x = jnp.asarray(rng.randn(V, C), jnp.bfloat16)
        idx = jnp.asarray(
            rng.randint(0, V, size=V * 27).astype(np.int32))
        w = jnp.asarray(rng.randn(27 * C, C), jnp.bfloat16)

        @jax.jit
        def f(x, idx, w, chain):
            g = x[idx].reshape(V, 27 * C)
            return (jnp.dot(g, w, preferred_element_type=jnp.float32)
                    + chain).astype(jnp.bfloat16)

        t = timeit(f, x, idx, w)
        print(f"V={V:7d} C={C:4d}: {t*1e3:8.2f} ms "
              f"({V*27/t/1e6:6.0f} Mrows/s)", flush=True)


if __name__ == "__main__":
    main()
