"""Microbenchmark: row-gather strategies for sparse-conv apply on TPU.

The sparse encoder's hot op is `fpad[rules]` — gathering (V_out*K) rows of
C features from a (V_in, C) table. This script measures achievable rates
for several formulations on the current chip so the kernel design is
evidence-driven, not guessed.

Axon-backend quirk: block_until_ready does not synchronize; every timing
chains iterations on the previous output and syncs with a 1-elem fetch.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    s = jnp.zeros((), jnp.float32)
    out = fn(*args, chain=s)  # compile
    jax.block_until_ready(out)
    s = jnp.ravel(out[0] if isinstance(out, tuple) else out)[0] * 0.0
    s = s.astype(jnp.float32)
    out = fn(*args, chain=s)  # second compile (chain now an array)
    s = jnp.ravel(out[0] if isinstance(out, tuple) else out)[0].astype(
        jnp.float32) * 0.0
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, chain=s)
        s = jnp.ravel(out[0] if isinstance(out, tuple) else out)[0].astype(
            jnp.float32) * 0.0
    _ = float(s)
    return (time.perf_counter() - t0) / iters


def main():
    V = 120_000
    K = 27
    rng = np.random.RandomState(0)
    # "nearly sorted" indices: CSR-ordered rulebooks walk the table almost
    # monotonically per tap. Model that: idx = clip(arange + noise).
    base = np.arange(V * K, dtype=np.int64) // K
    noise = rng.randint(-3000, 3000, size=V * K)
    idx_sorted = np.clip(base + noise, 0, V - 1).astype(np.int32)
    idx_rand = rng.randint(0, V, size=V * K).astype(np.int32)

    for C in (16, 32, 64, 128):
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.randn(V, C), dtype=dt)
            w = jnp.asarray(rng.randn(K * C, 128), dtype=dt)
            nbytes = V * K * C * x.dtype.itemsize

            @jax.jit
            def g_plain(x, idx, chain=0.0):
                return x[idx] + chain.astype(x.dtype)

            @jax.jit
            def g_fused(x, idx, w, chain=0.0):
                g = x[idx].reshape(V, K * C)
                return jnp.dot(g, w, preferred_element_type=jnp.float32) + chain

            for name, idx in (("sorted", idx_sorted), ("random", idx_rand)):
                idxd = jnp.asarray(idx)
                t = timeit(g_plain, x, idxd)
                t2 = timeit(functools.partial(g_fused, x, idxd, w))
                print(
                    f"C={C:4d} {np.dtype(dt).name:8s} {name:6s} "
                    f"gather {t*1e3:8.2f} ms ({nbytes/t/1e9:7.1f} GB/s) "
                    f"| fused+mm {t2*1e3:8.2f} ms",
                    flush=True,
                )

    # one-hot matmul alternative: tile of S sites x window W table rows
    C = 32
    S, Wn = 1024, 4096
    x = jnp.asarray(rng.randn(Wn, C), jnp.bfloat16)
    li = jnp.asarray(rng.randint(0, Wn, size=(S * K,)), jnp.int32)

    @jax.jit
    def onehot_mm(x, li, chain=0.0):
        oh = jax.nn.one_hot(li, Wn, dtype=jnp.bfloat16)
        return jnp.dot(oh, x, preferred_element_type=jnp.float32) + chain

    t = timeit(onehot_mm, x, li)
    n_tiles = V // S
    print(
        f"one-hot mm tile S*K={S*K} W={Wn}: {t*1e3:.3f} ms/tile "
        f"-> {t*n_tiles*1e3:.1f} ms per conv-equivalent", flush=True,
    )


if __name__ == "__main__":
    main()
