"""Chip ceilings: bf16 matmul rate law + HBM stream bandwidth (TPU).

micro_mxu_probe r4 measured only 18.4 TF/s on a (8192,1024,1024) f32-acc
matmul — far below v5e peak. This probe maps the rate law over shape,
dtype-out, and K-depth, plus a copy/stream test for HBM bandwidth, to pin
the real ceilings the sparse-conv kernel should be judged against.

Usage: python tools/micro_ceiling.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focalformer3d_tpu.utils.platform import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chained(fn, x, *args, iters=20):
    """Chain each iteration on the previous output (axon has no working
    block_until_ready; see bench.py)."""
    out = fn(x, *args)
    out = fn(x, *args)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x, *args)
    _ = float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    print("== bf16 matmul rate law ==", flush=True)
    for (m, k, n, out_dt) in [
        (8192, 1024, 1024, jnp.float32),
        (8192, 1024, 1024, jnp.bfloat16),
        (4096, 4096, 4096, jnp.bfloat16),
        (8192, 8192, 8192, jnp.bfloat16),
        (16384, 2048, 2048, jnp.bfloat16),
        (2304, 64, 128, jnp.bfloat16),
        (2304, 512, 128, jnp.bfloat16),
        (36864, 64, 128, jnp.bfloat16),  # 16 tiles' oh dots fused
        (36864, 512, 128, jnp.bfloat16),
    ]:
        a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        b = jnp.asarray(rng.randn(k, n), jnp.bfloat16)

        # Repeats INSIDE one jit call: a per-call timing loop over the
        # axon tunnel measures host dispatch (~0.3-1 ms/call), not the
        # MXU — the r4 "18.4 TF/s plain matmul" reading was that
        # artifact. The chain must carry FULL tensors through a
        # nonlinearity: returning y[0,0] lets XLA slice-propagate
        # through dot (compute one element), which produced impossible
        # ">2 PF/s" readings; relu(y) @ b.T -> relu -> y alternation is
        # DCE- and factoring-proof. Reported rate counts both dots.
        reps = 8

        @jax.jit
        def jf(a, b):
            def body(_, x):
                y = jax.nn.relu(
                    jnp.dot(x, b, preferred_element_type=out_dt)
                ).astype(jnp.bfloat16)
                return jax.nn.relu(
                    jnp.dot(y, b.T, preferred_element_type=out_dt)
                ).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, reps, body, a, unroll=True)

        t = timeit_chained(lambda a, b: jf(a, b), a, b, iters=5) / (
            2 * reps
        )
        fl = 2 * m * k * n
        print(f"  ({m:6d},{k:5d})@({k:5d},{n:5d}) ->{out_dt.__name__:9s}: "
              f"{t*1e6:9.1f} us  {fl/t/1e12:6.1f} TF/s", flush=True)

    print("== chained same-buffer matmul (dependency-true rate) ==",
          flush=True)
    m = k = n = 4096
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(k, n), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(8):
            x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
        return x

    t = timeit_chained(lambda a, b: chain(a, b), a, b) / 8
    print(f"  8-chain 4096^3 bf16: {t*1e6:9.1f} us/dot  "
          f"{2*m*k*n/t/1e12:6.1f} TF/s", flush=True)

    print("== HBM stream (copy+scale) ==", flush=True)
    for mb in (64, 256, 1024):
        x = jnp.asarray(rng.randn(mb * 1024 * 1024 // 4), jnp.float32)

        @jax.jit
        def g(x):
            def body(_, c):
                # full-tensor carry; abs() blocks multiply-folding
                return jnp.abs(c) * 1.0000001 - 1e-20

            return jax.lax.fori_loop(0, 8, body, x, unroll=True)

        t = timeit_chained(lambda x: g(x), x, iters=5) / 8
        bytes_moved = x.size * 4 * 2
        print(f"  {mb:5d} MB copy: {t*1e3:8.2f} ms  "
              f"{bytes_moved/t/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
