"""MXU dot-shape cost law inside a Pallas kernel (decides the z-run bet).

The sparse-conv kernel's cost unit has been modeled as "one-hot rows/s",
but candidate rewrites trade ROWS for WIDTH (fewer selection rows against
a wider stacked operand). Whether that wins depends on how a Pallas-dot's
cost actually scales with (M, K, N) at our sizes — MXU passes predict
cost ~ (M/8) * ceil(K/128) * ceil(N/128) + fixed-per-dot, but the
measured one-hot rate (0.7-0.9 G rows/s at M=2304,K=64,N=128) is ~10x
slower than the pass model, so something else binds.

Each variant runs `n_tiles` grid steps; per step `reps` dots of
(M, K) @ (K, N) on VMEM-resident bf16 operands (accumulated f32 to keep
every dot live). Reported: ms per call, derived rows/s, and implied
cost per MXU pass.

Usage: python tools/micro_dotshape.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focalformer3d_tpu.utils.platform import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, o_ref, acc_ref, *, reps, M, K, N):
    del o_ref
    acc = jnp.zeros((8, N), jnp.float32)
    for r in range(reps):
        d = jnp.dot(
            a_ref[0] + jnp.bfloat16(r), b_ref[0],
            preferred_element_type=jnp.float32,
        )  # (M, N)
        acc = acc + d[:8, :]
    acc_ref[0, :, :] = acc


def _outer(a_ref, b_ref, o_ref, acc_ref, *, reps, M, K, N):
    _kernel(a_ref, b_ref, None, acc_ref, reps=reps, M=M, K=K, N=N)
    o_ref[0, :, :] = acc_ref[0]


def time_shape(M, K, N, reps, n_tiles, iters=20):
    a = jnp.ones((1, M, K), jnp.bfloat16)
    b = jnp.ones((1, K, N), jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(_outer, reps=reps, M=M, K=K, N=N),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, M, K), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, N), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 8, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    jf = jax.jit(lambda a, b: f(a, b).sum())
    out = jf(a, b)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(a, b)
    _ = float(out)
    dt = (time.perf_counter() - t0) / iters
    rows = M * reps * n_tiles
    passes = (M / 8) * -(-K // 128) * -(-N // 128) * reps * n_tiles
    print(
        f"M={M:5d} K={K:4d} N={N:5d} reps={reps:2d}: {dt * 1e3:7.2f} ms"
        f" | {rows / dt / 1e9:6.2f} Grows/s | {passes / dt / 1e9:6.2f}"
        f" Gpass/s | {M * K * N * 2 * reps * n_tiles / dt / 1e12:6.1f}"
        f" TFLOP/s",
        flush=True,
    )
    return dt


N_TILES = 600
print(f"n_tiles={N_TILES}, all operands VMEM-resident bf16")
# production oh-dot shape (3 band dots of (9T, wb) @ (wb, cl))
time_shape(2304, 64, 128, 3, N_TILES)
# trade rows for N width at constant output volume
time_shape(768, 64, 384, 3, N_TILES)
time_shape(768, 64, 1536, 3, N_TILES)
# z-run selection shape: (3T, wb) @ (wb, 12*p*cout)
time_shape(768, 64, 512, 3, N_TILES)
# K scaling at fixed M, N
time_shape(2304, 128, 128, 3, N_TILES)
time_shape(2304, 256, 128, 3, N_TILES)
time_shape(2304, 512, 128, 3, N_TILES)
# unpacked multi-hot shape: (9T, 3*window) @ (., cout)
time_shape(2304, 1536, 128, 1, N_TILES)
# M scaling (halved rows, same K/N)
time_shape(1152, 64, 128, 3, N_TILES)
time_shape(4608, 64, 128, 3, N_TILES)
# per-dot fixed cost: the 27-small-dots floor structure
time_shape(256, 64, 128, 27, N_TILES)
# mbuf/Wbig band-dot shape
time_shape(256, 1152, 128, 3, N_TILES)
