"""Disambiguate the micro_dotshape 2.5 ms floor: per-CALL (axon host
dispatch, invisible inside the fused bench program) vs per-GRID-STEP
(pipeline bubble paid by every tile of every conv).

Varies n_tiles at fixed per-step work, varies tiles-per-step at fixed
total work, and chains call inputs on outputs so ms/call is honest.

Usage: python tools/micro_dotshape2.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _outer(a_ref, b_ref, o_ref, *, reps, N):
    acc = jnp.zeros((8, N), jnp.float32)
    for r in range(reps):
        d = jnp.dot(
            a_ref[0] + jnp.bfloat16(r), b_ref[0],
            preferred_element_type=jnp.float32,
        )
        acc = acc + d[:8, :]
    o_ref[0, :, :] = acc


def time_shape(M, K, N, reps, n_tiles, iters=20, semantics="arbitrary"):
    a = jnp.ones((1, M, K), jnp.bfloat16)
    b = jnp.ones((1, K, N), jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(_outer, reps=reps, N=N),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(semantics,),
        ),
    )

    # chain input on output: serialized, honest per-call time
    @jax.jit
    def step(a, b):
        return f(a, b)[0, :1, :1].astype(jnp.bfloat16) * 0 + a

    out = step(a, b)
    _ = float(out[0, 0, 0])
    t0 = time.perf_counter()
    x = a
    for _ in range(iters):
        x = step(x, b)
    _ = float(x[0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    rows = M * reps * n_tiles
    print(
        f"M={M:5d} K={K:4d} N={N:4d} reps={reps} tiles={n_tiles:4d} "
        f"[{semantics[:3]}]: {dt * 1e3:7.2f} ms | {rows / dt / 1e9:6.2f} "
        f"Grows/s | {dt / n_tiles * 1e6:6.2f} us/step",
        flush=True,
    )
    return dt


# per-step vs per-call floor: same per-step work, vary n_tiles
time_shape(2304, 64, 128, 3, 600)
time_shape(2304, 64, 128, 3, 300)
time_shape(2304, 64, 128, 3, 150)
time_shape(2304, 64, 128, 3, 75)
time_shape(2304, 64, 128, 3, 16)
# same TOTAL work, fatter steps (4 tiles per step)
time_shape(9216, 64, 128, 3, 150)
time_shape(4608, 64, 128, 3, 300)
# parallel semantics
time_shape(2304, 64, 128, 3, 600, semantics="parallel")
time_shape(9216, 64, 128, 3, 150, semantics="parallel")
