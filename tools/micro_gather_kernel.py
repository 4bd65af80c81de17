"""In-kernel gather strategies: one-hot MXU dot vs Mosaic's native gather.

The windowed sparse-conv kernel is VMEM-traffic bound: the (9T, W/p)
one-hot matrix is built by the VPU, stored to scratch, then re-read by
the MXU — ~3.6 MB/tile of pure index plumbing (see docs/PERF.md r4).
jax 0.9 Mosaic lowers 2D `jnp.take_along_axis` gathers natively; if that
runs near sublane rate it replaces the one-hot dot wholesale.

Variants, each gathering K=27 taps x T rows from a (W, L) window:
  ohdot   — build (tpg*T, W/p) one-hot, dot against packed window (prod)
  take    — jnp.take_along_axis(win, idx) per tap, lane-broadcast index
  takerow — single fused take_along_axis for all taps at once

Usage: python tools/micro_gather_kernel.py
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


def timeit(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / iters


def _ohdot_kernel(rel_ref, x_ref, o_ref, *, T, K, wb, pack):
    i = pl.program_id(0)
    del i
    rel = rel_ref[0]  # (T, K)
    cl = x_ref.shape[1]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, wb), 1)
    acc = jnp.zeros((T, cl), jnp.float32)
    for k in range(K):
        r = rel[:, k][:, None]
        oh = (r // pack == iota_w).astype(jnp.bfloat16)
        g = jnp.dot(oh, x_ref[:wb, :], preferred_element_type=jnp.float32)
        acc = acc + g
    o_ref[0, :, :] = acc.astype(o_ref.dtype)


def _take_kernel(rel_ref, x_ref, o_ref, *, T, K, wb, pack):
    del wb, pack
    rel = rel_ref[0]  # (T, K)
    cl = x_ref.shape[1]
    acc = jnp.zeros((T, cl), jnp.float32)
    for k in range(K):
        idx = jnp.broadcast_to(rel[:, k][:, None], (T, cl))
        g = jnp.take_along_axis(x_ref[...], idx, axis=0)
        acc = acc + g.astype(jnp.float32)
    o_ref[0, :, :] = acc.astype(o_ref.dtype)


def _takerow_kernel(rel_ref, x_ref, o_ref, *, T, K, wb, pack):
    del wb, pack
    rel = rel_ref[0]  # (T, K)
    cl = x_ref.shape[1]
    idx = jnp.broadcast_to(
        rel.reshape(T * K, 1), (T * K, cl)
    )
    g = jnp.take_along_axis(
        jnp.broadcast_to(x_ref[...], (x_ref.shape[0], cl)), idx, axis=0
    )
    o_ref[0, :, :] = (
        g.reshape(T, K, cl).sum(axis=1).astype(o_ref.dtype)
    )


def run(kernel, rel, xw, T, K, wb, pack, n_tiles):
    cl = xw.shape[-1]
    return pl.pallas_call(
        functools.partial(kernel, T=T, K=K, wb=wb, pack=pack),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, T, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(xw.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, cl), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, T, cl), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=jax.default_backend() != "tpu",
    )(rel, xw)


def main():
    rng = np.random.RandomState(0)
    T, K = 128, 27
    n_tiles = 1024
    for W, cl, pack in ((256, 128, 4), (512, 128, 8), (256, 128, 1)):
        wb = W // pack
        rows = T * K * n_tiles
        rel = jnp.asarray(
            rng.randint(0, wb, size=(n_tiles, T, K)), jnp.int32)
        xw = jnp.asarray(rng.randn(max(W, wb), cl), jnp.bfloat16)
        for name, kern in (("ohdot", _ohdot_kernel),
                           ("take", _take_kernel),
                           ("takerow", _takerow_kernel)):
            try:
                f = jax.jit(lambda r, x, kern=kern: run(
                    kern, r, x, T, K, wb, pack, n_tiles).sum())
                t = timeit(f, rel, xw)
                print(f"W={W} pack={pack} {name:8s}: {t*1e3:7.2f} ms  "
                      f"{rows/t/1e9:6.2f} Grows/s", flush=True)
            except Exception as e:
                msg = (str(e).splitlines() or [repr(e)])[0][:90]
                print(f"W={W} pack={pack} {name:8s}: FAILED {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
