"""Microbenchmark 2: row-width scaling, slab gathers, Pallas VMEM gather.

Question: gather is ~2.7 cyc/row at <=512B rows. Do wider rows keep the
row rate (-> bytes rate scales) and do 2D slab gathers / Pallas local
gathers beat XLA's row gather?
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    s = jnp.zeros((), jnp.float32)
    out = fn(*args, chain=s)
    s = (jnp.ravel(out)[0] * 0).astype(jnp.float32)
    out = fn(*args, chain=s)
    s = (jnp.ravel(out)[0] * 0).astype(jnp.float32)
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, chain=s)
        s = (jnp.ravel(out)[0] * 0).astype(jnp.float32)
    _ = float(s)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)

    print("== row-width sweep (1.08M rows, bf16) ==", flush=True)
    N_ROWS = 1_080_000
    for width in (32, 64, 128, 256, 512, 1024, 2048):
        V = max(1, 64 * 1024 * 1024 // (width * 2))  # ~128MB table
        x = jnp.asarray(rng.randn(V, width), jnp.bfloat16)
        idx = jnp.asarray(
            rng.randint(0, V, size=N_ROWS).astype(np.int32))

        @jax.jit
        def g(x, idx, chain):
            return x[idx] + chain.astype(x.dtype)

        t = timeit(g, x, idx)
        nbytes = N_ROWS * width * 2
        print(f"width={width*2:5d}B rows: {t*1e3:8.2f} ms "
              f"({nbytes/t/1e9:7.1f} GB/s, {N_ROWS/t/1e6:6.0f} Mrows/s)",
              flush=True)

    print("== slab gather lax.gather slice_sizes=(S, C) ==", flush=True)
    V, C = 120_000, 32
    x = jnp.asarray(rng.randn(V, C), jnp.bfloat16)
    for S, n in ((1, 3_240_000), (4, 1_080_000), (8, 540_000)):
        starts = jnp.asarray(
            rng.randint(0, V - S, size=(n, 1)).astype(np.int32))

        @jax.jit
        def gs(x, st, chain):
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,))
            out = jax.lax.gather(
                x, st, dnums, slice_sizes=(S, C), mode="clip")
            return out + chain.astype(x.dtype)

        t = timeit(gs, x, starts)
        nbytes = n * S * C * 2
        print(f"S={S} n={n}: {t*1e3:8.2f} ms ({nbytes/t/1e9:7.1f} GB/s, "
              f"{n/t/1e6:6.1f} Mslabs/s)", flush=True)

    print("== dynamic_slice in vmap (slab) ==", flush=True)
    for S, n in ((8, 540_000),):
        starts = jnp.asarray(rng.randint(0, V - S, size=n).astype(np.int32))

        @jax.jit
        def gd(x, st, chain):
            out = jax.vmap(
                lambda s: jax.lax.dynamic_slice(x, (s, 0), (S, C))
            )(st)
            return out + chain.astype(x.dtype)

        t = timeit(gd, x, starts)
        print(f"S={S} n={n}: {t*1e3:8.2f} ms "
              f"({n*S*C*2/t/1e9:7.1f} GB/s)", flush=True)

    print("== pallas: table in VMEM, per-row loop gather ==", flush=True)
    V, C = 65_536, 32  # 4MB bf16 table
    NR = 262_144
    x = jnp.asarray(rng.randn(V, C), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, V, size=NR).astype(np.int32))
    TILE = 2048

    def kernel(idx_ref, x_ref, o_ref):
        def body(i, _):
            o_ref[i, :] = x_ref[idx_ref[i], :]
            return 0
        jax.lax.fori_loop(0, TILE, body, 0)

    @jax.jit
    def pg(x, idx, chain):
        out = pl.pallas_call(
            kernel,
            grid=(NR // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((V, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NR, C), x.dtype),
        )(idx, x)
        return out + chain.astype(x.dtype)

    try:
        t = timeit(pg, x, idx)
        print(f"pallas VMEM loop: {t*1e3:8.2f} ms "
              f"({NR/t/1e6:6.1f} Mrows/s)", flush=True)
    except Exception as e:
        print(f"pallas VMEM loop FAILED: {type(e).__name__}: {e}",
              flush=True)

    print("== pallas: one-hot-free take along sublanes? ==", flush=True)
    # take_along_axis on axis 0 inside pallas
    def kernel2(idx_ref, x_ref, o_ref):
        ids = idx_ref[:]  # (TILE,) int32 in VMEM? needs 2D
        o_ref[:, :] = jnp.take(x_ref[:, :], ids, axis=0)

    @jax.jit
    def pg2(x, idx, chain):
        out = pl.pallas_call(
            kernel2,
            grid=(NR // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((V, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NR, C), x.dtype),
        )(idx, x)
        return out + chain.astype(x.dtype)

    try:
        t = timeit(pg2, x, idx)
        print(f"pallas jnp.take: {t*1e3:8.2f} ms "
              f"({NR/t/1e6:6.1f} Mrows/s)", flush=True)
    except Exception as e:
        print(f"pallas jnp.take FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
