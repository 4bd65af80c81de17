"""Attribute per-stage cost inside the pallas sparse-conv kernel by
timing variants with stages disabled (numerically wrong, timing only)."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.ops import sparse_conv_pallas as scp


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


def variant_kernel(starts_ref, x_ref, rel_ref, wbig_ref, out_ref,
                   oh_ref, mb_ref, *, n_groups, pack, window,
                   do_oh, do_gmm, do_mask, do_fmm):
    i = pl.program_id(0)
    G = n_groups
    rel = rel_ref[0]
    T, K = rel.shape
    tpg = K // G
    cl = x_ref.shape[1]
    c = cl // pack
    wb = window // pack
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, wb), 1)
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (T, cl), 1) // c
    acc = None
    for g in range(G):
        if do_oh:
            for j in range(tpg):
                r = rel[:, g * tpg + j][:, None]
                oh_ref[j * T:(j + 1) * T, :] = (
                    r // pack == iota_w).astype(jnp.bfloat16)
        start = pl.multiple_of(starts_ref[i * G + g], 64)
        win = x_ref[pl.ds(pl.multiple_of(start // pack, 8), wb), :].astype(
            jnp.bfloat16)
        if do_gmm:
            gath = jnp.dot(oh_ref[:, :], win,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
        else:
            gath = jnp.zeros((tpg * T, cl), jnp.bfloat16) + win[0:1, :]
        for j in range(tpg):
            piece = gath[j * T:(j + 1) * T, :]
            if do_mask and pack > 1:
                r = rel[:, g * tpg + j][:, None]
                piece = piece * (lane_blk == (r % pack)).astype(jnp.bfloat16)
            mb_ref[:, j * cl:(j + 1) * cl] = piece
        if do_fmm:
            part = jnp.dot(mb_ref[:, :], wbig_ref[g],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    if acc is None:
        acc = mb_ref[:, 0:out_ref.shape[1]].astype(jnp.float32)
    out_ref[:, :] = acc.astype(out_ref.dtype)


def main():
    rng = np.random.RandomState(0)
    shape, V, C = (41, 1440, 1440), 120000, 16
    # clustered voxel set
    ncol = V // 2
    D, H, W = shape
    cols = rng.choice(H * W, size=ncol, replace=False)
    z = rng.randint(0, D, size=(ncol, 2))
    keys = np.unique((np.repeat(cols, 2) * D + z.reshape(-1)).astype(np.int64))
    rng.shuffle(keys)
    keys = keys[:V]
    n = len(keys)
    coords = np.stack([keys % D, keys // D // W, (keys // D) % W],
                      -1).astype(np.int32)
    coords = np.pad(coords, ((0, V - n), (0, 0)))
    valid = np.arange(V) < n
    coords, valid = jnp.asarray(coords), jnp.asarray(valid)
    feats = jnp.asarray(rng.randn(V, C).astype(np.float32)).astype(
        jnp.bfloat16)
    table0 = sc.build_table(coords, valid, shape)
    coords, valid, feats = sc.csr_reorder(table0, feats)
    table = sc.build_table(coords, valid, shape)
    rules = sc.build_subm_rules(table, shape, 3, use_positions=True)
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.05).astype(
        jnp.bfloat16)

    T, Wn = 256, 512
    plan = scp.build_tile_plan(rules, V, 3, T, Wn, 8192)
    pack = 128 // C
    cl = pack * C
    K = 27
    G = 3
    tpg = 9
    xp = scp._pack_table(feats, V)
    wperm = w[jnp.asarray(plan.perm)]
    wbig = jnp.tile(wperm.astype(jnp.bfloat16), (1, pack, 1)).reshape(
        G, tpg * cl, C)
    n_tiles = plan.rel.shape[0]

    for name, flags in [
        ("full        ", dict(do_oh=1, do_gmm=1, do_mask=1, do_fmm=1)),
        ("no fmm      ", dict(do_oh=1, do_gmm=1, do_mask=1, do_fmm=0)),
        ("no mask/fmm ", dict(do_oh=1, do_gmm=1, do_mask=0, do_fmm=0)),
        ("no gmm/...  ", dict(do_oh=1, do_gmm=0, do_mask=0, do_fmm=0)),
        ("only copy   ", dict(do_oh=0, do_gmm=0, do_mask=0, do_fmm=0)),
    ]:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, K), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, C), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tpg * T, Wn // pack), jnp.bfloat16),
                pltpu.VMEM((T, tpg * cl), jnp.bfloat16),
            ],
        )

        @jax.jit
        def run(xp, rel, starts, wbig, chain):
            out = pl.pallas_call(
                functools.partial(variant_kernel, n_groups=G, pack=pack,
                                  window=Wn, **{k: bool(v) for k, v in
                                                flags.items()}),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((n_tiles * T, C),
                                               jnp.float32),
                interpret=False,
            )(starts, xp, rel, wbig)
            return out + chain

        try:
            t = timeit(run, xp, plan.rel, plan.starts, wbig)
            print(f"{name}: {t*1e3:7.2f} ms "
                  f"({t/n_tiles*1e6:6.2f} us/tile)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
