"""One-hot apply kernel restructure probe: v2 per-tap fused dots.

The production kernel (_kernel in ops/sparse_conv_pallas.py) stages per
band: bulk one-hot (tpg*T, wb) -> one gather dot -> per-tap mask ->
lane-concat into mb_ref (T, tpg*cl) -> one weight dot. The gath + mb
round trips are ~3.5 MB/tile of VMEM traffic; PERF.md r4 measured the
whole apply at 0.7-0.9 Grows/s vs a 1.7 bare-gather floor.

v2 drops ALL bulk staging: per tap, one (T, wb) one-hot dot against the
window, a sub-row mask, and an accumulating (T, cl) x (cl, cout) weight
dot. Same MACs, same rounding (bf16 operands, f32 accumulate, gather
output cast to bf16 is lossless), zero scratch writes beyond the oh
build. This probe runs both on the real chip at every production conv
geometry of the bench scan and reports ms + parity vs the XLA engine.

Usage: python tools/micro_kernel_v2.py
"""
from __future__ import annotations

import argparse
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

from focalformer3d_tpu.configs import get_config
from focalformer3d_tpu.data import synthetic
from focalformer3d_tpu.models.detector import preprocess_points
from focalformer3d_tpu.ops import plan_builder as pb
from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.ops import sparse_conv_pallas as scp

_ap = argparse.ArgumentParser()
_ap.add_argument("--window", type=int, default=512)
_ap.add_argument("--window-down", type=int, default=1792)
_ap.add_argument("--tile", type=int, default=256)
_ap.add_argument("--ov", type=int, default=4096)
_ap.add_argument("--iters", type=int, default=8)
_args = _ap.parse_args()


def _kernel_v2(
    starts_ref, x_ref, rel_ref, wall_ref, cb_ref, ovo_ref, out_ref,
    *, n_groups, pack, window, tile_ov,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    G = n_groups
    S = rel_ref.shape[1]
    T, K = rel_ref.shape[2], rel_ref.shape[3]
    tpg = K // G
    cl = x_ref.shape[2]
    c = cl // pack
    wb = window // pack
    n_tiles = pl.num_programs(1) * S
    count = starts_ref[b, n_tiles * G]
    cout = out_ref.shape[2]

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, wb), 1)
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (T, cl), 1) // c

    for s in range(S):
        t_id = i * S + s
        rel = rel_ref[0, s]

        @pl.when(t_id >= count)
        def _pad(s=s):
            out_ref[0, s * T:(s + 1) * T, :] = jnp.zeros(
                (T, out_ref.shape[2]), out_ref.dtype)

        @pl.when(t_id < count)
        def _live(s=s, t_id=t_id, rel=rel):
            acc = jnp.zeros((T, cout), jnp.float32)
            for g in range(G):
                start = pl.multiple_of(starts_ref[b, t_id * G + g],
                                       scp._ALIGN)
                win = x_ref[
                    0, pl.ds(pl.multiple_of(start // pack, 8), wb), :
                ].astype(jnp.bfloat16)
                for j in range(tpg):
                    r = rel[:, g * tpg + j][:, None]
                    oh = (r // pack == iota_w).astype(jnp.bfloat16)
                    piece = jnp.dot(
                        oh, win, preferred_element_type=jnp.float32)
                    if pack > 1:
                        piece = jnp.where(
                            lane_blk == (r % pack), piece, 0.0)
                    acc = acc + jnp.dot(
                        piece.astype(jnp.bfloat16),
                        wall_ref[g * tpg + j],
                        preferred_element_type=jnp.float32)
            m = cb_ref.shape[1]
            mt = min(tile_ov, m)
            seg = pl.multiple_of(starts_ref[b, n_tiles * G + 1 + t_id], 8)
            ov = ovo_ref[0, pl.ds(seg, mt), :]
            cbv = cb_ref[0, pl.ds(seg, mt), :]
            site = t_id * T + jax.lax.broadcasted_iota(
                jnp.int32, (mt, T), 1)
            oh_t = (ov == site).astype(jnp.float32)
            corr = jax.lax.dot_general(
                oh_t, cbv, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, s * T:(s + 1) * T, :] = (acc + corr).astype(
                out_ref.dtype)


def run_v2(features, plan, weights, in_capacity, valid, bias=None):
    K, C, cout = weights.shape
    features = scp._pad_c(features, 1)[None]
    weights = scp._pad_c(weights, 1)
    K, C, cout = weights.shape
    plan = jax.tree.map(lambda a: a[None], plan)
    B, n_tiles, T, _ = plan.rel.shape
    G = plan.n_groups
    tpg = K // G
    pack = scp._pack_factor(C)
    cl = pack * C
    xp = jax.vmap(lambda f: scp._pack_table(f, in_capacity))(features)

    S = min(scp._STEP_TILES, n_tiles)
    rel = plan.rel
    starts = plan.starts
    if n_tiles % S:
        pad_t = S - n_tiles % S
        ntp = n_tiles + pad_t
        rel = jnp.pad(rel, ((0, 0), (0, pad_t), (0, 0), (0, 0)),
                      constant_values=plan.window)
        starts = jnp.concatenate([
            jnp.pad(starts[:, : n_tiles * G], ((0, 0), (0, pad_t * G))),
            starts[:, n_tiles * G: n_tiles * G + 1],
            jnp.pad(starts[:, n_tiles * G + 1:], ((0, 0), (0, pad_t))),
        ], axis=1)
        n_tiles = ntp
    contrib = scp._spill_contrib(features, weights, plan, in_capacity)
    ov_out = plan.ov_out[..., None]

    wperm = weights[jnp.asarray(plan.perm)]
    wall = jnp.tile(wperm.astype(jnp.bfloat16), (1, pack, 1))  # (K, cl, cout)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles // S),
        in_specs=[
            pl.BlockSpec((1,) + xp.shape[1:], lambda b, i, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, T, K), lambda b, i, s: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + contrib.shape[1:],
                         lambda b, i, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + ov_out.shape[1:],
                         lambda b, i, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S * T, cout), lambda b, i, s: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v2, n_groups=G, pack=pack,
                          window=plan.window, tile_ov=plan.tile_ov),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * T, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=scp._interpret_default(),
    )(starts, xp, rel, wall, contrib, ov_out)
    out = out[:, : plan.v_out]
    if bias is not None:
        out = out + bias[None, None, :]
    return jnp.where(valid[None, :, None], out[0], 0.0)


def timed(name, fn, *args):
    jf = jax.jit(fn)
    out = jf(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    out = jf(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(_args.iters):
        out = jf(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    dt = (time.perf_counter() - t0) / _args.iters
    print(f"  {name:36s}: {dt * 1e3:8.2f} ms", flush=True)
    return out, dt


def main():
    cfg = get_config("FocalFormer3D_L")["model"]
    rng = np.random.RandomState(0)
    batch = synthetic.make_batch(
        rng, batch_size=1, n_points=200000, n_boxes=24, max_gts=32,
        num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range, mode="radial")
    points = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["points_mask"])
    vox = jax.jit(lambda p, m: preprocess_points(cfg, p, m))(points, mask)
    coords = vox["coords"][0]
    valid = vox["voxel_mask"][0]
    print(f"occupancy {int(valid.sum())}", flush=True)

    shape = tuple(cfg.sparse_shape)
    caps = list(cfg.capacities) + [cfg.out_capacity]
    chans = [16, 32, 64, 128]
    rngk = jax.random.PRNGKey(0)
    table = jax.jit(lambda c, v: sc.build_table_csr(c, v, shape))(
        coords, valid)
    cap = coords.shape[0]
    level = 0
    worst = 0.0
    tot_v1 = tot_v2 = 0.0

    while True:
        C = chans[level]
        x = jnp.where(table.valid[:, None],
                      jax.random.normal(rngk, (cap, C), jnp.bfloat16), 0)
        w = 0.1 * jax.random.normal(rngk, (27, C, C), jnp.float32)

        def subm_plan(t):
            m9 = sc.widen_meta9(t.meta, shape)
            rules = sc.build_conv_rules(
                t, shape, t.coords, t.valid, 3, 1, (1, 1, 1),
                use_positions=True, meta9=m9)
            plan = scp.build_tile_plan(
                rules, cap, 3, _args.tile, _args.window, _args.ov, 1024)
            return rules, plan

        rules, plan = jax.jit(subm_plan)(table)
        pb_ = jax.tree.map(lambda a: a[None], plan)
        (y_ref,) = (jax.jit(
            lambda f, w_: sc.apply_conv(f, rules, w_, table.valid)
        )(x, w),)
        y1, dt1 = timed(
            f"L{level} subm v1 one-hot {C}^2",
            lambda f, w_: scp.apply_conv_pallas_batched(
                f[None], pb_, pb_, w_, table.valid[None])[0], x, w)
        y2, dt2 = timed(
            f"L{level} subm v2 per-tap {C}^2",
            lambda f, w_: run_v2(f, plan, w_, cap, table.valid), x, w)
        n_apply = 5 if level == 0 else 4
        tot_v1 += dt1 * n_apply
        tot_v2 += dt2 * n_apply
        d2 = float(jnp.max(jnp.abs(y2 - y_ref)))
        sc_ = float(jnp.max(jnp.abs(y_ref))) + 1e-9
        print(f"    v2 parity vs XLA: {d2:.4e} (ref max {sc_:.2f})",
              flush=True)
        worst = max(worst, d2 / sc_)

        pad = tuple(cfg.down_paddings[level])
        out_cap = caps[level + 1]
        out_shape = sc.conv_out_shape(shape, 3, 2, pad)
        out_meta, total, colz = jax.jit(lambda m: (
            sc.downsample_meta(m, shape, 3, 2, pad)[0],
            sc.downsample_meta(m, shape, 3, 2, pad)[2],
            pb.colz_from_meta(
                sc.downsample_meta(m, shape, 3, 2, pad)[0], out_cap,
                d=out_shape[0])))(table.meta)
        out_valid = jnp.arange(out_cap) < jnp.minimum(total, out_cap)
        czs = jnp.where(colz >= 0, colz, 0)
        ccol = czs >> 6
        out_coords = jnp.stack(
            [czs & 63, ccol // out_shape[2], ccol % out_shape[2]], -1)

        def down_plan(t, oc, ov):
            rules = sc.build_conv_rules(
                t, shape, oc, ov, 3, 2, pad, use_positions=True)
            plan = scp.build_tile_plan(
                rules, cap, 3, _args.tile, _args.window_down, _args.ov,
                512)
            return rules, plan

        rules_d, plan_d = jax.jit(down_plan)(table, out_coords, out_valid)
        cout = chans[level + 1] if level < 3 else 128
        wd = 0.1 * jax.random.normal(rngk, (27, C, cout), jnp.float32)
        dpb = jax.tree.map(lambda a: a[None], plan_d)
        yd_ref = jax.jit(
            lambda f, w_: sc.apply_conv(f, rules_d, w_, out_valid))(x, wd)
        yd1, dd1 = timed(
            f"L{level} down v1 one-hot {C}->{cout}",
            lambda f, w_: scp.apply_conv_pallas_batched(
                f[None], dpb, dpb, w_, out_valid[None])[0], x, wd)
        yd2, dd2 = timed(
            f"L{level} down v2 per-tap {C}->{cout}",
            lambda f, w_: run_v2(f, plan_d, w_, cap, out_valid), x, wd)
        tot_v1 += dd1
        tot_v2 += dd2
        dd = float(jnp.max(jnp.abs(yd2 - yd_ref)))
        dsc = float(jnp.max(jnp.abs(yd_ref))) + 1e-9
        print(f"    v2 parity vs XLA: {dd:.4e} (ref max {dsc:.2f})",
              flush=True)
        worst = max(worst, dd / dsc)

        level += 1
        if level >= cfg.sparse_dense_from:
            break
        table = sc.table_from_meta(out_coords, out_valid, out_meta)
        shape, cap = out_shape, out_cap

    print(f"\nworst v2 rel max-abs-diff: {worst:.4e}")
    print(f"apply totals: v1 {tot_v1 * 1e3:.1f} ms | v2 {tot_v2 * 1e3:.1f}"
          f" ms", flush=True)


if __name__ == "__main__":
    main()
