"""Bisect the plan-build pipeline: which sub-stage owns the 96 ms?

micro_enc_profile attributes ~96 ms/scan to index builds at production
settings, but op-level byte estimates only explain ~2 GB of the ~12 GB
cost model per build. This probe times each sub-stage in isolation on
the bench scan's L0 table (each number carries ~1.8 ms of axon per-call
dispatch; compare deltas, not absolutes).

Usage: python tools/micro_planbits.py [--level 0]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focalformer3d_tpu.utils.platform import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np

from focalformer3d_tpu.configs import get_config
from focalformer3d_tpu.data import synthetic
from focalformer3d_tpu.models.detector import preprocess_points
from focalformer3d_tpu.ops import plan_builder as pb
from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.ops import sparse_conv_pallas as scp


def timeit(name, fn, *args, iters=10):
    jf = jax.jit(fn)
    out = jf(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"  {name:38s}: {dt * 1e3:8.2f} ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=0)
    args = ap.parse_args()

    cfg = get_config("FocalFormer3D_L")["model"]
    rng = np.random.RandomState(0)
    batch = synthetic.make_batch(
        rng, batch_size=1, n_points=200000, n_boxes=24, max_gts=32,
        num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range, mode="radial",
    )
    vox = jax.jit(lambda p, m: preprocess_points(cfg, p, m))(
        jnp.asarray(batch["points"]), jnp.asarray(batch["points_mask"]))
    coords = vox["coords"][0]
    valid = vox["voxel_mask"][0]
    shape = tuple(cfg.sparse_shape)
    caps = list(cfg.capacities) + [cfg.out_capacity]
    cap = coords.shape[0]
    table = jax.jit(
        lambda c, v: sc.build_table_csr(c, v, shape))(coords, valid)

    for lv in range(args.level):
        pad = tuple(cfg.down_paddings[lv])
        out_shape = sc.conv_out_shape(shape, 3, 2, pad)
        out_cap = caps[lv + 1]
        out_meta, _, total = sc.downsample_meta(table.meta, shape, 3, 2,
                                                pad)
        colz = pb.colz_from_meta(out_meta, out_cap, d=out_shape[0])
        out_valid = jnp.arange(out_cap) < jnp.minimum(total, out_cap)
        czs = jnp.where(colz >= 0, colz, 0)
        ccol = czs >> 6
        out_coords = jnp.stack(
            [czs & 63, ccol // out_shape[2], ccol % out_shape[2]], -1)
        table = sc.table_from_meta(out_coords, out_valid, out_meta)
        shape, cap = out_shape, out_cap
    print(f"level {args.level}: cap={cap} n_col={shape[1] * shape[2]}",
          flush=True)

    m9 = timeit("widen_meta9",
                lambda t: sc.widen_meta9(t.meta, shape), table)
    rules = timeit(
        "build_conv_rules (subm, w/ meta9)",
        lambda t, m: sc.build_conv_rules(
            t, shape, t.coords, t.valid, 3, 1, (1, 1, 1),
            use_positions=True, meta9=m),
        table, m9)
    timeit(
        "build_conv_rules (subm, no meta9)",
        lambda t: sc.build_conv_rules(
            t, shape, t.coords, t.valid, 3, 1, (1, 1, 1),
            use_positions=True),
        table)
    timeit("build_tile_plan (full)",
           lambda r: scp.build_tile_plan(r, cap, 3, 256, 512, 4096),
           rules)

    # build_tile_plan sub-stages
    def stage_windows(r):
        K, v_out = r.shape
        tile, window = 256, 512
        n_tiles = -(-v_out // tile)
        padn = n_tiles * tile - v_out
        pos = jnp.pad(r, ((0, 0), (0, padn)), constant_values=cap)
        pos = pos.reshape(K, n_tiles, tile)
        vld = pos < cap
        groups = scp.tap_groups(3)
        vp = scp._padded_rows(cap)
        sts = []
        for g in range(3):
            taps = tuple(k for k in range(K) if groups[k] == g)
            p = jnp.where(vld[taps, :], pos[taps, :], scp.INT_MAX)
            lo = jnp.min(p, axis=(0, 2))
            lo = jnp.where(lo == scp.INT_MAX, 0, lo)
            sts.append(
                (jnp.minimum(lo, vp - window) & ~63).astype(jnp.int32))
        return jnp.stack(sts)

    timeit("  tile_plan: window starts only", stage_windows, rules)

    def stage_rel(r):
        K, v_out = r.shape
        tile, window = 256, 512
        n_tiles = -(-v_out // tile)
        padn = n_tiles * tile - v_out
        pos = jnp.pad(r, ((0, 0), (0, padn)), constant_values=cap)
        pos = pos.reshape(K, n_tiles, tile)
        sts = stage_windows(r)
        groups = scp.tap_groups(3)
        st_kt = jnp.stack([sts[groups[k]] for k in range(K)], 0)
        rel = pos - st_kt[:, :, None]
        vld = pos < cap
        in_win = vld & (rel >= 0) & (rel < window)
        relf = jnp.where(in_win, rel, window).astype(jnp.int32)
        return jnp.transpose(
            relf, (1, 2, 0))[:, :, jnp.asarray(scp._group_perm(3)[0])]

    timeit("  tile_plan: + rel transpose", stage_rel, rules)

    def stage_overflow(r):
        K, v_out = r.shape
        tile, window, ovc = 256, 512, 4096
        n_tiles = -(-v_out // tile)
        padn = n_tiles * tile - v_out
        pos = jnp.pad(r, ((0, 0), (0, padn)), constant_values=cap)
        pos = pos.reshape(K, n_tiles, tile)
        sts = stage_windows(r)
        groups = scp.tap_groups(3)
        st_kt = jnp.stack([sts[groups[k]] for k in range(K)], 0)
        rel = pos - st_kt[:, :, None]
        vld = pos < cap
        in_win = vld & (rel >= 0) & (rel < window)
        overflow = vld & ~in_win
        tcap = max(8, min(n_tiles, ovc // tile))
        tile_any = jnp.any(overflow, axis=(0, 2))
        (tidx,) = jnp.nonzero(tile_any, size=tcap, fill_value=n_tiles)
        tsafe = jnp.minimum(tidx, n_tiles - 1)
        ov_sub = overflow[:, tsafe, :] & (tidx < n_tiles)[None, :, None]
        (ov_idx,) = jnp.nonzero(
            ov_sub.reshape(-1), size=ovc, fill_value=ov_sub.size)
        return ov_idx

    timeit("  tile_plan: + overflow compaction", stage_overflow, rules)

    pad = tuple(cfg.down_paddings[min(args.level, 2)])
    out_shape = sc.conv_out_shape(shape, 3, 2, pad)
    out_cap = caps[min(args.level, 2) + 1]
    (out_meta, total) = timeit(
        "downsample_meta",
        lambda m: sc.downsample_meta(m, shape, 3, 2, pad)[::2],
        table.meta)
    timeit("colz_from_meta",
           lambda m: pb.colz_from_meta(m, out_cap, d=out_shape[0]),
           out_meta)


if __name__ == "__main__":
    main()
