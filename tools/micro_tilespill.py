"""Per-TILE spill census at driver-bench density.

The r4 tile-segmented spill compaction scans a bounded per-tile segment
(_TILE_OV rows) in the kernel; _compact_overflow forces n_overflow past
capacity (-> checked XLA fallback) when any tile's spill segment exceeds
that budget. BENCH r4 measured max_plan_overflow = 4097 = capacity+1,
i.e. the forcing fired. This probe reports, per production plan, the
true spill count, the max per-tile spill count, and the exact
over_budget predicate from sparse_conv_pallas._compact_overflow — the
data that decides whether to raise _TILE_OV, widen a window, or re-seat
the segment alignment.

Usage: python tools/micro_tilespill.py [--window 512] [--window-down 1792]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from focalformer3d_tpu.configs import get_config
from focalformer3d_tpu.data import synthetic
from focalformer3d_tpu.models.detector import preprocess_points
from focalformer3d_tpu.ops import plan_builder as pb
from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.ops import sparse_conv_pallas as scp


def tile_census(rules, in_capacity, kernel_size, tile, window, cap_m, name):
    K, v_out = rules.shape
    groups = scp.tap_groups(kernel_size)
    n_groups = max(groups) + 1
    n_tiles = -(-v_out // tile)
    pad = n_tiles * tile - v_out
    pos = jnp.pad(rules, ((0, 0), (0, pad)), constant_values=in_capacity)
    pos = pos.reshape(K, n_tiles, tile)
    valid = pos < in_capacity
    vp = scp._padded_rows(in_capacity)
    over = jnp.zeros((K, n_tiles, tile), bool)
    for g in range(n_groups):
        taps = tuple(k for k in range(K) if groups[k] == g)
        p = jnp.where(valid[taps, :], pos[taps, :], jnp.iinfo(jnp.int32).max)
        lo = jnp.min(p, axis=(0, 2))
        lo = jnp.where(lo == jnp.iinfo(jnp.int32).max, 0, lo)
        start = jnp.minimum(lo, vp - window) & ~(scp._ALIGN - 1)
        rel = pos[taps, :] - start[None, :, None]
        over = over.at[jnp.asarray(taps)].set(
            valid[taps, :] & ((rel < 0) | (rel >= window))
        )
    # exact per-tile counts + the _compact_overflow over_budget predicate
    cnt = np.asarray(jnp.sum(over, axis=(0, 2), dtype=jnp.int32))
    total = int(cnt.sum())
    ends = np.cumsum(cnt)
    mt = min(scp._TILE_OV, cap_m)
    seg = np.clip((ends - cnt) & ~7, 0, max(cap_m - mt, 0))
    worst = int(np.max(np.where(cnt > 0, ends - seg, 0))) if len(cnt) else 0
    over_budget = worst > mt
    n_spill_tiles = int(np.sum(cnt > 0))
    top = np.sort(cnt)[::-1][:8]
    print(
        f"  {name}: spills={total} spill_tiles={n_spill_tiles} "
        f"max_tile_cnt={int(cnt.max()) if len(cnt) else 0} "
        f"worst_seg_need={worst} (budget {mt}) over_budget={over_budget} "
        f"top_tiles={list(map(int, top))}",
        flush=True,
    )
    return total, over_budget


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--window-down", type=int, default=1792)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--overflow", type=int, default=4096)
    ap.add_argument("--n-points", type=int, default=200000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", type=str, default="cpu")
    args = ap.parse_args()

    from focalformer3d_tpu.utils.platform import setup
    setup(platform=args.platform)

    cfg = get_config("FocalFormer3D_L")["model"]
    rng = np.random.RandomState(args.seed)
    batch = synthetic.make_batch(
        rng, batch_size=1, n_points=args.n_points, n_boxes=24, max_gts=32,
        num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range, mode="radial",
    )
    points = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["points_mask"])
    vox = preprocess_points(cfg, points, mask)
    coords = vox["coords"][0]
    valid = vox["voxel_mask"][0]
    print(f"L0 occupancy: {int(jnp.sum(valid))} / {valid.shape[0]}",
          flush=True)

    shape = tuple(cfg.sparse_shape)
    caps = list(cfg.capacities) + [cfg.out_capacity]
    any_over = False
    level = 0
    table = sc.build_table_csr(coords, valid, shape)
    cap = coords.shape[0]
    while True:
        rules = sc.build_conv_rules(
            table, shape, table.coords, table.valid, 3, 1, (1, 1, 1),
            use_positions=True,
        )
        _, ob = tile_census(
            rules, cap, 3, args.tile, args.window, args.overflow,
            f"L{level} subm",
        )
        any_over |= ob
        last = level >= cfg.sparse_dense_from - 1
        pad = tuple(cfg.down_paddings[level])
        out_cap = caps[level + 1]
        out_shape = sc.conv_out_shape(shape, 3, 2, pad)
        out_meta, _, total = sc.downsample_meta(table.meta, shape, 3, 2, pad)
        out_valid = jnp.arange(out_cap) < jnp.minimum(total, out_cap)
        colz = pb.colz_from_meta(out_meta, out_cap, d=out_shape[0])
        czs = jnp.where(colz >= 0, colz, 0)
        ccol = czs >> 6
        out_coords = jnp.stack(
            [czs & 63, ccol // out_shape[2], ccol % out_shape[2]], axis=-1
        )
        rules_d = sc.build_conv_rules(
            table, shape, out_coords, out_valid, 3, 2, pad,
            use_positions=True,
        )
        _, ob = tile_census(
            rules_d, cap, 3, args.tile, args.window_down, args.overflow,
            f"L{level}->L{level + 1} down",
        )
        any_over |= ob
        # the transposed down plan is built at the same windows
        rules_t = scp.transpose_rules(rules_d, cap, 3)
        _, ob = tile_census(
            rules_t, out_cap, 3, args.tile, args.window_down, args.overflow,
            f"L{level}->L{level + 1} down^T",
        )
        any_over |= ob
        if last:
            break
        table = sc.table_from_meta(out_coords, out_valid, out_meta)
        shape, cap = out_shape, out_cap
        level += 1

    print(f"ANY over_budget plan: {any_over}", flush=True)


if __name__ == "__main__":
    main()
