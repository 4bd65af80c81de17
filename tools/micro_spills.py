"""Per-plan window-spill census at driver-bench density (VERDICT r4 item 1).

Rebuilds the bench's exact voxel sets (radial 200k-pt scan, production
capacities) and reports, for every plan the pallas engine builds
(per level: submanifold + strided down), the true overflow count and the
per-(tile, band) position-span distribution — the data that sizes
plan_window / plan_window_down / plan_overflow, and that decides whether
a wider window or a checked fallback is the right exactness mechanism.

Usage: python tools/micro_spills.py [--window 512] [--window-down 896]
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


def span_census(rules, in_capacity, kernel_size, tile, window, name):
    """Span (max-min in-band position) per (tile, band) + spill counts."""
    K, v_out = rules.shape
    groups = scp.tap_groups(kernel_size)
    n_groups = max(groups) + 1
    n_tiles = -(-v_out // tile)
    pad = n_tiles * tile - v_out
    pos = jnp.pad(rules, ((0, 0), (0, pad)), constant_values=in_capacity)
    pos = pos.reshape(K, n_tiles, tile)
    valid = pos < in_capacity
    spans = []
    spills = 0
    vp = scp._padded_rows(in_capacity)
    for g in range(n_groups):
        taps = tuple(k for k in range(K) if groups[k] == g)
        p = jnp.where(valid[taps, :], pos[taps, :], jnp.iinfo(jnp.int32).max)
        lo = jnp.min(p, axis=(0, 2))
        lo = jnp.where(lo == jnp.iinfo(jnp.int32).max, 0, lo)
        start = jnp.minimum(lo, vp - window) & ~(scp._ALIGN - 1)
        hi = jnp.max(jnp.where(valid[taps, :], pos[taps, :], -1),
                     axis=(0, 2))
        spans.append(np.asarray(jnp.where(hi >= 0, hi - start + 1, 0)))
        rel = pos[taps, :] - start[None, :, None]
        spills += int(jnp.sum(valid[taps, :] & (
            (rel < 0) | (rel >= window))))
    spans = np.concatenate(spans)
    qs = np.percentile(spans, [50, 90, 99, 99.9, 100])
    n_rules = int(jnp.sum(valid))
    print(f"  {name}: rules={n_rules} spills={spills} "
          f"({100.0 * spills / max(n_rules, 1):.2f}%) | span p50/p90/p99/"
          f"p99.9/max = {qs[0]:.0f}/{qs[1]:.0f}/{qs[2]:.0f}/{qs[3]:.0f}/"
          f"{qs[4]:.0f} (window {window})", flush=True)
    return spills


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--window-down", type=int, default=896)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--n-points", type=int, default=200000)
    ap.add_argument("--seed", type=int, default=0)
    # the census is pure index math — identical on any backend; --platform
    # cpu keeps it off the (single, shared) TPU tunnel while kernels bench
    ap.add_argument("--platform", type=str, default=None)
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
    total_spills = 0
    level = 0
    table = sc.build_table_csr(coords, valid, shape)
    cap = coords.shape[0]
    while True:
        # submanifold plan at this level
        rules = sc.build_conv_rules(
            table, shape, table.coords, table.valid, 3, 1, (1, 1, 1),
            use_positions=True,
        )
        total_spills += span_census(
            rules, cap, 3, args.tile, args.window, f"L{level} subm"
        )
        # strided down conv to the next level (the transition into the
        # dense tail ALSO runs sparse — it was the missing 53k-spill plan)
        last = level >= cfg.sparse_dense_from - 1
        pad = tuple(cfg.down_paddings[level])
        out_cap = caps[level + 1]
        out_shape = sc.conv_out_shape(shape, 3, 2, pad)
        out_meta, _, total = sc.downsample_meta(table.meta, shape, 3, 2, pad)
        print(f"  L{level + 1} active set: {int(total)} (cap {out_cap})",
              flush=True)
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
        total_spills += span_census(
            rules_d, cap, 3, args.tile, args.window_down,
            f"L{level}->L{level + 1} down",
        )
        if last:
            break
        table = sc.table_from_meta(out_coords, out_valid, out_meta)
        shape, cap = out_shape, out_cap
        level += 1

    print(f"TOTAL spills at windows ({args.window}, {args.window_down}): "
          f"{total_spills}", flush=True)


if __name__ == "__main__":
    main()
