"""Per-stage sparse-encoder attribution: time + XLA bytes for every piece.

Mirrors the production pallas path (SparseEncoder._voxel_forward,
engine='pallas') on the bench scan, timing each sub-program separately:

  - index build per level: table/meta, downsample_meta + colz, subm/down
    rules + tile plans (production windows)
  - conv applies per level (plans pre-built, fed as jit inputs)
  - dense tail + to_dense

Each jitted piece reports wall ms and XLA cost-model bytes ("bytes
accessed") so the 122 GB/scan mystery (VERDICT r4 item 2) decomposes into
named producers.

Usage: python tools/micro_enc_profile.py
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

from focalformer3d_tpu.configs import get_config
from focalformer3d_tpu.data import synthetic
from focalformer3d_tpu.models.detector import preprocess_points
from focalformer3d_tpu.ops import plan_builder as pb
from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.ops import sparse_conv_pallas as scp

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--window", type=int, default=512)
_ap.add_argument("--window-down", type=int, default=1792)
_ap.add_argument("--tile", type=int, default=256)
_ap.add_argument("--tile-down", type=int, default=256)
_ap.add_argument("--ov", type=int, default=4096)
_ap.add_argument("--ov-down", type=int, default=32768)
_args = _ap.parse_args()
WINDOW = _args.window
WINDOW_DOWN = _args.window_down
TILE = _args.tile
TILE_DOWN = _args.tile_down
OV = _args.ov
OV_DOWN = _args.ov_down


def bench_piece(name, fn, *args, iters=10):
    """jit + AOT-compile fn, print wall ms + cost-model bytes/flops."""
    jf = jax.jit(fn)
    try:
        comp = jf.lower(*args).compile()
        cost = comp.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        gb = cost.get("bytes accessed", 0) / 1e9
        gf = cost.get("flops", 0) / 1e9
    except Exception as e:  # pragma: no cover
        gb = gf = float("nan")
        print(f"  (cost analysis failed for {name}: {e})", flush=True)
    out = jf(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    out = jf(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"  {name:34s}: {dt * 1e3:8.2f} ms | {gb:7.2f} GB | "
          f"{gf:8.1f} GF", flush=True)
    return out, dt


def main():
    cfg = get_config("FocalFormer3D_L")["model"]
    rng = np.random.RandomState(0)
    batch = synthetic.make_batch(
        rng, batch_size=1, n_points=200000, n_boxes=24, max_gts=32,
        num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range, mode="radial",
    )
    points = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["points_mask"])
    vox = jax.jit(lambda p, m: preprocess_points(cfg, p, m))(points, mask)
    coords = vox["coords"][0]
    valid = vox["voxel_mask"][0]
    feats0 = jnp.where(valid[:, None], vox["features"][0], 0).astype(
        jnp.bfloat16)
    print(f"occupancy {int(valid.sum())}", flush=True)

    shape = tuple(cfg.sparse_shape)
    caps = list(cfg.capacities) + [cfg.out_capacity]
    chans = [16, 32, 64, 128]
    rngk = jax.random.PRNGKey(0)

    total_build = 0.0
    total_conv = 0.0
    level = 0
    cap = coords.shape[0]

    (table,), dt = bench_piece(
        "L0 build_table_csr",
        lambda c, v: (sc.build_table_csr(c, v, shape),), coords, valid)
    total_build += dt
    x = feats0

    while True:
        cin = chans[level] if level else 16

        def subm_plan(t):
            rules = sc.build_conv_rules(
                t, shape, t.coords, t.valid, 3, 1, (1, 1, 1),
                use_positions=True)
            return scp.build_tile_plan(rules, cap, 3, TILE, WINDOW, OV)

        (plan,), dt = bench_piece(
            f"L{level} subm rules+plan",
            lambda t: (subm_plan(t),), table)
        total_build += dt

        # conv applies at this level: conv_input-like (first level) + 4
        # block convs, all sharing the plan
        c_in = x.shape[-1]
        w1 = 0.1 * jax.random.normal(rngk, (27, c_in, chans[level]),
                                     jnp.float32)
        pb_ = jax.tree.map(lambda a: a[None], plan)
        _, dt = bench_piece(
            f"L{level} conv {c_in}->{chans[level]} (x1)",
            lambda f, w: scp.apply_conv_pallas_batched(
                f[None], pb_, pb_, w, table.valid[None]),
            x, w1)
        x = jnp.where(table.valid[:, None],
                      jax.random.normal(rngk, (cap, chans[level]),
                                        jnp.bfloat16), 0)
        w2 = 0.1 * jax.random.normal(rngk, (27, chans[level], chans[level]),
                                     jnp.float32)
        _, dt = bench_piece(
            f"L{level} conv {chans[level]}^2 (x4 of these)",
            lambda f, w: scp.apply_conv_pallas_batched(
                f[None], pb_, pb_, w, table.valid[None]),
            x, w2)
        total_conv += dt * 4 + (dt if level else dt)

        # down transition
        pad = tuple(cfg.down_paddings[level])
        out_cap = caps[level + 1]
        out_shape = sc.conv_out_shape(shape, 3, 2, pad)

        def down_sets(m):
            out_meta, _, total = sc.downsample_meta(m, shape, 3, 2, pad)
            colz = pb.colz_from_meta(out_meta, out_cap, d=out_shape[0])
            return out_meta, total, colz

        (out_meta, total, colz), dt = bench_piece(
            f"L{level} downsample_meta+colz", down_sets, table.meta)
        total_build += dt
        out_valid = jnp.arange(out_cap) < jnp.minimum(total, out_cap)
        czs = jnp.where(colz >= 0, colz, 0)
        ccol = czs >> 6
        out_coords = jnp.stack(
            [czs & 63, ccol // out_shape[2], ccol % out_shape[2]], -1)

        def down_plan(t, oc, ov):
            rules = sc.build_conv_rules(
                t, shape, oc, ov, 3, 2, pad, use_positions=True)
            return scp.build_tile_plan(rules, cap, 3, TILE_DOWN, WINDOW_DOWN,
                                        OV_DOWN)

        (dplan,), dt = bench_piece(
            f"L{level} down rules+plan",
            lambda t, oc, ov: (down_plan(t, oc, ov),),
            table, out_coords, out_valid)
        total_build += dt

        dpb = jax.tree.map(lambda a: a[None], dplan)
        wd = 0.1 * jax.random.normal(
            rngk, (27, chans[level], chans[level + 1] if level < 3 else 128),
            jnp.float32)
        _, dt = bench_piece(
            f"L{level} down conv {chans[level]}->{wd.shape[-1]}",
            lambda f, w: scp.apply_conv_pallas_batched(
                f[None], dpb, dpb, w, out_valid[None]),
            x, wd)
        total_conv += dt

        level += 1
        if level >= cfg.sparse_dense_from:
            break
        table = sc.table_from_meta(out_coords, out_valid, out_meta)
        shape, cap = out_shape, out_cap
        x = jnp.where(out_valid[:, None],
                      jax.random.normal(rngk, (cap, chans[level]),
                                        jnp.bfloat16), 0)

    # transposed-plan builds (training only): one representative level
    def tplan(t, oc, ov):
        rules = sc.build_conv_rules(
            t, shape, oc, ov, 3, 2, pad, use_positions=True)
        rt = scp.transpose_rules(rules, cap, 3)
        return scp.build_tile_plan(rt, out_cap, 3, TILE_DOWN, WINDOW_DOWN,
                                   OV_DOWN)

    bench_piece("L2 down TRANSPOSED plan (train)", lambda t, oc, ov:
                (tplan(t, oc, ov),), table, out_coords, out_valid)

    print(f"\nindex build total ~ {total_build * 1e3:.1f} ms | conv apply "
          f"total ~ {total_conv * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
