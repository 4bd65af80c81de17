"""On-TPU z-run kernel probe: Mosaic-compiled parity + rate per level.

For each sparse level of the bench scan (production windows/tiles), builds
the z-run plan and runs the Mosaic-compiled kernel against the exact XLA
gather-GEMM engine (ops/sparse_conv.apply_conv), reporting max-abs-diff
and per-conv wall ms side by side with the one-hot kernel. This is the
on-TPU numeric parity gate VERDICT r4 asked for (interpret-mode tests
don't exercise Mosaic codegen) plus the z-run rate measurement.

Usage: python tools/micro_zrun.py [--window 512] [--window-down 1792]
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
from focalformer3d_tpu.ops import sparse_conv_zrun as scz

_ap = argparse.ArgumentParser()
_ap.add_argument("--window", type=int, default=512)
_ap.add_argument("--window-down", type=int, default=1792)
_ap.add_argument("--tile", type=int, default=256)
_ap.add_argument("--ov", type=int, default=4096)
_ap.add_argument("--tile-ov", type=int, default=1024)
_ap.add_argument("--tile-ov-down", type=int, default=512)
_ap.add_argument("--iters", type=int, default=10)
_args = _ap.parse_args()


def timed(name, fn, *args, iters=None):
    iters = iters or _args.iters
    jf = jax.jit(fn)
    out = jf(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    out = jf(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"  {name:40s}: {dt * 1e3:8.2f} ms", flush=True)
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
    print(f"occupancy {int(valid.sum())}", flush=True)

    shape = tuple(cfg.sparse_shape)
    caps = list(cfg.capacities) + [cfg.out_capacity]
    chans = [16, 32, 64, 128]
    rngk = jax.random.PRNGKey(0)

    table = jax.jit(
        lambda c, v: sc.build_table_csr(c, v, shape)
    )(coords, valid)
    cap = coords.shape[0]
    level = 0
    worst = 0.0
    zr_total = oh_total = 0.0

    while True:
        C = chans[level]
        x = jnp.where(
            table.valid[:, None],
            jax.random.normal(rngk, (cap, C), jnp.bfloat16), 0)
        w = 0.1 * jax.random.normal(rngk, (27, C, C), jnp.float32)

        # ---- subm at this level ----
        def subm_builds(t):
            m9 = sc.widen_meta9(t.meta, shape)
            rules = sc.build_conv_rules(
                t, shape, t.coords, t.valid, 3, 1, (1, 1, 1),
                use_positions=True, meta9=m9)
            plan = scp.build_tile_plan(
                rules, cap, 3, _args.tile, _args.window, _args.ov,
                _args.tile_ov)
            zplan = scz.build_zplan(
                t, shape, t.coords, t.valid, 3, 1, (1, 1, 1),
                tile=_args.tile, window=_args.window,
                overflow_capacity=_args.ov, tile_ov=_args.tile_ov,
                meta9=m9)
            return rules, plan, zplan

        (rules, plan, zplan), dt_b = timed(
            f"L{level} subm rules+plan+zplan build",
            lambda t: subm_builds(t), table)
        _, dt_zb = timed(
            f"L{level} subm ZPLAN-only build",
            lambda t: scz.build_zplan(
                t, shape, t.coords, t.valid, 3, 1, (1, 1, 1),
                tile=_args.tile, window=_args.window,
                overflow_capacity=_args.ov, tile_ov=_args.tile_ov),
            table)
        novf = int(zplan.n_overflow)
        print(f"    zplan n_overflow={novf}", flush=True)

        pb_ = jax.tree.map(lambda a: a[None], plan)
        zb_ = jax.tree.map(lambda a: a[None], zplan)

        (y_ref,), _ = timed(
            f"L{level} subm XLA engine {C}^2",
            lambda f, w_: (sc.apply_conv(f, rules, w_, table.valid),), x, w)
        (y_oh,), dt_oh = timed(
            f"L{level} subm one-hot kernel {C}^2",
            lambda f, w_: (scp.apply_conv_pallas_batched(
                f[None], pb_, pb_, w_, table.valid[None])[0],), x, w)
        (y_zr,), dt_zr = timed(
            f"L{level} subm Z-RUN kernel {C}^2",
            lambda f, w_: (scz.apply_conv_zrun_batched(
                f[None], zb_, None, None, w_, table.valid[None],
                interpret=False)[0],), x, w)
        n_apply = 5 if level == 0 else 4
        zr_total += dt_zr * n_apply + dt_zb
        oh_total += dt_oh * n_apply + (dt_b - dt_zb)
        d_oh = float(jnp.max(jnp.abs(y_oh - y_ref)))
        d_zr = float(jnp.max(jnp.abs(y_zr - y_ref)))
        scale = float(jnp.max(jnp.abs(y_ref))) + 1e-9
        print(f"    parity vs XLA: one-hot {d_oh:.4e}  z-run {d_zr:.4e}"
              f"  (ref max {scale:.2f})", flush=True)
        worst = max(worst, d_zr / scale)

        # ---- down transition ----
        pad = tuple(cfg.down_paddings[level])
        out_cap = caps[level + 1]
        out_shape = sc.conv_out_shape(shape, 3, 2, pad)

        def down_sets(m):
            out_meta, _, total = sc.downsample_meta(m, shape, 3, 2, pad)
            colz = pb.colz_from_meta(out_meta, out_cap, d=out_shape[0])
            return out_meta, total, colz

        (out_meta, total, colz) = jax.jit(down_sets)(table.meta)
        out_valid = jnp.arange(out_cap) < jnp.minimum(total, out_cap)
        czs = jnp.where(colz >= 0, colz, 0)
        ccol = czs >> 6
        out_coords = jnp.stack(
            [czs & 63, ccol // out_shape[2], ccol % out_shape[2]], -1)

        def down_builds(t, oc, ov):
            m9 = sc.widen_meta9(t.meta, shape)
            rules = sc.build_conv_rules(
                t, shape, oc, ov, 3, 2, pad, use_positions=True, meta9=m9)
            plan = scp.build_tile_plan(
                rules, cap, 3, _args.tile, _args.window_down, _args.ov,
                _args.tile_ov_down)
            zplan = scz.build_zplan(
                t, shape, oc, ov, 3, 2, pad,
                tile=_args.tile, window=_args.window_down,
                overflow_capacity=_args.ov, tile_ov=_args.tile_ov_down,
                meta9=m9)
            return rules, plan, zplan

        (rules_d, plan_d, zplan_d), dt_db = timed(
            f"L{level} down rules+plan+zplan build",
            down_builds, table, out_coords, out_valid)
        _, dt_dzb = timed(
            f"L{level} down ZPLAN-only build",
            lambda t, oc, ov: scz.build_zplan(
                t, shape, oc, ov, 3, 2, pad,
                tile=_args.tile, window=_args.window_down,
                overflow_capacity=_args.ov, tile_ov=_args.tile_ov_down),
            table, out_coords, out_valid)
        print(f"    down zplan n_overflow={int(zplan_d.n_overflow)}",
              flush=True)

        cout = chans[level + 1] if level < 3 else 128
        wd = 0.1 * jax.random.normal(rngk, (27, C, cout), jnp.float32)
        dpb = jax.tree.map(lambda a: a[None], plan_d)
        dzb = jax.tree.map(lambda a: a[None], zplan_d)
        (yd_ref,), _ = timed(
            f"L{level} down XLA engine {C}->{cout}",
            lambda f, w_: (sc.apply_conv(f, rules_d, w_, out_valid),), x, wd)
        (yd_oh,), dt_doh = timed(
            f"L{level} down one-hot kernel",
            lambda f, w_: (scp.apply_conv_pallas_batched(
                f[None], dpb, dpb, w_, out_valid[None])[0],), x, wd)
        (yd_zr,), dt_dzr = timed(
            f"L{level} down Z-RUN kernel",
            lambda f, w_: (scz.apply_conv_zrun_batched(
                f[None], dzb, None, None, w_, out_valid[None],
                interpret=False)[0],), x, wd)
        zr_total += dt_dzr + dt_dzb
        oh_total += dt_doh + (dt_db - dt_dzb)
        dd_oh = float(jnp.max(jnp.abs(yd_oh - yd_ref)))
        dd_zr = float(jnp.max(jnp.abs(yd_zr - yd_ref)))
        dscale = float(jnp.max(jnp.abs(yd_ref))) + 1e-9
        print(f"    parity vs XLA: one-hot {dd_oh:.4e}  z-run {dd_zr:.4e}"
              f"  (ref max {dscale:.2f})", flush=True)
        worst = max(worst, dd_zr / dscale)

        level += 1
        if level >= cfg.sparse_dense_from:
            break
        table = sc.table_from_meta(out_coords, out_valid, out_meta)
        shape, cap = out_shape, out_cap

    print(f"\nworst rel max-abs-diff (z-run vs XLA): {worst:.4e}")
    print(f"encoder-equivalent totals: one-hot path ~{oh_total * 1e3:.1f} ms"
          f" | z-run path ~{zr_total * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
