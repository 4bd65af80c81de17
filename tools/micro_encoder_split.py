"""Split the pallas sparse-encoder stage into index-build vs conv-apply.

Measures, as separate jitted programs on the bench configuration
(FocalFormer3D_L, 200k-point synthetic scan, engine='pallas'):

  1. full encoder forward (inference)
  2. plan builds only (tables + downsample sets + fused tile plans,
     forward plans only — what inference actually needs)
  3. plan builds including transposed plans (what training needs)

conv-apply ~= (1) - (2). Drives VERDICT r2 item 1a (shrink the 107.6 ms
encoder stage by attributing index build vs conv apply).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters


def main():
    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.models.detector import preprocess_points
    from focalformer3d_tpu.models.sparse_encoder import SparseEncoder
    from focalformer3d_tpu.ops import sparse_conv as sc
    from focalformer3d_tpu.ops import sparse_conv_pallas as scp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = get_config("FocalFormer3D_L")["model"]
    rng = np.random.RandomState(0)
    batch = synthetic.make_batch(
        rng, batch_size=B, n_points=200000, n_boxes=24, max_gts=32,
        num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range,
    )
    points = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["points_mask"])
    key = jax.random.PRNGKey(0)

    vox = jax.jit(lambda p, m: preprocess_points(cfg, p, m))(points, mask)
    vox = jax.tree.map(lambda a: a.block_until_ready(), vox)
    nvox = int(vox["voxel_mask"].sum())
    print(f"occupied voxels: {nvox}", flush=True)

    enc = SparseEncoder(
        sparse_shape=cfg.sparse_shape,
        output_channels=cfg.sparse_out_channels,
        encoder_channels=cfg.encoder_channels,
        down_paddings=cfg.down_paddings,
        capacities=cfg.capacities,
        out_capacity=cfg.out_capacity,
        engine="pallas" if jax.default_backend() == "tpu" else "voxel",
        assume_csr=True,
        dense_from=cfg.sparse_dense_from,
    )
    feats = vox["features"]
    evars = jax.jit(enc.init)(key, feats, vox["coords"], vox["voxel_mask"])

    @jax.jit
    def s_full(evars, feats, coords, valid):
        return enc.apply(evars, feats, coords, valid).sum()

    t_full = timeit(s_full, evars, feats, vox["coords"], vox["voxel_mask"])
    print(f"encoder full:         {t_full*1e3:8.2f} ms", flush=True)

    # ---- plan builds only (mirrors _voxel_forward's index path) ----
    def plans_fn(coords, valid, with_t):
        shape = tuple(cfg.sparse_shape)
        caps = cfg.capacities
        table = jax.vmap(sc.build_table_csr, in_axes=(0, 0, None))(
            coords, valid, shape)
        cap = coords.shape[1]
        acc = []

        def mk(table, shp, oc, ov, in_cap, out_cap, ks, stride, pad):
            win = min(256, scp._padded_rows(in_cap))
            win_t = min(256, scp._padded_rows(out_cap))

            def one(t, oc_, ov_):
                rules = sc.build_conv_rules(
                    t, shp, oc_, ov_, ks, stride, pad, use_positions=True)
                plan = scp.build_tile_plan(rules, in_cap, ks, 256, win, 4096)
                if with_t:
                    rules_t = scp.transpose_rules(rules, in_cap, ks)
                    plan_t = scp.build_tile_plan(
                        rules_t, out_cap, ks, 256, win_t, 4096)
                    return plan, plan_t
                return plan

            return jax.vmap(one)(table, oc, ov)

        acc.append(mk(table, shape, coords, valid, cap, cap,
                      3, 1, (1, 1, 1)))
        coords_l, valid_l = coords, valid
        for i in range(3):
            pad = tuple(cfg.down_paddings[i])
            out_cap = caps[i + 1]
            out_shape = sc.conv_out_shape(shape, 3, 2, pad)
            oc, ov, om = jax.vmap(
                lambda c, v: (lambda r: (r[0], r[1], r[4]))(
                    sc.build_downsample(c, v, shape, 3, 2, pad, out_cap))
            )(coords_l, valid_l)
            acc.append(mk(table, shape, oc, ov, cap, out_cap, 3, 2, pad))
            coords_l, valid_l, shape, cap = oc, ov, out_shape, out_cap
            table = jax.vmap(sc.table_from_meta)(coords_l, valid_l, om)
            acc.append(mk(table, shape, coords_l, valid_l, cap, cap,
                          3, 1, (1, 1, 1)))
        ks_out = (3, 1, 1)
        oc, ov = jax.vmap(
            lambda c, v: sc.build_downsample(
                c, v, shape, ks_out, (2, 1, 1), 0, cfg.out_capacity)[:2]
        )(coords_l, valid_l)
        acc.append(mk(table, shape, oc, ov, cap, cfg.out_capacity,
                      ks_out, (2, 1, 1), 0))
        plans_flat = [
            x for pair in acc
            for x in (pair if isinstance(pair, tuple) else (pair,))
        ]
        return jnp.asarray(sum(
            jnp.sum(x.rel % 7) + jnp.sum(x.starts % 7) for x in plans_flat
        ))

    s_plans = jax.jit(lambda c, v: plans_fn(c, v, False))
    t_plans = timeit(s_plans, vox["coords"], vox["voxel_mask"])
    print(f"plans (fwd only):     {t_plans*1e3:8.2f} ms", flush=True)

    s_plans_t = jax.jit(lambda c, v: plans_fn(c, v, True))
    t_plans_t = timeit(s_plans_t, vox["coords"], vox["voxel_mask"])
    print(f"plans (fwd+bwd):      {t_plans_t*1e3:8.2f} ms", flush=True)

    print(f"conv apply (approx):  {(t_full - t_plans)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
