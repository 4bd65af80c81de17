"""Encoder batch-scaling attribution: L0 plan build vs conv apply, B=1 vs 4.

tools/micro_batch4.py pinned the batch-4 per-scan regression on the
sparse encoder (199.5 -> 276.2 ms/scan on the r5 chip). This times the
two halves of level 0 — the vmapped index/plan build and the batched
pallas subm conv apply — at both batch sizes. A piece whose per-scan
time grows with B is the serialization.

Usage: python tools/micro_enc_batch.py [B]
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
from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.ops import sparse_conv_pallas as scp

TILE, WIN, OV, TOV = 256, 512, 4096, 512


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
    bmax = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = get_config("FocalFormer3D_L")["model"]
    shape = tuple(cfg.sparse_shape)
    rng = np.random.RandomState(0)

    def plans(coords, valid):
        def one(c, v):
            t = sc.build_table_csr(c, v, shape)
            m9 = sc.widen_meta9(t.meta, shape)
            rules = sc.build_conv_rules(
                t, shape, t.coords, t.valid, 3, (1, 1, 1), (1, 1, 1),
                use_positions=True, meta9=m9)
            return scp.build_tile_plan(rules, c.shape[0], 3, TILE, WIN,
                                       OV, TOV)
        p = jax.vmap(one)(coords, valid)
        return p.rel.sum() + p.starts.sum() + p.ov_pos.sum()

    def apply_once(feats, coords, valid, w):
        def one(c, v):
            t = sc.build_table_csr(c, v, shape)
            m9 = sc.widen_meta9(t.meta, shape)
            rules = sc.build_conv_rules(
                t, shape, t.coords, t.valid, 3, (1, 1, 1), (1, 1, 1),
                use_positions=True, meta9=m9)
            return scp.build_tile_plan(rules, c.shape[0], 3, TILE, WIN,
                                       OV, TOV)
        plan = jax.vmap(one)(coords, valid)
        y = scp.apply_conv_pallas_batched(
            feats, plan, plan, w, valid)
        # 5 subm applies at L0 in production: time N applies on one plan
        for _ in range(4):
            y = scp.apply_conv_pallas_batched(
                y, plan, plan, w2, valid)
        return jnp.sum(y.astype(jnp.float32))

    for B in (1, bmax):
        batch = synthetic.make_batch(
            rng, batch_size=B, n_points=200000, n_boxes=24, max_gts=32,
            num_classes=cfg.decoder.num_classes,
            pc_range=cfg.voxel.point_cloud_range, mode="radial",
        )
        points = jnp.asarray(batch["points"])
        mask = jnp.asarray(batch["points_mask"])
        vox = jax.jit(lambda p, m: preprocess_points(cfg, p, m))(
            points, mask)
        coords, valid = vox["coords"], vox["voxel_mask"]
        feats = jnp.pad(
            vox["features"], ((0, 0), (0, 0), (0, 16 - 5))
        ).astype(jnp.bfloat16)
        global w2
        k = jax.random.PRNGKey(0)
        w = jax.random.normal(k, (27, 16, 16), jnp.float32) * 0.1
        w2 = jax.random.normal(k, (27, 16, 16), jnp.float32) * 0.1

        t_p = timeit(jax.jit(plans), coords, valid)
        t_a = timeit(jax.jit(apply_once), feats, coords, valid, w)
        print(
            f"B={B}: L0 table+rules+plan {t_p*1e3/B:7.2f} ms/scan "
            f"({t_p*1e3:7.2f} tot) | +5 subm applies "
            f"{(t_a - t_p)*1e3/B:7.2f} ms/scan ({(t_a-t_p)*1e3:7.2f} tot)",
            flush=True,
        )


if __name__ == "__main__":
    main()
