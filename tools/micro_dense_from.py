"""Decide SparseEncoder.dense_from: sparse L2 vs XLA dense conv3d tail.

The r4 profile (docs/PERF.md) puts the sparse L2 block at ~62 ms/scan
(plans 13 ms + 5 subm convs 37 ms + down 12 ms) at 13% occupancy
(186.8k of 11x360x360). A dense conv3d tail needs no index build and no
capacity bound; its cost is pure MXU FLOPs (~1.65 TF for the L2 block).
This probe measures, on the real chip at driver-bench geometry:

  1. raw conv3d rate at the L2 shapes (in-jit fori_loop repeats so the
     axon tunnel's per-call dispatch cost is excluded);
  2. the full encoder at dense_from=3 (today) vs dense_from=2, with the
     down-conv plan window at 1792 (today) vs 896 (enough once the
     L2->L3 transition — the only >896 span — runs dense);
  3. output agreement between the variants (exactness guard).

Usage: python tools/micro_dense_from.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focalformer3d_tpu.utils.platform import setup

setup()

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


def conv3d_rate():
    """Raw lax conv3d at the dense-L2 shapes, repeats chained inside jit."""
    shapes = [
        ((1, 11, 360, 360, 64), (3, 3, 3, 64, 64), (1, 1, 1), "subm L2"),
        ((1, 11, 360, 360, 64), (3, 3, 3, 64, 128), (2, 2, 2), "down L2"),
        ((1, 21, 720, 720, 32), (3, 3, 3, 32, 32), (1, 1, 1), "subm L1"),
    ]
    for xs, ws, stride, name in shapes:
        x = jnp.ones(xs, jnp.bfloat16)
        w = jnp.full(ws, 1e-3, jnp.bfloat16)
        pads = [(0, 1), (1, 1), (1, 1)] if stride[0] == 2 else [(1, 1)] * 3

        def one(x_, w_):
            return jax.lax.conv_general_dilated(
                x_, w_, stride, pads,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        @jax.jit
        def rep(x_, w_):
            def body(_, c):
                # real data dependence on the previous iterate so XLA
                # cannot CSE the loop body into a single conv
                return one(x_ + 1e-6 * c[0, 0, 0, 0, 0].astype(x_.dtype),
                           w_)

            y = jax.lax.fori_loop(
                0, 8, body, one(x_, w_), unroll=True
            )
            return y[0, 0, 0, 0, 0]

        t = timeit(rep, x, w) / 8
        out_sp = np.prod(
            [(s + p[0] + p[1] - k) // st + 1
             for s, p, k, st in zip(xs[1:4], pads, ws[:3], stride)]
        )
        fl = 2 * out_sp * ws[0] * ws[1] * ws[2] * ws[3] * ws[4]
        print(f"  conv3d {name}: {t*1e3:7.2f} ms  "
              f"{fl/t/1e12:6.1f} TF/s", flush=True)


def main():
    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.models.detector import preprocess_points
    from focalformer3d_tpu.models.sparse_encoder import SparseEncoder

    print("backend:", jax.default_backend(), flush=True)
    print("== raw conv3d rates ==", flush=True)
    conv3d_rate()

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
    feats = vox["features"].astype(jnp.bfloat16)
    coords, valid = vox["coords"], vox["voxel_mask"]
    occ = int(jnp.sum(valid))
    print(f"occupancy {occ}", flush=True)

    def make(dense_from, win_down):
        return SparseEncoder(
            sparse_shape=cfg.sparse_shape,
            output_channels=cfg.sparse_out_channels,
            encoder_channels=cfg.encoder_channels,
            down_paddings=cfg.down_paddings,
            capacities=cfg.capacities,
            out_capacity=cfg.out_capacity,
            engine="pallas",
            assume_csr=True,
            dense_from=dense_from,
            plan_window_down=win_down,
        )

    enc0 = make(3, 1792)
    variables = jax.jit(enc0.init)(
        jax.random.PRNGKey(0), feats, coords, valid
    )
    outs = {}
    print("== encoder end-to-end ==", flush=True)
    for dense_from, win_down in [(3, 1792), (2, 1792), (2, 896), (1, 896)]:
        enc = make(dense_from, win_down)

        @jax.jit
        def run(v, f, c, m):
            return enc.apply(v, f, c, m)

        try:
            t = timeit(run, variables, feats, coords, valid)
            outs[(dense_from, win_down)] = np.asarray(
                run(variables, feats, coords, valid), np.float32
            )
            print(f"  dense_from={dense_from} win_down={win_down}: "
                  f"{t*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"  dense_from={dense_from} win_down={win_down}: "
                  f"FAILED {e}", flush=True)

    ref = outs.get((3, 1792))
    if ref is not None:
        for k, v in outs.items():
            if k == (3, 1792):
                continue
            err = np.max(np.abs(v - ref)) / (np.max(np.abs(ref)) + 1e-9)
            print(f"  rel-max-err vs (3,1792) {k}: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
