"""Engine A/B at production scale: encoder-only forward on the TPU.

Compares, on the bench scan (radial 200k pts, FocalFormer3D_L shapes):

  - pallas, dense_from=3 (production r4)
  - pallas, dense_from=2 (re-measure: the r3 sweep that rejected it ran
    against the pre-exactness sparse path, which silently truncated —
    the sparse side's cost has since grown by the exact spill
    correction + in-graph fallback)
  - pillar (sparse-BEV / dense-z): 9 BEV-neighbor gathers per subm conv
    instead of 27 voxel gathers; no tile plans at all. Never measured
    on TPU (the engine predates the TPU tunnel).

Timing: pipelined jit calls chained through a scalar (axon
block_until_ready does not sync), encoder cut only.

Usage: python tools/micro_engine_ab.py [--iters 10]
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
from focalformer3d_tpu.models.sparse_encoder import SparseEncoder

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=10)
ap.add_argument("--engines", type=str,
                default="pallas:3,pallas:2,pillar:4")
args = ap.parse_args()

cfg = get_config("FocalFormer3D_L")["model"]
rng = np.random.RandomState(0)
batch = synthetic.make_batch(
    rng, batch_size=1, n_points=200000, n_boxes=24, max_gts=32,
    num_classes=cfg.decoder.num_classes,
    pc_range=cfg.voxel.point_cloud_range, mode="radial",
)
points = jnp.asarray(batch["points"])
mask = jnp.asarray(batch["points_mask"])
vox0 = preprocess_points(cfg, points, mask)
feats0 = vox0["features"]
coords0 = vox0["coords"]
vmask0 = vox0["voxel_mask"]

for spec in args.engines.split(","):
    engine, _, df = spec.partition(":")
    df = int(df or 4)
    enc = SparseEncoder(
        sparse_shape=cfg.sparse_shape,
        output_channels=cfg.sparse_out_channels,
        encoder_channels=cfg.encoder_channels,
        down_paddings=cfg.down_paddings,
        capacities=cfg.capacities,
        out_capacity=cfg.out_capacity,
        engine=engine,
        assume_csr=(engine != "pillar"),
        dense_from=df,
    )
    try:
        init = jax.jit(lambda k, f, c, v: enc.init(k, f, c, v))
        variables = init(jax.random.PRNGKey(0), feats0, coords0, vmask0)

        @jax.jit
        def run(variables, f, c, v, eps):
            out = enc.apply(variables, f + eps, c, v)
            return out.sum() * 0.0 + jnp.float32(1.0)

        t_c0 = time.perf_counter()
        eps = run(variables, feats0, coords0, vmask0, jnp.float32(0))
        _ = float(eps)
        compile_s = time.perf_counter() - t_c0
        eps = run(variables, feats0, coords0, vmask0, eps)
        _ = float(eps)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            eps = run(variables, feats0, coords0, vmask0, eps)
        _ = float(eps)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        try:
            comp = run.lower(
                variables, feats0, coords0, vmask0, jnp.float32(0)
            ).compile()
            cost = comp.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0] if cost else {}
            gb = cost.get("bytes accessed", 0) / 1e9
            gf = cost.get("flops", 0) / 1e9
        except Exception:
            gb = gf = float("nan")
        print(f"{engine:8s} df={df}: {dt:8.2f} ms/scan | {gb:7.2f} GB | "
              f"{gf:8.1f} GFLOP | compile {compile_s:.0f}s", flush=True)
    except Exception as e:
        print(f"{engine:8s} df={df}: FAILED {type(e).__name__}: {e}",
              flush=True)
