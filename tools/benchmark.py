#!/usr/bin/env python3
"""Inference FPS benchmark.

Counterpart of /root/reference/tools/analysis_tools/benchmark.py (2000-sample
timed loop): measures steady-state per-scan latency of the jitted predict
step on synthetic scans (or a real info pkl with --data-root).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="FocalFormer3D_L")
    p.add_argument("--samples", type=int, default=200)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--n-points", type=int, default=200000)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    args = p.parse_args()

    from focalformer3d_tpu.utils import platform as _plat
    _plat.setup(args.platform)
    import jax
    import jax.numpy as jnp

    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.models.detector import (
        FocalFormer3D, preprocess_points,
    )

    cfg = get_config(args.config)["model"]
    model = FocalFormer3D(cfg)
    rng = np.random.RandomState(0)
    batch = synthetic.make_batch(
        rng, batch_size=args.batch_size, n_points=args.n_points, n_boxes=24,
        max_gts=32, num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range, with_images=cfg.input_img,
        img_hw=cfg.lss.img_scale,
    )
    points = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["points_mask"])
    img_data = None
    if cfg.input_img:
        img_data = {
            k: jnp.asarray(batch[k])
            for k in ("imgs", "lidar2img", "img_aug", "bev_aug")
        }

    vox = preprocess_points(cfg, points, mask)
    init = jax.jit(
        lambda k, v, i: model.init({"params": k}, v, i, False)
    )
    variables = init(jax.random.PRNGKey(0), vox, img_data)

    # Chained timing + host-fetch sync: block_until_ready is unreliable on
    # remote-TPU backends (see bench.py).
    @jax.jit
    def predict(v, pts, m, img, eps):
        vox = preprocess_points(cfg, pts + eps, m)
        out = model.apply(v, vox, img, False)
        dec = model.get_bboxes(out, 200)
        return dec, dec["scores"].sum() * 0.0

    out, eps = predict(variables, points, mask, img_data, jnp.float32(0))
    _ = float(eps)
    for _ in range(args.warmup):
        out, eps = predict(variables, points, mask, img_data, eps)
    _ = float(eps)

    t0 = time.perf_counter()
    for _ in range(args.samples):
        out, eps = predict(variables, points, mask, img_data, eps)
    _ = float(eps)
    dt = time.perf_counter() - t0
    scans = args.samples * args.batch_size
    print(f"{scans} scans in {dt:.2f}s -> {scans / dt:.2f} scans/s "
          f"({1000 * dt / scans:.1f} ms/scan)")


if __name__ == "__main__":
    main()
