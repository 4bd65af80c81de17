#!/usr/bin/env python3
"""Model FLOPs / memory-traffic report via XLA cost analysis.

Counterpart of /root/reference/tools/analysis_tools/get_flops.py (mmcv
complexity hook): lowers the jitted forward and reads the compiler's own
cost model, which — unlike the reference's module-hook counting — includes
every op XLA actually executes.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="FocalFormer3D_L")
    p.add_argument("--n-points", type=int, default=200000)
    p.add_argument("--platform", default=None)
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
        rng, batch_size=1, n_points=args.n_points, n_boxes=16, max_gts=32,
        num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range, with_images=cfg.input_img,
        img_hw=cfg.lss.img_scale,
    )
    points = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["points_mask"])
    img_data = None
    if cfg.input_img:
        img_data = {k: jnp.asarray(batch[k]) for k in (
            "imgs", "lidar2img", "img_aug", "bev_aug")}
    vox = preprocess_points(cfg, points, mask)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, vox, img_data,
                           False)
    )
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(variables["params"])
    )

    def fwd(v, pts, m, img):
        vox = preprocess_points(cfg, pts, m)
        return model.apply(v, vox, img, False)

    lowered = jax.jit(fwd).lower(variables, points, mask, img_data)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))
    print(f"config: {args.config}")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"forward flops: {flops / 1e9:.2f} GFLOPs")
    print(f"bytes accessed: {bytes_ / 1e9:.2f} GB")
    print(f"arithmetic intensity: {flops / max(bytes_, 1):.1f} flop/byte")


if __name__ == "__main__":
    main()
