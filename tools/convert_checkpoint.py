#!/usr/bin/env python3
"""Convert a released mmdet3d FocalFormer3D .pth checkpoint into this
framework's parameter tree (orbax format, loadable via --load-from).

Counterpart of the reference's checkpoint loading paths
(/root/reference/tools/train.py:268-293: load_from / load_img_from) for the
released checkpoints (README.md:39-44). The key mapping + layout transforms
live in focalformer3d_tpu/utils/convert.py and cover every branch (sparse
encoder, SECOND/FPN, FocalEncoder incl. LSS/locatt/mb2, the full
FocalDecoder, ResNet+FPN); tests/test_convert.py proves bidirectional
coverage against the reference key inventory and tests/test_convert_torch.py
proves numeric layout parity against torch oracles.

Usage:
  python tools/convert_checkpoint.py FocalFormer3D_L path/to/ref.pth out_dir \
      [--require-full]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_torch_state(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def convert(config_name: str, pth_path: str, out_dir: str,
            require_full: bool = False):
    import jax
    import jax.numpy as jnp

    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.models.detector import (
        FocalFormer3D, preprocess_points,
    )
    from focalformer3d_tpu.utils.convert import convert_tree

    cfg = get_config(config_name)["model"]
    model = FocalFormer3D(cfg)
    rng = np.random.RandomState(0)
    batch = synthetic.make_batch(
        rng, batch_size=1, n_points=5000, n_boxes=4,
        max_gts=8, num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range, with_images=cfg.input_img,
        img_hw=cfg.lss.img_scale,
    )
    vox = preprocess_points(
        cfg, jnp.asarray(batch["points"]), jnp.asarray(batch["points_mask"])
    )
    img_data = None
    if cfg.input_img:
        img_data = {k: jnp.asarray(batch[k]) for k in (
            "imgs", "lidar2img", "img_aug", "bev_aug")}
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, vox, img_data,
                           False)
    )
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables,
    )

    sd = load_torch_state(pth_path)
    out, report = convert_tree(variables, sd)
    print(report.summary())
    if require_full and not (report.full and not report.unloaded):
        raise SystemExit("conversion incomplete")

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(out_dir).absolute(), out, force=True)
    ckptr.wait_until_finished()
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("pth")
    p.add_argument("out_dir")
    p.add_argument("--require-full", action="store_true")
    a = p.parse_args()
    convert(a.config, a.pth, a.out_dir, a.require_full)
