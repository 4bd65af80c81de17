"""Config variants derived from the base configs.

Covers the remaining reference config family
(/root/reference/projects/configs/focalformer3d/): dynamic voxelization,
I2P-projection fusion, Waymo 1/5 split with class-aware regression, and the
TTA eval variant. Each is the matching base config with the reference's
deltas applied.
"""
from __future__ import annotations

import dataclasses

from . import deformformer3d_l, focalformer3d_l, focalformer3d_lc
from . import focalformer3d_waymo_l


def deformformer3d_l_dynamic():
    """DeformFormer3D_L_dynamic.py: DynamicSimpleVFE (per-point voxel mean,
    no per-voxel point caps)."""
    cfg = deformformer3d_l.get_config()
    cfg["model"] = dataclasses.replace(cfg["model"],
                                       vfe_type="DynamicSimpleVFE")
    return cfg


def focalformer3d_lc_proj():
    """FocalFormer3D_LC_Proj.py: camera fusion via per-layer I2P projection
    (grid-sampled multi-view features + per-cell attention) instead of LSS.
    """
    cfg = focalformer3d_lc.get_config()
    cfg["model"] = dataclasses.replace(
        cfg["model"], cam_proj="i2p", iter_bev_cam=True,
        max_points_height=10, freeze_camlss=False,
    )
    return cfg


def focalformer3d_waymo15_l():
    """FocalFormer3D_Waymo15_L.py: 1/5 training split (load_interval=5),
    200 proposals, class-aware regression heads."""
    cfg = focalformer3d_waymo_l.get_config()
    cfg["model"] = dataclasses.replace(
        cfg["model"],
        decoder=dataclasses.replace(
            cfg["model"].decoder, num_proposals=200, classaware_reg=True,
        ),
    )
    cfg["load_interval"] = 5
    return cfg


def focalformer3d_lc_tta():
    """FocalFormer3D_LC_TTA.py: eval-time double-flip x 3-scale TTA over the
    LC model (tools/test.py --tta consumes the flags)."""
    cfg = focalformer3d_lc.get_config()
    cfg["tta"] = {
        "pts_scale_ratio": (1.0, 1.06, 0.96),
        "flip_horizontal": True,
        "flip_vertical": True,
    }
    return cfg


def _deform_deltas(cfg):
    cfg["model"] = dataclasses.replace(
        cfg["model"],
        extra_feat=False,
        decoder=dataclasses.replace(
            cfg["model"].decoder,
            num_proposals=200, num_decoder_layers=1,
            multistage_heatmap=1, reuse_first_heatmap=False,
            extra_feat=False, roi_feats=0, roi_based_reg=False,
        ),
    )
    return cfg


def deformformer3d_waymo_l():
    """DeformFormer3D_Waymo_L.py: single-stage head on the Waymo base."""
    return _deform_deltas(focalformer3d_waymo_l.get_config())


def deformformer3d_waymo15_l():
    """DeformFormer3D_Waymo15_L.py: 1/5 split single-stage Waymo."""
    cfg = _deform_deltas(focalformer3d_waymo_l.get_config())
    cfg["load_interval"] = 5
    return cfg
