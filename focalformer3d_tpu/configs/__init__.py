"""Config registry: named model/loss/train configurations.

Mirrors the reference's 13 shipped configs
(/root/reference/projects/configs/focalformer3d/) as structured dataclasses.
Use ``get_config(name)``; names match the reference file stems.
"""
from __future__ import annotations

import importlib
from typing import Any, Dict

_REGISTRY = {
    "FocalFormer3D_L": "focalformer3d_l",
    "DeformFormer3D_L": "deformformer3d_l",
    "FocalFormer3D_Waymo_L": "focalformer3d_waymo_l",
    "FocalFormer3D_LC": "focalformer3d_lc",
    "DeformFormer3D_C_R50": "deformformer3d_c_r50",
    "Tiny_L": "tiny_l",
    "Tiny_Waymo_L": "tiny_waymo_l",
}

# derived variants (variants.py)
_VARIANTS = {
    "DeformFormer3D_L_dynamic": "deformformer3d_l_dynamic",
    "FocalFormer3D_LC_Proj": "focalformer3d_lc_proj",
    "FocalFormer3D_Waymo15_L": "focalformer3d_waymo15_l",
    "FocalFormer3D_LC_TTA": "focalformer3d_lc_tta",
    "DeformFormer3D_Waymo_L": "deformformer3d_waymo_l",
    "DeformFormer3D_Waymo15_L": "deformformer3d_waymo15_l",
}


def get_config(name: str):
    """Resolve a named config. Ensures a 'dataset' key ('nuscenes' by
    default, 'waymo' for Waymo configs) — drives dataset and metric
    selection in tools/train.py and tools/test.py."""
    if name in _VARIANTS:
        mod = importlib.import_module("focalformer3d_tpu.configs.variants")
        cfg = getattr(mod, _VARIANTS[name])()
    else:
        mod = importlib.import_module(
            f"focalformer3d_tpu.configs.{_REGISTRY[name]}"
        )
        cfg = mod.get_config()
    cfg.setdefault(
        "dataset", "waymo" if "Waymo" in name else "nuscenes"
    )
    return cfg


def available() -> list:
    return sorted(list(_REGISTRY) + list(_VARIANTS))
