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
    if name in _VARIANTS:
        mod = importlib.import_module("focalformer3d_tpu.configs.variants")
        return getattr(mod, _VARIANTS[name])()
    mod = importlib.import_module(
        f"focalformer3d_tpu.configs.{_REGISTRY[name]}"
    )
    return mod.get_config()


def available() -> list:
    return sorted(list(_REGISTRY) + list(_VARIANTS))
