"""DeformFormer3D-L (nuScenes, LiDAR-only): single-stage variant.

Matches /root/reference/projects/configs/focalformer3d/DeformFormer3D_L.py:
single heatmap stage (multistage=1, no reuse, no extra feat), 200 proposals,
1 decoder round, no RoI pooling; trained 20 epochs with fade at 15.
"""
from __future__ import annotations

import dataclasses

from .focalformer3d_l import (
    CLASS_NAMES, PC_RANGE, VOXEL_SIZE, TrainRecipe, get_config as _base,
)


def get_config():
    cfg = _base()
    model = dataclasses.replace(
        cfg["model"],
        extra_feat=False,
        decoder=dataclasses.replace(
            cfg["model"].decoder,
            num_proposals=200,
            num_decoder_layers=1,
            multistage_heatmap=1,
            reuse_first_heatmap=False,
            extra_feat=False,
            roi_feats=0,
            roi_based_reg=False,
        ),
    )
    train = dataclasses.replace(
        cfg["train"], total_epochs=20, fade_epoch=15
    )
    return {"model": model, "loss": cfg["loss"], "train": train,
            "class_names": CLASS_NAMES}
