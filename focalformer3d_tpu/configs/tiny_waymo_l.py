"""Tiny_Waymo_L: miniature Waymo-flavoured config for CLI smokes / CI.

Exercises the Waymo end-to-end path (HardVFE, 3 classes, code_size 8,
KITTI-style infos, L1/L2 mAP/mAPH evaluator) at toy scale so
tools/train.py / tools/test.py compile in seconds on CPU.
"""
from __future__ import annotations

from ..models.detector import DetectorConfig
from ..models.focal_decoder import FocalDecoderConfig
from ..ops.voxelize import VoxelConfig
from ..training.losses import LossConfig
from .focalformer3d_l import TrainRecipe

CLASS_NAMES = ("Car", "Pedestrian", "Cyclist")
PC_RANGE = (-8.0, -8.0, -3.0, 8.0, 8.0, 3.0)


def get_config():
    model = DetectorConfig(
        voxel=VoxelConfig(
            point_cloud_range=PC_RANGE,
            voxel_size=(0.25, 0.25, 0.24),
            max_num_points=5,
            max_voxels=512,
        ),
        vfe_type="HardVFE",
        vfe_channels=(16,),
        sparse_shape=(25, 64, 64),
        sparse_out_channels=32,
        encoder_channels=((8, 8, 16), (16, 16, 24), (24, 24, 32), (32, 32)),
        down_paddings=((1, 1, 1), (1, 1, 1), (0, 1, 1)),
        capacities=(512, 384, 256, 192),
        out_capacity=192,
        second_channels=(32, 48),
        second_layers=(2, 2),
        fpn_channels=(48, 48),
        hidden=32,
        decoder=FocalDecoderConfig(
            num_classes=len(CLASS_NAMES),
            hidden=32,
            hidden_roi=64,
            num_proposals=16,
            num_decoder_layers=2,
            inner_layers=1,
            num_heads=4,
            multistage_heatmap=1,
            reuse_first_heatmap=True,
            multiscale=True,
            roi_feats=3,
            add_gt_groups=2,
            max_gts=24,
            kernel1_classes=(1, 2),
            code_size=8,
            pc_range=PC_RANGE,
            voxel_size=(0.25, 0.25, 0.75),
            out_size_factor=8,
            post_center_range=(-10, -10, -5, 10, 10, 5),
        ),
    )
    loss = LossConfig(code_weights=(1.0,) * 8)
    return {
        "model": model, "loss": loss,
        "train": TrainRecipe(total_epochs=2, fade_epoch=1,
                             samples_per_device=2),
        "class_names": CLASS_NAMES,
        "dataset": "waymo",
    }
