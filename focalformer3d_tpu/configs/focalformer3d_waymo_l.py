"""FocalFormer3D Waymo-L (LiDAR-only, 3 classes).

Matches /root/reference/projects/configs/focalformer3d/FocalFormer3D_Waymo_L.py:
0.1m voxels over +-76.8m, 1536^2 x 41 grid (192^2 BEV), HardVFE [64],
multistage heatmap 2 + reuse_first (3 stages), 200 proposals/stage,
2 decoder rounds, code_size 8 (no velocity), bbox loss weight 2.0,
Ped/Cyc (classes 1,2) keep kernel-1 peak NMS.
"""
from __future__ import annotations

import dataclasses

from ..models.detector import DetectorConfig
from ..models.focal_decoder import FocalDecoderConfig
from ..ops.voxelize import VoxelConfig
from ..training.losses import LossConfig
from .focalformer3d_l import TrainRecipe

CLASS_NAMES = ("Car", "Pedestrian", "Cyclist")
PC_RANGE = (-76.8, -76.8, -2.0, 76.8, 76.8, 4.0)
VOXEL_SIZE = (0.1, 0.1, 0.15)


def get_config():
    model = DetectorConfig(
        voxel=VoxelConfig(
            point_cloud_range=PC_RANGE,
            voxel_size=VOXEL_SIZE,
            max_num_points=5,
            max_voxels=150000,
        ),
        vfe_type="HardVFE",
        vfe_channels=(64,),
        sparse_shape=(41, 1536, 1536),
        sparse_out_channels=128,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        down_paddings=((1, 1, 1), (1, 1, 1), (0, 1, 1)),
        capacities=(150000, 245760, 188416, 77824),
        out_capacity=57344,
        second_channels=(128, 256),
        second_layers=(5, 5),
        fpn_channels=(256, 256),
        neck_layers=2,
        hidden=128,
        iterbev="bevfusionmb2",
        extra_feat=True,
        input_img=False,
        decoder=FocalDecoderConfig(
            num_classes=len(CLASS_NAMES),
            hidden=128,
            hidden_roi=512,
            num_proposals=200,
            num_decoder_layers=2,
            inner_layers=3,
            num_heads=8,
            nms_kernel_size=3,
            multistage_heatmap=2,
            reuse_first_heatmap=True,
            extra_feat=True,
            multiscale=True,
            bevpos=True,
            roi_feats=7,
            roi_dropout=0.1,
            roi_based_reg=True,
            roi_expand_ratio=1.2,
            add_gt_groups=3,
            add_gt_pos_thresh=5.0,
            add_gt_pos_boxnoise_thresh=0.75,
            gt_center_limit=5.0,
            max_gts=220,
            kernel1_classes=(1, 2),
            code_size=8,
            pc_range=PC_RANGE,
            voxel_size=VOXEL_SIZE,
            out_size_factor=8,
            post_center_range=(-80.0, -80.0, -10.0, 80.0, 80.0, 10.0),
            score_threshold=0.0,
        ),
    )
    loss = LossConfig(
        code_weights=(1.0,) * 8,
        loss_cls_weight=1.0,
        loss_bbox_weight=2.0,
        loss_heatmap_weight=1.0,
        gaussian_overlap=0.1,
        min_radius=2,
    )
    train = TrainRecipe(total_epochs=12, fade_epoch=11)
    return {"model": model, "loss": loss, "train": train,
            "class_names": CLASS_NAMES}
