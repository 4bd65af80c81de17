"""FocalFormer3D-L (nuScenes, LiDAR-only) — flagship config.

Hyperparameters match the reference
/root/reference/projects/configs/focalformer3d/FocalFormer3D_L.py:
0.075m voxels, 1440^2 x 41 sparse grid, 8x out_size_factor (180^2 BEV),
multistage heatmap 1 + reuse_first, 300 proposals/stage, 2 decoder rounds,
3 denoising GT groups, AdamW 1e-4 cyclic.
"""
from __future__ import annotations

import dataclasses

from ..models.detector import DetectorConfig
from ..models.focal_decoder import FocalDecoderConfig
from ..ops.voxelize import VoxelConfig
from ..training.losses import LossConfig

CLASS_NAMES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)

PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
VOXEL_SIZE = (0.075, 0.075, 0.2)


@dataclasses.dataclass(frozen=True)
class TrainRecipe:
    base_lr: float = 1e-4
    weight_decay: float = 0.01
    grad_clip: float = 0.1
    total_epochs: int = 6
    fade_epoch: int = 1
    samples_per_device: int = 2
    lr_target_ratio: tuple = (10.0, 1e-4)
    momentum_target_ratio: tuple = (0.8947368421052632, 1.0)
    step_ratio_up: float = 0.4


def get_config():
    model = DetectorConfig(
        voxel=VoxelConfig(
            point_cloud_range=PC_RANGE,
            voxel_size=VOXEL_SIZE,
            max_num_points=10,
            max_voxels=120000,
            max_voxels_test=160000,
        ),
        vfe_type="HardSimpleVFE",
        sparse_shape=(41, 1440, 1440),
        sparse_out_channels=128,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        down_paddings=((1, 1, 1), (1, 1, 1), (0, 1, 1)),
        capacities=(160000, 245760, 188416, 77824),
        out_capacity=53248,
        second_channels=(128, 256),
        second_layers=(5, 5),
        fpn_channels=(256, 256),
        neck_layers=1,
        hidden=128,
        iterbev="bevfusionmb2",
        extra_feat=True,
        input_img=False,
        decoder=FocalDecoderConfig(
            num_classes=len(CLASS_NAMES),
            hidden=128,
            hidden_roi=512,
            num_proposals=300,
            num_decoder_layers=2,
            inner_layers=3,
            num_heads=8,
            nms_kernel_size=3,
            multistage_heatmap=1,
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
            max_gts=200,
            kernel1_classes=(8, 9),
            code_size=10,
            pc_range=PC_RANGE,
            voxel_size=VOXEL_SIZE,
            out_size_factor=8,
            post_center_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
            score_threshold=0.0,
        ),
    )
    loss = LossConfig(
        code_weights=(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2),
        loss_cls_weight=1.0,
        loss_bbox_weight=0.25,
        loss_heatmap_weight=1.0,
        gaussian_overlap=0.1,
        min_radius=2,
    )
    return {"model": model, "loss": loss, "train": TrainRecipe(),
            "class_names": CLASS_NAMES}
