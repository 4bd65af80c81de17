"""DeformFormer3D-C-R50 (nuScenes, camera-only).

Hyperparameters match the reference
/root/reference/projects/configs/focalformer3d/DeformFormer3D_C_R50.py:
just_image=True (no point branch), ResNet-50 + FPN at 448x800, LSS camera
BEV feeding the head directly (no fusion layers), single heatmap stage,
200 proposals, 1 decoder round, no denoising groups, roi_feats=0.
"""
from __future__ import annotations

from ..models.detector import DetectorConfig
from ..models.focal_decoder import FocalDecoderConfig
from ..models.lss import LSSConfig
from ..ops.voxelize import VoxelConfig
from ..training.losses import LossConfig
from .focalformer3d_l import CLASS_NAMES, PC_RANGE, VOXEL_SIZE, TrainRecipe

IMG_SCALE = (448, 800)


def get_config():
    model = DetectorConfig(
        voxel=VoxelConfig(
            point_cloud_range=PC_RANGE,
            voxel_size=VOXEL_SIZE,
            max_num_points=10,
            max_voxels=120000,
        ),
        neck_layers=0,
        hidden=128,
        iterbev="bevfusion",
        extra_feat=False,
        input_img=True,
        input_pts=False,
        img_backbone_depth=50,
        use_grid_mask=True,
        cam_proj="lss",
        iter_bev_cam=True,
        max_points_height=10,
        lss=LSSConfig(
            img_scale=IMG_SCALE,
            camera_depth_range=(4.0, 45.0, 1.0),
            pc_range=PC_RANGE,
            downsample=4,
            grid=0.6,
            input_channels=256,
            cam_channels=64,
            out_channels=128,
        ),
        decoder=FocalDecoderConfig(
            num_classes=len(CLASS_NAMES),
            hidden=128,
            num_proposals=200,
            num_decoder_layers=1,
            inner_layers=3,
            num_heads=8,
            nms_kernel_size=3,
            multistage_heatmap=1,
            reuse_first_heatmap=False,
            extra_feat=False,
            multiscale=True,
            bevpos=True,
            roi_feats=0,
            roi_based_reg=False,
            add_gt_groups=0,
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
    return {"model": model, "loss": loss,
            "train": TrainRecipe(total_epochs=20, fade_epoch=15),
            "class_names": CLASS_NAMES, "img_scale": IMG_SCALE}
