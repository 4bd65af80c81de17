"""FocalFormer3D-LC (nuScenes, LiDAR + camera fusion).

Hyperparameters match the reference
/root/reference/projects/configs/focalformer3d/FocalFormer3D_LC.py:
ResNet-50 + FPN image branch at 448x800, LSS camera BEV (grid 0.6, camC 64,
depth 4..45), 'bevfusion' local-attention fusion layers with iter_bev_cam,
multistage heatmap 2 (no reuse), frozen img/camlss/pts branches (staged
finetune from DeformFormer3D_C_R50 + FocalFormer3D_L).
"""
from __future__ import annotations

from ..models.detector import DetectorConfig
from ..models.focal_decoder import FocalDecoderConfig
from ..models.lss import LSSConfig
from ..ops.voxelize import VoxelConfig
from ..training.losses import LossConfig
from .focalformer3d_l import CLASS_NAMES, PC_RANGE, VOXEL_SIZE, TrainRecipe

IMG_SCALE = (448, 800)  # (H, W) network input


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
        neck_layers=2,  # = multistage_heatmap
        hidden=128,
        iterbev="bevfusion",
        extra_feat=True,
        input_img=True,
        input_pts=True,
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
        freeze_img=True,
        freeze_camlss=True,
        freeze_pts=True,
        decoder=FocalDecoderConfig(
            num_classes=len(CLASS_NAMES),
            hidden=128,
            hidden_roi=512,
            num_proposals=300,
            num_decoder_layers=2,
            inner_layers=3,
            num_heads=8,
            nms_kernel_size=3,
            multistage_heatmap=2,
            reuse_first_heatmap=False,
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
            "class_names": CLASS_NAMES, "img_scale": IMG_SCALE}
