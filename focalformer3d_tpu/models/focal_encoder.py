"""FocalEncoder fusion neck: per-HIP-stage BEV feature generation.

Mirrors the reference neck (focal_encoder.py:89-222): a shared 3x3 conv
projects the SECOND-FPN BEV (512ch) to the hidden width; N FocalEncoderLayers
then iteratively mix the BEV map (and, in fusion mode, inject camera BEV
features), collecting one BEV map per Hard-Instance-Probing stage; an
optional extra conv provides the decoder's value feature.

Layer variants (reference focal_encoder.py:15-87):
  'bevfusionmb2' — MobileNetV2 inverted-residual self-mixing (LiDAR-only cfgs)
  'bevfusion'    — local-window cross-attention (k=9) self-mixing (LC fusion)

Camera projection variants:
  cam_proj='lss' — LiftSplatShoot camera BEV consumed by every layer
                   (FocalFormer3D_LC.py:194-209, iter_bev_cam=True)
  cam_proj='i2p' — per-layer (or layer-0-only if iter_bev_cam) I2P projection
                   fusion (FocalFormer3D_LC_Proj variant)
  camera-only    — input_pts=False, num_layers=0: the cam BEV feeds the head
                   directly (DeformFormer3D_C_R50.py, focal_encoder.py:196-209)
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.local_attn import local_attention
from .i2p import I2P
from .layers import BasicBlock2d, ConvBN, InvertedResidual
from .lss import LiftSplatShoot, LSSConfig


class LocalContextBlock(nn.Module):
    """LocalContextAttentionBlock (encoder_utils.py:109-163): two-layer
    1x1 ConvBNReLU query/key projections, one-layer value projection, then
    k x k window attention."""

    features: int
    kernel_size: int = 9
    dtype: Any = None

    @nn.compact
    def __call__(self, query_map, key_map, train: bool = False):
        dt = self.dtype
        q = ConvBN(self.features, 1, dtype=dt, name="q_proj0")(query_map, train)
        q = ConvBN(self.features, 1, dtype=dt, name="q_proj1")(q, train)
        k = ConvBN(self.features, 1, dtype=dt, name="k_proj0")(key_map, train)
        k = ConvBN(self.features, 1, dtype=dt, name="k_proj1")(k, train)
        v = ConvBN(self.features, 1, dtype=dt, name="v_proj")(key_map, train)
        out = jax.vmap(
            lambda qq, kk, vv: local_attention(qq, kk, vv, self.kernel_size)
        )(q, k, v)
        return out


class FocalEncoderLayer(nn.Module):
    hidden: int = 128
    iterbev: str = "bevfusionmb2"
    iterbev_wo_img: bool = True
    layer_id: int = 0
    iter_bev_cam: bool = False
    cam_proj: str = ""  # '' | 'lss' | 'i2p'
    max_points_height: int = 10
    pc_range: Tuple[float, ...] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    img_input_shape: Tuple[int, int] = (448, 800)
    dtype: Any = None

    @nn.compact
    def __call__(self, img_feat, lidar_feat,
                 img_data: Optional[Dict[str, Any]] = None,
                 train: bool = False):
        # ---- image-to-BEV feature ----
        if self.iterbev_wo_img or img_feat is None:
            i2p_feat = lidar_feat
        elif self.cam_proj == "i2p" and (
            not self.iter_bev_cam or self.layer_id == 0
        ):
            i2p_feat = I2P(
                pts_channels=self.hidden,
                max_points_height=self.max_points_height,
                pc_range=self.pc_range,
                input_shape=self.img_input_shape,
                name="I2P_block",
            )(
                lidar_feat, img_feat, img_data["lidar2img"],
                img_data.get("img_aug"), img_data.get("bev_aug"), train,
            )
            img_feat = i2p_feat  # iter_bev_cam: later layers reuse it
        else:
            i2p_feat = img_feat  # cam BEV (lss) or previous I2P output

        # ---- BEV self-mixing + integration ----
        dt = self.dtype
        if self.iterbev == "bevfusionmb2":
            p2p = InvertedResidual(self.hidden, 2, dtype=dt, name="P_IML")(
                lidar_feat, train
            )
            aug = InvertedResidual(self.hidden, 1, dtype=dt,
                                   name="P_out_proj")(
                jnp.concatenate([i2p_feat, p2p], axis=-1), train
            )
            new_lidar = InvertedResidual(self.hidden, 1, dtype=dt,
                                         name="P_integration")(
                jnp.concatenate([aug, lidar_feat], axis=-1), train
            )
        elif self.iterbev == "bevfusion":
            p2p = LocalContextBlock(self.hidden, 9, dtype=dt, name="P_IML")(
                lidar_feat, lidar_feat, train
            )
            aug = ConvBN(self.hidden, 1, activation=None, dtype=dt,
                         name="P_out_proj")(
                jnp.concatenate([i2p_feat, p2p], axis=-1), train
            )
            new_lidar = ConvBN(
                self.hidden, 1, activation=None, dtype=dt,
                name="P_integration"
            )(jnp.concatenate([aug, lidar_feat], axis=-1), train)
        else:  # pragma: no cover - config error
            raise ValueError(self.iterbev)

        if self.iterbev_wo_img or img_feat is None:
            new_img = None
        else:
            new_img = BasicBlock2d(img_feat.shape[-1], dtype=self.dtype,
                                   name="iterimg")(
                img_feat, train
            )
        return new_img, new_lidar


class FocalEncoder(nn.Module):
    num_layers: int = 1
    hidden: int = 128
    iterbev: str = "bevfusionmb2"
    iterbev_wo_img: bool = True
    multistage_heatmap: int = 1
    extra_feat: bool = True
    input_img: bool = False
    input_pts: bool = True
    cam_proj: str = ""  # '' | 'lss' | 'i2p'
    iter_bev_cam: bool = False
    max_points_height: int = 10
    lss: LSSConfig = LSSConfig()
    bev_shape: Tuple[int, int] = (180, 180)
    freeze_camlss: bool = False  # stop_gradient after LSS (staged finetune)
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        img_data: Optional[Dict[str, Any]],  # camera arrays, or None
        pts_feats: Optional[jax.Array],  # (B, H, W, 512) from SECOND-FPN
        train: bool = False,
    ) -> Tuple[jax.Array, List[jax.Array]]:
        """Returns (pts_feat_conv, multistage_feats [+extra])."""
        img_feat = None
        if self.input_img and img_data is not None:
            if self.cam_proj == "lss":
                img_feat, _depth = LiftSplatShoot(self.lss, name="cam_lss")(
                    img_data["img_feats"],
                    img_data["cam2lidar_rot"],
                    img_data["cam2lidar_trans"],
                    img_data.get("img_aug"),
                    img_data.get("bev_aug"),
                    train and not self.freeze_camlss,
                )
                if self.freeze_camlss:
                    # reference freeze_camlss detaches the LSS branch
                    # (focalformer3d.py:107-117)
                    img_feat = jax.lax.stop_gradient(img_feat)
                if not self.input_pts and not self.multistage_heatmap:
                    # camera-only model: cam BEV feeds the head directly
                    # (reference focal_encoder.py:196-198).
                    return img_feat, [img_feat]
            elif self.cam_proj == "i2p":
                img_feat = nn.Conv(
                    self.hidden, (3, 3), name="shared_conv_img"
                )(img_data["img_feats"])
            else:  # pragma: no cover - config error
                raise ValueError(self.cam_proj)

        if self.input_pts:
            x = nn.Conv(self.hidden, (3, 3), dtype=self.dtype,
                        name="shared_conv_pts")(
                pts_feats
            )
        else:
            B = img_feat.shape[0]
            x = jnp.zeros(
                (B,) + self.bev_shape + (self.hidden,), img_feat.dtype
            )
        pts_feat_conv = x

        stage_feats = []
        for i in range(self.num_layers):
            img_feat, x = FocalEncoderLayer(
                self.hidden, self.iterbev, self.iterbev_wo_img, i,
                self.iter_bev_cam, self.cam_proj, self.max_points_height,
                self.lss.pc_range, self.lss.img_scale, self.dtype,
                name=f"fusion{i}",
            )(img_feat, x, img_data, train)
            stage_feats.append(x)
        if not stage_feats:
            stage_feats = [x]
        if self.extra_feat:
            stage_feats.append(
                ConvBN(self.hidden, 3, activation=None, dtype=self.dtype,
                       name="extra_output")(
                    stage_feats[-1], train
                )
            )
        return pts_feat_conv, stage_feats
