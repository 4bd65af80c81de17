"""FocalEncoder fusion neck: per-HIP-stage BEV feature generation.

Mirrors the reference neck (focal_encoder.py:89-222): a shared 3x3 conv
projects the SECOND-FPN BEV (512ch) to the hidden width; N FocalEncoderLayers
then iteratively mix the BEV map (and, in fusion mode, inject camera BEV
features), collecting one BEV map per Hard-Instance-Probing stage; an
optional extra conv provides the decoder's value feature.

Layer variants:
  'bevfusionmb2' — MobileNetV2 inverted-residual self-mixing (LiDAR-only cfgs)
  'bevfusion'    — local-window cross-attention (k=9) self-mixing (LC fusion)
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.local_attn import local_attention
from .layers import BasicBlock2d, ConvBN, InvertedResidual


class LocalContextBlock(nn.Module):
    """LocalContextAttentionBlock (encoder_utils.py:109-163): 1x1 q/k/v
    projections + k x k window attention."""

    features: int
    kernel_size: int = 9

    @nn.compact
    def __call__(self, query_map, key_map, train: bool = False):
        q = nn.Conv(self.features, (1, 1), name="q_proj")(query_map)
        k = nn.Conv(self.features, (1, 1), name="k_proj")(key_map)
        v = nn.Conv(self.features, (1, 1), name="v_proj")(key_map)
        out = jax.vmap(
            lambda qq, kk, vv: local_attention(qq, kk, vv, self.kernel_size)
        )(q, k, v)
        return out


class FocalEncoderLayer(nn.Module):
    hidden: int = 128
    iterbev: str = "bevfusionmb2"
    iterbev_wo_img: bool = True

    @nn.compact
    def __call__(self, img_bev, lidar_feat, train: bool = False):
        # I2P feature: camera BEV in fusion mode, else the lidar map itself.
        i2p = lidar_feat if (self.iterbev_wo_img or img_bev is None) else img_bev
        if self.iterbev == "bevfusionmb2":
            p2p = InvertedResidual(self.hidden, 2, name="P_IML")(lidar_feat, train)
        elif self.iterbev == "bevfusion":
            p2p = LocalContextBlock(self.hidden, 9, name="P_IML")(
                lidar_feat, lidar_feat, train
            )
        else:  # pragma: no cover - config error
            raise ValueError(self.iterbev)
        aug = InvertedResidual(self.hidden, 1, name="P_out_proj")(
            jnp.concatenate([i2p, p2p], axis=-1), train
        ) if self.iterbev == "bevfusionmb2" else ConvBN(
            self.hidden, 1, activation=None, name="P_out_proj"
        )(jnp.concatenate([i2p, p2p], axis=-1), train)
        new_lidar = InvertedResidual(self.hidden, 1, name="P_integration")(
            jnp.concatenate([aug, lidar_feat], axis=-1), train
        ) if self.iterbev == "bevfusionmb2" else ConvBN(
            self.hidden, 1, activation=None, name="P_integration"
        )(jnp.concatenate([aug, lidar_feat], axis=-1), train)

        if self.iterbev_wo_img or img_bev is None:
            new_img = None
        else:
            new_img = BasicBlock2d(img_bev.shape[-1], name="iterimg")(
                img_bev, train
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

    @nn.compact
    def __call__(
        self,
        img_bev: Optional[jax.Array],  # camera BEV (B, H, W, C) or None
        pts_feats: jax.Array,  # (B, H, W, 512) from SECOND-FPN
        train: bool = False,
    ) -> Tuple[jax.Array, List[jax.Array]]:
        """Returns (pts_feat_conv, multistage_feats [+extra])."""
        x = nn.Conv(self.hidden, (3, 3), name="shared_conv_pts")(pts_feats)
        pts_feat_conv = x
        stage_feats = []
        img = img_bev
        for i in range(self.num_layers):
            img, x = FocalEncoderLayer(
                self.hidden, self.iterbev, self.iterbev_wo_img,
                name=f"fusion{i}",
            )(img, x, train)
            stage_feats.append(x)
        if self.extra_feat:
            stage_feats.append(
                ConvBN(self.hidden, 3, activation=None, name="extra_output")(
                    stage_feats[-1], train
                )
            )
        return pts_feat_conv, stage_feats
