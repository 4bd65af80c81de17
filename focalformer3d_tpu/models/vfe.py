"""Voxel feature encoders: HardSimpleVFE, HardVFE (masked mean / PointNet-max).

Replicates mmdet3d's VFEs as configured by the reference
(HardSimpleVFE for nuScenes, FocalFormer3D_L.py:194-197; HardVFE
feat_channels=[64] for Waymo, FocalFormer3D_Waymo_L.py:142-151) over the
fixed-capacity (V, P, D) voxel slots produced by ops.voxelize.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import MaskedBatchNorm


def hard_simple_vfe(voxels: jax.Array, num_points: jax.Array) -> jax.Array:
    """Mean of real points per voxel. voxels (..., V, P, D) -> (..., V, D)."""
    P = voxels.shape[-2]
    slot = jnp.arange(P)
    m = (slot[None, :] < num_points[..., None]).astype(voxels.dtype)
    total = jnp.sum(voxels * m[..., None], axis=-2)
    return total / jnp.maximum(num_points[..., None].astype(voxels.dtype), 1.0)


class HardVFE(nn.Module):
    """PointNet-style VFE: (optional) cluster/center offsets, MLP, max.

    Matches mmdet3d HardVFE as the reference Waymo config instantiates it
    (FocalFormer3D_Waymo_L.py:141-151: in_channels=5, feat_channels=[64],
    with_cluster_center=False, with_voxel_center=False), INCLUDING the
    quirk that padded point slots are zeroed only at the input: after
    Linear(no bias)+BN+ReLU a padded slot carries relu(BN(0)), and those
    values participate in the per-voxel max exactly as mmdet3d's VFELayer
    does (no re-mask before torch.max). BN statistics in training span all
    point slots of valid voxels (padded slots are zeros there too).
    """

    feat_channels: Sequence[int] = (64,)
    voxel_size: Sequence[float] = (0.1, 0.1, 0.15)
    point_cloud_range: Sequence[float] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    with_cluster_center: bool = False
    with_voxel_center: bool = False

    @nn.compact
    def __call__(self, voxels, num_points, coords, train: bool = False):
        # voxels (B, V, P, D); coords (B, V, 3)=(z,y,x); num_points (B, V)
        B, V, P, D = voxels.shape
        slot_mask = (
            jnp.arange(P)[None, None, :] < num_points[..., None]
        )  # (B,V,P)
        fmask = slot_mask[..., None].astype(voxels.dtype)

        feats = [voxels]
        if self.with_cluster_center:
            mean = jnp.sum(voxels[..., :3] * fmask, axis=-2) / jnp.maximum(
                num_points[..., None].astype(voxels.dtype), 1.0
            )
            feats.append(voxels[..., :3] - mean[..., None, :3])
        if self.with_voxel_center:
            vs = jnp.asarray(self.voxel_size, voxels.dtype)
            pcr = jnp.asarray(self.point_cloud_range[:3], voxels.dtype)
            centers = (
                coords[..., ::-1].astype(voxels.dtype) + 0.5
            ) * vs + pcr  # (B,V,3) xyz
            feats.append(voxels[..., :3] - centers[..., None, :])
        x = jnp.concatenate(feats, axis=-1) * fmask
        has_pts = num_points > 0
        # BN stats over every point slot of every non-empty voxel
        # (mmdet3d normalizes the full (V, P) plane; padded slots are
        # zeros there exactly as here)
        bn_mask = jnp.broadcast_to(has_pts[..., None], (B, V, P))
        for i, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False, name=f"vfe_fc{i}")(x)
            x = MaskedBatchNorm(name=f"vfe_bn{i}")(x, bn_mask, train)
            x = nn.relu(x)
        out = jnp.max(x, axis=-2)
        return jnp.where(has_pts[..., None], out, 0.0)
