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
    """PointNet-style VFE: augment with cluster & center offsets, MLP, max.

    Matches mmdet3d HardVFE(with_cluster_center=True, with_voxel_center=True,
    feat_channels=[64]) semantics.
    """

    feat_channels: Sequence[int] = (64,)
    voxel_size: Sequence[float] = (0.1, 0.1, 0.15)
    point_cloud_range: Sequence[float] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)

    @nn.compact
    def __call__(self, voxels, num_points, coords, train: bool = False):
        # voxels (B, V, P, D); coords (B, V, 3)=(z,y,x); num_points (B, V)
        B, V, P, D = voxels.shape
        slot_mask = (
            jnp.arange(P)[None, None, :] < num_points[..., None]
        )  # (B,V,P)
        fmask = slot_mask[..., None].astype(voxels.dtype)

        mean = jnp.sum(voxels[..., :3] * fmask, axis=-2) / jnp.maximum(
            num_points[..., None].astype(voxels.dtype), 1.0
        )
        f_cluster = voxels[..., :3] - mean[..., None, :3]

        vs = jnp.asarray(self.voxel_size, voxels.dtype)
        pcr = jnp.asarray(self.point_cloud_range[:3], voxels.dtype)
        centers = (
            coords[..., ::-1].astype(voxels.dtype) + 0.5
        ) * vs + pcr  # (B,V,3) xyz
        f_center = voxels[..., :3] - centers[..., None, :]

        feats = jnp.concatenate([voxels, f_cluster, f_center], axis=-1)
        feats = feats * fmask
        x = feats
        for i, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False, name=f"vfe_fc{i}")(x)
            x = MaskedBatchNorm(name=f"vfe_bn{i}")(x, slot_mask, train)
            x = nn.relu(x)
            x = jnp.where(slot_mask[..., None], x, -1e9)
        out = jnp.max(x, axis=-2)
        has_pts = num_points > 0
        return jnp.where(has_pts[..., None], out, 0.0)
