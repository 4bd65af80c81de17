"""Lift-Splat-Shoot camera -> BEV lifting (TPU-native).

Counterpart of the reference LSS neck
(/root/reference/projects/mmdet3d_plugin/models/necks/lss.py:76-384):
a 1x1 conv predicts a per-pixel depth distribution (D bins) and a feature
vector; their outer product lifts each pixel to D frustum points; points are
transformed image->camera->lidar (replaying image and point-cloud
augmentations from recorded matrices) and sum-pooled into a (Z, X, Y) voxel
grid; Z is stacked into channels and a conv stack encodes the BEV map.

TPU-first formulation: the reference's sort + QuickCumsum / CUDA ``bev_pool``
interval-sum (lss.py:97-123,285-322) collapses to a single XLA
``segment_sum`` scatter-add over flattened voxel ranks — out-of-range points
are routed to an overflow segment instead of boolean filtering, keeping all
shapes static. Augmentation replay (`img_aug_matrix` undo at lss.py:240-250,
`apply_3d_transformation` at lss.py:264) becomes two recorded affine
matrices: ``img_aug`` (Ncam,4,4) and ``bev_aug`` (4,4) per sample.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.scatter import segment_sum


@dataclasses.dataclass(frozen=True)
class LSSConfig:
    img_scale: Tuple[int, int] = (448, 800)  # (H, W) network input size
    camera_depth_range: Tuple[float, float, float] = (4.0, 45.0, 1.0)
    pc_range: Tuple[float, ...] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    downsample: int = 4
    grid: float = 0.6
    input_channels: int = 256  # FPN level-0 feature channels
    cam_channels: int = 64  # lifted per-point channels (camC)
    out_channels: int = 128

    @property
    def feat_hw(self) -> Tuple[int, int]:
        return (self.img_scale[0] // self.downsample,
                self.img_scale[1] // self.downsample)

    @property
    def depth_bins(self) -> int:
        lo, hi, step = self.camera_depth_range
        return int(np.ceil((hi - lo) / step))

    @property
    def nx(self) -> Tuple[int, int, int]:
        """Voxel counts (X, Y, Z) — torch long() truncation semantics."""
        return (
            int((self.pc_range[3] - self.pc_range[0]) / self.grid),
            int((self.pc_range[4] - self.pc_range[1]) / self.grid),
            int((self.pc_range[5] - self.pc_range[2]) / self.grid),
        )


def create_frustum(cfg: LSSConfig) -> np.ndarray:
    """(D, fH, fW, 3) of (x_px, y_px, depth) in network-input pixel coords."""
    ogH, ogW = cfg.img_scale
    fH, fW = cfg.feat_hw
    lo, hi, step = cfg.camera_depth_range
    ds = np.arange(lo, hi, step, dtype=np.float32)
    xs = np.linspace(0, ogW - 1, fW, dtype=np.float32)
    ys = np.linspace(0, ogH - 1, fH, dtype=np.float32)
    d, y, x = np.meshgrid(ds, ys, xs, indexing="ij")
    return np.stack([x, y, d], axis=-1)


def frustum_geometry(
    cfg: LSSConfig,
    cam2lidar_rot: jax.Array,  # (N, 3, 3) = inverse(lidar2img)[:3,:3]
    cam2lidar_trans: jax.Array,  # (N, 3)
    img_aug: Optional[jax.Array] = None,  # (N, 4, 4) pixel-space aug matrix
    bev_aug: Optional[jax.Array] = None,  # (4, 4) point-cloud aug matrix
) -> jax.Array:
    """Frustum points in (augmented) lidar coords: (N, D, fH, fW, 3).

    Mirrors LiftSplatShoot.get_geometry (lss.py:228-271): undo image aug on
    pixel coords, un-project to camera rays, map to lidar frame, then replay
    the point-cloud augmentation forward.
    """
    frustum = jnp.asarray(create_frustum(cfg))  # (D, fH, fW, 3)
    N = cam2lidar_rot.shape[0]
    pts = jnp.broadcast_to(frustum, (N,) + frustum.shape)
    if img_aug is not None:
        post_rot = img_aug[:, :3, :3]  # acts on (x_px, y_px, ~) plane
        post_tran = img_aug[:, :3, 3]
        pts = pts - post_tran[:, None, None, None, :]
        inv = jnp.linalg.inv(post_rot)
        pts = jnp.einsum("nij,ndhwj->ndhwi", inv, pts)
    # pixel*depth un-projection: (x*d, y*d, d)
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], -1)
    pts = jnp.einsum("nij,ndhwj->ndhwi", cam2lidar_rot, pts)
    pts = pts + cam2lidar_trans[:, None, None, None, :]
    if bev_aug is not None:
        pts = jnp.einsum("ij,ndhwj->ndhwi", bev_aug[:3, :3], pts)
        pts = pts + bev_aug[:3, 3]
    return pts


class CamEncode(nn.Module):
    """1x1 conv -> (depth softmax) x (features) outer product
    (lss.py:126-147)."""

    depth_bins: int
    cam_channels: int

    @nn.compact
    def __call__(self, x: jax.Array):
        """x (..., H, W, Cin) -> feats (..., D, H, W, C), depth (..., D, H, W)."""
        y = nn.Conv(self.depth_bins + self.cam_channels, (1, 1),
                    name="depthnet")(x)
        depth = jax.nn.softmax(y[..., : self.depth_bins], axis=-1)
        feat = y[..., self.depth_bins:]
        # (..., H, W, D, C) -> move D before H
        lifted = depth[..., None] * feat[..., None, :]
        lifted = jnp.moveaxis(lifted, -2, -4)  # (..., D, H, W, C)
        depth = jnp.moveaxis(depth, -1, -3)  # (..., D, H, W)
        return lifted, depth


def splat_to_bev(cfg: LSSConfig, geom: jax.Array, feats: jax.Array):
    """Sum-pool frustum features into the voxel grid (one sample).

    geom (N, D, fH, fW, 3) lidar-frame xyz; feats (N, D, fH, fW, C).
    Returns (Y, X, C*Z) — Z stacked channel-major (c*Z + z), matching the
    reference s2c layout (lss.py:373-377) for checkpoint parity.
    """
    nx, ny, nz = cfg.nx
    pc_min = jnp.asarray(cfg.pc_range[:3])
    idx = jnp.floor((geom - pc_min) / cfg.grid).astype(jnp.int32)
    ix, iy, iz = idx[..., 0], idx[..., 1], idx[..., 2]
    valid = (
        (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) & (iz >= 0) & (iz < nz)
    )
    num_cells = nz * nx * ny
    rank = (iz * nx + ix) * ny + iy
    rank = jnp.where(valid, rank, num_cells)  # overflow bucket is dropped
    C = feats.shape[-1]
    pooled = segment_sum(
        feats.reshape(-1, C), rank.reshape(-1), num_cells + 1
    )[:num_cells]
    pooled = pooled.reshape(nz, nx, ny, C)  # (Z, X, Y, C)
    pooled = jnp.transpose(pooled, (2, 1, 3, 0))  # (Y, X, C, Z)
    return pooled.reshape(ny, nx, C * nz)


class BevEncode(nn.Module):
    """conv3x3(BN,ReLU) x4: C*Z -> C*Z -> 512 -> 512 -> out (lss.py:196-210)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = (x.shape[-1], 512, 512, self.out_channels)
        for i, w in enumerate(widths):
            x = nn.Conv(w, (3, 3), padding="SAME", use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class LiftSplatShoot(nn.Module):
    cfg: LSSConfig = LSSConfig()

    @nn.compact
    def __call__(
        self,
        img_feats: jax.Array,  # (B, Ncam, fH, fW, Cin) FPN level-0
        cam2lidar_rot: jax.Array,  # (B, Ncam, 3, 3)
        cam2lidar_trans: jax.Array,  # (B, Ncam, 3)
        img_aug: Optional[jax.Array] = None,  # (B, Ncam, 4, 4)
        bev_aug: Optional[jax.Array] = None,  # (B, 4, 4)
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (bev (B, Y, X, out_channels), depth (B, Ncam, D, fH, fW))."""
        cfg = self.cfg
        lifted, depth = CamEncode(
            cfg.depth_bins, cfg.cam_channels, name="camencode"
        )(img_feats)

        def one(geom_args, feats):
            rot, tran, ia, ba = geom_args
            geom = frustum_geometry(cfg, rot, tran, ia, ba)
            return splat_to_bev(cfg, geom, feats)

        B = img_feats.shape[0]
        ia = img_aug if img_aug is not None else jnp.broadcast_to(
            jnp.eye(4), (B, img_feats.shape[1], 4, 4)
        )
        ba = bev_aug if bev_aug is not None else jnp.broadcast_to(
            jnp.eye(4), (B, 4, 4)
        )
        bev = jax.vmap(one)((cam2lidar_rot, cam2lidar_trans, ia, ba), lifted)
        bev = BevEncode(cfg.out_channels, name="bevencode")(bev, train)
        return bev, depth
