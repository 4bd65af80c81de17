"""I2P: image-to-point (BEV) projection fusion.

Counterpart of the reference I2P block
(/root/reference/projects/mmdet3d_plugin/models/utils/encoder_utils.py:185-261):
a (Z x H x W) grid of 3D points over the point-cloud range is projected into
every camera (lidar2img), image features are bilinearly sampled, samples are
masked-mean-reduced over cameras, and a per-BEV-cell single-head attention
(lidar feature = query, the Z vertical samples = keys/values) decorates the
lidar BEV map with camera evidence.

TPU-first: the reference's per-batch / per-camera python loops become a
single vmapped einsum program; `apply_3d_transformation` replay becomes the
recorded ``bev_aug`` matrix (inverse applied here, since grid points live in
augmented lidar space and must be brought back to sensor space before
lidar2img).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.bilinear import grid_sample_norm


def project_points_to_cams(
    pts: jax.Array,  # (P, 3) lidar-frame (augmented) xyz
    lidar2img: jax.Array,  # (Ncam, 4, 4)
    img_aug: Optional[jax.Array],  # (Ncam, 4, 4) or None
    bev_aug: Optional[jax.Array],  # (4, 4) or None
    input_shape: Tuple[int, int],  # (H_img, W_img) network input size
    eps: float = 1e-5,
):
    """Returns (xy_norm (Ncam, P, 2) in [-1,1], valid (Ncam, P))."""
    if bev_aug is not None:
        inv = jnp.linalg.inv(bev_aug)
        pts = pts @ inv[:3, :3].T + inv[:3, 3]
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1)  # (P, 4)
    cam = jnp.einsum("nij,pj->npi", lidar2img, ph)  # (N, P, 4)
    z = cam[..., 2]
    in_front = z > eps
    xy = cam[..., :2] / jnp.maximum(z, eps)[..., None]
    if img_aug is not None:
        xy1 = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], -1)
        xy = (
            jnp.einsum("nij,npj->npi", img_aug[:, :3, :3], xy1)
            + img_aug[:, None, :3, 3]
        )[..., :2]
    H, W = input_shape
    xn = xy[..., 0] / W * 2.0 - 1.0
    yn = xy[..., 1] / H * 2.0 - 1.0
    valid = in_front & (xn > -1.0) & (xn < 1.0) & (yn > -1.0) & (yn < 1.0)
    return jnp.stack([xn, yn], -1), valid


class I2P(nn.Module):
    """Decorate a lidar BEV map with projected camera features."""

    pts_channels: int = 128
    max_points_height: int = 10
    pc_range: Tuple[float, ...] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    input_shape: Tuple[int, int] = (448, 800)
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        lidar_feat: jax.Array,  # (B, H, W, C)
        img_feats: jax.Array,  # (B, Ncam, fH, fW, Cimg)
        lidar2img: jax.Array,  # (B, Ncam, 4, 4)
        img_aug: Optional[jax.Array] = None,  # (B, Ncam, 4, 4)
        bev_aug: Optional[jax.Array] = None,  # (B, 4, 4)
        train: bool = False,
    ) -> jax.Array:
        B, H, W, C = lidar_feat.shape
        Z = self.max_points_height
        pcr = jnp.asarray(self.pc_range)

        # (Z, H, W, 3) grid of cell-center world coords; x <-> W, y <-> H
        # (encoder_utils.py:175-182,212-214: (idx + 0.5)/size * range + min).
        zi, yi, xi = jnp.meshgrid(
            jnp.arange(Z, dtype=jnp.float32),
            jnp.arange(H, dtype=jnp.float32),
            jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        )
        grid = jnp.stack(
            [
                (xi + 0.5) / W * (pcr[3] - pcr[0]) + pcr[0],
                (yi + 0.5) / H * (pcr[4] - pcr[1]) + pcr[1],
                (zi + 0.5) / Z * (pcr[5] - pcr[2]) + pcr[2],
            ],
            -1,
        ).reshape(-1, 3)  # (Z*H*W, 3)

        q_proj = nn.Dense(C, name="q_proj")
        k_proj = nn.Dense(C, name="k_proj")
        v_proj = nn.Dense(C, name="v_proj")
        out_proj = nn.Dense(C, name="out_proj")

        def one(lidar, imgs, l2i, ia, ba):
            xy, valid = project_points_to_cams(
                grid, l2i, ia, ba, self.input_shape
            )
            # sample every camera: (Ncam, P, Cimg)
            samp = jax.vmap(grid_sample_norm)(imgs, xy)
            m = valid.astype(samp.dtype)[..., None]
            reduced = jnp.sum(samp * m, 0) / (jnp.sum(m, 0) + 1e-10)
            seen = jnp.sum(valid, 0) > 0  # (P,)
            kv = reduced.reshape(Z, H * W, -1).transpose(1, 0, 2)  # (HW,Z,Ci)
            kv_mask = seen.reshape(Z, H * W).T  # (HW, Z)

            q = q_proj(lidar.reshape(H * W, C))
            k = k_proj(kv)
            v = v_proj(kv)
            logits = jnp.einsum("qc,qzc->qz", q, k) / jnp.sqrt(
                jnp.asarray(C, q.dtype)
            )
            logits = jnp.where(kv_mask, logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1)
            out = out_proj(jnp.einsum("qz,qzc->qc", attn, v))
            any_valid = jnp.any(kv_mask, axis=-1, keepdims=True)
            out = jnp.where(any_valid, out, 0.0)
            return out.reshape(H, W, C)

        ia = img_aug if img_aug is not None else jnp.broadcast_to(
            jnp.eye(4), lidar2img.shape
        )
        ba = bev_aug if bev_aug is not None else jnp.broadcast_to(
            jnp.eye(4), (B, 4, 4)
        )
        out = jax.vmap(one)(lidar_feat, img_feats, lidar2img, ia, ba)
        if self.dropout > 0 and train:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out
