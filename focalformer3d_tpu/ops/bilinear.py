"""Bilinear sampling on 2D feature maps (grid_sample / MSDA building block).

Replaces torch ``F.grid_sample`` uses (RoI grid pooling at
/root/reference/projects/mmdet3d_plugin/models/dense_heads/focal_decoder.py:912-916,
I2P at encoder_utils.py:243, LSS) and the bilinear core of mmcv's CUDA
``MultiScaleDeformableAttention``. Implemented as 4 gathers + lerp weights —
XLA fuses this into a single kernel; a Pallas version can slot in later for
the decoder hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(
    feat: jax.Array,  # (H, W, C)
    xy: jax.Array,  # (..., 2) in pixel coords; x in [0, W-1], y in [0, H-1]
    zero_outside: bool = True,
) -> jax.Array:
    """Sample with align_corners=False torch semantics on *center* coords:
    a query at (x, y) interpolates the 4 texels around it; coordinates are in
    texel-center units (i.e. feat[i, j] sits at x=j, y=i)."""
    H, W, C = feat.shape
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        v = feat[yi_c, xi_c]
        if zero_outside:
            v = jnp.where(inb[..., None], v, 0.0)
        return v

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def grid_sample_norm(
    feat: jax.Array,  # (H, W, C)
    grid: jax.Array,  # (..., 2) normalized to [-1, 1] (torch convention)
) -> jax.Array:
    """torch.F.grid_sample(align_corners=False, padding_mode='zeros') parity:
    norm -1..1 maps to pixel centers via ((g+1) * size - 1) / 2."""
    H, W, C = feat.shape
    x = ((grid[..., 0] + 1.0) * W - 1.0) * 0.5
    y = ((grid[..., 1] + 1.0) * H - 1.0) * 0.5
    return bilinear_sample(feat, jnp.stack([x, y], axis=-1), zero_outside=True)
