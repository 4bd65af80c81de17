"""Device points-in-rotated-boxes test (mmdet3d points_in_boxes_gpu).

Replaces the CUDA roiaware_pool3d kernel the reference uses for the
'boxcls' heatmap-masking mode
(/root/reference/projects/mmdet3d_plugin/models/dense_heads/focal_decoder.py:742-759).
Boxes are LiDAR-frame [x, y, z(bottom), dx, dy, dz, yaw]; a point belongs
to the first box containing it (lowest index), -1 if none — matching the
CUDA op's single-assignment semantics. Fully vectorized (N x M tests),
jit/vmap friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def points_in_boxes_mask(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """points (N, >=3), boxes (M, 7) -> bool (N, M) containment matrix."""
    p = points[:, None, :3]  # (N, 1, 3)
    c = boxes[None, :, :3]  # (1, M, 3)
    yaw = boxes[None, :, 6]
    dx = p[..., 0] - c[..., 0]
    dy = p[..., 1] - c[..., 1]
    cos, sin = jnp.cos(-yaw), jnp.sin(-yaw)
    lx = dx * cos - dy * sin
    ly = dx * sin + dy * cos
    half = boxes[None, :, 3:6] * 0.5
    dz = p[..., 2] - c[..., 2]  # bottom-anchored z
    return (
        (jnp.abs(lx) <= half[..., 0])
        & (jnp.abs(ly) <= half[..., 1])
        & (dz >= 0)
        & (dz <= boxes[None, :, 5])
    )


def points_in_boxes(points: jax.Array, boxes: jax.Array,
                    valid: jax.Array | None = None) -> jax.Array:
    """points (N, >=3), boxes (M, 7) -> int32 (N,) first containing box
    index (or -1). ``valid`` masks out padded boxes."""
    m = points_in_boxes_mask(points, boxes)
    if valid is not None:
        m = m & valid[None, :]
    M = boxes.shape[0]
    first = jnp.argmax(m, axis=1).astype(jnp.int32)
    any_in = jnp.any(m, axis=1)
    del M
    return jnp.where(any_in, first, -1)
