"""3D box utilities (LiDAR frame), pure JAX, fixed shapes.

Box layout (code-wide convention, matching mmdet3d LiDARInstance3DBoxes as used
by the reference — see /root/reference/projects/mmdet3d_plugin/core/bbox/coders/
transfusion_bbox_coder.py:24-37):

    box = (x, y, z_bottom, dx, dy, dz, yaw[, vx, vy])

* ``(x, y, z_bottom)``: bottom-center of the box in the LiDAR frame.
* ``(dx, dy, dz)``: full extents along the box-local axes.
* ``yaw``: rotation about +z, 0 = box-local x aligned with world x.
* optional ``(vx, vy)``: BEV velocity (nuScenes; code_size=10).

All functions are shape-polymorphic over leading batch dims and never use
data-dependent shapes; invalid/padded boxes are handled by caller-side masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gravity_center(boxes: jax.Array) -> jax.Array:
    """(..., >=7) boxes -> (..., 3) gravity centers (z_bottom + dz/2)."""
    return jnp.stack(
        [boxes[..., 0], boxes[..., 1], boxes[..., 2] + 0.5 * boxes[..., 5]],
        axis=-1,
    )


def bev_corners(boxes: jax.Array) -> jax.Array:
    """BEV (x, y) corners of rotated boxes.

    Args:
        boxes: (..., >=7) array.
    Returns:
        (..., 4, 2) corners in counter-clockwise order starting at
        (+dx/2, +dy/2) in the box frame.
    """
    x, y = boxes[..., 0], boxes[..., 1]
    hdx, hdy = 0.5 * boxes[..., 3], 0.5 * boxes[..., 4]
    yaw = boxes[..., 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # Local-frame corner offsets, CCW.
    lx = jnp.stack([hdx, -hdx, -hdx, hdx], axis=-1)
    ly = jnp.stack([hdy, hdy, -hdy, -hdy], axis=-1)
    wx = x[..., None] + c[..., None] * lx - s[..., None] * ly
    wy = y[..., None] + s[..., None] * lx + c[..., None] * ly
    return jnp.stack([wx, wy], axis=-1)


def corners_3d(boxes: jax.Array) -> jax.Array:
    """All 8 corners: (..., 8, 3); bottom 4 then top 4, matching bev order."""
    bev = bev_corners(boxes)  # (..., 4, 2)
    zb = boxes[..., 2]
    zt = boxes[..., 2] + boxes[..., 5]
    bot = jnp.concatenate(
        [bev, jnp.broadcast_to(zb[..., None, None], bev.shape[:-1] + (1,))], -1
    )
    top = jnp.concatenate(
        [bev, jnp.broadcast_to(zt[..., None, None], bev.shape[:-1] + (1,))], -1
    )
    return jnp.concatenate([bot, top], axis=-2)


def rotate_points_z(points: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate (..., N, 3) or (..., N, 2) points about +z by ``angle`` (...,).

    Counter-clockwise (right-hand rule about +z), matching
    mmdet3d ``rotation_3d_in_axis`` as used at
    /root/reference/projects/mmdet3d_plugin/models/dense_heads/focal_decoder.py:899.
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, y = points[..., 0], points[..., 1]
    rx = c[..., None] * x - s[..., None] * y
    ry = s[..., None] * x + c[..., None] * y
    rest = points[..., 2:]
    return jnp.concatenate([jnp.stack([rx, ry], axis=-1), rest], axis=-1)


def points_in_boxes_bev(points_xy: jax.Array, boxes: jax.Array) -> jax.Array:
    """Mask of which BEV points fall inside which rotated boxes.

    TPU-native replacement of mmdet3d ``points_in_boxes_gpu`` restricted to the
    BEV plane (z-extents are handled by the caller; the reference sets
    degenerate z bounds before calling it — focal_decoder.py:747-752).

    Args:
        points_xy: (..., N, 2).
        boxes: (..., M, >=7).
    Returns:
        bool (..., N, M) — point n inside box m.
    """
    dx = points_xy[..., :, None, 0] - boxes[..., None, :, 0]
    dy = points_xy[..., :, None, 1] - boxes[..., None, :, 1]
    yaw = boxes[..., None, :, 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # World -> box-local.
    lx = c * dx + s * dy
    ly = -s * dx + c * dy
    return (jnp.abs(lx) <= 0.5 * boxes[..., None, :, 3]) & (
        jnp.abs(ly) <= 0.5 * boxes[..., None, :, 4]
    )


def points_in_boxes_3d(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """bool (..., N, M): 3D point containment (bottom-inclusive)."""
    inside_bev = points_in_boxes_bev(points[..., :2], boxes)
    z = points[..., :, None, 2]
    zb = boxes[..., None, :, 2]
    zt = zb + boxes[..., None, :, 5]
    return inside_bev & (z >= zb) & (z <= zt)


def flip_boxes(boxes: jax.Array, axis: str) -> jax.Array:
    """Flip boxes over BEV 'horizontal' (y -> -y) or 'vertical' (x -> -x) axis.

    Matches mmdet3d box flip semantics used for TTA mapping-back
    (/root/reference/projects/mmdet3d_plugin/core/post_processing/merge_augs.py:88-95).
    """
    x, y, z, dx, dy, dz, yaw = (boxes[..., i] for i in range(7))
    rest = boxes[..., 7:]
    if axis == "horizontal":
        y = -y
        yaw = -yaw
        if rest.shape[-1] >= 2:
            rest = rest.at[..., 1].multiply(-1.0)
    elif axis == "vertical":
        x = -x
        yaw = -yaw + jnp.pi
        if rest.shape[-1] >= 2:
            rest = rest.at[..., 0].multiply(-1.0)
    else:  # pragma: no cover - config error
        raise ValueError(axis)
    out = jnp.stack([x, y, z, dx, dy, dz, yaw], axis=-1)
    return jnp.concatenate([out, rest], axis=-1)


def scale_boxes(boxes: jax.Array, scale: jax.Array) -> jax.Array:
    """Uniformly scale geometry (centers, dims, velocity) by ``scale``."""
    geom = boxes[..., :6] * scale
    yaw = boxes[..., 6:7]
    rest = boxes[..., 7:] * scale
    return jnp.concatenate([geom, yaw, rest], axis=-1)


def rotate_boxes(boxes: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate boxes about the z axis (global), CCW by ``angle``."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = c * boxes[..., 0] - s * boxes[..., 1]
    y = s * boxes[..., 0] + c * boxes[..., 1]
    yaw = boxes[..., 6] + angle
    parts = [
        jnp.stack([x, y], axis=-1),
        boxes[..., 2:6],
        yaw[..., None],
    ]
    if boxes.shape[-1] > 7:
        vx = c * boxes[..., 7] - s * boxes[..., 8]
        vy = s * boxes[..., 7] + c * boxes[..., 8]
        parts.append(jnp.stack([vx, vy], axis=-1))
    return jnp.concatenate(parts, axis=-1)
