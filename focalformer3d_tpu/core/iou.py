"""Rotated BEV / 3D IoU, pure JAX (convex polygon clipping, fixed buffers).

TPU-native replacement for mmdet3d's CUDA ``boxes_iou_bev`` / ``BboxOverlaps3D``
(used by the reference's HungarianAssigner3D iou cost and TTA box voting —
SURVEY.md §2.3). The intersection of two rotated rectangles is computed by
Sutherland–Hodgman clipping with an 8-vertex fixed-capacity buffer (a convex
quad clipped by 4 half-planes has at most 8 vertices), then shoelace area.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import boxes as box_utils

_MAX_VERTS = 8


def _clip_halfplane(poly, n, p0, p1):
    """Clip convex polygon by half-plane left of directed edge p0->p1.

    poly: (_MAX_VERTS, 2); n: int32 live vertex count.
    Returns new (poly, n).
    """
    ex, ey = p1[0] - p0[0], p1[1] - p0[1]

    def side(pt):  # >= 0 means inside (left of edge for CCW rect)
        return ex * (pt[..., 1] - p0[1]) - ey * (pt[..., 0] - p0[0])

    idx = jnp.arange(_MAX_VERTS)
    nn = jnp.maximum(n, 1)
    nxt_idx = jnp.where(idx + 1 >= nn, 0, idx + 1)
    cur = poly
    nxt = poly[nxt_idx]
    s_cur = side(cur)
    s_nxt = side(nxt)
    live = idx < n

    cur_in = s_cur >= 0
    nxt_in = s_nxt >= 0
    # Intersection point of segment (cur, nxt) with the edge line.
    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = cur + t[:, None] * (nxt - cur)

    emit_cur = live & cur_in
    emit_int = live & (cur_in ^ nxt_in)

    # Compact: slots interleaved [cur_0, int_0, cur_1, int_1, ...].
    flags = jnp.stack([emit_cur, emit_int], axis=1).reshape(-1)  # (2K,)
    verts = jnp.stack([cur, inter], axis=1).reshape(-1, 2)  # (2K, 2)
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    out_idx = jnp.where(flags, pos, _MAX_VERTS)  # dropped when == _MAX_VERTS
    new_poly = jnp.zeros((_MAX_VERTS, 2), poly.dtype).at[out_idx].set(
        verts, mode="drop"
    )
    new_n = jnp.sum(flags.astype(jnp.int32))
    return new_poly, new_n


def _poly_area(poly, n):
    idx = jnp.arange(_MAX_VERTS)
    nn = jnp.maximum(n, 1)
    nxt = poly[jnp.where(idx + 1 >= nn, 0, idx + 1)]
    cross = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    cross = jnp.where(idx < n, cross, 0.0)
    return 0.5 * jnp.abs(jnp.sum(cross))


def _pair_intersection_area(box1, box2):
    """BEV intersection area of two (>=7,) rotated boxes."""
    c1 = box_utils.bev_corners(box1)  # (4, 2) CCW
    c2 = box_utils.bev_corners(box2)
    poly = jnp.zeros((_MAX_VERTS, 2), box1.dtype).at[:4].set(c1)
    n = jnp.int32(4)
    for k in range(4):
        poly, n = _clip_halfplane(poly, n, c2[k], c2[(k + 1) % 4])
    return _poly_area(poly, n)


def boxes_intersection_bev(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise BEV intersection areas: (N, >=7) x (M, >=7) -> (N, M)."""
    f = jax.vmap(jax.vmap(_pair_intersection_area, in_axes=(None, 0)), in_axes=(0, None))
    return f(boxes1, boxes2)


def boxes_iou_bev(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise rotated BEV IoU (N, M)."""
    inter = boxes_intersection_bev(boxes1, boxes2)
    a1 = boxes1[:, 3] * boxes1[:, 4]
    a2 = boxes2[:, 3] * boxes2[:, 4]
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


def boxes_iou_3d(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise 3D IoU in LiDAR coords (z = bottom center), (N, M).

    Matches mmdet3d ``BboxOverlaps3D(coordinate='lidar', mode='iou')``.
    """
    inter_bev = boxes_intersection_bev(boxes1, boxes2)
    zb1, zt1 = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    zb2, zt2 = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    z_overlap = jnp.maximum(
        jnp.minimum(zt1[:, None], zt2[None, :])
        - jnp.maximum(zb1[:, None], zb2[None, :]),
        0.0,
    )
    inter = inter_bev * z_overlap
    v1 = boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5]
    v2 = boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5]
    union = jnp.maximum(v1[:, None] + v2[None, :] - inter, 1e-8)
    return jnp.clip(inter / union, 0.0, 1.0)
