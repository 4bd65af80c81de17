"""Fixed-shape NMS variants (circle NMS, rotated-BEV NMS) as masked lax loops.

Replaces mmdet3d's numba ``circle_nms`` and CUDA ``nms_gpu`` used by the
reference at focal_decoder.py:1352-1392 and merge_augs.py:113-141.  All outputs
are keep-masks over fixed-size inputs (no boolean indexing), so the whole
inference path stays jittable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .iou import boxes_iou_bev


def _suppress_loop(order: jax.Array, suppress_mat: jax.Array) -> jax.Array:
    """Greedy NMS given a score ordering and pairwise suppression matrix.

    Args:
        order: (N,) indices sorted by descending score.
        suppress_mat: (N, N) bool in *original* index space;
            suppress_mat[i, j] True when i (if kept) suppresses j.
    Returns:
        keep mask (N,) bool in original index space.
    """
    n = order.shape[0]
    sup_o = suppress_mat[order][:, order]  # ordered space
    alive0 = jnp.ones((n,), dtype=bool)

    def body(i, alive):
        row = sup_o[i] & alive[i]
        row = row & (jnp.arange(n) > i)
        return alive & ~row

    alive = jax.lax.fori_loop(0, n, body, alive0)
    keep = jnp.zeros((n,), dtype=bool).at[order].set(alive)
    return keep


def circle_nms(
    centers_xy: jax.Array,  # (N, 2)
    scores: jax.Array,  # (N,)
    valid: jax.Array,  # (N,) bool
    radius: float,
) -> jax.Array:
    """Center-distance NMS; keeps the higher-scored of any pair closer than
    ``radius`` (squared-distance rule of mmdet3d's numba kernel)."""
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf))[::-1]
    d2 = jnp.sum(
        (centers_xy[:, None, :] - centers_xy[None, :, :]) ** 2, axis=-1
    )
    sup = (d2 < radius * radius) & valid[None, :] & valid[:, None]
    return _suppress_loop(order, sup) & valid


def rotated_nms_bev(
    boxes: jax.Array,  # (N, >=7) world boxes
    scores: jax.Array,  # (N,)
    valid: jax.Array,  # (N,) bool
    iou_threshold: float,
    pre_max_size: int | None = None,
) -> jax.Array:
    """Rotated-rectangle IoU NMS; returns keep mask (N,).

    ``pre_max_size`` drops everything below the top-K scores before the
    O(N^2) IoU computation (mirrors nms_gpu's pre_maxsize cap, but as a mask).
    """
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg_inf)
    if pre_max_size is not None and pre_max_size < boxes.shape[0]:
        kth = jnp.sort(masked_scores)[::-1][pre_max_size - 1]
        valid = valid & (masked_scores >= kth)
        masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(masked_scores)[::-1]
    iou = boxes_iou_bev(boxes, boxes)
    sup = (iou > iou_threshold) & valid[None, :] & valid[:, None]
    return _suppress_loop(order, sup) & valid


def top_k_mask(scores: jax.Array, valid: jax.Array, k: int) -> jax.Array:
    """Keep-mask selecting the top-k valid scores (ties broken by index)."""
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    idx = jnp.argsort(s)[::-1][:k]
    mask = jnp.zeros(scores.shape, dtype=bool).at[idx].set(True)
    return mask & valid
