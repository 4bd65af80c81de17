"""HungarianAssigner3D: focal-cls + BEV-L1 + (-IoU3D) cost, padded & masked.

Composition mirrors the reference assigner
(/root/reference/projects/mmdet3d_plugin/core/bbox/assigners/hungarian_assigner.py:92-162)
with the config weights cls=0.15 / reg=0.25 / iou=0.25
(FocalFormer3D_L.py:316-321), but runs entirely on device with fixed shapes:
GTs are padded to a static ``G`` with a validity mask, and the assignment is a
(Q,)-shaped gt-index vector (-1 = background) rather than dynamic index lists.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from . import hungarian, iou, losses


@dataclasses.dataclass(frozen=True)
class AssignerConfig:
    cls_weight: float = 0.15
    reg_weight: float = 0.25
    iou_weight: float = 0.25
    cls_gamma: float = 2.0
    cls_alpha: float = 0.25
    method: str = "auction"  # or "scipy"


def hungarian_assign_3d(
    cfg: AssignerConfig,
    bboxes: jax.Array,  # (Q, 7|9) decoded world boxes
    cls_logits: jax.Array,  # (Q, C)
    gt_bboxes: jax.Array,  # (G, 7|9) padded
    gt_labels: jax.Array,  # (G,) int32
    gt_valid: jax.Array,  # (G,) bool
    pc_range: Sequence[float],
):
    """Single-sample assignment.

    Returns dict:
      assigned_gt: (Q,) int32, matched gt index or -1
      max_overlaps: (Q,) float, IoU3D with matched gt (0 for background)
      labels: (Q,) int32, matched class or -1
    """
    cls_cost = losses.focal_loss_cost(
        cls_logits, gt_labels, cfg.cls_gamma, cfg.cls_alpha, cfg.cls_weight
    )
    reg_cost = losses.bbox_bev_l1_cost(bboxes, gt_bboxes, pc_range, cfg.reg_weight)
    iou3d = iou.boxes_iou_3d(bboxes, gt_bboxes)
    iou_cost = -iou3d * cfg.iou_weight
    cost = cls_cost + reg_cost + iou_cost
    cost = jnp.where(gt_valid[None, :], cost, hungarian.BIG_COST)

    q_valid = jnp.ones((bboxes.shape[0],), bool)
    row_to_col = hungarian.assign(cost, q_valid, gt_valid, method=cfg.method)

    matched = row_to_col >= 0
    safe = jnp.clip(row_to_col, 0, gt_bboxes.shape[0] - 1)
    max_overlaps = jnp.where(
        matched, iou3d[jnp.arange(bboxes.shape[0]), safe], 0.0
    )
    labels = jnp.where(matched, gt_labels[safe], -1)
    return {
        "assigned_gt": row_to_col,
        "max_overlaps": jnp.clip(max_overlaps, 0.0, 1.0),
        "labels": labels,
    }


def apply_gt_center_limit(
    assigned_gt: jax.Array,  # (Q,)
    bboxes: jax.Array,  # (Q, >=2)
    gt_bboxes: jax.Array,  # (G, >=2)
    limit: float,
):
    """Unassign matches whose BEV center distance exceeds ``limit``
    (reference gt_center_limit postfilter, focal_decoder.py:1083-1088)."""
    safe = jnp.clip(assigned_gt, 0, gt_bboxes.shape[0] - 1)
    d = jnp.linalg.norm(bboxes[:, :2] - gt_bboxes[safe, :2], axis=-1)
    keep = (assigned_gt >= 0) & (d <= limit)
    return jnp.where(keep, assigned_gt, -1)


def heuristic_assign_3d(
    pred_centers: jax.Array,  # (Q, 2 or 3)
    pred_labels: jax.Array,  # (Q,) int32
    gt_centers: jax.Array,  # (G, 2 or 3)
    gt_labels: jax.Array,  # (G,)
    gt_valid: jax.Array,  # (G,)
    dist_thresh: float = 10.0,
) -> jax.Array:
    """HeuristicAssigner3D (reference hungarian_assigner.py:49-89):
    class-aware nearest-center matching — each prediction takes the closest
    same-class GT within ``dist_thresh`` (cross-class distance is inflated).

    Returns (Q,) int32 of assigned GT indices, -1 for unassigned.
    """
    d = jnp.linalg.norm(
        pred_centers[:, None, :2] - gt_centers[None, :, :2], axis=-1
    )
    same = pred_labels[:, None] == gt_labels[None, :]
    d = jnp.where(same, d, d + 1e5)
    d = jnp.where(gt_valid[None, :], d, jnp.inf)
    best = jnp.argmin(d, axis=1)
    bestd = jnp.min(d, axis=1)
    return jnp.where(bestd < dist_thresh, best, -1).astype(jnp.int32)
