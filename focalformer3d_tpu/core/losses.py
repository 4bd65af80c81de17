"""Loss functions (sigmoid focal, gaussian focal, weighted L1) and match costs.

Numerics follow the mmdet implementations the reference configures
(FocalLoss use_sigmoid gamma=2 alpha=0.25, GaussianFocalLoss alpha=2 gamma=4,
L1Loss — see /root/reference/projects/configs/focalformer3d/FocalFormer3D_L.py:281-283),
but are written as pure fixed-shape JAX functions with explicit ``avg_factor``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_sigmoid(x: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Sigmoid clamped away from {0,1} (mmdet3d ``clip_sigmoid``)."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def sigmoid_focal_loss(
    logits: jax.Array,  # (N, C)
    labels: jax.Array,  # (N,) int; label == C means background
    weights: jax.Array | None = None,  # (N,)
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor: jax.Array | float = 1.0,
    loss_weight: float = 1.0,
) -> jax.Array:
    num_classes = logits.shape[-1]
    target = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * target + p * (1.0 - target)
    focal_weight = (alpha * target + (1.0 - alpha) * (1.0 - target)) * pt ** gamma
    # Numerically stable BCE with logits.
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = bce * focal_weight
    loss = jnp.sum(loss, axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss_weight * jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def gaussian_focal_loss(
    pred: jax.Array,  # probabilities in (0, 1), e.g. clip_sigmoid(logits)
    gaussian_target: jax.Array,  # same shape, in [0, 1]
    weights: jax.Array | None = None,
    alpha: float = 2.0,
    gamma: float = 4.0,
    avg_factor: jax.Array | float = 1.0,
    loss_weight: float = 1.0,
) -> jax.Array:
    eps = 1e-12
    pos_w = (gaussian_target == 1.0).astype(pred.dtype)
    neg_w = (1.0 - gaussian_target) ** gamma
    pos_loss = -jnp.log(pred + eps) * (1.0 - pred) ** alpha * pos_w
    neg_loss = -jnp.log(1.0 - pred + eps) * pred ** alpha * neg_w
    loss = pos_loss + neg_loss
    if weights is not None:
        loss = loss * weights
    return loss_weight * jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def l1_loss(
    pred: jax.Array,
    target: jax.Array,
    weights: jax.Array | None = None,
    avg_factor: jax.Array | float = 1.0,
    loss_weight: float = 1.0,
) -> jax.Array:
    loss = jnp.abs(pred - target)
    if weights is not None:
        loss = loss * weights
    return loss_weight * jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def focal_loss_cost(
    cls_logits: jax.Array,  # (Q, C)
    gt_labels: jax.Array,  # (G,) int
    gamma: float = 2.0,
    alpha: float = 0.25,
    weight: float = 1.0,
    eps: float = 1e-12,
) -> jax.Array:
    """mmdet ``FocalLossCost``: (Q, G) classification matching cost."""
    p = jax.nn.sigmoid(cls_logits)
    neg_cost = -jnp.log(1.0 - p + eps) * (1.0 - alpha) * p ** gamma
    pos_cost = -jnp.log(p + eps) * alpha * (1.0 - p) ** gamma
    cost = pos_cost - neg_cost  # (Q, C)
    return cost[:, gt_labels] * weight


def bbox_bev_l1_cost(
    bboxes: jax.Array,  # (Q, >=2) world boxes
    gt_bboxes: jax.Array,  # (G, >=2)
    pc_range,  # (6,)
    weight: float = 1.0,
) -> jax.Array:
    """BBoxBEVL1Cost: L1 between pc-range-normalized BEV centers, (Q, G)."""
    start = jnp.asarray(pc_range[:2], dtype=bboxes.dtype)
    extent = jnp.asarray(pc_range[3:5], dtype=bboxes.dtype) - start
    q = (bboxes[:, :2] - start) / extent
    g = (gt_bboxes[:, :2] - start) / extent
    return weight * jnp.sum(jnp.abs(q[:, None, :] - g[None, :, :]), axis=-1)
