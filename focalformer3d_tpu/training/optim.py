"""Optimizer: AdamW + grad-norm clip + cyclic LR / cyclic beta1 schedules.

Reproduces the reference recipe (FocalFormer3D_L.py:338-353): AdamW lr 1e-4
wd 0.01, grad clip 0.1 (L2), one-cycle LR with target_ratio (10, 1e-4) and
step_ratio_up 0.4, and the matching cyclic momentum (0.8947..., 1) applied to
Adam's beta1 (mmcv CyclicMomentumUpdater semantics, cosine annealing).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import optax


def cyclic_schedule(
    base: float,
    total_steps: int,
    target_ratio: Tuple[float, float] = (10.0, 1e-4),
    step_ratio_up: float = 0.4,
):
    """mmcv cyclic updater (anneal_strategy='cos' default in these configs)."""
    up_steps = int(total_steps * step_ratio_up)
    down_steps = max(total_steps - up_steps, 1)

    def cos_anneal(start, end, pct):
        return end + (start - end) * (jnp.cos(jnp.pi * pct) + 1) / 2

    def schedule(step):
        step = jnp.minimum(step, total_steps)
        in_up = step < up_steps
        pct_up = jnp.clip(step / jnp.maximum(up_steps, 1), 0.0, 1.0)
        pct_down = jnp.clip((step - up_steps) / down_steps, 0.0, 1.0)
        v_up = cos_anneal(base, base * target_ratio[0], pct_up)
        v_down = cos_anneal(
            base * target_ratio[0], base * target_ratio[1], pct_down
        )
        return jnp.where(in_up, v_up, v_down)

    return schedule


def make_optimizer(
    base_lr: float = 1e-4,
    weight_decay: float = 0.01,
    total_steps: int = 10000,
    grad_clip: float = 0.1,
    lr_target_ratio: Tuple[float, float] = (10.0, 1e-4),
    momentum_target_ratio: Tuple[float, float] = (0.8947368421052632, 1.0),
    step_ratio_up: float = 0.4,
    base_b1: float = 0.9,
    cyclic: bool = True,
    trainable_mask=None,
):
    """AdamW + cyclic schedules; ``trainable_mask`` (a callable
    params -> bool pytree, or a bool pytree) routes frozen subtrees
    through optax.masked so they get neither updates nor weight decay —
    the reference's per-branch freeze semantics (focalformer3d.py:80-131)
    without spending optimizer state or decay on frozen params."""
    if cyclic:
        lr_sched = cyclic_schedule(
            base_lr, total_steps, lr_target_ratio, step_ratio_up
        )
        b1_sched = cyclic_schedule(
            base_b1, total_steps, momentum_target_ratio, step_ratio_up
        )
    else:
        lr_sched = base_lr
        b1_sched = base_b1

    @optax.inject_hyperparams
    def _make(learning_rate, b1):
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(
                learning_rate=learning_rate, b1=b1, b2=0.999,
                weight_decay=weight_decay,
            ),
        )

    tx = _make(learning_rate=lr_sched, b1=b1_sched)
    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
    return tx
