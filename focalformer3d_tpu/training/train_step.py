"""Jitted train / eval steps for the detector.

One jitted program per step: voxelization preprocessing is folded into the
step (it is pure array work, so it runs on device), then the model forward,
Hungarian-matched losses, grads, optimizer update, and BN running-stat
updates. Under a 1-D data mesh the same function is the multi-chip program —
inputs arrive batch-sharded, parameters replicated.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.detector import DetectorConfig, FocalFormer3D, preprocess_points
from .losses import LossConfig, detection_loss


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def create_train_state(
    cfg: DetectorConfig,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_batch: Dict[str, jax.Array],
) -> Tuple[FocalFormer3D, TrainState]:
    model = FocalFormer3D(cfg)
    vox = preprocess_points(cfg, sample_batch["points"],
                            sample_batch["points_mask"])
    k1, k2, k3 = jax.random.split(rng, 3)
    variables = model.init(
        {"params": k1, "gt": k2, "dropout": k3},
        vox, None, True,
        sample_batch["gt_boxes"], sample_batch["gt_labels"],
        sample_batch["gt_valid"],
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return model, TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    cfg: DetectorConfig,
    lcfg: LossConfig,
    tx: optax.GradientTransformation,
):
    model = FocalFormer3D(cfg)

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array):
        vox = preprocess_points(cfg, batch["points"], batch["points_mask"])
        kg, kd = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                vox, None, True,
                batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"],
                rngs={"gt": kg, "dropout": kd},
                mutable=["batch_stats"],
            )
            loss, metrics = detection_loss(
                cfg.decoder, lcfg, out,
                batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"],
            )
            return loss, (metrics, mut["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, batch_stats=new_bs,
            opt_state=new_opt, step=state.step + 1,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(cfg: DetectorConfig, max_out: int = 200):
    model = FocalFormer3D(cfg)

    def eval_step(params, batch_stats, batch):
        vox = preprocess_points(cfg, batch["points"], batch["points_mask"])
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, vox, None, False
        )
        return model.get_bboxes(out, max_out)

    return eval_step


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.batch_stats, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)
