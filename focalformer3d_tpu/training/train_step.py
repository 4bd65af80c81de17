"""Jitted train / eval steps for the detector.

One jitted program per step: voxelization preprocessing is folded into the
step (it is pure array work, so it runs on device), then the model forward,
Hungarian-matched losses, grads, optimizer update, and BN running-stat
updates. Under a 1-D data mesh the same function is the multi-chip program —
inputs arrive batch-sharded, parameters replicated.

Branch freezing (the reference's requires_grad=False + .eval() on img /
cam_lss / pts branches, detectors/focalformer3d.py:80-131) is functional
here: `freeze_mask` zeroes the frozen subtrees' gradient updates via
``optax.masked``-style multiplication, and the model itself runs frozen BN
in inference mode (`freeze_img` -> ``bb_train=False`` inside the detector).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.detector import DetectorConfig, FocalFormer3D, preprocess_points
from ..models.grid_mask import grid_mask
from .losses import LossConfig, detection_loss

_IMG_KEYS = ("imgs", "lidar2img", "img_aug", "bev_aug")


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def _img_data_from_batch(batch: Dict[str, jax.Array]):
    if "imgs" not in batch:
        return None
    return {k: batch[k] for k in _IMG_KEYS if k in batch}


def _frozen_prefixes(cfg: DetectorConfig):
    """Module-path prefixes frozen by the reference's staged finetune
    flags (focalformer3d.py:80-131): freeze_pts covers the point branch +
    imgpts_neck.shared_conv_pts; freeze_img covers img_backbone/img_neck;
    freeze_camlss the LSS module."""
    prefixes = []
    if cfg.freeze_img:
        prefixes += ["img_backbone", "img_neck"]
    if cfg.freeze_camlss:
        prefixes += ["imgpts_neck/cam_lss"]
    if cfg.freeze_pts:
        prefixes += [
            "vfe", "pts_middle_encoder", "pts_backbone", "pts_neck",
            "imgpts_neck/shared_conv_pts",
        ]
    return prefixes


def _path_str(path):
    return "/".join(
        getattr(p, "key", str(getattr(p, "idx", p))) for p in path
    )


def freeze_mask(cfg: DetectorConfig, params: Any) -> Any:
    """Pytree of 0/1 multipliers implementing the reference freeze flags
    (kept for tests/diagnostics; updates are frozen via trainable_mask +
    optax.masked)."""
    prefixes = _frozen_prefixes(cfg)

    def mask_leaf(path, leaf):
        s = _path_str(path)
        frozen = any(s.startswith(p) or f"/{p}" in s for p in prefixes)
        return jnp.zeros((), leaf.dtype) if frozen else jnp.ones(
            (), leaf.dtype
        )

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def trainable_mask(cfg: DetectorConfig, params: Any) -> Any:
    """Pure-python bool pytree for optax.masked: True = trainable."""
    prefixes = _frozen_prefixes(cfg)

    def mask_leaf(path, leaf):
        s = _path_str(path)
        return not any(
            s.startswith(p) or f"/{p}" in s for p in prefixes
        )

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def create_train_state(
    cfg: DetectorConfig,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_batch: Dict[str, jax.Array],
) -> Tuple[FocalFormer3D, TrainState]:
    model = FocalFormer3D(cfg)
    vox = None
    if cfg.input_pts:
        vox = preprocess_points(cfg, sample_batch["points"],
                                sample_batch["points_mask"], train=True)
    img_data = _img_data_from_batch(sample_batch) if cfg.input_img else None
    k1, k2, k3 = jax.random.split(rng, 3)

    @jax.jit  # eager per-op dispatch of init is minutes on TPU
    def _init(k1, k2, k3, vox, img_data, gtb, gtl, gtv):
        return model.init(
            {"params": k1, "gt": k2, "dropout": k3},
            vox, img_data, True, gtb, gtl, gtv,
        )

    variables = _init(
        k1, k2, k3, vox, img_data,
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
        vox = None
        if cfg.input_pts:
            vox = preprocess_points(
                cfg, batch["points"], batch["points_mask"], train=True
            )
        kg, kd, km = jax.random.split(
            jax.random.fold_in(rng, state.step), 3
        )
        img_data = _img_data_from_batch(batch) if cfg.input_img else None
        if img_data is not None and cfg.use_grid_mask:
            img_data = dict(img_data)
            img_data["imgs"] = grid_mask(km, img_data["imgs"])

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                vox, img_data, True,
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
        # frozen branches: stop_gradient in the detector keeps their
        # backward cheap; optax.masked (training/optim.py trainable_mask)
        # keeps their params and optimizer state untouched.
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
        vox = None
        if cfg.input_pts:
            vox = preprocess_points(
                cfg, batch["points"], batch["points_mask"]
            )
        img_data = _img_data_from_batch(batch) if cfg.input_img else None
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            vox, img_data, False,
        )
        return model.get_bboxes(out, max_out)

    return eval_step


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.batch_stats, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)
