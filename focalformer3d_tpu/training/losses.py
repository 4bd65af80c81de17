"""Detection loss assembly: Hungarian targets + focal/L1/gaussian-focal.

Mirrors the reference loss composition
(/root/reference/projects/mmdet3d_plugin/models/dense_heads/focal_decoder.py:994-1311):
per-round Hungarian assignment on decoded (stop-gradient) boxes, classification
focal loss over matched labels, L1 box regression with code weights, dense
heatmap gaussian-focal loss with multistage ignore masks, and the denoising
GT-group losses — all batched/vmapped with padded GTs instead of per-sample
python loops.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core import assigner as assigner_lib
from ..core import box_coder as bc
from ..core import gaussian, losses as L
from ..models.focal_decoder import FocalDecoderConfig


@dataclasses.dataclass(frozen=True)
class LossConfig:
    assigner: assigner_lib.AssignerConfig = dataclasses.field(
        default_factory=assigner_lib.AssignerConfig
    )
    code_weights: Tuple[float, ...] = (
        1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2
    )
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 0.25
    loss_heatmap_weight: float = 1.0
    gt_query_loss_weight: float = 1.0
    gaussian_overlap: float = 0.1
    min_radius: int = 2


def _pred_vector(out, sl, with_vel):
    parts = [out["center"][sl], out["height"][sl], out["dim"][sl],
             out["rot"][sl]]
    if with_vel:
        parts.append(out["vel"][sl])
    return jnp.concatenate(parts, axis=-1)


def detection_loss(
    cfg: FocalDecoderConfig,
    lcfg: LossConfig,
    out: Dict[str, jax.Array],
    gt_boxes: jax.Array,  # (B, G, 9) world boxes (z bottom)
    gt_labels: jax.Array,  # (B, G)
    gt_valid: jax.Array,  # (B, G)
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    coder = cfg.coder
    R = cfg.num_decoder_layers
    num_prop = cfg.total_stages * cfg.num_proposals
    B = gt_boxes.shape[0]
    ncls = cfg.num_classes
    cw = jnp.asarray(lcfg.code_weights[: cfg.code_size])

    # ---- per (B, R) assignment on real queries ----
    center = out["center"][:, :, :num_prop]
    height = out["height"][:, :, :num_prop]
    dim = out["dim"][:, :, :num_prop]
    rot = out["rot"][:, :, :num_prop]
    vel = out["vel"][:, :, :num_prop] if cfg.with_vel else None
    heat = out["heatmap"][:, :, :num_prop]

    boxes_dec = jax.lax.stop_gradient(
        bc.decode_box(coder, center, height, dim, rot, vel)
    )  # (B, R, Q, 7|9)
    heat_sg = jax.lax.stop_gradient(heat)

    def assign_one(bx, lg, gtb, gtl, gtv):
        res = assigner_lib.hungarian_assign_3d(
            lcfg.assigner, bx, lg, gtb, gtl, gtv, cfg.pc_range
        )
        a = res["assigned_gt"]
        if cfg.gt_center_limit is not None:
            a = assigner_lib.apply_gt_center_limit(a, bx, gtb,
                                                   cfg.gt_center_limit)
        return a, res["max_overlaps"]

    assign_b = jax.vmap(
        jax.vmap(assign_one, in_axes=(0, 0, None, None, None)),
        in_axes=(0, 0, 0, 0, 0),
    )
    assigned, overlaps = assign_b(boxes_dec, heat_sg, gt_boxes, gt_labels,
                                  gt_valid)  # (B, R, Q)

    pos = assigned >= 0
    safe = jnp.clip(assigned, 0, gt_boxes.shape[1] - 1)
    labels = jnp.where(
        pos, jnp.take_along_axis(
            gt_labels[:, None, :].repeat(R, 1), safe, axis=-1
        ), ncls,
    )  # (B, R, Q)
    gt_enc = bc.encode(coder, gt_boxes)  # (B, G, code)
    tgt = jnp.take_along_axis(
        gt_enc[:, None].repeat(R, 1), safe[..., None], axis=2
    )  # (B, R, Q, code)
    num_pos = jnp.maximum(jnp.sum(pos), 1).astype(jnp.float32)

    loss_cls = L.sigmoid_focal_loss(
        heat.reshape(-1, ncls),
        labels.reshape(-1),
        weights=None,
        avg_factor=num_pos,
        loss_weight=lcfg.loss_cls_weight,
    )
    preds = _pred_vector(out, (slice(None), slice(None), slice(0, num_prop)),
                         cfg.with_vel)
    loss_bbox = L.l1_loss(
        preds, tgt,
        weights=pos[..., None].astype(preds.dtype) * cw,
        avg_factor=num_pos,
        loss_weight=lcfg.loss_bbox_weight,
    )

    # ---- dense heatmap loss with multistage masks ----
    H, Wd = out["dense_heatmap"].shape[2:4]
    hm_t = jax.vmap(
        lambda b, l, v: gaussian.heatmap_targets(
            b, l, v, ncls,
            jnp.asarray(cfg.pc_range), jnp.asarray(cfg.voxel_size),
            cfg.out_size_factor, (H, Wd),
            lcfg.gaussian_overlap, lcfg.min_radius,
        )
    )(gt_boxes, gt_labels, gt_valid)  # (B, ncls, H, W)
    hm_t = jnp.transpose(hm_t, (0, 2, 3, 1))[:, None]  # (B, 1, H, W, ncls)
    masks = out["multistage_masks"]  # (B, S', H, W, ncls)
    hm_masked = hm_t * masks
    pred_hm = L.clip_sigmoid(out["dense_heatmap"])
    loss_heatmap = L.gaussian_focal_loss(
        pred_hm, hm_masked, weights=masks,
        avg_factor=jnp.maximum(jnp.sum(hm_masked == 1.0), 1.0),
        loss_weight=lcfg.loss_heatmap_weight,
    )

    metrics = {
        "loss_cls": loss_cls,
        "loss_bbox": loss_bbox,
        "loss_heatmap": loss_heatmap,
        "num_pos": num_pos,
        "matched_ious": jnp.sum(jnp.where(pos, overlaps, 0.0)) / num_pos,
    }
    # per-decoder-round diagnostics matching the reference's observable
    # loss surface (layer_N_loss_cls/_bbox, focal_decoder.py:1189-1217);
    # the optimized total is unchanged.
    for r in range(R):
        metrics[f"layer_{r}_loss_cls"] = L.sigmoid_focal_loss(
            heat[:, r].reshape(-1, ncls), labels[:, r].reshape(-1),
            weights=None, avg_factor=num_pos,
            loss_weight=lcfg.loss_cls_weight,
        )
        metrics[f"layer_{r}_loss_bbox"] = L.l1_loss(
            preds[:, r], tgt[:, r],
            weights=pos[:, r, :, None].astype(preds.dtype) * cw,
            avg_factor=num_pos, loss_weight=lcfg.loss_bbox_weight,
        )
    total = loss_cls + loss_bbox + loss_heatmap

    # ---- denoising gt-group losses ----
    if "gt_valid_mask" in out and cfg.add_gt_groups > 0:
        NGG = out["gt_valid_mask"].shape[1]  # NG * G
        NG = cfg.add_gt_groups
        gq_heat = out["heatmap"][:, :, num_prop:]  # (B, R, NGG, ncls)
        gq_labels = out["gt_query_labels"][:, None, :].repeat(R, 1)
        gq_valid = out["gt_valid_mask"][:, None, :].repeat(R, 1)
        n_gts = jnp.sum(gt_valid)
        avg = jnp.maximum(n_gts * NG * R, 1).astype(jnp.float32)
        gt_query_loss_cls = L.sigmoid_focal_loss(
            gq_heat.reshape(-1, ncls),
            gq_labels.reshape(-1),
            weights=gq_valid.reshape(-1).astype(jnp.float32),
            avg_factor=avg,
            loss_weight=lcfg.gt_query_loss_weight,
        )
        gq_preds = _pred_vector(
            out, (slice(None), slice(None), slice(num_prop, None)),
            cfg.with_vel,
        )  # (B, R, NGG, code)
        gq_tgt = jnp.tile(gt_enc, (1, NG, 1))[:, None].repeat(R, 1)
        positive = (gq_labels != ncls) & gq_valid
        gt_query_loss_box = L.l1_loss(
            gq_preds, gq_tgt,
            weights=positive[..., None].astype(gq_preds.dtype) * cw,
            avg_factor=avg,
            loss_weight=lcfg.gt_query_loss_weight * lcfg.loss_bbox_weight,
        )
        metrics["gt_query_loss_cls"] = gt_query_loss_cls
        metrics["gt_query_loss_box"] = gt_query_loss_box
        total = total + gt_query_loss_cls + gt_query_loss_box

    metrics["loss"] = total
    return total, metrics
