"""Test-time-augmentation result merging (fixed-shape, device-side).

Counterpart of the reference `merge_aug_bboxes_3d`
(/root/reference/projects/mmdet3d_plugin/core/post_processing/merge_augs.py:14-184):
map each augmented pass's boxes back to the canonical frame
(`bbox3d_mapping_back`), concatenate, per-class rotated-BEV NMS (thr 0.1),
IoU-weighted box voting among survivors (IoU >= 0.65; yaw averaged via
atan2 of sin/cos means), and keep the top 500 by score.

TPU-first: all passes are padded to the same box count and merged with
masks — no boolean filtering, the whole merge jits.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from . import boxes as box_utils
from .iou import boxes_iou_bev
from .nms import rotated_nms_bev, top_k_mask


@dataclasses.dataclass(frozen=True)
class TTAConfig:
    nms_thresh: float = 0.1
    vote_iou: float = 0.65
    max_out: int = 500
    num_classes: int = 10


def mapping_back(
    boxes: jax.Array,  # (N, 9)
    scale: jax.Array,  # scalar pts scale ratio applied during aug
    flip_horizontal: jax.Array,  # bool scalar (y-flip)
    flip_vertical: jax.Array,  # bool scalar (x-flip)
) -> jax.Array:
    """Invert the TTA transform on predicted boxes
    (mmdet3d bbox3d_mapping_back: flip back then inverse-scale)."""
    b = boxes
    b = jnp.where(flip_horizontal, box_utils.flip_boxes(b, "horizontal"), b)
    b = jnp.where(flip_vertical, box_utils.flip_boxes(b, "vertical"), b)
    return box_utils.scale_boxes(b, 1.0 / scale)


def merge_aug_boxes(
    cfg: TTAConfig,
    boxes: jax.Array,  # (A, N, 9) already mapped back
    scores: jax.Array,  # (A, N)
    labels: jax.Array,  # (A, N) int32
    valid: jax.Array,  # (A, N) bool
):
    """Returns dict(bboxes (M,9), scores (M,), labels (M,), mask (M,))
    with M = A*N; mask marks the kept top `max_out` boxes."""
    A, N = scores.shape
    b = boxes.reshape(A * N, -1)
    s = scores.reshape(-1)
    l = labels.reshape(-1)
    v = valid.reshape(-1)

    # per-class rotated NMS: run NMS once with cross-class suppression
    # disabled by offsetting classes far apart in BEV (standard batched-NMS
    # trick; exact per-class equivalence).
    offset = (
        l.astype(b.dtype) * (2.0 * 200.0)
    )  # farther than any in-range box extent
    b_off = b.at[:, 0].add(offset)
    keep = rotated_nms_bev(b_off, jnp.where(v, s, -1.0), v, cfg.nms_thresh)
    keep = keep & v

    # IoU-weighted voting among kept boxes against all (same-class) boxes
    iou = boxes_iou_bev(b_off, b_off)  # offsets keep classes separate
    w = jnp.where(
        (iou >= cfg.vote_iou) & v[None, :], s[None, :], 0.0
    )  # (kept_query, contributor)
    wsum = jnp.maximum(w.sum(-1, keepdims=True), 1e-6)
    ww = w / wsum
    xyzdims = jnp.einsum("km,md->kd", ww, b[:, :6])
    sin = jnp.einsum("km,m->k", ww, jnp.sin(b[:, 6]))
    cos = jnp.einsum("km,m->k", ww, jnp.cos(b[:, 6]))
    yaw = jnp.arctan2(sin, cos)
    rest = (
        jnp.einsum("km,md->kd", ww, b[:, 7:]) if b.shape[1] > 7 else None
    )
    voted = jnp.concatenate(
        [xyzdims, yaw[:, None]] + ([rest] if rest is not None else []), -1
    )
    any_support = w.sum(-1) > 0
    voted = jnp.where(any_support[:, None], voted, b)

    final_mask = top_k_mask(jnp.where(keep, s, -jnp.inf), keep, cfg.max_out)
    return {
        "bboxes": voted,
        "scores": jnp.where(final_mask, s, 0.0),
        "labels": l,
        "mask": final_mask,
    }


def merge_tta_results(
    cfg: TTAConfig,
    aug_results: Sequence[dict],  # each: bboxes (N,9), scores, labels, mask
    scales: Sequence[float],
    flips_h: Sequence[bool],
    flips_v: Sequence[bool],
):
    """Convenience wrapper: map each pass back then merge."""
    boxes = jnp.stack([
        mapping_back(
            r["bboxes"], jnp.asarray(s), jnp.asarray(fh), jnp.asarray(fv)
        )
        for r, s, fh, fv in zip(aug_results, scales, flips_h, flips_v)
    ])
    scores = jnp.stack([r["scores"] for r in aug_results])
    labels = jnp.stack([r["labels"] for r in aug_results])
    valid = jnp.stack([r["mask"] for r in aug_results])
    return merge_aug_boxes(cfg, boxes, scores, labels, valid)


def dump_aug_cache(cache_dir, sample_idx, boxes, scores, labels, valid):
    """Persist one sample's mapped-back TTA candidates for OFFLINE
    ensembling (reference merge_augs.py:35-109 pickles
    {aug_bboxes, aug_scores, aug_labels} per sample into
    ./merge_augs/<model>/sampleidx_<idx>.pkl; ensemble mode later
    concatenates every cached model's candidates before NMS).

    Only the valid rows are stored; arrays are host numpy.
    """
    import os
    import pickle

    import numpy as np

    os.makedirs(cache_dir, exist_ok=True)
    v = np.asarray(valid)
    payload = {
        "aug_bboxes": np.asarray(boxes)[v].astype(np.float32),
        "aug_scores": np.asarray(scores)[v].astype(np.float32),
        "aug_labels": np.asarray(labels)[v].astype(np.int32),
    }
    with open(
        os.path.join(cache_dir, f"sampleidx_{sample_idx}.pkl"), "wb"
    ) as f:
        pickle.dump(payload, f)


def load_ensemble(folders: Sequence[str], sample_idx, pad_to: int):
    """Concatenate cached TTA candidates from several model folders and
    pad to a fixed count (jit-friendly). Returns (boxes (P, box_dim),
    scores (P,), labels (P,), valid (P,)) numpy arrays.

    Counterpart of the reference's ensemble branch
    (merge_augs.py:35-57): each folder is one model's dump from
    ``dump_aug_cache``; missing files raise.
    """
    import os
    import pickle

    import numpy as np

    bs, ss, ls = [], [], []
    for folder in folders:
        with open(
            os.path.join(folder, f"sampleidx_{sample_idx}.pkl"), "rb"
        ) as f:
            t = pickle.load(f)
        bs.append(t["aug_bboxes"])
        ss.append(t["aug_scores"])
        ls.append(t["aug_labels"])
    boxes = np.concatenate(bs, 0)
    scores = np.concatenate(ss, 0)
    labels = np.concatenate(ls, 0)
    n = len(scores)
    if n > pad_to:
        keep = np.argsort(-scores)[:pad_to]
        boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
        n = pad_to
    pad = pad_to - n
    boxes = np.pad(boxes, ((0, pad), (0, 0)))
    scores = np.pad(scores, (0, pad))
    labels = np.pad(labels, (0, pad))
    valid = np.arange(pad_to) < n
    return boxes, scores, labels, valid


def tta_augs(tta_cfg: dict):
    """Expand a config 'tta' dict into (scale, flip_h, flip_v) passes
    (reference MultiScaleFlipAug3D: pts_scale_ratio x double-flip,
    FocalFormer3D_LC_TTA.py:84-96)."""
    scales = tuple(tta_cfg.get("pts_scale_ratio", (1.0,)))
    flips = [(False, False)]
    if tta_cfg.get("flip_horizontal", True):
        flips.append((True, False))
    if tta_cfg.get("flip_vertical", True):
        flips.append((False, True))
    if len(flips) == 3:
        flips.append((True, True))
    return [(s, fh, fv) for s in scales for fh, fv in flips]
