"""Waymo Open Dataset detection metrics: L1/L2 mAP and mAPH (host side).

Self-contained NumPy re-implementation of the metric the reference
computes through the Waymo-provided binary (`dataset.evaluate` with
``--eval waymo``, /root/reference/tools/test.py:120-121,245-254):

- per-class AP over a precision/recall curve built by greedy score-order
  matching with 3D IoU thresholds 0.7 (Vehicle/Car) and 0.5
  (Pedestrian/Cyclist);
- APH: each true positive's contribution is weighted by heading accuracy
  ``max(0, 1 - |Δyaw|_wrapped / π)``;
- difficulty split: LEVEL_1 evaluates only L1 ground truth (annotated
  difficulty < 2 and ≥ 5 points in box) — predictions matching L2-only
  boxes are ignored (neither TP nor FP); LEVEL_2 evaluates all boxes.

AP integration uses 101-point interpolated precision (the official tool
integrates a step-interpolated P/R curve on a fine score grid; on the
same matching this differs by well under the run-to-run noise of the
model itself, and the matching/weighting semantics above are what the
parity claim rests on).

Box layout: [x, y, z(bottom), dx, dy, dz, yaw] LiDAR frame (KITTI-style
mmdet3d convention used by data/waymo.py).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

IOU_THRESH = {"Car": 0.7, "Vehicle": 0.7, "Pedestrian": 0.5,
              "Cyclist": 0.5, "Sign": 0.5}


def _iou3d(pred: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """(7,) vs (G, 7) axis-aligned-in-z rotated-BEV 3D IoU."""
    import jax.numpy as jnp

    from .iou import boxes_iou_3d

    if len(gts) == 0:
        return np.zeros((0,), np.float32)
    # boxes_iou_3d expects gravity-center z
    p = pred.copy()
    p[2] += p[5] / 2
    g = gts.copy()
    g[:, 2] += g[:, 5] / 2
    return np.asarray(
        boxes_iou_3d(jnp.asarray(p[None, :7]), jnp.asarray(g[:, :7]))
    )[0]


def _heading_acc(a: float, b: float) -> float:
    d = abs(a - b) % (2 * np.pi)
    d = min(d, 2 * np.pi - d)
    return max(0.0, 1.0 - d / np.pi)


def accumulate_class(
    preds: List[dict],  # per frame {boxes (P,7+), scores (P,), ...}
    gts: List[dict],  # per frame {boxes (G,7+), l2_only (G,) bool}
    iou_thresh: float,
    level: int,
) -> Dict[str, float]:
    """Match one class over all frames; returns AP and APH."""
    rows = []  # (score, is_tp, heading_acc, ignored)
    n_gt = 0
    for pred, gt in zip(preds, gts):
        gb = np.asarray(gt["boxes"], np.float64)
        gboxes = gb.reshape(len(gb), -1)[:, :7] \
            if len(gb) else np.zeros((0, 7))
        l2only = np.asarray(
            gt.get("l2_only", np.zeros(len(gboxes), bool)), bool
        )
        if level == 1:
            counted = ~l2only
        else:
            counted = np.ones(len(gboxes), bool)
        n_gt += int(counted.sum())
        order = np.argsort(-np.asarray(pred["scores"]))
        taken = np.zeros(len(gboxes), bool)
        for i in order:
            box = np.asarray(pred["boxes"][i], np.float64)[:7]
            score = float(pred["scores"][i])
            ious = _iou3d(box, gboxes)
            ious = np.where(taken, -1.0, ious)
            j = int(np.argmax(ious)) if len(ious) else -1
            if j >= 0 and ious[j] >= iou_thresh:
                taken[j] = True
                if counted[j]:
                    h = _heading_acc(float(box[6]), float(gboxes[j, 6]))
                    rows.append((score, 1.0, h, False))
                else:
                    rows.append((score, 0.0, 0.0, True))  # ignored match
            else:
                rows.append((score, 0.0, 0.0, False))
    if n_gt == 0 or not rows:
        return {"ap": 0.0, "aph": 0.0, "n_gt": n_gt}
    rows.sort(key=lambda r: -r[0])
    tp = np.array([r[1] for r in rows if not r[3]])
    hacc = np.array([r[2] for r in rows if not r[3]])
    if len(tp) == 0:
        return {"ap": 0.0, "aph": 0.0, "n_gt": n_gt}
    ctp = np.cumsum(tp)
    chtp = np.cumsum(tp * hacc)
    npred = np.arange(1, len(tp) + 1)
    recall = ctp / n_gt
    prec = ctp / npred
    prec_h = chtp / npred

    def interp_ap(rec, pr):
        ap = 0.0
        for t in np.linspace(0, 1, 101):
            m = rec >= t
            ap += (np.max(pr[m]) if m.any() else 0.0) / 101
        return float(ap)

    return {
        "ap": interp_ap(recall, prec),
        "aph": interp_ap(recall, prec_h),
        "n_gt": n_gt,
    }


def evaluate_detections(
    predictions: Dict[str, dict],  # token -> {boxes, scores, labels}
    gt: Dict[str, dict],  # token -> {boxes, labels, l2_only}
    class_names: Sequence[str],
) -> Dict[str, float]:
    """Waymo L1/L2 mAP/mAPH over all classes. Tokens must align."""
    out: Dict[str, float] = {}
    for level in (1, 2):
        aps, aphs = [], []
        for ci, cname in enumerate(class_names):
            preds, gts = [], []
            for token, p in predictions.items():
                lm = np.asarray(p["labels"]) == ci
                pb = np.asarray(p["boxes"])
                preds.append({
                    "boxes": pb.reshape(len(pb), -1)[lm]
                    if len(pb) else np.zeros((0, 9)),
                    "scores": np.asarray(p["scores"])[lm],
                })
                g = gt[token]
                gm = np.asarray(g["labels"]) == ci
                ggb = np.asarray(g["boxes"])
                gts.append({
                    "boxes": ggb.reshape(len(ggb), -1)[gm]
                    if len(ggb) else np.zeros((0, 9)),
                    "l2_only": np.asarray(
                        g.get("l2_only", np.zeros(int(gm.sum()), bool))
                    )[gm] if len(ggb) else np.zeros(0, bool),
                })
            r = accumulate_class(
                preds, gts, IOU_THRESH.get(cname, 0.5), level
            )
            out[f"L{level}/{cname}_AP"] = r["ap"]
            out[f"L{level}/{cname}_APH"] = r["aph"]
            aps.append(r["ap"])
            aphs.append(r["aph"])
        out[f"L{level}/mAP"] = float(np.mean(aps)) if aps else 0.0
        out[f"L{level}/mAPH"] = float(np.mean(aphs)) if aphs else 0.0
    return out
