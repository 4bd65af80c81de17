"""Unit tests for the Waymo L1/L2 mAP/mAPH evaluator."""
import numpy as np

from focalformer3d_tpu.core import eval_waymo as ew


def _box(x, y, yaw=0.0, dx=4.0, dy=2.0, dz=1.5):
    return [x, y, 0.0, dx, dy, dz, yaw, 0.0, 0.0]


def _frame(pred_boxes, scores, labels, gt_boxes, gt_labels, l2=None):
    preds = {
        "t0": {
            "boxes": np.asarray(pred_boxes, np.float64),
            "scores": np.asarray(scores, np.float64),
            "labels": np.asarray(labels, np.int32),
        }
    }
    gts = {
        "t0": {
            "boxes": np.asarray(gt_boxes, np.float64),
            "labels": np.asarray(gt_labels, np.int32),
            "l2_only": np.asarray(
                l2 if l2 is not None else [False] * len(gt_boxes), bool
            ),
        }
    }
    return preds, gts


CLASSES = ("Car", "Pedestrian", "Cyclist")


def test_perfect_predictions():
    preds, gts = _frame(
        [_box(0, 0), _box(10, 0)], [0.9, 0.8], [0, 0],
        [_box(0, 0), _box(10, 0)], [0, 0],
    )
    m = ew.evaluate_detections(preds, gts, CLASSES)
    assert abs(m["L2/Car_AP"] - 1.0) < 1e-6
    assert abs(m["L2/Car_APH"] - 1.0) < 1e-6
    assert m["L2/mAP"] == m["L2/Car_AP"] / 3  # other classes empty


def test_heading_error_hits_aph_not_ap():
    preds, gts = _frame(
        [_box(0, 0, yaw=np.pi)], [0.9], [0],
        [_box(0, 0, yaw=0.0)], [0],
    )
    m = ew.evaluate_detections(preds, gts, CLASSES)
    assert abs(m["L2/Car_AP"] - 1.0) < 1e-6
    assert m["L2/Car_APH"] < 1e-6  # heading off by pi -> zero weight
    # 90 degrees -> half weight (square box keeps IoU = 1)
    preds, gts = _frame(
        [_box(0, 0, yaw=np.pi / 2, dx=2.0, dy=2.0)], [0.9], [0],
        [_box(0, 0, yaw=0.0, dx=2.0, dy=2.0)], [0],
    )
    m = ew.evaluate_detections(preds, gts, CLASSES)
    assert abs(m["L2/Car_APH"] - 0.5) < 0.01


def test_false_positive_lowers_ap():
    preds, gts = _frame(
        [_box(0, 0), _box(50, 50)], [0.8, 0.9], [0, 0],
        [_box(0, 0)], [0],
    )
    m = ew.evaluate_detections(preds, gts, CLASSES)
    # high-scoring FP first: precision at full recall = 1/2
    assert 0.45 < m["L2/Car_AP"] < 0.55


def test_l2_only_gt_ignored_in_l1():
    preds, gts = _frame(
        [_box(0, 0), _box(10, 0)], [0.9, 0.8], [0, 0],
        [_box(0, 0), _box(10, 0)], [0, 0],
        l2=[False, True],
    )
    m = ew.evaluate_detections(preds, gts, CLASSES)
    # L1: one counted GT, its pred matches; the other pred matches an
    # L2-only box -> ignored, not an FP
    assert abs(m["L1/Car_AP"] - 1.0) < 1e-6
    assert abs(m["L2/Car_AP"] - 1.0) < 1e-6


def test_iou_threshold_per_class():
    # a pedestrian box offset enough for IoU ~0.45: counts at 0.5? no
    preds, gts = _frame(
        [_box(0.0, 0.45, dx=0.8, dy=0.8)], [0.9], [1],
        [_box(0, 0, dx=0.8, dy=0.8)], [1],
    )
    m = ew.evaluate_detections(preds, gts, CLASSES)
    assert m["L2/Pedestrian_AP"] < 1e-6
    preds, gts = _frame(
        [_box(0.0, 0.1, dx=0.8, dy=0.8)], [0.9], [1],
        [_box(0, 0, dx=0.8, dy=0.8)], [1],
    )
    m = ew.evaluate_detections(preds, gts, CLASSES)
    assert abs(m["L2/Pedestrian_AP"] - 1.0) < 1e-6
