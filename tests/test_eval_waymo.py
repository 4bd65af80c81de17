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


def test_iou3d_matrix_matches_jax_oracle():
    """NumPy vectorized rotated-IoU vs the device core.iou implementation."""
    import jax.numpy as jnp

    from focalformer3d_tpu.core.iou import boxes_iou_3d

    rng = np.random.RandomState(3)
    p = np.concatenate([
        rng.uniform(-5, 5, (12, 2)), rng.uniform(-1, 1, (12, 1)),
        rng.uniform(0.5, 4, (12, 3)), rng.uniform(-np.pi, np.pi, (12, 1)),
    ], axis=1)
    g = np.concatenate([
        rng.uniform(-5, 5, (9, 2)), rng.uniform(-1, 1, (9, 1)),
        rng.uniform(0.5, 4, (9, 3)), rng.uniform(-np.pi, np.pi, (9, 1)),
    ], axis=1)
    got = ew.iou3d_matrix(p, g)
    # boxes_iou_3d also takes bottom-z boxes (mmdet3d LiDAR convention)
    want = np.asarray(boxes_iou_3d(jnp.asarray(p), jnp.asarray(g)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_missing_l2_only_key_with_mixed_classes():
    """gt without 'l2_only' plus boxes of another class must not raise
    (regression: default had gm.sum() length, indexed by a len(labels)
    mask)."""
    preds = {"t0": {
        "boxes": np.asarray([_box(0, 0)], np.float64),
        "scores": np.asarray([0.9]),
        "labels": np.asarray([0], np.int32),
    }}
    gts = {"t0": {
        "boxes": np.asarray([_box(0, 0), _box(5, 5)], np.float64),
        "labels": np.asarray([0, 1], np.int32),  # one Car, one Pedestrian
    }}
    m = ew.evaluate_detections(preds, gts, CLASSES)
    assert abs(m["L2/Car_AP"] - 1.0) < 1e-6


def test_three_frame_hand_computed_ap():
    """3-frame scenario with hand-computed AP/APH at both levels.

    Frame A: 1 L1 gt, matched by pred s=0.9 with 90-deg heading error.
    Frame B: 1 L2-only gt, matched by pred s=0.8 (exact heading).
    Frame C: 1 L1 gt, missed; plus an FP pred s=0.7.
    L2 (all 3 gt counted): ranked rows: (0.9 TP), (0.8 TP), (0.7 FP).
      precision at recalls 1/3, 2/3: 1.0, 1.0; max recall 2/3.
      AP = 67/101 * 1 + ... 101-pt: thresholds t <= 2/3 give max prec 1.
      t in {0, .01, ..., .66} -> 67 points of 1.0 => AP = 67/101.
      APH rows: hacc 0.5, 1.0 in rank order; cumulative (0.5, 1.5)/(1,2)
      -> prec_h (0.5, 0.75); for t <= 1/3: max 0.75; t in (1/3, 2/3]: 0.75.
      => APH = 67/101 * 0.75.
    L1 (2 counted gt: A and C): rows: (0.9 TP h=0.5), frame-B pred
      matches an uncounted gt -> ignored, (0.7 FP).
      recall hits 1/2; precisions: 1.0 then 0.5 at the FP.
      AP = 51/101 * 1.0; APH = 51/101 * 0.5.
    """
    sq = dict(dx=2.0, dy=2.0)
    preds = {
        "a": {"boxes": np.asarray([_box(0, 0, yaw=np.pi / 2, **sq)]),
              "scores": np.asarray([0.9]), "labels": np.asarray([0])},
        "b": {"boxes": np.asarray([_box(0, 0, **sq)]),
              "scores": np.asarray([0.8]), "labels": np.asarray([0])},
        "c": {"boxes": np.asarray([_box(50, 50, **sq)]),
              "scores": np.asarray([0.7]), "labels": np.asarray([0])},
    }
    gts = {
        "a": {"boxes": np.asarray([_box(0, 0, **sq)]),
              "labels": np.asarray([0]), "l2_only": np.asarray([False])},
        "b": {"boxes": np.asarray([_box(0, 0, **sq)]),
              "labels": np.asarray([0]), "l2_only": np.asarray([True])},
        "c": {"boxes": np.asarray([_box(10, 0, **sq)]),
              "labels": np.asarray([0]), "l2_only": np.asarray([False])},
    }
    m = ew.evaluate_detections(preds, gts, ("Car",))
    assert abs(m["L2/Car_AP"] - 67 / 101) < 1e-9
    assert abs(m["L2/Car_APH"] - 67 / 101 * 0.75) < 1e-9
    assert abs(m["L1/Car_AP"] - 51 / 101) < 1e-9
    assert abs(m["L1/Car_APH"] - 51 / 101 * 0.5) < 1e-9


def test_l1_l2_split_semantics():
    """data/waymo.py pins LEVEL_2 to (difficulty >= 2) OR (points <= 5):
    exactly-5-point boxes are L2-only (official definition)."""
    diff = np.asarray([0, 2, 0, 0, 1], np.int32)
    npts = np.asarray([100, 100, 5, 6, 4], np.int32)
    l2 = (diff >= 2) | (npts <= 5)
    np.testing.assert_array_equal(
        l2, [False, True, True, False, True]
    )


def test_optimal_assignment_beats_greedy_crossing():
    """The official Hungarian matcher's signature case: a high-score
    prediction overlaps TWO ground truths and greedily grabs the one the
    lower-score prediction needs. Greedy score-order matching yields
    1 TP + 1 FP; the optimal assignment pairs both (2 TP) and AP = 1.

    Geometry (axis-aligned 4x2 boxes, IoU thresh 0.7 for Car):
      gt A at x=0, gt B at x=0.8
      pred P1 (score .9) at x=0.4  -> IoU(A)=0.75 < IoU(B)=0.79... pick
      shapes so P1's best is A while P2 only overlaps A.
    """
    # gt A at 0, gt B at 1.0; P1 at 0.5 overlaps both (closer to A via
    # a slight offset), P2 at -0.1 overlaps only A above threshold.
    def iou_1d_pair(x1, x2, dx=4.0):
        inter = max(0.0, dx - abs(x1 - x2))
        return inter / (2 * dx - inter)

    # verify the construction overlaps as intended
    assert iou_1d_pair(0.45, 0.0) > 0.7  # P1-A
    assert iou_1d_pair(0.45, 1.0) > 0.7  # P1-B
    assert iou_1d_pair(-0.35, 0.0) > 0.7  # P2-A
    assert iou_1d_pair(-0.35, 1.0) < 0.7  # P2-B below threshold
    assert iou_1d_pair(0.45, 0.0) > iou_1d_pair(0.45, 1.0)  # greedy bait

    preds, gts = _frame(
        [_box(0.45, 0), _box(-0.35, 0)], [0.9, 0.8], [0, 0],
        [_box(0, 0), _box(1.0, 0)], [0, 0],
    )
    m = ew.evaluate_detections(preds, gts, CLASSES)
    # greedy: P1 takes A (its argmax), P2 finds B below threshold -> FP;
    # optimal: P1-B + P2-A both above threshold -> perfect AP
    assert abs(m["L2/Car_AP"] - 1.0) < 1e-6


def test_match_optimal_max_iou_sum():
    """_match_optimal maximizes summed IoU over eligible pairs."""
    iou = np.array([[0.9, 0.75], [0.8, 0.0]])
    ri, ci = ew._match_optimal(iou, 0.7)
    pairs = set(zip(ri.tolist(), ci.tolist()))
    # row0->col1 + row1->col0 (0.75+0.8) beats row0->col0 alone (0.9)
    assert pairs == {(0, 1), (1, 0)}
    # ineligible pairs are never returned
    iou = np.array([[0.6, 0.5]])
    ri, ci = ew._match_optimal(iou, 0.7)
    assert len(ri) == 0
