import numpy as np
import jax
import jax.numpy as jnp
import pytest

from focalformer3d_tpu.core import assigner, box_coder, boxes, gaussian, hungarian, iou, losses, nms


def rand_boxes(rng, n, code_size=9):
    out = np.zeros((n, code_size), np.float32)
    out[:, 0:2] = rng.uniform(-20, 20, (n, 2))
    out[:, 2] = rng.uniform(-3, 1, n)
    out[:, 3:6] = rng.uniform(0.5, 6.0, (n, 3))
    out[:, 6] = rng.uniform(-np.pi, np.pi, n)
    if code_size > 7:
        out[:, 7:9] = rng.uniform(-5, 5, (n, 2))
    return out


class TestBoxes:
    def test_gravity_center(self):
        b = jnp.array([[1.0, 2.0, -1.0, 2.0, 2.0, 4.0, 0.0]])
        gc = boxes.gravity_center(b)
        np.testing.assert_allclose(gc, [[1.0, 2.0, 1.0]])

    def test_bev_corners_axis_aligned(self):
        b = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.0, 0.0]])
        c = np.asarray(boxes.bev_corners(b))[0]
        expected = {(2.0, 1.0), (-2.0, 1.0), (-2.0, -1.0), (2.0, -1.0)}
        got = {tuple(np.round(p, 5)) for p in c}
        assert got == expected

    def test_corners_rotation_90(self):
        b = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.0, np.pi / 2]])
        c = np.asarray(boxes.bev_corners(b))[0]
        # 90deg CCW: local +x maps to +y.
        got = {tuple(np.round(p, 5)) for p in c}
        expected = {(-1.0, 2.0), (-1.0, -2.0), (1.0, -2.0), (1.0, 2.0)}
        assert got == expected

    def test_points_in_boxes_bev(self):
        b = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.0, np.pi / 2]])
        pts = jnp.array([[[0.5, 1.5], [1.5, 0.5]]])
        m = np.asarray(boxes.points_in_boxes_bev(pts, b[None]))
        assert m[0, 0, 0] and not m[0, 1, 0]

    def test_flip_roundtrip(self):
        rng = np.random.RandomState(0)
        b = jnp.asarray(rand_boxes(rng, 10))
        b2 = boxes.flip_boxes(boxes.flip_boxes(b, "horizontal"), "horizontal")
        np.testing.assert_allclose(b[:, :6], b2[:, :6], atol=1e-5)
        np.testing.assert_allclose(np.sin(b[:, 6]), np.sin(b2[:, 6]), atol=1e-5)


class TestCoder:
    CFG = box_coder.BBoxCoderConfig(
        pc_range=(-54.0, -54.0), voxel_size=(0.075, 0.075), out_size_factor=8,
        post_center_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
        score_threshold=0.0, code_size=10)

    def test_roundtrip(self):
        rng = np.random.RandomState(1)
        b = jnp.asarray(rand_boxes(rng, 32, 9))
        enc = box_coder.encode(self.CFG, b)
        dec = box_coder.decode_box(
            self.CFG, enc[:, :2], enc[:, 2:3], enc[:, 3:6], enc[:, 6:8], enc[:, 8:10])
        np.testing.assert_allclose(np.asarray(dec)[:, :6], np.asarray(b)[:, :6], atol=2e-3)
        np.testing.assert_allclose(
            np.sin(np.asarray(dec)[:, 6]), np.sin(np.asarray(b)[:, 6]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dec)[:, 7:9], np.asarray(b)[:, 7:9], atol=1e-5)

    def test_decode_filter_mask(self):
        heat = jnp.array([[[0.9, 0.1], [0.2, 0.3]]])  # (1, 2 queries, 2 cls)
        center = jnp.array([[[90.0, 90.0], [100000.0, 0.0]]])
        height = jnp.zeros((1, 2, 1))
        dim = jnp.zeros((1, 2, 3))
        rot = jnp.concatenate([jnp.zeros((1, 2, 1)), jnp.ones((1, 2, 1))], -1)
        out = box_coder.decode(self.CFG, heat, center, height, dim, rot, None, apply_filter=True)
        m = np.asarray(out["mask"])[0]
        assert m[0] and not m[1]
        assert np.asarray(out["labels"])[0, 0] == 0


class TestIoU:
    def test_identical(self):
        b = jnp.array([[0, 0, 0, 4, 2, 1, 0.3]], jnp.float32)
        got = np.asarray(iou.boxes_iou_bev(b, b))
        np.testing.assert_allclose(got, [[1.0]], atol=1e-5)

    def test_aligned_overlap(self):
        b1 = jnp.array([[0, 0, 0, 2, 2, 1, 0.0]], jnp.float32)
        b2 = jnp.array([[1, 0, 0, 2, 2, 1, 0.0]], jnp.float32)
        got = np.asarray(iou.boxes_iou_bev(b1, b2))[0, 0]
        np.testing.assert_allclose(got, 2.0 / 6.0, atol=1e-5)

    def test_rotated_45(self):
        # unit square vs itself rotated 45deg about the same center:
        # intersection is a regular octagon, area = 2*(sqrt(2)-1).
        b1 = jnp.array([[0, 0, 0, 1, 1, 1, 0.0]], jnp.float32)
        b2 = jnp.array([[0, 0, 0, 1, 1, 1, np.pi / 4]], jnp.float32)
        inter = np.asarray(iou.boxes_intersection_bev(b1, b2))[0, 0]
        np.testing.assert_allclose(inter, 2 * (np.sqrt(2) - 1), atol=1e-4)

    def test_disjoint(self):
        b1 = jnp.array([[0, 0, 0, 2, 2, 1, 0.4]], jnp.float32)
        b2 = jnp.array([[10, 10, 0, 2, 2, 1, 1.2]], jnp.float32)
        got = np.asarray(iou.boxes_iou_bev(b1, b2))
        np.testing.assert_allclose(got, [[0.0]], atol=1e-6)

    def test_monte_carlo_agreement(self):
        rng = np.random.RandomState(3)
        b1 = rand_boxes(rng, 6)
        b2 = b1.copy()
        b2[:, 0:2] += rng.uniform(-2, 2, (6, 2))
        b2[:, 6] += rng.uniform(-0.8, 0.8, 6)
        got = np.asarray(iou.boxes_intersection_bev(jnp.asarray(b1), jnp.asarray(b2)))
        # Monte-Carlo oracle per diagonal pair.
        for i in range(6):
            lo = b1[i, :2] - 8
            pts = rng.uniform(0, 1, (200000, 2)) * 16 + lo
            m1 = np.asarray(boxes.points_in_boxes_bev(
                jnp.asarray(pts[None]), jnp.asarray(b1[i:i+1][None])))[0, :, 0]
            m2 = np.asarray(boxes.points_in_boxes_bev(
                jnp.asarray(pts[None]), jnp.asarray(b2[i:i+1][None])))[0, :, 0]
            mc = (m1 & m2).mean() * 16 * 16
            assert abs(got[i, i] - mc) < 0.25, (i, got[i, i], mc)

    def test_iou3d_z(self):
        b1 = jnp.array([[0, 0, 0.0, 2, 2, 2, 0.0]], jnp.float32)
        b2 = jnp.array([[0, 0, 1.0, 2, 2, 2, 0.0]], jnp.float32)
        got = np.asarray(iou.boxes_iou_3d(b1, b2))[0, 0]
        np.testing.assert_allclose(got, 4.0 / 12.0, atol=1e-5)


class TestNMS:
    def test_circle_nms(self):
        centers = jnp.array([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [0.0, 0.0]])
        scores = jnp.array([0.9, 0.8, 0.7, 0.1])
        valid = jnp.array([True, True, True, False])
        keep = np.asarray(nms.circle_nms(centers, scores, valid, radius=0.5))
        assert list(keep) == [True, False, True, False]

    def test_rotated_nms(self):
        b = jnp.array([
            [0, 0, 0, 4, 2, 1, 0.0],
            [0.2, 0, 0, 4, 2, 1, 0.05],
            [10, 10, 0, 4, 2, 1, 0.0],
        ], jnp.float32)
        scores = jnp.array([0.5, 0.9, 0.3])
        keep = np.asarray(nms.rotated_nms_bev(b, scores, jnp.ones(3, bool), 0.3))
        assert list(keep) == [False, True, True]


class TestGaussian:
    def test_radius_matches_reference_impl(self):
        # Oracle: direct transcription of the CornerNet formula.
        def oracle(h, w, mo):
            a1, b1, c1 = 1, h + w, w * h * (1 - mo) / (1 + mo)
            sq1 = np.sqrt(b1 ** 2 - 4 * a1 * c1); r1 = (b1 + sq1) / 2
            a2, b2, c2 = 4, 2 * (h + w), (1 - mo) * w * h
            sq2 = np.sqrt(b2 ** 2 - 4 * a2 * c2); r2 = (b2 + sq2) / 2
            a3, b3, c3 = 4 * mo, -2 * mo * (h + w), (mo - 1) * w * h
            sq3 = np.sqrt(b3 ** 2 - 4 * a3 * c3); r3 = (b3 + sq3) / 2
            return min(r1, r2, r3)
        for h, w in [(3.0, 5.0), (10.0, 2.0), (7.7, 7.7)]:
            got = float(gaussian.gaussian_radius((jnp.float32(h), jnp.float32(w)), 0.1))
            assert abs(got - oracle(h, w, 0.1)) < 1e-3

    def test_heatmap_peak(self):
        hm = gaussian.heatmap_targets(
            gt_boxes=jnp.array([[0.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.2]]),
            gt_labels=jnp.array([2]),
            gt_valid=jnp.array([True]),
            num_classes=3,
            pc_range=np.array([-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]),
            voxel_size=np.array([0.075, 0.075, 0.2]),
            out_size_factor=8,
            feature_size=(180, 180),
        )
        hm = np.asarray(hm)
        assert hm.shape == (3, 180, 180)
        assert hm[2, 90, 90] == 1.0
        assert hm[0].max() == 0.0 and hm[1].max() == 0.0
        assert 0 < hm[2, 90, 91] < 1.0

    def test_multiple_gts_max_combine(self):
        hm = gaussian.heatmap_targets(
            gt_boxes=jnp.array([[0.0, 0.0, -1, 4, 2, 1.5, 0.0],
                                [0.3, 0.0, -1, 4, 2, 1.5, 0.0]]),
            gt_labels=jnp.array([0, 0]),
            gt_valid=jnp.array([True, True]),
            num_classes=1,
            pc_range=np.array([-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]),
            voxel_size=np.array([0.075, 0.075, 0.2]),
            out_size_factor=8,
            feature_size=(180, 180),
        )
        assert float(jnp.max(hm)) == 1.0


class TestHungarian:
    def test_auction_matches_scipy_cost(self):
        from scipy.optimize import linear_sum_assignment
        rng = np.random.RandomState(0)
        for trial in range(5):
            Q, G = 40, 12
            cost = rng.uniform(0, 10, (Q, G)).astype(np.float32)
            row_valid = np.ones(Q, bool)
            col_valid = np.ones(G, bool)
            got = np.asarray(hungarian.assign(
                jnp.asarray(cost), jnp.asarray(row_valid), jnp.asarray(col_valid),
                method="auction"))
            r, c = linear_sum_assignment(cost)
            opt = cost[r, c].sum()
            matched = got >= 0
            assert matched.sum() == G
            assert len(np.unique(got[matched])) == G
            achieved = cost[np.arange(Q)[matched], got[matched]].sum()
            assert achieved <= opt + 0.05 * abs(opt) + 1e-3, (trial, achieved, opt)

    def test_padded_columns_ignored(self):
        Q, G = 10, 6
        rng = np.random.RandomState(2)
        cost = rng.uniform(0, 5, (Q, G)).astype(np.float32)
        cost[:, 4:] = hungarian.BIG_COST
        col_valid = np.array([1, 1, 1, 1, 0, 0], bool)
        got = np.asarray(hungarian.assign(
            jnp.asarray(cost), jnp.ones(Q, bool), jnp.asarray(col_valid), method="auction"))
        assert (got < 4).all()
        assert (got >= 0).sum() == 4

    def test_scipy_backend(self):
        rng = np.random.RandomState(4)
        cost = rng.uniform(0, 5, (8, 3)).astype(np.float32)
        got = np.asarray(hungarian.assign(
            jnp.asarray(cost), jnp.ones(8, bool), jnp.ones(3, bool), method="scipy"))
        from scipy.optimize import linear_sum_assignment
        r, c = linear_sum_assignment(cost)
        exp = np.full(8, -1, np.int32)
        exp[r] = c
        np.testing.assert_array_equal(got, exp)


class TestAssigner:
    def test_assignment_prefers_overlapping(self):
        rng = np.random.RandomState(0)
        gt = rand_boxes(rng, 4)
        # queries: exact copies of gts + far-away noise
        q = np.concatenate([gt, rand_boxes(rng, 12) + np.array([100.0] + [0] * 8)], 0)
        C = 10
        logits = np.full((16, C), -4.0, np.float32)
        labels = np.array([1, 3, 5, 7], np.int32)
        for i, l in enumerate(labels):
            logits[i, l] = 4.0
        res = assigner.hungarian_assign_3d(
            assigner.AssignerConfig(),
            jnp.asarray(q), jnp.asarray(logits),
            jnp.asarray(gt), jnp.asarray(labels), jnp.ones(4, bool),
            pc_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 3.0),
        )
        a = np.asarray(res["assigned_gt"])
        np.testing.assert_array_equal(a[:4], [0, 1, 2, 3])
        assert (a[4:] == -1).all()
        assert np.asarray(res["max_overlaps"])[:4].min() > 0.99

    def test_gt_center_limit(self):
        q = jnp.asarray(np.array([[0, 0, 0, 1, 1, 1, 0, 0, 0],
                                  [9, 0, 0, 1, 1, 1, 0, 0, 0]], np.float32))
        gt = jnp.asarray(np.array([[0.1, 0, 0, 1, 1, 1, 0, 0, 0],
                                   [0.2, 0.1, 0, 1, 1, 1, 0, 0, 0]], np.float32))
        assigned = jnp.array([0, 1])
        out = np.asarray(assigner.apply_gt_center_limit(assigned, q, gt, limit=5.0))
        np.testing.assert_array_equal(out, [0, -1])


class TestLosses:
    def test_focal_loss_zero_when_confident(self):
        logits = jnp.array([[10.0, -10.0], [-10.0, -10.0]])
        labels = jnp.array([0, 2])  # second is background (C=2)
        loss = losses.sigmoid_focal_loss(logits, labels, avg_factor=1.0)
        assert float(loss) < 1e-3

    def test_gaussian_focal(self):
        pred = jnp.array([[0.9999, 0.0001]])
        tgt = jnp.array([[1.0, 0.0]])
        loss = losses.gaussian_focal_loss(pred, tgt, avg_factor=1.0)
        assert float(loss) < 1e-3

    def test_l1_weighted(self):
        loss = losses.l1_loss(jnp.array([1.0, 2.0]), jnp.array([0.0, 0.0]),
                              weights=jnp.array([1.0, 0.0]), avg_factor=2.0)
        np.testing.assert_allclose(float(loss), 0.5)


class TestHeuristicAssigner:
    def test_class_aware_nearest(self):
        import jax.numpy as jnp
        from focalformer3d_tpu.core.assigner import heuristic_assign_3d

        pred_c = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [50.0, 50.0]])
        pred_l = jnp.asarray([0, 1, 0], jnp.int32)
        gt_c = jnp.asarray([[1.0, 0.0], [9.0, 0.0]])
        gt_l = jnp.asarray([0, 1], jnp.int32)
        gt_v = jnp.asarray([True, True])
        out = np.asarray(
            heuristic_assign_3d(pred_c, pred_l, gt_c, gt_l, gt_v)
        )
        # pred0 (cls0) -> gt0; pred1 (cls1) -> gt1; pred2 too far -> -1
        np.testing.assert_array_equal(out, [0, 1, -1])


def test_nuscenes_calc_ap_matches_devkit_definition():
    """Validate the internal evaluator's AP against hand-computed values
    from the devkit calc_ap definition (101-pt interp, 0.1 recall and
    precision clips) on a canned prediction set (VERDICT item 5)."""
    from focalformer3d_tpu.core.eval_nuscenes import accumulate_class

    # 3 GT boxes; 4 preds: 2 TPs (d<2m), 1 FP, then 1 more TP.
    def b(x):
        return np.array([x, 0.0, 0, 2, 2, 2, 0, 0, 0], np.float64)

    gts = [{"sample": "s0", "box": b(0.0)},
           {"sample": "s0", "box": b(10.0)},
           {"sample": "s0", "box": b(20.0)}]
    preds = [
        {"sample": "s0", "box": b(0.5), "score": 0.9},
        {"sample": "s0", "box": b(10.5), "score": 0.8},
        {"sample": "s0", "box": b(40.0), "score": 0.7},
        {"sample": "s0", "box": b(20.5), "score": 0.6},
    ]
    r = accumulate_class(preds, gts, dist_th=2.0)
    # ranking: TP TP FP TP -> rec [1/3, 2/3, 2/3, 1], prec [1, 1, 2/3, 3/4]
    # devkit AP: interp precision on the 101-pt recall grid, drop
    # recall <= 0.1, subtract 0.1 precision floor, /0.9.
    rec = np.array([1 / 3, 2 / 3, 2 / 3, 1.0])
    prec = np.array([1.0, 1.0, 2 / 3, 3 / 4])
    grid = np.linspace(0, 1, 101)
    prec_i = np.interp(grid, rec, prec, right=0)
    expected = float(np.maximum(prec_i[11:] - 0.1, 0).mean() / 0.9)
    assert abs(r["ap"] - expected) < 1e-9
    # sanity: a perfect single-box case gives AP = 1
    gts1 = [{"sample": "s0", "box": b(0.0)}]
    preds1 = [{"sample": "s0", "box": b(0.1), "score": 0.9}]
    assert abs(accumulate_class(preds1, gts1, 2.0)["ap"] - 1.0) < 1e-9


@pytest.mark.slow
def test_auction_vs_scipy_realistic_scale():
    """Bound the device auction's suboptimality on PRODUCTION-SHAPED cost
    matrices (VERDICT r2 weak 6): Q=200 proposals vs up to 96 padded GTs
    (3 denoising groups x 32), costs from the real focal-cls/BEV-L1/IoU3D
    composition on noisy-copy predictions — the mid-training regime where
    assignments drive loss targets. The auction must stay within 1% total
    matched cost of scipy's optimum and agree on >= 90% of matched
    queries across seeds."""
    from scipy.optimize import linear_sum_assignment

    from focalformer3d_tpu.core import assigner as asn
    from focalformer3d_tpu.core import hungarian, iou, losses

    pc_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    cfg = asn.AssignerConfig()
    Q, Gpad, C = 200, 96, 10
    gaps, agrees = [], []
    for seed in range(10):
        rng = np.random.RandomState(seed)
        G = rng.randint(20, 60)
        gt = np.zeros((Gpad, 9), np.float32)
        gt[:G, :2] = rng.uniform(-50, 50, (G, 2))
        gt[:G, 2] = rng.uniform(-2, 0.5, G)
        gt[:G, 3:6] = rng.uniform(0.5, 4.0, (G, 3))
        gt[:G, 6] = rng.uniform(-np.pi, np.pi, G)
        gt_labels = rng.randint(0, C, Gpad).astype(np.int32)
        gt_valid = np.arange(Gpad) < G
        # predictions: noisy copies of GTs (matched candidates) + clutter
        pred = np.zeros((Q, 9), np.float32)
        ncopy = min(Q // 2, G * 2)
        src = rng.randint(0, G, ncopy)
        pred[:ncopy] = gt[src] + rng.randn(ncopy, 9).astype(np.float32) * 0.3
        pred[ncopy:, :2] = rng.uniform(-54, 54, (Q - ncopy, 2))
        pred[ncopy:, 3:6] = rng.uniform(0.5, 4.0, (Q - ncopy, 3))
        logits = rng.randn(Q, C).astype(np.float32) * 2 - 2
        logits[np.arange(ncopy), gt_labels[src]] += 4  # confident matches

        cls_cost = losses.focal_loss_cost(
            jnp.asarray(logits), jnp.asarray(gt_labels),
            cfg.cls_gamma, cfg.cls_alpha, cfg.cls_weight)
        reg_cost = losses.bbox_bev_l1_cost(
            jnp.asarray(pred), jnp.asarray(gt), pc_range, cfg.reg_weight)
        iou_cost = -iou.boxes_iou_3d(
            jnp.asarray(pred), jnp.asarray(gt)) * cfg.iou_weight
        cost = np.asarray(cls_cost + reg_cost + iou_cost)
        cost_m = np.where(gt_valid[None, :], cost, hungarian.BIG_COST)

        got = np.asarray(hungarian.assign(
            jnp.asarray(cost_m), jnp.ones(Q, bool), jnp.asarray(gt_valid),
            method="auction"))
        r, c = linear_sum_assignment(cost_m[:, :G])
        opt = cost_m[r, c].sum()
        matched = got >= 0
        assert matched.sum() == G
        achieved = cost_m[np.arange(Q)[matched], got[matched]].sum()
        gaps.append((achieved - opt) / max(abs(opt), 1e-6))
        ref = np.full(Q, -1, np.int64)
        ref[r] = c
        agrees.append((got[matched] == ref[matched]).mean())
    assert max(gaps) <= 0.01, gaps
    assert np.mean(agrees) >= 0.90, agrees
