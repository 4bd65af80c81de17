"""Data layer tests: transforms (aug-matrix recording), nuScenes info
reader, multisweep loading, CBGS, DB sampling, collation."""
import pickle

import numpy as np
import pytest

from focalformer3d_tpu.data import transforms as T
from focalformer3d_tpu.data import nuscenes as nusc
from focalformer3d_tpu.data.pipelines import (
    train_pipeline as make_train_pipeline,
    test_pipeline as make_test_pipeline,
)


def _sample(n=100, g=4, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-20, 20, (n, 5)).astype(np.float32)
    boxes = np.zeros((g, 9), np.float32)
    boxes[:, :2] = rng.uniform(-15, 15, (g, 2))
    boxes[:, 2] = -1.5
    boxes[:, 3:6] = rng.uniform(1, 4, (g, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, g)
    boxes[:, 7:9] = rng.uniform(-3, 3, (g, 2))
    names = np.array(["car", "truck", "pedestrian", "bus"][:g], object)
    return {
        "points": pts, "gt_boxes": boxes, "gt_names": names,
        "bev_aug": np.eye(4, dtype=np.float32),
    }


class TestBevAugMatrix:
    def test_rot_scale_trans_matrix_replays_points(self):
        """bev_aug must reproduce exactly the transform applied to points."""
        s = _sample()
        orig = s["points"][:, :3].copy()
        out = T.GlobalRotScaleTrans()(s, np.random.RandomState(1))
        M = out["bev_aug"]
        replay = orig @ M[:3, :3].T + M[:3, 3]
        np.testing.assert_allclose(out["points"][:, :3], replay, atol=1e-4)

    def test_flip_matrix_replays_points(self):
        s = _sample()
        orig = s["points"][:, :3].copy()
        out = T.RandomFlip3D(1.0, 1.0)(s, np.random.RandomState(2))
        M = out["bev_aug"]
        replay = orig @ M[:3, :3].T + M[:3, 3]
        np.testing.assert_allclose(out["points"][:, :3], replay, atol=1e-5)
        # both flips applied: x and y negated
        np.testing.assert_allclose(out["points"][:, 0], -orig[:, 0])
        np.testing.assert_allclose(out["points"][:, 1], -orig[:, 1])

    def test_boxes_follow_points(self):
        """A point at a box center must stay at the center after aug."""
        s = _sample()
        s["points"][0, :3] = s["gt_boxes"][0, :3]
        out = T.Compose([T.GlobalRotScaleTrans(), T.RandomFlip3D(1.0, 0.0)])(
            s, np.random.RandomState(3)
        )
        np.testing.assert_allclose(
            out["points"][0, :3], out["gt_boxes"][0, :3], atol=1e-4
        )

    def test_range_and_name_filters(self):
        s = _sample()
        s["gt_boxes"][0, 0] = 100.0  # out of range
        pcr = (-54, -54, -5, 54, 54, 3)
        out = T.ObjectRangeFilter(pcr)(s)
        assert len(out["gt_boxes"]) == 3
        out = T.ObjectNameFilter(["car", "truck"])(out)
        assert set(out["gt_names"]) <= {"car", "truck"}
        out = T.PointsRangeFilter(pcr)(out)
        p = out["points"]
        assert (np.abs(p[:, :2]) <= 54).all()


class TestImageTransforms:
    def test_image_aug_matrix_maps_pixels(self):
        """Track a bright pixel through resize+crop and check the recorded
        matrix maps its original position to its new one."""
        rng = np.random.RandomState(0)
        img = np.zeros((100, 160, 3), np.float32)
        img[40, 80] = 255.0
        aug = T.ImageAug3D(final_dim=(48, 64), resize_lim=(0.8, 0.8),
                           bot_pct_lim=(0.0, 0.0), rot_lim=(0.0, 0.0),
                           rand_flip=False, is_train=True)
        s = {"imgs": [img]}
        out = aug(s, rng)
        M = out["img_aug"][0]
        uv = M[:2, :2] @ np.array([80.0, 40.0]) + M[:2, 3]
        got = out["imgs"][0].sum(-1)
        if (got > 1).any():
            v, u = np.unravel_index(np.argmax(got), got.shape)
            assert abs(u - uv[0]) <= 2 and abs(v - uv[1]) <= 2, (
                (u, v), uv
            )

    def test_normalize_pad(self):
        img = np.full((30, 50, 3), 100.0, np.float32)
        s = {"imgs": [img]}
        s = T.NormalizeMultiviewImage((90.0,) * 3, (10.0,) * 3)(s)
        np.testing.assert_allclose(s["imgs"][0], 1.0)
        s = T.PadMultiViewImage(32)(s)
        assert s["imgs"][0].shape == (32, 64, 3)
        assert s["input_shape"] == (32, 64)

    def test_scale_image(self):
        img = np.zeros((100, 160, 3), np.float32)
        s = {"imgs": [img], "lidar2img": np.eye(4)[None]}
        s = T.ScaleImageMultiViewImage((80, 50))(s)
        assert s["imgs"][0].shape == (50, 80, 3)
        assert s["img_aug"][0][0, 0] == 0.5


def _write_fake_nuscenes(tmp_path, n_samples=4, n_sweeps=2):
    rng = np.random.RandomState(0)
    infos = []
    for i in range(n_samples):
        pts = rng.uniform(-30, 30, (500, 5)).astype(np.float32)
        lidar_path = tmp_path / f"lidar_{i}.bin"
        pts.tofile(lidar_path)
        sweeps = []
        for s in range(n_sweeps):
            sp = rng.uniform(-30, 30, (200, 5)).astype(np.float32)
            spath = tmp_path / f"sweep_{i}_{s}.bin"
            sp.tofile(spath)
            th = rng.uniform(-0.1, 0.1)
            sweeps.append({
                "data_path": str(spath),
                "sensor2lidar_rotation": np.array(
                    [[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0], [0, 0, 1]]
                ),
                "sensor2lidar_translation": rng.uniform(-1, 1, 3),
                "timestamp": 1e6 * (1000 + i) - 1e5 * (s + 1),
            })
        g = 3
        boxes = np.zeros((g, 7), np.float32)
        boxes[:, :2] = rng.uniform(-20, 20, (g, 2))
        boxes[:, 3:6] = rng.uniform(1, 4, (g, 3))
        names = ["car", "pedestrian", "bus"]
        infos.append({
            "token": f"tok{i}",
            "lidar_path": str(lidar_path),
            "sweeps": sweeps,
            "timestamp": 1e6 * (1000 + i),
            "gt_boxes": boxes,
            "gt_names": np.array(names, object),
            "gt_velocity": rng.uniform(-2, 2, (g, 2)),
            "num_lidar_pts": np.array([10, 8, 6]),
            "valid_flag": np.array([True, True, i % 2 == 0]),
        })
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "fake"}}, f)
    return pkl


class TestNuScenesDataset:
    def test_load_and_sample(self, tmp_path):
        pkl = _write_fake_nuscenes(tmp_path)
        ds = nusc.NuScenesDataset(
            str(pkl), pipeline=make_train_pipeline(
                (-54, -54, -5, 54, 54, 3), nusc.CLASS_NAMES
            ),
        )
        assert len(ds) == 4
        s = ds.get_sample(0, np.random.RandomState(0))
        assert s["points"].shape[1] == 5
        # sweeps concatenated: > 500 points before range filtering kicks some
        assert s["gt_boxes"].shape[1] == 9
        assert len(s["gt_boxes"]) == len(s["gt_names"])

    def test_valid_flag_filters_gts(self, tmp_path):
        pkl = _write_fake_nuscenes(tmp_path)
        ds = nusc.NuScenesDataset(str(pkl), pipeline=None)
        s1 = ds.get_sample(1)  # odd idx -> third gt invalid
        assert len(s1["gt_boxes"]) == 2

    def test_cbgs_balances(self, tmp_path):
        pkl = _write_fake_nuscenes(tmp_path)
        ds = nusc.NuScenesDataset(str(pkl), pipeline=None)
        idx = ds.cbgs_indices(np.random.RandomState(0))
        assert len(idx) > 0
        assert idx.max() < len(ds)

    def test_collate_fixed_shapes(self, tmp_path):
        pkl = _write_fake_nuscenes(tmp_path)
        ds = nusc.NuScenesDataset(
            str(pkl), pipeline=make_test_pipeline((-54, -54, -5, 54, 54, 3)),
            test_mode=False,
        )
        batch = nusc.collate(
            [ds.get_sample(i) for i in range(2)],
            max_points=2000, max_gts=16,
        )
        assert batch["points"].shape == (2, 2000, 5)
        assert batch["gt_boxes"].shape == (2, 16, 9)
        assert batch["bev_aug"].shape == (2, 4, 4)
        assert batch["points_mask"].any()
        assert batch["gt_valid"].sum() > 0

    def test_multisweep_time_dim(self, tmp_path):
        pkl = _write_fake_nuscenes(tmp_path)
        ds = nusc.NuScenesDataset(str(pkl), pipeline=None)
        s = ds.get_sample(0)
        tdim = s["points"][:, 4]
        assert (tdim[:500] == 0).all()  # key frame
        assert (tdim[500:] > 0).any()  # sweeps lag behind


class TestDBSampler:
    def test_sample_and_paste(self, tmp_path):
        rng = np.random.RandomState(0)
        dbinfos = {"car": [], "pedestrian": []}
        for i in range(5):
            pts = rng.uniform(-1, 1, (20, 5)).astype(np.float32)
            p = tmp_path / f"db_car_{i}.bin"
            pts.tofile(p)
            dbinfos["car"].append({
                "name": "car", "path": f"db_car_{i}.bin",
                "box3d_lidar": np.array(
                    [5.0 + 4 * i, 0, -1.5, 4, 2, 1.5, 0.3], np.float32
                ),
                "num_points_in_gt": 20, "difficulty": 0,
            })
        dbp = tmp_path / "dbinfos.pkl"
        with open(dbp, "wb") as f:
            pickle.dump(dbinfos, f)
        sampler = nusc.DBSampler(
            str(dbp), str(tmp_path), ["car", "pedestrian"],
            sample_groups={"car": 3},
            min_points={"car": 5},
        )
        s = _sample()
        s["gt_names"] = np.array(["truck"] * 4, object)
        s["gt_boxes"][:, :2] = 40.0  # move existing away from db boxes
        n_before = len(s["points"])
        out = nusc.ObjectSample(sampler)(s, rng)
        assert len(out["gt_boxes"]) > 4
        assert (out["gt_names"] == "car").sum() >= 1
        assert len(out["points"]) > 0

    def test_collision_rejection(self):
        a = np.array([[0, 0, 0, 4, 2, 1, 0.0, 0, 0]], np.float32)
        b = np.array([[1, 0, 0, 4, 2, 1, 0.5, 0, 0]], np.float32)
        c = np.array([[10, 10, 0, 4, 2, 1, 0.0, 0, 0]], np.float32)
        ca = nusc._rect_corners_bev(a)
        assert nusc._rects_collide(ca, nusc._rect_corners_bev(b)).all()
        assert not nusc._rects_collide(ca, nusc._rect_corners_bev(c)).any()

    def test_points_in_rbbox(self):
        boxes = np.array([[0, 0, -1, 4, 2, 2, np.pi / 2, 0, 0]], np.float32)
        pts = np.array([
            [0, 0, 0],  # inside (z in [-1, 1])
            [0, 1.5, 0],  # inside: box rotated 90deg -> dx along y
            [1.5, 0, 0],  # outside: width 2 -> |x| <= 1
            [0, 0, 2.0],  # above
        ], np.float32)
        m = nusc.points_in_rbbox(pts, boxes)[:, 0]
        np.testing.assert_array_equal(m, [True, True, False, False])


class TestGTDatabaseCreation:
    def test_create_and_sample_roundtrip(self, tmp_path):
        import sys
        sys.path.insert(0, "/root/repo/tools")
        from create_data import create_gt_database

        pkl = _write_fake_nuscenes(tmp_path)
        create_gt_database(str(pkl), str(tmp_path), str(tmp_path),
                           sweeps_num=0)
        dbp = tmp_path / "nuscenes_dbinfos_train.pkl"
        assert dbp.exists()
        with open(dbp, "rb") as f:
            db = pickle.load(f)
        assert set(db) <= {"car", "pedestrian", "bus"}
        # the generated db can drive the sampler
        sampler = nusc.DBSampler(
            str(dbp), str(tmp_path), nusc.CLASS_NAMES,
            sample_groups={"car": 2, "bus": 2},
            min_points={},
        )
        rng = np.random.RandomState(0)
        boxes, names, pts = sampler.sample(
            np.zeros((0, 9), np.float32), np.array([], object), rng
        )
        assert len(boxes) >= 1
        assert pts.shape[1] == 5


class TestResultFormatting:
    def test_quat_roundtrip(self):
        from focalformer3d_tpu.core.results import (
            mat_to_yaw, quat_to_mat, yaw_to_quat,
        )
        yaw = 0.73
        R = quat_to_mat(yaw_to_quat(yaw))
        assert abs(mat_to_yaw(R) - yaw) < 1e-9

    def test_lidar_to_global(self):
        from focalformer3d_tpu.core.results import boxes_lidar_to_global

        info = {
            "lidar2ego_rotation": [1.0, 0, 0, 0],
            "lidar2ego_translation": [1.0, 0, 2.0],
            "ego2global_rotation": [np.cos(np.pi / 4), 0, 0,
                                    np.sin(np.pi / 4)],  # yaw 90deg
            "ego2global_translation": [100.0, 50.0, 0.0],
        }
        boxes = np.array([[10.0, 0, -1.0, 4, 2, 2, 0.0, 1.0, 0.0]])
        c, dims, yaws, vel = boxes_lidar_to_global(info, boxes)
        # lidar (10,0,0 gravity z=-1+1=0) -> ego (11,0,2) -> global rot90
        np.testing.assert_allclose(c[0], [100.0, 50.0 + 11.0, 2.0],
                                   atol=1e-6)
        assert abs(yaws[0] - np.pi / 2) < 1e-9
        np.testing.assert_allclose(vel[0], [0.0, 1.0], atol=1e-9)

    def test_submission_format(self, tmp_path):
        from focalformer3d_tpu.core.results import (
            format_nuscenes_submission, tracking_from_detections,
        )
        info = {
            "lidar2ego_rotation": [1.0, 0, 0, 0],
            "lidar2ego_translation": [0.0, 0, 0],
            "ego2global_rotation": [1.0, 0, 0, 0],
            "ego2global_translation": [0.0, 0, 0],
        }
        preds = {"tok0": {
            "boxes": np.array([[1.0, 2, -1, 4, 2, 1.5, 0.3, 3.0, 0.0]]),
            "scores": np.array([0.9]),
            "labels": np.array([0]),
        }}
        sub = format_nuscenes_submission(
            preds, {"tok0": info}, nusc.CLASS_NAMES,
            str(tmp_path / "sub.json"),
        )
        ann = sub["results"]["tok0"][0]
        assert ann["detection_name"] == "car"
        assert ann["attribute_name"] == "vehicle.moving"  # speed 3 m/s
        assert (tmp_path / "sub.json").exists()
        trk = tracking_from_detections(sub)
        assert trk["results"]["tok0"][0]["tracking_id"]


class TestNativeLoader:
    def test_native_matches_numpy(self, tmp_path):
        from focalformer3d_tpu.data import native

        if native.get_lib() is None:
            pytest.skip("no native toolchain")
        pkl = _write_fake_nuscenes(tmp_path)
        ds = nusc.NuScenesDataset(str(pkl), pipeline=None)
        info = ds.infos[0]
        a = nusc.load_points_multisweep(info, test_mode=True,
                                        use_native=True)
        b = nusc.load_points_multisweep(info, test_mode=True,
                                        use_native=False)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_remove_close_applied(self, tmp_path):
        from focalformer3d_tpu.data import native

        if native.get_lib() is None:
            pytest.skip("no native toolchain")
        # one sweep with points near origin
        pts = np.zeros((10, 5), np.float32)
        pts[:5, 0] = 0.5  # close in x and y=0 -> filtered
        pts[5:, 0] = 20.0
        p = tmp_path / "sweep.bin"
        pts.tofile(p)
        out = native.load_sweeps_native(
            [str(p)],
            np.eye(3, dtype=np.float32)[None],
            np.zeros((1, 3), np.float32),
            np.asarray([0.25], np.float32),
            np.asarray([1], np.uint8), np.asarray([1], np.uint8),
            np.asarray([1], np.uint8),
        )
        assert out.shape[0] == 5
        assert (out[:, 0] == 20.0).all()
        assert (out[:, 4] == 0.25).all()


class TestPrefetcher:
    def test_order_and_completion(self):
        from focalformer3d_tpu.data.prefetch import prefetch

        out = list(prefetch(iter(range(100)), depth=3))
        assert out == list(range(100))

    def test_exception_propagates(self):
        from focalformer3d_tpu.data.prefetch import prefetch

        def gen():
            yield 1
            yield 2
            raise ValueError("producer failed")

        it = prefetch(gen(), depth=2)
        assert next(it) == 1
        assert next(it) == 2
        import pytest as _pytest
        with _pytest.raises(ValueError, match="producer failed"):
            next(it)

    def test_overlap(self):
        """Consumer work overlaps producer work (wall < serial sum)."""
        import time

        from focalformer3d_tpu.data.prefetch import prefetch

        def slow_gen():
            for i in range(6):
                time.sleep(0.05)
                yield i

        t0 = time.perf_counter()
        for _ in prefetch(slow_gen(), depth=2):
            time.sleep(0.05)  # consumer-side "step"
        wall = time.perf_counter() - t0
        assert wall < 0.5  # serial would be ~0.6s
