"""Waymo KITTI-format reader tests (synthetic fixture)."""
import pickle

import numpy as np

from focalformer3d_tpu.data import waymo


def _rt(yaw, t):
    c, s = np.cos(yaw), np.sin(yaw)
    M = np.eye(4)
    M[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    M[:3, 3] = t
    return M


class TestBoxCameraToLidar:
    def test_identity_calib_axes(self):
        """With rect=I and the canonical velo->cam axis swap, a box ahead of
        the ego maps back to +x lidar with consistent yaw/dims."""
        # KITTI velo->cam: x_cam = -y_velo, y_cam = -z_velo, z_cam = x_velo
        trv2c = np.array([
            [0, -1, 0, 0],
            [0, 0, -1, 0],
            [1, 0, 0, 0],
            [0, 0, 0, 1.0],
        ])
        rect = np.eye(4)
        # camera box: 10 m ahead (z_cam=10), l=4, h=1.5, w=2, ry=0
        cam = np.array([[0.0, 0.0, 10.0, 4.0, 1.5, 2.0, 0.0]])
        lidar = waymo.box_camera_to_lidar(cam, rect, trv2c)
        np.testing.assert_allclose(lidar[0, :3], [10, 0, 0], atol=1e-6)
        np.testing.assert_allclose(lidar[0, 3:6], [4.0, 2.0, 1.5])
        assert abs(lidar[0, 6] + np.pi / 2) < 1e-6  # -0 - pi/2

    def test_points_follow_boxes(self):
        """A cam-frame point at the box center lands at the lidar center."""
        rng = np.random.RandomState(0)
        trv2c = _rt(0.3, [0.2, -0.1, 0.5])
        rect = _rt(-0.05, [0, 0, 0])
        cam = np.array([[1.0, 2.0, 8.0, 4.0, 1.5, 2.0, 0.7]])
        lidar = waymo.box_camera_to_lidar(cam, rect, trv2c)
        p_cam = np.array([1.0, 2.0, 8.0, 1.0])
        p_lidar = (np.linalg.inv(rect @ trv2c) @ p_cam)[:3]
        np.testing.assert_allclose(lidar[0, :3], p_lidar, atol=1e-6)


class TestWaymoDataset:
    def _write(self, tmp_path, n=3):
        rng = np.random.RandomState(0)
        infos = []
        (tmp_path / "velo").mkdir()
        for i in range(n):
            pts = rng.uniform(-50, 50, (400, 6)).astype(np.float32)
            rel = f"velo/{i}.bin"
            pts.tofile(tmp_path / rel)
            infos.append({
                "image": {"image_idx": i},
                "point_cloud": {"num_features": 6, "velodyne_path": rel},
                "calib": {
                    "R0_rect": np.eye(4),
                    "Tr_velo_to_cam": np.array([
                        [0, -1, 0, 0], [0, 0, -1, 0],
                        [1, 0, 0, 0], [0, 0, 0, 1.0],
                    ]),
                },
                "annos": {
                    "name": np.array(["Car", "Pedestrian", "DontCare"],
                                     object),
                    "location": rng.uniform(-10, 10, (3, 3)),
                    "dimensions": np.abs(rng.uniform(1, 4, (3, 3))),
                    "rotation_y": rng.uniform(-np.pi, np.pi, 3),
                },
            })
        p = tmp_path / "waymo_infos.pkl"
        with open(p, "wb") as f:
            pickle.dump(infos, f)
        return p

    def test_load(self, tmp_path):
        pkl = self._write(tmp_path)
        ds = waymo.WaymoDataset(str(pkl), data_root=str(tmp_path))
        assert len(ds) == 3
        s = ds.get_sample(0)
        assert s["points"].shape == (400, 5)
        assert s["gt_boxes"].shape == (2, 9)  # DontCare dropped
        assert set(s["gt_names"]) == {"Car", "Pedestrian"}

    def test_pipeline_integration(self, tmp_path):
        from focalformer3d_tpu.data import transforms as T

        pkl = self._write(tmp_path)
        pcr = (-76.8, -76.8, -2, 76.8, 76.8, 4)
        ds = waymo.WaymoDataset(
            str(pkl), data_root=str(tmp_path),
            pipeline=[
                T.GlobalRotScaleTrans(), T.RandomFlip3D(),
                T.PointsRangeFilter(pcr), T.ObjectRangeFilter(pcr),
                T.ObjectNameFilter(waymo.CLASS_NAMES),
            ],
        )
        s = ds.get_sample(1, np.random.RandomState(1))
        assert s["points"].shape[1] == 5
        assert s["bev_aug"].shape == (4, 4)
