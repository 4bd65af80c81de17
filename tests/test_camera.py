"""Camera branch tests: ResNet/FPN, LSS geometry + splat, I2P, GridMask,
and tiny LC / camera-only end-to-end smokes (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from focalformer3d_tpu.models.detector import (
    DetectorConfig, FocalFormer3D, preprocess_points,
)
from focalformer3d_tpu.models.focal_decoder import FocalDecoderConfig
from focalformer3d_tpu.models.grid_mask import grid_mask
from focalformer3d_tpu.models.i2p import I2P, project_points_to_cams
from focalformer3d_tpu.models.lss import (
    CamEncode, LSSConfig, LiftSplatShoot, create_frustum, frustum_geometry,
    splat_to_bev,
)
from focalformer3d_tpu.models.resnet import FPN, ResNet
from focalformer3d_tpu.data import synthetic
from focalformer3d_tpu.ops.voxelize import VoxelConfig

PC_RANGE = (-8.0, -8.0, -3.0, 8.0, 8.0, 3.0)
IMG_HW = (64, 96)

TINY_LSS = LSSConfig(
    img_scale=IMG_HW,
    camera_depth_range=(1.0, 9.0, 1.0),
    pc_range=PC_RANGE,
    downsample=4,
    grid=2.0,
    input_channels=32,
    cam_channels=8,
    out_channels=16,
)


class TestResNetFPN:
    def test_shapes_r18(self):
        model = ResNet(depth=18)
        x = jnp.zeros((2, 64, 96, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(vars_, x)
        assert [o.shape for o in outs] == [
            (2, 16, 24, 64), (2, 8, 12, 128), (2, 4, 6, 256), (2, 2, 3, 512)
        ]
        fpn = FPN(32, 5)
        fv = fpn.init(jax.random.PRNGKey(0), outs)
        fouts = fpn.apply(fv, outs)
        assert len(fouts) == 5
        assert fouts[0].shape == (2, 16, 24, 32)
        assert fouts[4].shape == (2, 1, 2, 32)

    def test_r50_channels(self):
        model = ResNet(depth=50)
        x = jnp.zeros((1, 32, 32, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(vars_, x)
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


class TestLSSGeometry:
    def test_frustum_shape_and_range(self):
        fr = create_frustum(TINY_LSS)
        D = TINY_LSS.depth_bins
        fH, fW = TINY_LSS.feat_hw
        assert fr.shape == (D, fH, fW, 3)
        assert fr[..., 2].min() == 1.0 and fr[..., 2].max() == 8.0
        assert fr[..., 0].max() == IMG_HW[1] - 1
        assert fr[..., 1].max() == IMG_HW[0] - 1

    def test_identity_cam_unprojection(self):
        """With identity rotation and pinhole-free mapping, the frustum point
        (x*d, y*d, d) should appear unchanged."""
        rot = jnp.eye(3)[None]
        trans = jnp.zeros((1, 3))
        geom = frustum_geometry(TINY_LSS, rot, trans)
        fr = create_frustum(TINY_LSS)
        expect = np.concatenate(
            [fr[..., :2] * fr[..., 2:3], fr[..., 2:3]], -1
        )
        np.testing.assert_allclose(np.asarray(geom[0]), expect, rtol=1e-5)

    def test_img_aug_undo(self):
        """A recorded pixel-space scale+shift must be inverted exactly."""
        rot = jnp.eye(3)[None]
        trans = jnp.zeros((1, 3))
        aug = np.eye(4, dtype=np.float32)
        aug[0, 0] = 2.0  # x' = 2x + 3
        aug[0, 3] = 3.0
        geom_aug = frustum_geometry(
            TINY_LSS, rot, trans, img_aug=jnp.asarray(aug)[None]
        )
        fr = np.asarray(create_frustum(TINY_LSS))
        x_undone = (fr[..., 0] - 3.0) / 2.0
        expect_x = x_undone * fr[..., 2]
        np.testing.assert_allclose(
            np.asarray(geom_aug[0, ..., 0]), expect_x, rtol=1e-4, atol=1e-4
        )

    def test_bev_aug_forward(self):
        rot = jnp.eye(3)[None]
        trans = jnp.zeros((1, 3))
        ba = np.eye(4, dtype=np.float32)
        th = 0.3
        ba[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        ba[:3, 3] = [1.0, -2.0, 0.5]
        base = np.asarray(frustum_geometry(TINY_LSS, rot, trans))
        out = np.asarray(
            frustum_geometry(TINY_LSS, rot, trans, bev_aug=jnp.asarray(ba))
        )
        expect = base @ ba[:3, :3].T + ba[:3, 3]
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)

    def test_splat_mass_conservation(self):
        """Sum of pooled features == sum of in-range point features."""
        rng = np.random.RandomState(0)
        N, D, fH, fW, C = 2, 3, 4, 5, 6
        geom = rng.uniform(-10, 10, (N, D, fH, fW, 3)).astype(np.float32)
        geom[..., 2] = rng.uniform(-3, 3, (N, D, fH, fW))
        feats = rng.uniform(0, 1, (N, D, fH, fW, C)).astype(np.float32)
        bev = np.asarray(
            splat_to_bev(TINY_LSS, jnp.asarray(geom), jnp.asarray(feats))
        )
        nx, ny, nz = TINY_LSS.nx
        assert bev.shape == (ny, nx, C * nz)
        inr = np.all(
            (geom >= np.array(PC_RANGE[:3])) & (geom < np.array(PC_RANGE[3:])),
            axis=-1,
        )
        np.testing.assert_allclose(
            bev.sum(), feats[inr].sum(), rtol=1e-4
        )

    def test_splat_position(self):
        """A single point lands in its voxel column with the c*Z+z layout."""
        nx, ny, nz = TINY_LSS.nx
        geom = np.full((1, 1, 1, 1, 3), 99.0, np.float32)  # out of range
        geom[0, 0, 0, 0] = [-7.9, 5.0, 2.5]  # ix=0, iy=6, iz=2
        feats = np.zeros((1, 1, 1, 1, 2), np.float32)
        feats[0, 0, 0, 0] = [1.0, 3.0]
        bev = np.asarray(
            splat_to_bev(TINY_LSS, jnp.asarray(geom), jnp.asarray(feats))
        )
        iz = int((2.5 - PC_RANGE[2]) / 2.0)
        assert bev[6, 0, 0 * nz + iz] == 1.0
        assert bev[6, 0, 1 * nz + iz] == 3.0
        assert bev.sum() == 4.0

    def test_lss_module(self):
        B, N = 1, 2
        fH, fW = TINY_LSS.feat_hw
        m = LiftSplatShoot(TINY_LSS)
        feats = jnp.ones((B, N, fH, fW, TINY_LSS.input_channels))
        rot = jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3))
        tr = jnp.zeros((B, N, 3))
        vars_ = m.init(jax.random.PRNGKey(0), feats, rot, tr)
        bev, depth = m.apply(vars_, feats, rot, tr)
        nx, ny, nz = TINY_LSS.nx
        assert bev.shape == (B, ny, nx, TINY_LSS.out_channels)
        assert depth.shape == (B, N, TINY_LSS.depth_bins, fH, fW)
        d = np.asarray(depth)
        np.testing.assert_allclose(
            d.sum(2), np.ones_like(d.sum(2)), rtol=1e-5
        )


class TestI2P:
    def test_projection_validity(self):
        rng = np.random.RandomState(1)
        l2i = synthetic.make_cameras(rng, 3, IMG_HW)
        pts = rng.uniform(-7, 7, (50, 3)).astype(np.float32)
        xy, valid = project_points_to_cams(
            jnp.asarray(pts), jnp.asarray(l2i), None, None, IMG_HW
        )
        assert xy.shape == (3, 50, 2)
        v = np.asarray(valid)
        assert v.any()  # some points visible
        # verify against numpy oracle for camera 0
        ph = np.concatenate([pts, np.ones((50, 1), np.float32)], -1)
        cam = ph @ l2i[0].T
        front = cam[:, 2] > 1e-5
        u = cam[:, 0] / np.maximum(cam[:, 2], 1e-5)
        oracle = front & (u / IMG_HW[1] * 2 - 1 > -1) & (
            u / IMG_HW[1] * 2 - 1 < 1
        )
        vv = np.asarray(valid[0])
        # x-validity must match oracle wherever oracle is decisive
        assert ((vv & ~oracle) == False).all() or True
        np.testing.assert_array_equal(
            vv & oracle, vv
        )

    def test_i2p_module(self):
        rng = np.random.RandomState(2)
        B, N, H, W, C = 1, 2, 6, 6, 8
        fH, fW = 16, 24
        l2i = np.stack(
            [synthetic.make_cameras(rng, N, IMG_HW) for _ in range(B)]
        )
        m = I2P(pts_channels=C, max_points_height=3, pc_range=PC_RANGE,
                input_shape=IMG_HW)
        lidar = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.float32)
        imgf = jnp.asarray(
            rng.uniform(-1, 1, (B, N, fH, fW, 12)), jnp.float32
        )
        vars_ = m.init(jax.random.PRNGKey(0), lidar, imgf, jnp.asarray(l2i))
        out = m.apply(vars_, lidar, imgf, jnp.asarray(l2i))
        assert out.shape == (B, H, W, C)
        assert not np.any(np.isnan(np.asarray(out)))


class TestGridMask:
    def test_mode1_keeps_strips_and_prob(self):
        imgs = jnp.ones((2, 32, 40, 3))
        out = grid_mask(jax.random.PRNGKey(0), imgs, prob=1.0)
        arr = np.asarray(out)
        kept = arr.mean()
        assert 0.0 < kept < 1.0  # something masked, something kept
        # prob=0 -> identity
        out2 = grid_mask(jax.random.PRNGKey(0), imgs, prob=0.0)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(imgs))

    def test_mask_is_grid(self):
        imgs = jnp.ones((1, 64, 64, 1))
        out = np.asarray(grid_mask(jax.random.PRNGKey(3), imgs, prob=1.0))
        # mask is rank-1 separable: out = row_pattern OR col_pattern structure
        # mode=1 keeps the union of row-strips and col-strips: every kept
        # pixel lies on a fully-kept row or a fully-kept column.
        m = out[0, :, :, 0]
        row_full = m.min(axis=1)
        col_full = m.min(axis=0)
        recon = np.maximum(row_full[:, None], col_full[None, :])
        np.testing.assert_array_equal(m, recon)


def tiny_lc_config(input_pts=True):
    dec = FocalDecoderConfig(
        num_classes=4,
        hidden=16,
        hidden_roi=32,
        num_proposals=8,
        num_decoder_layers=1,
        inner_layers=1,
        num_heads=2,
        multistage_heatmap=1 if not input_pts else 2,
        reuse_first_heatmap=False,
        extra_feat=input_pts,
        multiscale=True,
        roi_feats=3 if input_pts else 0,
        roi_based_reg=input_pts,
        add_gt_groups=2 if input_pts else 0,
        max_gts=6,
        kernel1_classes=(2, 3),
        pc_range=PC_RANGE,
        voxel_size=(0.25, 0.25, 0.75),
        out_size_factor=8,
        post_center_range=(-10, -10, -5, 10, 10, 5),
    )
    return DetectorConfig(
        voxel=VoxelConfig(
            point_cloud_range=PC_RANGE,
            voxel_size=(0.25, 0.25, 0.24),
            max_num_points=5,
            max_voxels=512,
        ),
        sparse_shape=(25, 64, 64),
        sparse_out_channels=16,
        encoder_channels=((8, 8, 8), (8, 8, 8), (8, 8, 16), (16, 16)),
        down_paddings=((1, 1, 1), (1, 1, 1), (0, 1, 1)),
        capacities=(512, 384, 256, 192),
        out_capacity=192,
        second_channels=(16, 24),
        second_layers=(1, 1),
        fpn_channels=(24, 24),
        neck_layers=2 if input_pts else 0,
        hidden=16,
        iterbev="bevfusion",
        extra_feat=input_pts,
        input_img=True,
        input_pts=input_pts,
        img_backbone_depth=18,
        cam_proj="lss",
        iter_bev_cam=True,
        max_points_height=3,
        lss=LSSConfig(
            img_scale=IMG_HW,
            camera_depth_range=(1.0, 9.0, 1.0),
            pc_range=PC_RANGE,
            downsample=4,
            grid=2.0,
            input_channels=256,
            cam_channels=8,
            out_channels=16,
        ),
        bev_shape=(8, 8),
        decoder=dec,
    )


def _img_data(batch):
    return {
        "imgs": jnp.asarray(batch["imgs"], jnp.float32),
        "lidar2img": jnp.asarray(batch["lidar2img"], jnp.float32),
        "img_aug": jnp.asarray(batch["img_aug"], jnp.float32),
        "bev_aug": jnp.asarray(batch["bev_aug"], jnp.float32),
    }


class TestLCFusionSmoke:
    @pytest.fixture(scope="class")
    def batch(self):
        rng = np.random.RandomState(0)
        return synthetic.make_batch(
            rng, batch_size=1, n_points=800, n_boxes=3, max_gts=6,
            num_classes=4, pc_range=PC_RANGE, with_images=True, n_cams=2,
            img_hw=IMG_HW,
        )

    @pytest.mark.slow
    def test_lc_forward(self, batch):
        cfg = tiny_lc_config(input_pts=True)
        model = FocalFormer3D(cfg)
        vox = preprocess_points(
            cfg, jnp.asarray(batch["points"]),
            jnp.asarray(batch["points_mask"]),
        )
        img_data = _img_data(batch)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, vox, img_data, False
        )
        out = model.apply(variables, vox, img_data, False)
        Qn = 2 * 8  # 2 stages x 8 proposals
        assert out["center"].shape == (1, 1, Qn, 2)
        assert not np.any(np.isnan(np.asarray(out["center"])))

    def test_camera_only_forward(self, batch):
        cfg = tiny_lc_config(input_pts=False)
        model = FocalFormer3D(cfg)
        img_data = _img_data(batch)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, None, img_data, False
        )
        out = model.apply(variables, None, img_data, False)
        assert out["center"].shape == (1, 1, 8, 2)
        assert not np.any(np.isnan(np.asarray(out["center"])))
