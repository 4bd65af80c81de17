"""End-to-end smoke tests for the detector on tiny shapes (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from focalformer3d_tpu.models.detector import (
    DetectorConfig, FocalFormer3D, preprocess_points,
)
from focalformer3d_tpu.models.focal_decoder import FocalDecoderConfig
from focalformer3d_tpu.ops.voxelize import VoxelConfig

PC_RANGE = (-8.0, -8.0, -3.0, 8.0, 8.0, 3.0)


def tiny_config():
    # grid 64x64x25 -> BEV 8x8 after 8x downsample
    # (z chain must survive 3 stride-2 stages + z-collapse: 25->13->7->3->1)
    return DetectorConfig(
        voxel=VoxelConfig(
            point_cloud_range=PC_RANGE,
            voxel_size=(0.25, 0.25, 0.24),
            max_num_points=5,
            max_voxels=512,
        ),
        sparse_shape=(25, 64, 64),
        sparse_out_channels=32,
        encoder_channels=((8, 8, 16), (16, 16, 24), (24, 24, 32), (32, 32)),
        down_paddings=((1, 1, 1), (1, 1, 1), (0, 1, 1)),
        capacities=(512, 384, 256, 192),
        out_capacity=192,
        second_channels=(32, 48),
        second_layers=(2, 2),
        fpn_channels=(48, 48),
        hidden=32,
        decoder=FocalDecoderConfig(
            num_classes=4,
            hidden=32,
            hidden_roi=64,
            num_proposals=16,
            num_decoder_layers=2,
            inner_layers=1,
            num_heads=4,
            multistage_heatmap=1,
            reuse_first_heatmap=True,
            multiscale=True,
            roi_feats=3,
            add_gt_groups=2,
            max_gts=6,
            kernel1_classes=(2, 3),
            pc_range=PC_RANGE,
            voxel_size=(0.25, 0.25, 0.75),
            out_size_factor=8,
            post_center_range=(-10, -10, -5, 10, 10, 5),
        ),
    )


def synth_batch(rng, B=2, N=1024, G=6):
    pts = rng.uniform(-7.5, 7.5, (B, N, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2.5, 2.5, (B, N))
    mask = np.ones((B, N), bool)
    mask[:, -50:] = False
    gt = np.zeros((B, G, 9), np.float32)
    gt[..., :2] = rng.uniform(-6, 6, (B, G, 2))
    gt[..., 2] = -1.0
    gt[..., 3:6] = rng.uniform(0.5, 3.0, (B, G, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, G))
    labels = rng.randint(0, 4, (B, G)).astype(np.int32)
    valid = np.ones((B, G), bool)
    valid[:, -2:] = False
    return (jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(gt),
            jnp.asarray(labels), jnp.asarray(valid))


class TestDetectorSmoke:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config()
        model = FocalFormer3D(cfg)
        rng = np.random.RandomState(0)
        pts, mask, gt, labels, valid = synth_batch(rng)
        vox = preprocess_points(cfg, pts, mask)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "gt": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            vox, None, True, gt, labels, valid,
        )
        return cfg, model, variables, vox, (gt, labels, valid)

    def test_train_forward_shapes(self, setup):
        cfg, model, variables, vox, (gt, labels, valid) = setup
        out, new_vars = model.apply(
            variables, vox, None, True, gt, labels, valid,
            rngs={"gt": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        S, P = 2, 16
        G, NG = 6, 2
        Qn = S * P + G * NG
        B = 2
        assert out["center"].shape == (B, 2, Qn, 2)
        assert out["heatmap"].shape == (B, 2, Qn, 4)
        assert out["vel"].shape == (B, 2, Qn, 2)
        assert out["dense_heatmap"].shape == (B, 2, 8, 8, 4)
        assert out["multistage_masks"].shape == (B, 2, 8, 8, 4)
        assert out["query_labels"].shape == (B, Qn)
        assert not np.any(np.isnan(np.asarray(out["center"])))

    def test_eval_forward_and_decode(self, setup):
        cfg, model, variables, vox, _ = setup
        out = model.apply(variables, vox, None, False)
        Qn = 32
        assert out["center"].shape == (2, 2, Qn, 2)
        dec = FocalFormer3D(cfg).get_bboxes(out, max_out=10)
        assert dec["bboxes"].shape == (2, Qn, 9)
        assert dec["mask"].sum(axis=1).max() <= 10
        assert not np.any(np.isnan(np.asarray(dec["bboxes"])))

    def test_jit_eval(self, setup):
        cfg, model, variables, vox, _ = setup

        @jax.jit
        def f(v, vd):
            return model.apply(v, vd, None, False)

        out = f(variables, vox)
        assert out["center"].shape[0] == 2

    def test_masking_reduces_second_stage_overlap(self, setup):
        """HIP property: stage-2 queries should avoid stage-1 peaks."""
        cfg, model, variables, vox, _ = setup
        out = model.apply(variables, vox, None, False)
        labels = np.asarray(out["query_labels"])
        # positions gathered per stage: stage splits at P=16
        # (can't access positions directly; check masks actually zeroed)
        masks = np.asarray(out["multistage_masks"])
        assert masks[:, 0].min() == 1.0  # first stage: nothing masked
        assert masks[:, 1].min() == 0.0  # second stage: something masked


@pytest.mark.slow
def test_boxcls_masking_mode_forward():
    """'boxcls' heatmap masking with dense box heads runs end-to-end and
    changes the accumulative mask vs 'poscls' (VERDICT item 9)."""
    import dataclasses

    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.models.focal_decoder import FocalDecoder

    cfg_all = get_config("Tiny_L")
    dec_cfg = dataclasses.replace(
        cfg_all["model"].decoder, mask_heatmap_mode="boxcls",
        heatmap_box=True, multistage_heatmap=2,
    )
    rng = np.random.RandomState(0)
    H = Wd = 8
    Cc = dec_cfg.hidden
    lidar_feat = jnp.asarray(rng.randn(1, H, Wd, Cc).astype(np.float32))
    n_stage = dec_cfg.total_stages - (1 if dec_cfg.reuse_first_heatmap
                                      else 0)
    feats = [jnp.asarray(rng.randn(1, H, Wd, Cc).astype(np.float32))
             for _ in range(n_stage)]
    if dec_cfg.extra_feat:
        feats.append(
            jnp.asarray(rng.randn(1, H, Wd, Cc).astype(np.float32)))
    dec = FocalDecoder(dec_cfg)
    vars_ = dec.init(jax.random.PRNGKey(0), lidar_feat, feats, False)
    out = dec.apply(vars_, lidar_feat, feats, False)
    assert np.isfinite(np.asarray(out["center"])).all()
    # the box-interior painting must suppress more cells than poscls
    m_box = np.asarray(out["multistage_masks"])
    dec_cfg2 = dataclasses.replace(dec_cfg, mask_heatmap_mode="poscls",
                                   heatmap_box=False)
    dec2 = FocalDecoder(dec_cfg2)
    vars2 = dec2.init(jax.random.PRNGKey(0), lidar_feat, feats, False)
    out2 = dec2.apply(vars2, lidar_feat, feats, False)
    m_pos = np.asarray(out2["multistage_masks"])
    assert m_box.sum() <= m_pos.sum()


@pytest.mark.slow
def test_bfloat16_compute_dtype_close_to_f32():
    """with_compute_dtype('bfloat16') runs the same params and stays close
    to the float32 forward (inference path; heads emit float32)."""
    from focalformer3d_tpu.models.detector import with_compute_dtype

    rng = np.random.RandomState(11)
    cfg = tiny_config()
    cfg16 = with_compute_dtype(cfg, "bfloat16")
    pts, mask, _gt, _labels, _valid = synth_batch(rng)
    vox = preprocess_points(cfg, pts, mask)

    model = FocalFormer3D(cfg)
    model16 = FocalFormer3D(cfg16)
    variables = jax.jit(
        lambda k, v: model.init({"params": k}, v, None, False)
    )(jax.random.PRNGKey(0), vox)
    out = jax.jit(lambda v, x: model.apply(v, x, None, False))(
        variables, vox)
    out16 = jax.jit(lambda v, x: model16.apply(v, x, None, False))(
        variables, vox)
    assert out16["center"].dtype == jnp.float32
    # bf16 has ~2-3 significant decimal digits, and near-tied heatmap
    # peaks may select different queries under rounding — require the
    # bulk of the centers to agree within half a grid cell rather than
    # elementwise equality
    c16 = np.asarray(out16["center"])
    c32 = np.asarray(out["center"])
    close = np.abs(c16 - c32) < 0.5
    assert close.mean() > 0.95, close.mean()
    assert np.isfinite(np.asarray(out16["heatmap"])).all()
