"""Checkpoint save/restore, retention, auto-resume, partial loads."""
import numpy as np
import jax
import jax.numpy as jnp

from focalformer3d_tpu.training import checkpoint as ckpt
from focalformer3d_tpu.training.train_step import TrainState


def _state(seed=0):
    rng = np.random.RandomState(seed)
    params = {
        "img_backbone": {"conv1": {"kernel": rng.randn(3, 3).astype(
            np.float32)}},
        "pts_backbone": {"block0": {"kernel": rng.randn(4).astype(
            np.float32)}},
        "imgpts_neck": {
            "cam_lss": {"w": rng.randn(2).astype(np.float32)},
            "shared_conv_pts": {"kernel": rng.randn(2).astype(np.float32)},
        },
    }
    return TrainState(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats={"bn": jnp.zeros(3)},
        opt_state={"m": jnp.zeros(1)},
        step=jnp.asarray(seed, jnp.int32),
    )


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        s = _state(3)
        ckpt.save_checkpoint(str(tmp_path), s, epoch=1)
        r = ckpt.restore_checkpoint(str(tmp_path / "epoch_1"), _state(0))
        np.testing.assert_array_equal(
            np.asarray(r.params["img_backbone"]["conv1"]["kernel"]),
            np.asarray(s.params["img_backbone"]["conv1"]["kernel"]),
        )
        assert int(r.step) == 3

    def test_keep_last(self, tmp_path):
        for e in range(1, 5):
            ckpt.save_checkpoint(str(tmp_path), _state(e), epoch=e,
                                 keep_last=2)
        assert ckpt.list_epochs(str(tmp_path)) == [3, 4]

    def test_auto_resume(self, tmp_path):
        assert ckpt.auto_resume(str(tmp_path), _state(0))[1] == 0
        ckpt.save_checkpoint(str(tmp_path), _state(7), epoch=2)
        s, e = ckpt.auto_resume(str(tmp_path), _state(0))
        assert e == 2 and int(s.step) == 7

    def test_partial_img_load(self):
        dst = _state(0)
        src = _state(9)
        merged = ckpt.load_partial_params(
            dst.params, src.params, ckpt.img_branch_filter
        )
        np.testing.assert_array_equal(
            np.asarray(merged["img_backbone"]["conv1"]["kernel"]),
            np.asarray(src.params["img_backbone"]["conv1"]["kernel"]),
        )
        np.testing.assert_array_equal(
            np.asarray(merged["imgpts_neck"]["cam_lss"]["w"]),
            np.asarray(src.params["imgpts_neck"]["cam_lss"]["w"]),
        )
        # non-image branches untouched
        np.testing.assert_array_equal(
            np.asarray(merged["pts_backbone"]["block0"]["kernel"]),
            np.asarray(dst.params["pts_backbone"]["block0"]["kernel"]),
        )
        np.testing.assert_array_equal(
            np.asarray(merged["imgpts_neck"]["shared_conv_pts"]["kernel"]),
            np.asarray(dst.params["imgpts_neck"]["shared_conv_pts"]
                       ["kernel"]),
        )


class TestFreezeMask:
    def test_masks_follow_flags(self):
        import dataclasses

        from focalformer3d_tpu.models.detector import DetectorConfig
        from focalformer3d_tpu.training.train_step import freeze_mask

        cfg = DetectorConfig(freeze_img=True, freeze_pts=True,
                             freeze_camlss=True)
        params = _state(0).params
        m = freeze_mask(cfg, params)
        assert float(m["img_backbone"]["conv1"]["kernel"]) == 0.0
        assert float(m["pts_backbone"]["block0"]["kernel"]) == 0.0
        assert float(m["imgpts_neck"]["cam_lss"]["w"]) == 0.0
        assert float(m["imgpts_neck"]["shared_conv_pts"]["kernel"]) == 0.0

        cfg2 = DetectorConfig()
        m2 = freeze_mask(cfg2, params)
        assert all(
            float(x) == 1.0 for x in jax.tree_util.tree_leaves(m2)
        )
