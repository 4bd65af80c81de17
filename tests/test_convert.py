"""Checkpoint-converter coverage: every key of a reference-shaped state_dict
maps onto the flax tree, and every flax leaf receives a value.

The fake state_dicts come from utils.ref_keys, which enumerates the exact
keys/shapes a released mmdet3d checkpoint carries (derived from the reference
module definitions — see that module's docstring). Numeric layout parity
(transposes, qkv splits, spconv tap order) is proven against live torch
oracles in test_convert_torch.py."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from focalformer3d_tpu.configs import get_config
from focalformer3d_tpu.data import synthetic
from focalformer3d_tpu.models.detector import FocalFormer3D, preprocess_points
from focalformer3d_tpu.utils.convert import convert_tree
from focalformer3d_tpu.utils.ref_keys import make_fake_state_dict


def _zeros_variables(config_name):
    cfg = get_config(config_name)["model"]
    model = FocalFormer3D(cfg)
    rng = np.random.RandomState(0)
    batch = synthetic.make_batch(
        rng, batch_size=1, n_points=2000, n_boxes=4, max_gts=8,
        num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range, with_images=cfg.input_img,
        img_hw=cfg.lss.img_scale,
    )
    vox = preprocess_points(
        cfg, jnp.asarray(batch["points"]), jnp.asarray(batch["points_mask"])
    )
    img_data = None
    if cfg.input_img:
        img_data = {k: jnp.asarray(batch[k]) for k in (
            "imgs", "lidar2img", "img_aug", "bev_aug")}
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, vox, img_data,
                           False)
    )
    return cfg, jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables
    )


@pytest.mark.parametrize("config_name", [
    "FocalFormer3D_L", "FocalFormer3D_LC",
    pytest.param("DeformFormer3D_L", marks=pytest.mark.slow),
    pytest.param("FocalFormer3D_LC_Proj", marks=pytest.mark.slow),
    pytest.param("DeformFormer3D_C_R50", marks=pytest.mark.slow),
    pytest.param("FocalFormer3D_Waymo_L", marks=pytest.mark.slow),
    pytest.param("FocalFormer3D_LC_TTA", marks=pytest.mark.slow),
])
def test_full_coverage(config_name):
    cfg, variables = _zeros_variables(config_name)
    sd = make_fake_state_dict(cfg)
    new_vars, report = convert_tree(variables, sd)
    assert not report.missed, report.summary()
    assert not report.unmapped, report.summary()
    assert not report.unloaded, report.summary()
    # spot-check one value actually landed (not left at zero init)
    flat = jax.tree_util.tree_flatten(new_vars["params"])[0]
    assert any(float(np.abs(x).max()) > 0 for x in flat)
