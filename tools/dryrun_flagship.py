"""Flagship-shape multichip dryrun: compile the real FocalFormer3D-L DP
train step over a virtual 8-device CPU mesh.

The tiny-topology dryrun (__graft_entry__.dryrun_multichip) executes a
full train step but at test shapes; sharding bugs that only appear at
the production 1440^2 grid / 160k-capacity shapes (non-divisible
shardings, SPMD partitioner failures, layout blowups) would not surface
there. This compiles — not executes — the flagship step: SPMD
partitioning runs at compile time, which is where those bugs live.
Params come from eval_shape + zeros so nothing model-sized executes on
the CPU backend.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/dryrun_flagship.py [n_devices]
(also invoked by __graft_entry__.dryrun_multichip and the slow test in
tests/test_parallel.py)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n_devices: int = 8) -> None:
    from focalformer3d_tpu.utils.platform import setup

    setup(platform="cpu", host_devices=n_devices)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.models.detector import FocalFormer3D
    from focalformer3d_tpu.parallel import mesh as mesh_lib
    from focalformer3d_tpu.training import optim
    from focalformer3d_tpu.training.losses import LossConfig
    from focalformer3d_tpu.training.train_step import (
        TrainState, make_train_step, preprocess_points, _img_data_from_batch,
    )

    assert jax.device_count() >= n_devices, (jax.device_count(), n_devices)
    cfg = get_config("FocalFormer3D_L")["model"]
    lcfg = LossConfig()
    tx = optim.make_optimizer(total_steps=10, cyclic=False)
    model = FocalFormer3D(cfg)

    rng = np.random.RandomState(0)
    # production grid / capacities / proposal counts; only the point count
    # is reduced (the voxel tables pad to full capacity regardless)
    batch = {
        k: jnp.asarray(v) for k, v in synthetic.make_batch(
            rng, batch_size=n_devices, n_points=4096, n_boxes=8, max_gts=32,
            num_classes=cfg.decoder.num_classes,
            pc_range=cfg.voxel.point_cloud_range,
        ).items()
    }

    t0 = time.time()
    vox = jax.eval_shape(
        lambda p, m: preprocess_points(cfg, p, m, train=True),
        batch["points"], batch["points_mask"],
    )
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    var_shapes = jax.eval_shape(
        lambda: model.init(
            {"params": k1, "gt": k2, "dropout": k3},
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), vox),
            _img_data_from_batch(batch) if cfg.input_img else None,
            True, batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"],
        )
    )
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), var_shapes
    )
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    print(f"state built in {time.time()-t0:.1f}s", flush=True)

    m = mesh_lib.make_mesh(n_devices)
    state = mesh_lib.replicate(m, state)
    batch = mesh_lib.shard_batch(m, batch)
    step = jax.jit(make_train_step(cfg, lcfg, tx))

    t0 = time.time()
    lowered = step.lower(state, batch, jax.random.PRNGKey(1))
    print(f"lowered in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time()-t0:.1f}s", flush=True)
    # SPMD-partitioned for the full mesh; input shardings preserved
    n_sh = len({str(s) for s in compiled.input_shardings[0]})
    print(
        f"dryrun_flagship({n_devices}): flagship DP train step compiled "
        f"OK ({n_sh} distinct input shardings)", flush=True,
    )


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
