"""Bound the auction assigner's end-metric effect vs exact scipy Hungarian.

The training loss matches queries to GTs with a Bertsekas auction pass
(core/hungarian.py, on-device) instead of the reference's
scipy.optimize.linear_sum_assignment host callback
(/root/reference/projects/mmdet3d_plugin/core/bbox/assigners/hungarian_assigner.py:147).
Random-matrix parity tests exist (tests/test_core.py); this probe measures
the END-METRIC drift: run the same synthetic overfit twice — identical
data, init, and optimizer, only the assignment method differs — and
compare the loss and matched-IoU trajectories (matched_ious is the
reference's own training diagnostic, focal_decoder.py:1251).

Usage: python tools/micro_assigner_drift.py [--steps 40]
Results recorded in docs/PERF.md (VERDICT r4 item 9).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-only probe: the scipy arm needs jax.pure_callback, which the axon
# remote-TPU backend does not support (host send/recv callbacks
# unimplemented) — another reason the on-device auction is the production
# default. The image's sitecustomize pins jax_platforms="axon,cpu", so the
# env var alone is not enough (see tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from focalformer3d_tpu.core import assigner as assigner_lib
from focalformer3d_tpu.data import synthetic
from focalformer3d_tpu.training import optim
from focalformer3d_tpu.training.losses import LossConfig
from focalformer3d_tpu.training.train_step import (
    create_train_state, make_train_step,
)
from tests.test_model_smoke import tiny_config, PC_RANGE


def run(method: str, steps: int):
    import jax.numpy as jnp

    cfg = tiny_config()
    lcfg = LossConfig(
        code_weights=(1.0,) * 8 + (0.2, 0.2),
        assigner=dataclasses.replace(
            assigner_lib.AssignerConfig(), method=method
        ),
    )
    tx = optim.make_optimizer(base_lr=3e-4, total_steps=steps,
                              cyclic=False, grad_clip=10.0)
    rng = np.random.RandomState(0)
    batch = {
        k: jnp.asarray(v) for k, v in synthetic.make_batch(
            rng, batch_size=2, n_points=2000, n_boxes=4, max_gts=6,
            num_classes=4, pc_range=PC_RANGE,
        ).items()
    }
    _, state = create_train_state(cfg, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(cfg, lcfg, tx))
    key = jax.random.PRNGKey(1)
    losses, ious = [], []
    for _ in range(steps):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
        iou = metrics.get("matched_ious")
        ious.append(float(iou) if iou is not None else float("nan"))
    return np.asarray(losses), np.asarray(ious)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()

    la, ia = run("auction", args.steps)
    ls, is_ = run("scipy", args.steps)
    print(f"{'step':>4} {'loss_auct':>10} {'loss_scipy':>10} "
          f"{'iou_auct':>9} {'iou_scipy':>9}")
    for i in range(0, args.steps, max(args.steps // 10, 1)):
        print(f"{i:>4} {la[i]:>10.4f} {ls[i]:>10.4f} "
              f"{ia[i]:>9.4f} {is_[i]:>9.4f}")
    tail = max(args.steps // 4, 1)
    print(f"\nfinal-quarter means (last {tail} steps):")
    print(f"  loss        auction {la[-tail:].mean():.4f}  "
          f"scipy {ls[-tail:].mean():.4f}  "
          f"rel-gap {(la[-tail:].mean() / ls[-tail:].mean() - 1) * 100:+.2f}%")
    print(f"  matched_iou auction {ia[-tail:].mean():.4f}  "
          f"scipy {is_[-tail:].mean():.4f}  "
          f"abs-gap {ia[-tail:].mean() - is_[-tail:].mean():+.4f}")


if __name__ == "__main__":
    main()
