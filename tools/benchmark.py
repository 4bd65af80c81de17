#!/usr/bin/env python3
"""Inference / training throughput benchmark.

Counterpart of /root/reference/tools/analysis_tools/benchmark.py (2000-sample
timed loop): measures steady-state per-scan latency of the jitted predict
step on synthetic scans. ``--train`` instead times the full jitted train
step (loss + Hungarian assignment + GT groups + backward + optimizer), and
for configs with frozen branches also times a freeze-disabled variant to
show the backward-compute saving (reference recipe README.md:67-74 trains
20+6 epochs x 28k scans, so steps/s decides wall-clock feasibility).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="FocalFormer3D_L")
    p.add_argument("--samples", type=int, default=200)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--n-points", type=int, default=200000)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    p.add_argument("--train", action="store_true",
                   help="benchmark the train step instead of inference")
    args = p.parse_args()

    from focalformer3d_tpu.utils import platform as _plat
    _plat.setup(args.platform)
    import jax
    import jax.numpy as jnp

    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.models.detector import (
        FocalFormer3D, preprocess_points,
    )

    cfg = get_config(args.config)["model"]
    model = FocalFormer3D(cfg)
    rng = np.random.RandomState(0)
    batch = synthetic.make_batch(
        rng, batch_size=args.batch_size, n_points=args.n_points, n_boxes=24,
        max_gts=32, num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range, with_images=cfg.input_img,
        img_hw=cfg.lss.img_scale,
    )
    points = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["points_mask"])
    img_data = None
    if cfg.input_img:
        img_data = {
            k: jnp.asarray(batch[k])
            for k in ("imgs", "lidar2img", "img_aug", "bev_aug")
        }

    if args.train:
        bench_train(args, cfg, batch)
        return

    vox = preprocess_points(cfg, points, mask)
    init = jax.jit(
        lambda k, v, i: model.init({"params": k}, v, i, False)
    )
    variables = init(jax.random.PRNGKey(0), vox, img_data)

    # Chained timing + host-fetch sync: block_until_ready is unreliable on
    # remote-TPU backends (see bench.py).
    @jax.jit
    def predict(v, pts, m, img, eps):
        vox = preprocess_points(cfg, pts + eps, m)
        out = model.apply(v, vox, img, False)
        dec = model.get_bboxes(out, 200)
        return dec, dec["scores"].sum() * 0.0

    out, eps = predict(variables, points, mask, img_data, jnp.float32(0))
    _ = float(eps)
    for _ in range(args.warmup):
        out, eps = predict(variables, points, mask, img_data, eps)
    _ = float(eps)

    t0 = time.perf_counter()
    for _ in range(args.samples):
        out, eps = predict(variables, points, mask, img_data, eps)
    _ = float(eps)
    dt = time.perf_counter() - t0
    scans = args.samples * args.batch_size
    print(f"{scans} scans in {dt:.2f}s -> {scans / dt:.2f} scans/s "
          f"({1000 * dt / scans:.1f} ms/scan)")


def bench_train(args, cfg, batch):
    """Jitted train-step steps/s (+ freeze-on vs freeze-off comparison)."""
    import dataclasses
    import jax
    import jax.numpy as jnp

    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.training import optim
    from focalformer3d_tpu.training.train_step import (
        create_train_state, make_train_step, trainable_mask,
    )

    lcfg = get_config(args.config)["loss"]
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "tokens"}

    def time_one(cfg, tag, iters):
        import time

        has_freeze = cfg.freeze_img or cfg.freeze_camlss or cfg.freeze_pts
        tx = optim.make_optimizer(
            trainable_mask=(
                (lambda params: trainable_mask(cfg, params))
                if has_freeze else None
            ),
        )
        _, state = create_train_state(
            cfg, tx, jax.random.PRNGKey(0), jb
        )
        step = jax.jit(make_train_step(cfg, lcfg, tx))
        rng = jax.random.PRNGKey(1)
        state, metrics = step(state, jb, rng)
        _ = float(metrics["loss"])  # host fetch = sync (axon-safe)
        state, metrics = step(state, jb, rng)
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, jb, rng)
        _ = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / iters
        bs = jb["points"].shape[0]
        print(f"{tag}: {dt * 1e3:.1f} ms/step "
              f"({bs / dt:.2f} scans/s, batch {bs})")
        return dt

    t = time_one(cfg, f"train step [{args.config}]", max(3, args.samples))
    if cfg.freeze_img or cfg.freeze_camlss or cfg.freeze_pts:
        cfg_nf = dataclasses.replace(
            cfg, freeze_img=False, freeze_camlss=False, freeze_pts=False)
        t_nf = time_one(cfg_nf, "train step [freeze disabled]",
                        max(3, args.samples))
        print(f"freeze saves {100 * (1 - t / t_nf):.1f}% step time")

    # loss-component time share: forward | +loss (assign/targets/costs)
    # | backward+update = step - (forward+loss)
    import time as _time

    from focalformer3d_tpu.models.detector import (
        FocalFormer3D, preprocess_points,
    )
    from focalformer3d_tpu.training.losses import detection_loss
    from focalformer3d_tpu.training.train_step import (
        _img_data_from_batch, grid_mask,
    )

    model = FocalFormer3D(cfg)
    tx2 = optim.make_optimizer()
    _, state = create_train_state(cfg, tx2, jax.random.PRNGKey(0), jb)
    rng = jax.random.PRNGKey(1)

    def fwd(params, batch_stats, batch, rng):
        vox = None
        if cfg.input_pts:
            vox = preprocess_points(
                cfg, batch["points"], batch["points_mask"], train=True)
        kg, kd, km = jax.random.split(rng, 3)
        img_data = _img_data_from_batch(batch) if cfg.input_img else None
        if img_data is not None and cfg.use_grid_mask:
            img_data = dict(img_data)
            img_data["imgs"] = grid_mask(km, img_data["imgs"])
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            vox, img_data, True,
            batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"],
            rngs={"gt": kg, "dropout": kd}, mutable=["batch_stats"],
        )
        return out

    def fwd_loss(params, batch_stats, batch, rng):
        out = fwd(params, batch_stats, batch, rng)
        loss, _ = detection_loss(
            cfg.decoder, lcfg, out,
            batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"],
        )
        return loss

    def ptime(f, *a, iters=None):
        iters = iters or max(3, args.samples)
        r = f(*a)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
        r = f(*a)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
        t0 = _time.perf_counter()
        for _i in range(iters):
            r = f(*a)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
        return (_time.perf_counter() - t0) / iters

    jf = jax.jit(lambda p, bs, b, r: jax.tree.map(
        lambda x: x.sum(), fwd(p, bs, b, r)))
    t_f = ptime(jf, state.params, state.batch_stats, jb, rng)
    jl = jax.jit(fwd_loss)
    t_fl = ptime(jl, state.params, state.batch_stats, jb, rng)
    print(f"forward {t_f*1e3:.1f} ms | loss(assign+targets+costs) "
          f"{(t_fl - t_f)*1e3:.1f} ms | backward+update "
          f"{(t - t_fl)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
