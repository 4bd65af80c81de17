#!/usr/bin/env python3
"""Training CLI.

Counterpart of /root/reference/tools/train.py (mmcv runner launch): builds a
named config, a nuScenes dataset (or a synthetic stream with --synthetic), a
1-D data-parallel mesh over all local devices, and runs the epoch loop with
Fading, per-epoch checkpointing, and auto-resume.

Examples:
  python tools/train.py FocalFormer3D_L --data-root data/nuscenes \
      --work-dir work_dirs/ff3d_l
  python tools/train.py FocalFormer3D_L --synthetic --iters-per-epoch 20 \
      --epochs 2 --work-dir /tmp/smoke
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser(description="Train a FocalFormer3D-TPU model")
    p.add_argument("config", help="config name, e.g. FocalFormer3D_L")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--ann-file", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="train on the synthetic scene generator (smoke)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--iters-per-epoch", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="global batch (default samples_per_device * ndev)")
    p.add_argument("--max-points", type=int, default=300000)
    p.add_argument("--no-cbgs", action="store_true")
    p.add_argument("--load-from", default=None,
                   help="checkpoint dir to warm-start params from")
    p.add_argument("--load-img-from", default=None,
                   help="checkpoint dir for the image branch only")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--keep-last", type=int, default=None)
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    p.add_argument("--no-tensorboard", action="store_true",
                   help="disable the TensorBoard writer (reference "
                        "TensorboardLoggerHook parity; on by default "
                        "when torch's SummaryWriter imports)")
    return p.parse_args()


def main():
    args = parse_args()
    from focalformer3d_tpu.utils import platform as _plat
    _plat.setup(args.platform)
    import jax
    import jax.numpy as jnp

    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.parallel import mesh as mesh_lib
    from focalformer3d_tpu.training import checkpoint as ckpt
    from focalformer3d_tpu.training import optim
    from focalformer3d_tpu.training.loop import Fading, run_training
    from focalformer3d_tpu.training.train_step import (
        create_train_state, make_train_step,
    )

    # multi-host: env-driven (JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    # JAX_PROCESS_ID, or TPU-pod auto-detect) — the reference's
    # dist_train.sh / torch.distributed.launch equivalent
    multihost = mesh_lib.init_distributed()
    main_proc = mesh_lib.is_main_process()
    if multihost:
        print(f"process {jax.process_index()}/{jax.process_count()} "
              f"({jax.local_device_count()} local devices)")

    cfg_all = get_config(args.config)
    cfg, lcfg, recipe = cfg_all["model"], cfg_all["loss"], cfg_all["train"]
    n_dev = jax.device_count()
    # global batch; each process feeds its local slice
    batch_size_global = args.batch_size or recipe.samples_per_device * n_dev
    batch_size = max(1, batch_size_global // jax.process_count())
    epochs = args.epochs or recipe.total_epochs
    work_dir = args.work_dir or f"work_dirs/{args.config}"

    rng_np = np.random.RandomState(args.seed)
    with_images = cfg.input_img

    if args.synthetic:
        iters = args.iters_per_epoch or 100

        def batch_iter(epoch):
            for _ in range(iters):
                yield {
                    k: jnp.asarray(v) for k, v in synthetic.make_batch(
                        rng_np, batch_size=batch_size, n_points=30000,
                        n_boxes=min(16, cfg.decoder.max_gts // 4),
                        max_gts=cfg.decoder.max_gts // 4,
                        num_classes=cfg.decoder.num_classes,
                        pc_range=cfg.voxel.point_cloud_range,
                        with_images=with_images,
                        img_hw=cfg.lss.img_scale,
                    ).items()
                }

        pipeline = None
        steps_per_epoch = iters
    elif cfg_all.get("dataset", "nuscenes") == "waymo":
        from focalformer3d_tpu.data import nuscenes as nusc  # collate
        from focalformer3d_tpu.data import pipelines as pl
        from focalformer3d_tpu.data import waymo as wds

        ann = args.ann_file or str(
            Path(args.data_root) / "waymo_infos_train.pkl"
        )
        pipe = pl.train_pipeline(
            cfg.voxel.point_cloud_range, cfg_all["class_names"],
            db_sampler=None, with_images=False,
        )
        ds = wds.WaymoDataset(
            ann, data_root=args.data_root,
            classes=cfg_all["class_names"], pipeline=pipe,
            load_interval=cfg_all.get("load_interval", 1),
        )
        pipeline = ds.pipeline
        indices = np.arange(len(ds))[
            jax.process_index()::jax.process_count()
        ]
        steps_per_epoch = max(1, len(indices) // batch_size)
        if args.iters_per_epoch:
            steps_per_epoch = args.iters_per_epoch

        def batch_iter(epoch):
            order = rng_np.permutation(indices)
            for it in range(steps_per_epoch):
                sel = order[it * batch_size: (it + 1) * batch_size]
                if len(sel) < batch_size:
                    return
                samples = [ds.get_sample(int(i), rng_np) for i in sel]
                b = nusc.collate(
                    samples, cfg_all["class_names"],
                    max_points=args.max_points,
                    max_gts=cfg.decoder.max_gts // 4,
                )
                b.pop("tokens", None)
                yield {k: jnp.asarray(v) for k, v in b.items()}
    else:
        from focalformer3d_tpu.data import nuscenes as nusc
        from focalformer3d_tpu.data import pipelines as pl

        ann = args.ann_file or str(
            Path(args.data_root) / "nuscenes_infos_train.pkl"
        )
        db_sampler = None
        db_path = Path(args.data_root) / "nuscenes_dbinfos_train.pkl"
        if db_path.exists() and not with_images:
            db_sampler = nusc.DBSampler(
                str(db_path), args.data_root, cfg_all["class_names"],
                sample_groups=dict(
                    car=2, truck=3, construction_vehicle=7, bus=4, trailer=6,
                    barrier=2, motorcycle=6, bicycle=6, pedestrian=2,
                    traffic_cone=2,
                ),
                min_points={c: 5 for c in cfg_all["class_names"]},
            )
        pipe = pl.train_pipeline(
            cfg.voxel.point_cloud_range, cfg_all["class_names"],
            db_sampler=db_sampler, with_images=with_images,
            img_scale=cfg.lss.img_scale,
        )
        ds = nusc.NuScenesDataset(
            ann, data_root=args.data_root, classes=cfg_all["class_names"],
            pipeline=pipe, with_images=with_images,
        )
        pipeline = ds.pipeline
        indices = (
            np.arange(len(ds)) if args.no_cbgs else ds.cbgs_indices(rng_np)
        )[jax.process_index()::jax.process_count()]
        steps_per_epoch = max(1, len(indices) // batch_size)
        if args.iters_per_epoch:
            steps_per_epoch = args.iters_per_epoch

        def batch_iter(epoch):
            order = rng_np.permutation(indices)
            for it in range(steps_per_epoch):
                sel = order[it * batch_size: (it + 1) * batch_size]
                if len(sel) < batch_size:
                    return
                samples = [ds.get_sample(int(i), rng_np) for i in sel]
                b = nusc.collate(
                    samples, cfg_all["class_names"],
                    max_points=args.max_points,
                    max_gts=cfg.decoder.max_gts // 4,
                )
                b.pop("tokens", None)
                yield {k: jnp.asarray(v) for k, v in b.items()}

    from focalformer3d_tpu.training.train_step import trainable_mask

    has_freeze = cfg.freeze_img or cfg.freeze_camlss or cfg.freeze_pts
    tx = optim.make_optimizer(
        base_lr=recipe.base_lr, weight_decay=recipe.weight_decay,
        total_steps=epochs * steps_per_epoch, grad_clip=recipe.grad_clip,
        lr_target_ratio=recipe.lr_target_ratio,
        momentum_target_ratio=recipe.momentum_target_ratio,
        step_ratio_up=recipe.step_ratio_up,
        trainable_mask=(
            (lambda params: trainable_mask(cfg, params))
            if has_freeze else None
        ),
    )

    print(f"devices: {n_dev}, global batch {batch_size_global}, "
          f"{steps_per_epoch} iters/epoch, {epochs} epochs")
    init_batch = next(iter(batch_iter(0)))
    _, state = create_train_state(
        cfg, tx, jax.random.PRNGKey(args.seed), init_batch
    )
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )
    print(f"params: {n_params / 1e6:.2f}M")

    if args.load_from:
        loaded = ckpt.restore_checkpoint(args.load_from, state)
        state = state.__class__(
            params=ckpt.load_partial_params(state.params, loaded.params),
            batch_stats=loaded.batch_stats,
            opt_state=state.opt_state, step=state.step,
        )
        print(f"warm-started params from {args.load_from}")
    if args.load_img_from:
        loaded = ckpt.restore_checkpoint(args.load_img_from, state)
        state = state.__class__(
            params=ckpt.load_partial_params(
                state.params, loaded.params, ckpt.img_branch_filter
            ),
            batch_stats=state.batch_stats,
            opt_state=state.opt_state, step=state.step,
        )
        print(f"loaded image branch from {args.load_img_from}")

    state, start_epoch = ckpt.auto_resume(work_dir, state)
    if start_epoch:
        print(f"auto-resumed from epoch {start_epoch}")

    mesh = mesh_lib.make_global_mesh() if multihost else mesh_lib.make_mesh()
    state = mesh_lib.replicate(mesh, state)
    shard_batch_fn = (
        mesh_lib.shard_global_batch if multihost else mesh_lib.shard_batch
    )

    fading = Fading(recipe.fade_epoch)
    fading.pipeline = pipeline

    run_training(
        make_train_step(cfg, lcfg, tx), state, batch_iter,
        epochs=epochs, start_epoch=start_epoch,
        rng=jax.random.PRNGKey(args.seed + 1),
        work_dir=work_dir, keep_last=args.keep_last,
        log_interval=args.log_interval, hooks=[fading],
        shard_fn=lambda b: shard_batch_fn(mesh, b),
        json_log_path=(
            str(Path(work_dir) / "train_log.jsonl")
            if work_dir and main_proc else None
        ),
        log_fn=print if main_proc else (lambda *_: None),
        save_checkpoints=main_proc,
        tensorboard_dir=(
            str(Path(work_dir) / "tf_logs")
            if work_dir and main_proc and not args.no_tensorboard
            else None
        ),
    )
    print("training complete")


if __name__ == "__main__":
    main()
