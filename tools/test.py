#!/usr/bin/env python3
"""Evaluation CLI.

Counterpart of /root/reference/tools/test.py: runs the jitted predict step
over the validation split, decodes boxes, optionally applies TTA
(double-flip x multi-scale, merged with rotated-NMS + IoU voting), formats a
nuScenes submission JSON, and evaluates — with the official nuscenes-devkit
when available (--official-eval), else with the self-contained evaluator
(core/eval_nuscenes.py).

Example:
  python tools/test.py FocalFormer3D_L --checkpoint work_dirs/.../epoch_6 \
      --data-root data/nuscenes --out results/ff3d_l.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", required=False, default=None)
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--ann-file", default=None)
    p.add_argument("--out", default=None, help="submission json path")
    p.add_argument("--tracking-out", default=None)
    p.add_argument("--max-points", type=int, default=300000)
    p.add_argument("--max-out", type=int, default=200)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--tta", action="store_true",
                   help="double-flip TTA with box voting")
    p.add_argument("--tta-cache-dir", default=None,
                   help="dump per-sample mapped-back TTA candidates "
                        "(pre-NMS) for offline ensembling — reference "
                        "merge_augs.py temp_result_folder semantics")
    p.add_argument("--tta-ensemble", nargs="+", default=None,
                   help="skip inference; merge cached TTA candidates "
                        "from these model folders (reference "
                        "merge_augs.py ensemble=True semantics)")
    p.add_argument("--official-eval", action="store_true",
                   help="run the nuscenes-devkit DetectionEval on the "
                        "submission (needs --out, raw dataset, devkit)")
    p.add_argument("--eval-set", default="val")
    p.add_argument("--nusc-version", default="v1.0-trainval")
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    return p.parse_args()


def main():
    args = parse_args()
    from focalformer3d_tpu.utils import platform as _plat
    _plat.setup(args.platform)
    import jax
    import jax.numpy as jnp

    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.core import eval_nuscenes, results as res
    from focalformer3d_tpu.core.merge_augs import (
        TTAConfig, merge_tta_results,
    )
    from focalformer3d_tpu.data import nuscenes as nusc
    from focalformer3d_tpu.data import pipelines as pl
    from focalformer3d_tpu.training import checkpoint as ckpt
    from focalformer3d_tpu.training.train_step import (
        create_train_state, make_eval_step,
    )
    from focalformer3d_tpu.training import optim

    cfg_all = get_config(args.config)
    cfg = cfg_all["model"]
    classes = cfg_all["class_names"]
    dataset = cfg_all.get("dataset", "nuscenes")

    if dataset == "waymo":
        from focalformer3d_tpu.data import waymo as wds

        ann = args.ann_file or str(
            Path(args.data_root) / "waymo_infos_val.pkl"
        )
        ds = wds.WaymoDataset(
            ann, data_root=args.data_root, classes=classes,
            pipeline=pl.test_pipeline(
                cfg.voxel.point_cloud_range, with_images=False,
            ),
            test_mode=True,
        )
    else:
        ann = args.ann_file or str(
            Path(args.data_root) / "nuscenes_infos_val.pkl"
        )
        ds = nusc.NuScenesDataset(
            ann, data_root=args.data_root, classes=classes,
            pipeline=pl.test_pipeline(
                cfg.voxel.point_cloud_range, with_images=cfg.input_img,
                img_scale=cfg.lss.img_scale,
            ),
            with_images=cfg.input_img, test_mode=True,
        )
    n = len(ds) if args.limit is None else min(args.limit, len(ds))
    print(f"evaluating {n} samples")

    rng = np.random.RandomState(0)
    init_batch_np = nusc.collate(
        [ds.get_sample(0, rng)], classes, max_points=args.max_points,
        max_gts=cfg.decoder.max_gts // 4,
    )
    init_batch_np.pop("tokens")
    init_batch = {k: jnp.asarray(v) for k, v in init_batch_np.items()}
    tx = optim.make_optimizer(total_steps=1, cyclic=False)
    _, state = create_train_state(
        cfg, tx, jax.random.PRNGKey(0), init_batch
    )
    if args.checkpoint:
        state = ckpt.restore_checkpoint(args.checkpoint, state)
        print(f"loaded {args.checkpoint}")
    eval_step = jax.jit(make_eval_step(cfg, args.max_out))

    augs = [(1.0, False, False)]
    if args.tta:
        from focalformer3d_tpu.core.merge_augs import tta_augs

        augs = tta_augs(cfg_all.get("tta", {}))

    predictions = {}
    gt = {}
    t0 = time.time()
    from focalformer3d_tpu.data.prefetch import prefetch

    # sample loading is host-side IO + pipeline numpy work; keep it off
    # the eval step's critical path (single worker thread -> rng draw
    # order is unchanged)
    for i, s in enumerate(prefetch(
            (ds.get_sample(j, rng) for j in range(n)), depth=4)):
        token = s["token"]
        if args.tta_ensemble:
            # offline ensemble: merge cached candidates from several
            # models, no forward pass (ref merge_augs.py ensemble=True)
            from focalformer3d_tpu.core.merge_augs import (
                load_ensemble, merge_aug_boxes,
            )

            eb, es, el, ev = load_ensemble(
                args.tta_ensemble, token,
                pad_to=args.max_out * 8 * len(args.tta_ensemble),
            )
            merged = merge_aug_boxes(
                TTAConfig(num_classes=len(classes)),
                jnp.asarray(eb)[None], jnp.asarray(es)[None],
                jnp.asarray(el)[None], jnp.asarray(ev)[None],
            )
            m = np.asarray(merged["mask"])
            predictions[token] = {
                "boxes": np.asarray(merged["bboxes"])[m],
                "scores": np.asarray(merged["scores"])[m],
                "labels": np.asarray(merged["labels"])[m],
            }
            if "gt_boxes" in s and len(s["gt_boxes"]):
                names = s["gt_names"]
                keep = [j for j, nm in enumerate(names) if nm in classes]
                gt[token] = {
                    "boxes": s["gt_boxes"][keep],
                    "labels": np.asarray(
                        [classes.index(names[j]) for j in keep], np.int32
                    ),
                }
                if "gt_l2_only" in s:
                    gt[token]["l2_only"] = np.asarray(
                        s["gt_l2_only"])[keep]
            else:
                gt[token] = {"boxes": np.zeros((0, 9)),
                             "labels": np.zeros(0)}
            continue
        aug_results = []
        for scale, fh, fv in augs:
            sa = dict(s)
            pts = s["points"].copy()
            if scale != 1.0:
                # reference MultiScaleFlipAug3D: pts_scale_ratio scales
                # the point cloud before the forward pass
                pts[:, :3] = pts[:, :3] * scale
            if fh:
                pts[:, 1] = -pts[:, 1]
            if fv:
                pts[:, 0] = -pts[:, 0]
            sa["points"] = pts
            b = nusc.collate(
                [sa], classes, max_points=args.max_points,
                max_gts=cfg.decoder.max_gts // 4,
            )
            b.pop("tokens")
            dec = eval_step(
                state.params, state.batch_stats,
                {k: jnp.asarray(v) for k, v in b.items()},
            )
            aug_results.append({
                "bboxes": dec["bboxes"][0],
                "scores": dec["scores"][0],
                "labels": dec["labels"][0],
                "mask": dec["mask"][0],
            })
        if len(aug_results) == 1:
            dec = aug_results[0]
            m = np.asarray(dec["mask"])
            predictions[token] = {
                "boxes": np.asarray(dec["bboxes"])[m],
                "scores": np.asarray(dec["scores"])[m],
                "labels": np.asarray(dec["labels"])[m],
            }
        else:
            if args.tta_cache_dir:
                from focalformer3d_tpu.core.merge_augs import (
                    dump_aug_cache, mapping_back,
                )

                mb = [
                    np.asarray(mapping_back(
                        r["bboxes"], jnp.asarray(sc_), jnp.asarray(fh),
                        jnp.asarray(fv),
                    ))
                    for r, (sc_, fh, fv) in zip(aug_results, augs)
                ]
                dump_aug_cache(
                    args.tta_cache_dir, token,
                    np.concatenate(mb, 0),
                    np.concatenate(
                        [np.asarray(r["scores"]) for r in aug_results]),
                    np.concatenate(
                        [np.asarray(r["labels"]) for r in aug_results]),
                    np.concatenate(
                        [np.asarray(r["mask"]) for r in aug_results]),
                )
            merged = merge_tta_results(
                TTAConfig(num_classes=len(classes)), aug_results,
                scales=[a[0] for a in augs],
                flips_h=[a[1] for a in augs],
                flips_v=[a[2] for a in augs],
            )
            m = np.asarray(merged["mask"])
            predictions[token] = {
                "boxes": np.asarray(merged["bboxes"])[m],
                "scores": np.asarray(merged["scores"])[m],
                "labels": np.asarray(merged["labels"])[m],
            }
        if "gt_boxes" in s and len(s["gt_boxes"]):
            names = s["gt_names"]
            keep = [j for j, nm in enumerate(names) if nm in classes]
            gt[token] = {
                "boxes": s["gt_boxes"][keep],
                "labels": np.asarray(
                    [classes.index(names[j]) for j in keep], np.int32
                ),
            }
            if "gt_l2_only" in s:
                gt[token]["l2_only"] = np.asarray(s["gt_l2_only"])[keep]
        else:
            gt[token] = {"boxes": np.zeros((0, 9)), "labels": np.zeros(0)}
        if (i + 1) % 50 == 0:
            fps = (i + 1) / (time.time() - t0)
            print(f"{i + 1}/{n} ({fps:.2f} samples/s)")

    if dataset == "waymo":
        from focalformer3d_tpu.core import eval_waymo

        metrics = eval_waymo.evaluate_detections(predictions, gt, classes)
    else:
        metrics = eval_nuscenes.evaluate_detections(
            predictions, gt, classes
        )
    print(json.dumps({k: round(v, 4) for k, v in metrics.items()},
                     indent=1))
    if dataset != "waymo" and "nds_no_attr" in metrics:
        print("note: nds_no_attr averages 9 terms (no attribute error — "
              "info pkls carry no attributes) and is NOT comparable to "
              "published NDS; use --official-eval for devkit NDS.")

    if args.out and dataset != "waymo":
        infos_by_token = {info["token"]: info for info in ds.infos}
        sub = res.format_nuscenes_submission(
            predictions, infos_by_token, classes, args.out
        )
        print(f"wrote {args.out}")
        if args.tracking_out:
            res.tracking_from_detections(sub, args.tracking_out)
            print(f"wrote {args.tracking_out}")

    if args.official_eval and dataset != "waymo":
        official = run_official_nuscenes_eval(
            args.out, args.data_root, args.eval_set, args.nusc_version,
        )
        if official is not None:
            print("official nuScenes devkit metrics:")
            print(json.dumps(official, indent=1))


def run_official_nuscenes_eval(submission_json, data_root, eval_set,
                               version):
    """Run the official nuscenes-devkit DetectionEval on a submission
    json (reference tools/test.py:245-254 -> dataset.evaluate). Returns
    the devkit metrics dict, or None if the devkit / raw dataset is not
    available (the internal evaluator has already been reported)."""
    if not submission_json:
        print("--official-eval needs --out <submission.json>")
        return None
    try:
        from nuscenes import NuScenes
        from nuscenes.eval.detection.config import config_factory
        from nuscenes.eval.detection.evaluate import DetectionEval
    except ImportError:
        print("nuscenes-devkit not installed; used internal evaluator.")
        return None
    try:
        nusc_obj = NuScenes(
            version=version, dataroot=data_root, verbose=False
        )
        ev = DetectionEval(
            nusc_obj,
            config=config_factory("detection_cvpr_2019"),
            result_path=submission_json,
            eval_set=eval_set,
            output_dir=str(Path(submission_json).parent / "official_eval"),
            verbose=False,
        )
        metrics = ev.main(render_curves=False)
        return {
            "mAP": metrics["mean_ap"],
            "NDS": metrics["nd_score"],
            **{k: v for k, v in metrics.items()
               if k.startswith("mean_dist_aps") or k.startswith("tp_")},
        }
    except Exception as e:  # raw dataset missing, bad token set, ...
        print(f"official eval failed: {type(e).__name__}: {e}")
        return None


if __name__ == "__main__":
    main()
