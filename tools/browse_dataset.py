#!/usr/bin/env python3
"""Visualize pipeline output: BEV scatter of points + GT boxes -> PNG.

Counterpart of /root/reference/tools/misc/browse_dataset.py (open3d viewer)
as a headless matplotlib render — sanity-checks augmentation, GT-paste, and
range filtering without a display.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def render_bev(points, boxes, out_path, pc_range=(-54, -54, 54, 54)):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    ax.scatter(points[:, 0], points[:, 1], s=0.05, c="gray")
    for b in boxes:
        cx, cy, dx, dy, yaw = b[0], b[1], b[3], b[4], b[6]
        c, s = np.cos(yaw), np.sin(yaw)
        base = np.array([[0.5, 0.5], [0.5, -0.5], [-0.5, -0.5], [-0.5, 0.5],
                         [0.5, 0.5]])
        corners = base * [dx, dy]
        corners = corners @ np.array([[c, s], [-s, c]]) + [cx, cy]
        ax.plot(corners[:, 0], corners[:, 1], "r-", lw=0.8)
    ax.set_xlim(pc_range[0], pc_range[2])
    ax.set_ylim(pc_range[1], pc_range[3])
    ax.set_aspect("equal")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", default=None)
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--train-pipeline", action="store_true")
    p.add_argument("--out", default="browse.png")
    args = p.parse_args()

    if args.synthetic:
        from focalformer3d_tpu.data import synthetic

        rng = np.random.RandomState(args.index)
        pts, boxes, _ = synthetic.make_scene(rng)
        render_bev(pts, boxes, args.out)
    else:
        from focalformer3d_tpu.data import nuscenes as nusc
        from focalformer3d_tpu.data import pipelines as pl

        ann = args.ann_file or str(
            Path(args.data_root) / "nuscenes_infos_train.pkl"
        )
        pcr = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
        pipe = (
            pl.train_pipeline(pcr, nusc.CLASS_NAMES)
            if args.train_pipeline else pl.test_pipeline(pcr)
        )
        ds = nusc.NuScenesDataset(ann, data_root=args.data_root,
                                  pipeline=pipe)
        s = ds.get_sample(args.index, np.random.RandomState(0))
        render_bev(
            s["points"], s.get("gt_boxes", np.zeros((0, 9))), args.out
        )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
