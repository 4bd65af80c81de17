"""Synthetic scene generator for tests, benchmarks, and overfit checks.

Generates scenes of ground-plane clutter + boxes with points sampled on
their surfaces, so a detector trained on them must actually localize
(box positions correlate with point density).
"""
from __future__ import annotations

import numpy as np


def make_scene(
    rng: np.random.RandomState,
    n_points: int = 30000,
    n_boxes: int = 12,
    num_classes: int = 10,
    pc_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 3.0),
    point_dim: int = 5,
):
    """Returns (points (N, D), gt_boxes (G, 9), gt_labels (G,))."""
    x0, y0, z0, x1, y1, z1 = pc_range
    margin = 0.1 * (x1 - x0)
    boxes = np.zeros((n_boxes, 9), np.float32)
    boxes[:, 0] = rng.uniform(x0 + margin, x1 - margin, n_boxes)
    boxes[:, 1] = rng.uniform(y0 + margin, y1 - margin, n_boxes)
    boxes[:, 2] = rng.uniform(-2.0, -1.0, n_boxes)
    boxes[:, 3] = rng.uniform(1.5, 5.0, n_boxes)
    boxes[:, 4] = rng.uniform(1.0, 2.5, n_boxes)
    boxes[:, 5] = rng.uniform(1.0, 2.5, n_boxes)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
    boxes[:, 7:9] = rng.uniform(-2, 2, (n_boxes, 2))
    labels = rng.randint(0, num_classes, n_boxes).astype(np.int32)

    n_obj = n_points // 2
    per = n_obj // n_boxes
    obj_pts = []
    for b in range(n_boxes):
        local = rng.uniform(-0.5, 0.5, (per, 3)).astype(np.float32)
        local *= boxes[b, 3:6]
        c, s = np.cos(boxes[b, 6]), np.sin(boxes[b, 6])
        world = np.stack([
            c * local[:, 0] - s * local[:, 1] + boxes[b, 0],
            s * local[:, 0] + c * local[:, 1] + boxes[b, 1],
            local[:, 2] + boxes[b, 2] + boxes[b, 5] / 2,
        ], -1)
        obj_pts.append(world)
    obj_pts = np.concatenate(obj_pts, 0)

    n_bg = n_points - len(obj_pts)
    bg = np.stack([
        rng.uniform(x0, x1, n_bg),
        rng.uniform(y0, y1, n_bg),
        rng.uniform(-2.2, -1.8, n_bg),  # ground plane
    ], -1).astype(np.float32)

    xyz = np.concatenate([obj_pts, bg], 0)
    extra = rng.uniform(0, 1, (n_points, point_dim - 3)).astype(np.float32)
    pts = np.concatenate([xyz, extra], -1)
    rng.shuffle(pts)
    return pts, boxes, labels


def make_batch(
    rng: np.random.RandomState,
    batch_size: int = 2,
    n_points: int = 30000,
    n_boxes: int = 12,
    max_gts: int = 32,
    num_classes: int = 10,
    pc_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 3.0),
    point_dim: int = 5,
):
    pts, masks, gts, gls, gvs = [], [], [], [], []
    for _ in range(batch_size):
        p, b, l = make_scene(rng, n_points, n_boxes, num_classes, pc_range,
                             point_dim)
        pts.append(p)
        masks.append(np.ones(n_points, bool))
        gb = np.zeros((max_gts, 9), np.float32)
        gb[:len(b)] = b
        gl = np.zeros((max_gts,), np.int32)
        gl[:len(l)] = l
        gv = np.zeros((max_gts,), bool)
        gv[:len(b)] = True
        gts.append(gb); gls.append(gl); gvs.append(gv)
    return {
        "points": np.stack(pts),
        "points_mask": np.stack(masks),
        "gt_boxes": np.stack(gts),
        "gt_labels": np.stack(gls),
        "gt_valid": np.stack(gvs),
    }
