"""TransFusion-style box codec between world metric and BEV-grid units.

Semantics match the reference coder
(/root/reference/projects/mmdet3d_plugin/core/bbox/coders/transfusion_bbox_coder.py):

* encode: xy -> feature-grid units, z bottom-center -> gravity center,
  dims -> log, yaw -> (sin, cos), velocity passthrough.
* decode: inverse, plus per-query class = argmax over heatmap channels.

Unlike the reference (which boolean-filters boxes, producing dynamic shapes),
``decode`` here returns fixed-shape arrays plus a validity mask so the whole
inference path stays jittable on TPU.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BBoxCoderConfig:
    pc_range: Sequence[float]  # (x_min, y_min) of the point cloud range
    voxel_size: Sequence[float]  # (vx, vy)
    out_size_factor: int
    post_center_range: Optional[Sequence[float]] = None
    score_threshold: Optional[float] = None
    code_size: int = 10

    @property
    def grid_step(self):
        return (
            self.out_size_factor * self.voxel_size[0],
            self.out_size_factor * self.voxel_size[1],
        )


def encode(cfg: BBoxCoderConfig, boxes: jax.Array) -> jax.Array:
    """(..., 7|9) world boxes -> (..., code_size) regression targets."""
    sx, sy = cfg.grid_step
    tx = (boxes[..., 0] - cfg.pc_range[0]) / sx
    ty = (boxes[..., 1] - cfg.pc_range[1]) / sy
    tz = boxes[..., 2] + 0.5 * boxes[..., 5]  # bottom -> gravity center
    tl = jnp.log(boxes[..., 3] + 1e-6)
    tw = jnp.log(boxes[..., 4] + 1e-6)
    th = jnp.log(boxes[..., 5] + 1e-6)
    tsin = jnp.sin(boxes[..., 6])
    tcos = jnp.cos(boxes[..., 6])
    out = [tx, ty, tz, tl, tw, th, tsin, tcos]
    if cfg.code_size == 10:
        vel = boxes[..., 7:9] if boxes.shape[-1] >= 9 else jnp.zeros(
            boxes.shape[:-1] + (2,), boxes.dtype
        )
        out.extend([vel[..., 0], vel[..., 1]])
    return jnp.stack(out, axis=-1)


def encode_center(cfg: BBoxCoderConfig, center_xy: jax.Array) -> jax.Array:
    sx, sy = cfg.grid_step
    return jnp.stack(
        [
            (center_xy[..., 0] - cfg.pc_range[0]) / sx,
            (center_xy[..., 1] - cfg.pc_range[1]) / sy,
        ],
        axis=-1,
    )


def decode_center(cfg: BBoxCoderConfig, center_xy: jax.Array) -> jax.Array:
    sx, sy = cfg.grid_step
    return jnp.stack(
        [
            center_xy[..., 0] * sx + cfg.pc_range[0],
            center_xy[..., 1] * sy + cfg.pc_range[1],
        ],
        axis=-1,
    )


def decode_box(
    cfg: BBoxCoderConfig,
    center: jax.Array,  # (..., Q, 2) in grid units
    height: jax.Array,  # (..., Q, 1) gravity-center z
    dim: jax.Array,  # (..., Q, 3) log extents
    rot: jax.Array,  # (..., Q, 2) (sin, cos)
    vel: Optional[jax.Array] = None,  # (..., Q, 2)
) -> jax.Array:
    """Regression outputs -> world boxes (..., Q, 7|9)."""
    xy = decode_center(cfg, center)
    dims = jnp.exp(dim)
    z_bottom = height[..., 0] - 0.5 * dims[..., 2]
    yaw = jnp.arctan2(rot[..., 0], rot[..., 1])
    parts = [xy, z_bottom[..., None], dims, yaw[..., None]]
    if vel is not None:
        parts.append(vel)
    return jnp.concatenate(parts, axis=-1)


def decode(
    cfg: BBoxCoderConfig,
    heatmap: jax.Array,  # (..., Q, num_classes) per-query class scores
    center: jax.Array,
    height: jax.Array,
    dim: jax.Array,
    rot: jax.Array,
    vel: Optional[jax.Array] = None,
    apply_filter: bool = False,
):
    """Decode query predictions to world boxes with fixed shapes.

    Returns dict with 'bboxes' (..., Q, 7|9), 'scores' (..., Q),
    'labels' (..., Q) int32, and 'mask' (..., Q) bool (all True when
    ``apply_filter`` is False).
    """
    labels = jnp.argmax(heatmap, axis=-1).astype(jnp.int32)
    scores = jnp.max(heatmap, axis=-1)
    bboxes = decode_box(cfg, center, height, dim, rot, vel)
    mask = jnp.ones(scores.shape, dtype=bool)
    if apply_filter:
        if cfg.score_threshold is not None:
            mask &= scores > cfg.score_threshold
        if cfg.post_center_range is not None:
            pcr = jnp.asarray(cfg.post_center_range, dtype=bboxes.dtype)
            # The reference range-checks the *gravity* center triplet
            # (decode() there checks final_box_preds[..., :3] post z-shift to
            # bottom; we mirror that exact tensor: x, y, z_bottom).
            ctr = bboxes[..., :3]
            mask &= jnp.all(ctr >= pcr[:3], axis=-1)
            mask &= jnp.all(ctr <= pcr[3:6], axis=-1)
    return {"bboxes": bboxes, "scores": scores, "labels": labels, "mask": mask}
