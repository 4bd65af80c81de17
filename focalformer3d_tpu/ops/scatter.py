"""Segment reductions over fixed-capacity tables (bev_pool / VFE building blocks).

These replace the reference's CUDA ``bev_pool`` interval-sum kernel
(/root/reference/projects/mmdet3d_plugin/models/utils/ops/bev_pool/src/bev_pool_cuda.cu:20-42)
and the scatter-mean of dynamic voxelization with XLA ``segment_sum`` over
static segment counts — the TPU-idiomatic formulation (sorted or unsorted
indices both lower to efficient one-pass scatters).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int):
    """data (N, C), segment_ids (N,) int32 in [0, num_segments) or >= num_segments
    to drop. Returns (num_segments, C)."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data: jax.Array, segment_ids: jax.Array, num_segments: int):
    total = segment_sum(data, segment_ids, num_segments)
    ones = jnp.ones((data.shape[0], 1), data.dtype)
    count = segment_sum(ones, segment_ids, num_segments)
    return total / jnp.maximum(count, 1.0), count[:, 0]


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int):
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=False
    )


def bev_pool(
    feats: jax.Array,  # (N, C) frustum features
    bev_index: jax.Array,  # (N,) flattened (b*Z*H*W...) voxel index, or >= num_cells to drop
    num_cells: int,
) -> jax.Array:
    """Sum-pool frustum points into BEV cells: returns (num_cells, C).

    Equivalent to the reference bev_pool op (sort + interval sum); on TPU a
    direct segment_sum is both simpler and faster because XLA lowers it to a
    single scatter-add pass — no sort needed.
    """
    return segment_sum(feats, bev_index, num_cells)
