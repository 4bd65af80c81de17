"""Hard & dynamic voxelization with static shapes (sort/segment formulation).

TPU-native replacement for mmdet3d's CUDA ``Voxelization`` op and the
per-sample python loop around it
(/root/reference/projects/mmdet3d_plugin/models/detectors/focalformer3d.py:189-233).

Strategy: points are padded to a fixed N with a validity mask. Each valid
in-range point gets a linearized voxel key; a stable sort groups equal keys,
run-starts are detected by key inequality, and a cumulative sum assigns dense
voxel slots.  Per-voxel point ranks come from position-minus-run-start. All
outputs are fixed capacity (max_voxels, max_points_per_voxel) with masks —
no host syncs, fully differentiable-free preprocessing that vmaps over batch.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .sparse_conv import exact_cumsum_i32


def _block_cumsum_f32(x: jax.Array) -> jax.Array:
    """Prefix sum over axis 0 of (N, D) f32 via blocked triangular
    matmuls: XLA lowers jnp.cumsum to a log-depth scan of full passes
    (~2 ms at the 200k-point bench scale); one (nb*D, 512) @ (512, 512)
    dot plus a tiny per-block offset scan is ~10x cheaper and carries
    the same ~1e-5 blockwise-summation rounding the docstring of
    hard_voxelize_simple already budgets for."""
    n, d = x.shape
    bs = 512
    nb = -(-n // bs)
    xp = jnp.pad(x, ((0, nb * bs - n), (0, 0)))
    # (D*nb, 512) rows so the matmul is MXU-shaped regardless of D
    xb = xp.reshape(nb, bs, d).transpose(2, 0, 1).reshape(d * nb, bs)
    tri = jnp.asarray(
        np.tril(np.ones((bs, bs), np.float32)).T, jnp.float32
    )  # incl[i] = sum_{j<=i} x[j]
    incl = jnp.dot(xb, tri, preferred_element_type=jnp.float32)
    incl = incl.reshape(d, nb, bs)
    offs = jnp.concatenate(
        [jnp.zeros((d, 1), jnp.float32), jnp.cumsum(incl[:, :, -1],
                                                    axis=1)[:, :-1]],
        axis=1,
    )
    out = (incl + offs[:, :, None]).reshape(d, nb * bs)
    return out.T[:n]


@dataclasses.dataclass(frozen=True)
class VoxelConfig:
    point_cloud_range: Sequence[float]  # (x0, y0, z0, x1, y1, z1)
    voxel_size: Sequence[float]  # (vx, vy, vz)
    max_num_points: int = 10  # per-voxel cap (hard mode)
    max_voxels: int = 120000
    # test-time voxel cap (reference nuScenes configs use
    # max_voxels=(120000 train, 160000 test) — mmdet3d Voxelization takes
    # a (train, test) pair); None = same as max_voxels
    max_voxels_test: int | None = None

    @property
    def grid_size(self):
        """(nx, ny, nz) — number of voxels along each axis."""
        pcr = self.point_cloud_range
        vs = self.voxel_size
        return (
            int(round((pcr[3] - pcr[0]) / vs[0])),
            int(round((pcr[4] - pcr[1]) / vs[1])),
            int(round((pcr[5] - pcr[2]) / vs[2])),
        )


def point_voxel_coords(cfg: VoxelConfig, points: jax.Array, mask: jax.Array):
    """Per-point integer voxel coords (z, y, x) and in-range validity.

    points: (N, >=3); mask: (N,) bool of real (non-pad) points.
    """
    pcr = jnp.asarray(cfg.point_cloud_range, points.dtype)
    vs = jnp.asarray(cfg.voxel_size, points.dtype)
    nx, ny, nz = cfg.grid_size
    cx = jnp.floor((points[:, 0] - pcr[0]) / vs[0]).astype(jnp.int32)
    cy = jnp.floor((points[:, 1] - pcr[1]) / vs[1]).astype(jnp.int32)
    cz = jnp.floor((points[:, 2] - pcr[2]) / vs[2]).astype(jnp.int32)
    valid = (
        mask
        & (cx >= 0) & (cx < nx)
        & (cy >= 0) & (cy < ny)
        & (cz >= 0) & (cz < nz)
    )
    coords = jnp.stack([cz, cy, cx], axis=-1)
    return coords, valid


def _linear_key(coords, valid, grid_size):
    """CSR-compatible linearization: column-major over BEV, z-minor —
    the same order ops/sparse_conv.py uses, so voxelizer output feeds
    the sparse encoder with identity CSR rows (no reorder pass)."""
    nx, ny, nz = grid_size
    key = (coords[:, 1] * nx + coords[:, 2]) * nz + coords[:, 0]
    return jnp.where(valid, key, jnp.iinfo(jnp.int32).max)


def hard_voxelize(cfg: VoxelConfig, points: jax.Array, mask: jax.Array):
    """Fixed-capacity hard voxelization of one sample.

    Args:
        points: (N, D) padded points.
        mask: (N,) bool.
    Returns dict:
        voxels: (V, P, D) per-voxel point slots (zero padded)
        num_points: (V,) int32 points per voxel (capped at P)
        coords: (V, 3) int32 (z, y, x)
        voxel_mask: (V,) bool — live voxels
    """
    V, P = cfg.max_voxels, cfg.max_num_points
    N, D = points.shape
    coords, valid = point_voxel_coords(cfg, points, mask)
    key = _linear_key(coords, valid, cfg.grid_size)

    order = jnp.argsort(key, stable=True)  # invalid (INT_MAX) sink to the end
    skey = key[order]
    svalid = valid[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
    ) & svalid
    voxel_id = exact_cumsum_i32(is_start.astype(jnp.int32)) - 1  # dense slot per run
    # rank of point within its voxel run
    pos = jnp.arange(N, dtype=jnp.int32)
    run_start_pos = jnp.where(is_start, pos, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, run_start_pos)
    rank = pos - run_start

    keep = svalid & (voxel_id < V) & (rank < P)
    flat_idx = jnp.where(keep, voxel_id * P + rank, V * P)

    sorted_pts = points[order]
    voxels = jnp.zeros((V * P, D), points.dtype).at[flat_idx].set(
        jnp.where(keep[:, None], sorted_pts, 0.0), mode="drop"
    ).reshape(V, P, D)

    ones = jnp.where(keep, 1, 0)
    num_points = jnp.zeros((V,), jnp.int32).at[
        jnp.where(keep, voxel_id, V)
    ].add(ones, mode="drop")

    vslot = jnp.where(is_start & (voxel_id < V), voxel_id, V)
    sorted_coords = coords[order]
    out_coords = jnp.zeros((V, 3), jnp.int32).at[vslot].set(
        sorted_coords, mode="drop"
    )
    voxel_mask = jnp.zeros((V,), bool).at[vslot].set(True, mode="drop")
    return {
        "voxels": voxels,
        "num_points": num_points,
        "coords": out_coords,
        "voxel_mask": voxel_mask,
    }


def dynamic_voxelize(cfg: VoxelConfig, points: jax.Array, mask: jax.Array):
    """Dynamic voxelization + mean VFE in one shot (DynamicSimpleVFE path,
    /root/reference/projects/configs/focalformer3d/DeformFormer3D_L_dynamic.py).

    Returns dict with per-voxel mean features (V, D), coords, voxel_mask.
    """
    V = cfg.max_voxels
    N, D = points.shape
    coords, valid = point_voxel_coords(cfg, points, mask)
    key = _linear_key(coords, valid, cfg.grid_size)
    order = jnp.argsort(key, stable=True)
    skey = key[order]
    svalid = valid[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
    ) & svalid
    voxel_id = exact_cumsum_i32(is_start.astype(jnp.int32)) - 1

    seg = jnp.where(svalid & (voxel_id < V), voxel_id, V)
    sorted_pts = points[order]
    total = jax.ops.segment_sum(sorted_pts, seg, num_segments=V + 1)[:V]
    count = jax.ops.segment_sum(
        jnp.ones((N,), points.dtype), seg, num_segments=V + 1
    )[:V]
    feats = total / jnp.maximum(count[:, None], 1.0)

    vslot = jnp.where(is_start & (voxel_id < V), voxel_id, V)
    out_coords = jnp.zeros((V, 3), jnp.int32).at[vslot].set(
        coords[order], mode="drop"
    )
    voxel_mask = jnp.zeros((V,), bool).at[vslot].set(True, mode="drop")
    return {"features": feats, "coords": out_coords, "voxel_mask": voxel_mask}


def hard_voxelize_simple(cfg: VoxelConfig, points: jax.Array,
                         mask: jax.Array):
    """Hard voxelization fused with HardSimpleVFE (per-voxel mean of the
    first ``max_num_points`` points) — skips materializing the
    (V, P, D) voxel tensor that mmdet3d's two-step pipeline builds
    (reference: Voxelization + HardSimpleVFE,
    focalformer3d.py:189-209 / FocalFormer3D_L.py:189-197).

    Returns dict: features (V, D), coords (V, 3), voxel_mask (V,).
    Semantics match hard_voxelize + hard_simple_vfe: only the first P
    points (input order) of each voxel contribute to the mean. The
    prefix-sum-difference formulation carries ~1e-5 absolute f32
    rounding relative to direct per-voxel summation (two large prefix
    sums cancel); negligible against the voxel features' scale.
    """
    V, P = cfg.max_voxels, cfg.max_num_points
    N, D = points.shape
    coords, valid = point_voxel_coords(cfg, points, mask)
    key = _linear_key(coords, valid, cfg.grid_size)

    order = jnp.argsort(key, stable=True)
    skey = key[order]
    svalid = valid[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
    ) & svalid
    voxel_id = exact_cumsum_i32(is_start.astype(jnp.int32)) - 1
    pos = jnp.arange(N, dtype=jnp.int32)

    # equal keys are contiguous after the sort, so per-voxel sums are
    # prefix-sum differences over run boundaries — no segment scatter,
    # and the first-P-points cap is pure index arithmetic.
    csum = _block_cumsum_f32(
        jnp.where(svalid[:, None], points[order], 0.0)
    )

    # One scatter total: run starts. Dropped (non-start) entries get
    # DISTINCT out-of-bounds sentinels (V + 1 + pos) so the whole index
    # vector is genuinely unique and the unique_indices fast path is
    # contractually valid; a shared sentinel would violate the hint (JAX
    # documents UB) even though the duplicates are dropped.
    # indices_are_sorted is NOT claimed: the sentinels interleave with
    # the ascending voxel ids.
    # slot V is also written (start of the first DROPPED run) so run
    # V-1's end is correct when the voxel capacity overflows
    vslot = jnp.where(is_start & (voxel_id <= V), voxel_id, V + 1 + pos)
    start_full = jnp.full((V + 1,), N, jnp.int32).at[vslot].set(
        pos, mode="drop", unique_indices=True
    )
    start = start_full[:V]
    # runs are contiguous in sorted order, so run v ends where run v+1
    # starts; the last run ends at the valid-point count — this replaces
    # a second 200k-row scatter with pure slicing (scatters run at
    # ~100 Mrows/s on this chip, tools/micro_plan_build2.py)
    n_valid = jnp.sum(svalid.astype(jnp.int32))
    run_end = jnp.minimum(start_full[1:], n_valid)
    end = jnp.maximum(jnp.minimum(start + P, run_end), start)
    count = jnp.where(start < N, end - start, 0)
    lo = jnp.where((start > 0)[:, None],
                   csum[jnp.maximum(start - 1, 0)], 0.0)
    hi = csum[jnp.maximum(end - 1, 0)]
    total = jnp.where((count > 0)[:, None], hi - lo, 0.0)
    feats = total[:, :D] / jnp.maximum(count[:, None], 1).astype(
        points.dtype
    )
    # coordinates by gather at the run starts (V rows) instead of a
    # 200k-row scatter
    start_rows = order[jnp.minimum(start, N - 1)]
    out_coords = jnp.where(
        (count > 0)[:, None], coords[start_rows], 0
    )
    voxel_mask = count > 0
    return {
        "features": feats,
        "coords": out_coords,
        "voxel_mask": voxel_mask,
    }
