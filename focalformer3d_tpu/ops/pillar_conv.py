"""Sparse-BEV / dense-Z pillar engine for 3D sparse convolution.

Second-generation TPU-native backend for the spconv-parity SparseEncoder
(see ops/sparse_conv.py for the per-voxel gather-GEMM engine and the spconv
semantics being reproduced — reference SparseEncoder config at
/root/reference/projects/configs/focalformer3d/FocalFormer3D_L.py:198-206).

Why this layout: on TPU the per-voxel engine is bound by 27 random gathers
of tiny rows per conv plus 27 index lookups per rulebook (measured ~13 ms /
conv and ~50-80 ms / rulebook at the 1440^2 x 41 level). LiDAR occupancy is
"few active BEV columns x few active z cells", so we store each active BEV
column as a *dense z pillar*:

    feats (P, Dz, C)   zmask (P, Dz) bool   bev_coords (P, 2) int32 (y, x)

A 3x3x3 submanifold conv then needs only NINE BEV-neighbor gathers of
contiguous (Dz*C)-sized rows (~2.7 KB — DMA-efficient), with the z dimension
handled by dense shifted matmuls on the MXU. Inactive cells hold zeros, so
summing over a dense z window equals spconv's sum over active neighbors
exactly; outputs are re-masked with the active-set mask, preserving
submanifold/regular sparse-conv semantics bit-for-bit (see
tests/test_pillar_conv.py parity tests against the per-voxel engine).

Index structures are 2D: a (H*W+1) int32 BEV grid (8 MB at 1440^2 vs 340 MB
for the 3D grid), built with one scatter; rulebooks are 9 cheap gathers.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

INT_MAX = jnp.iinfo(jnp.int32).max

# BEV tap offsets for a 3x3 kernel, (dy, dx), row-major — the z taps are
# handled densely inside the pillar.
BEV_OFFSETS_3X3 = tuple((dy, dx) for dy in range(3) for dx in range(3))


@dataclasses.dataclass(frozen=True)
class PillarSet:
    """Active BEV columns of one sample (fixed capacity P)."""

    bev_coords: jax.Array  # (P, 2) int32 (y, x)
    valid: jax.Array  # (P,) bool
    grid: jax.Array  # (H*W + 1,) int32: bev key -> pillar row (P = miss)

    @property
    def capacity(self) -> int:
        return self.bev_coords.shape[0]


jax.tree_util.register_pytree_node(
    PillarSet,
    lambda t: ((t.bev_coords, t.valid, t.grid), None),
    lambda _, c: PillarSet(*c),
)


def _bev_keys(coords_yx: jax.Array, valid: jax.Array, hw) -> jax.Array:
    H, W = hw
    k = coords_yx[:, 0] * W + coords_yx[:, 1]
    return jnp.where(valid, k, INT_MAX)


def _build_set_from_keys(cand_keys: jax.Array, hw, capacity: int):
    """Dedupe candidate BEV keys (INT_MAX = invalid) into a PillarSet.

    Scatter-min + cumsum compaction (no sort)."""
    H, W = hw
    n = H * W
    M = cand_keys.shape[0]
    order = jnp.arange(M, dtype=jnp.int32)
    slot = jnp.where(cand_keys == INT_MAX, n, cand_keys)
    first = jnp.full((n + 1,), M, jnp.int32).at[slot].min(order, mode="drop")
    is_canon = (first[jnp.clip(slot, 0, n)] == order) & (
        cand_keys != INT_MAX
    )
    rank = jnp.cumsum(is_canon.astype(jnp.int32)) - 1
    tgt = jnp.where(is_canon & (rank < capacity), rank, capacity)
    keys_out = jnp.full((capacity,), INT_MAX, jnp.int32).at[tgt].set(
        cand_keys, mode="drop"
    )
    valid_out = keys_out != INT_MAX
    ky = jnp.where(valid_out, keys_out // W, 0)
    kx = jnp.where(valid_out, keys_out % W, 0)
    bev_coords = jnp.stack([ky, kx], -1).astype(jnp.int32)
    # pillar-row lookup grid over the new set
    gslot = jnp.where(valid_out, keys_out, n)
    grid = jnp.full((n + 1,), capacity, jnp.int32).at[gslot].set(
        jnp.arange(capacity, dtype=jnp.int32), mode="drop"
    )
    return PillarSet(bev_coords, valid_out, grid)


def build_pillars(
    coords: jax.Array,  # (V, 3) int32 (z, y, x) voxel coords
    valid: jax.Array,  # (V,)
    features: jax.Array,  # (V, C)
    shape: Tuple[int, int, int],  # (Dz, H, W)
    capacity: int,  # max active BEV columns P
):
    """Voxel table -> (PillarSet, feats (P, Dz, C), zmask (P, Dz))."""
    Dz, H, W = shape
    V, C = features.shape
    keys = _bev_keys(coords[:, 1:], valid, (H, W))
    pset = _build_set_from_keys(keys, (H, W), capacity)
    n = H * W
    pid = pset.grid[jnp.clip(jnp.where(keys == INT_MAX, n, keys), 0, n)]
    pid = jnp.where(valid, pid, capacity)  # capacity = dropped/invalid
    flat_idx = jnp.where(
        (pid < capacity) & valid, pid * Dz + coords[:, 0], capacity * Dz
    )
    feats = jnp.zeros((capacity * Dz + 1, C), features.dtype).at[
        flat_idx
    ].set(jnp.where(valid[:, None], features, 0.0), mode="drop")
    zmask = jnp.zeros((capacity * Dz + 1,), bool).at[flat_idx].set(
        valid, mode="drop"
    )
    return (
        pset,
        feats[:-1].reshape(capacity, Dz, C),
        zmask[:-1].reshape(capacity, Dz),
    )


def bev_rules(pset: PillarSet, hw, stride: int = 1, padding: int = 1):
    """(9, P) neighbor pillar rows for each output pillar (P = miss).

    For stride 1 (submanifold) the output set equals the input set; for the
    strided case call with the *output* PillarSet and the input grid — use
    `bev_rules_strided` instead.
    """
    H, W = hw
    n = H * W
    rules = []
    for dy, dx in BEV_OFFSETS_3X3:
        ny = pset.bev_coords[:, 0] * stride - padding + dy
        nx = pset.bev_coords[:, 1] * stride - padding + dx
        inb = pset.valid & (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
        key = jnp.where(inb, ny * W + nx, n)
        rules.append(
            jnp.where(inb, pset.grid[jnp.clip(key, 0, n)], pset.capacity)
        )
    return jnp.stack(rules, 0).astype(jnp.int32)


def bev_rules_strided(
    out_set: PillarSet, in_set: PillarSet, in_hw, stride=2, padding=1
):
    """(9, P_out) input pillar rows feeding each output pillar."""
    H, W = in_hw
    n = H * W
    rules = []
    for dy, dx in BEV_OFFSETS_3X3:
        ny = out_set.bev_coords[:, 0] * stride - padding + dy
        nx = out_set.bev_coords[:, 1] * stride - padding + dx
        inb = out_set.valid & (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
        key = jnp.where(inb, ny * W + nx, n)
        rules.append(
            jnp.where(inb, in_set.grid[jnp.clip(key, 0, n)], in_set.capacity)
        )
    return jnp.stack(rules, 0).astype(jnp.int32)


def downsample_bev_set(
    in_set: PillarSet, in_hw, out_hw, out_capacity: int,
    stride: int = 2, padding: int = 1,
):
    """Active output BEV columns of a strided 3x3 conv (any-tap-hit rule)."""
    Ho, Wo = out_hw
    cands = []
    for dy, dx in BEV_OFFSETS_3X3:
        num_y = in_set.bev_coords[:, 0] + padding - dy
        num_x = in_set.bev_coords[:, 1] + padding - dx
        jy = num_y // stride
        jx = num_x // stride
        ok = (
            in_set.valid
            & (jy * stride == num_y) & (jx * stride == num_x)
            & (jy >= 0) & (jy < Ho) & (jx >= 0) & (jx < Wo)
        )
        cands.append(jnp.where(ok, jy * Wo + jx, INT_MAX))
    cand = jnp.concatenate(cands, 0)
    return _build_set_from_keys(cand, out_hw, out_capacity)


def _zpad(x: jax.Array, pad: int):
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[1] = (pad, pad)
    return jnp.pad(x, cfg)


def pillar_conv(
    feats: jax.Array,  # (P_in, Dz_in, C_in) — zeros at inactive cells
    rules: jax.Array,  # (9, P_out) with P_in as miss sentinel
    weights: jax.Array,  # (9, kz, C_in, C_out), kz in {1, 3}
    z_stride: int = 1,
    z_padding: int = 1,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Masked 3D conv over pillar sets: returns (P_out, Dz_out, C_out),
    NOT yet output-masked (caller applies the output zmask)."""
    P_in, Dz, C_in = feats.shape
    K, kz, _, C_out = weights.shape
    Dz_out = (Dz + 2 * z_padding - kz) // z_stride + 1
    fpad = jnp.concatenate(
        [feats, jnp.zeros((1, Dz, C_in), feats.dtype)], 0
    )
    acc = jnp.zeros((rules.shape[1], Dz_out, C_out), compute_dtype)
    for k in range(K):
        g = fpad[rules[k]]  # (P_out, Dz, C_in) contiguous-row gather
        gz = _zpad(g, z_padding)
        # unfold the z window -> one wide matmul per tap (contraction kz*C)
        cols = [
            gz[:, dz: dz + (Dz_out - 1) * z_stride + 1: z_stride]
            for dz in range(kz)
        ]
        win = jnp.concatenate(cols, axis=-1)  # (P_out, Dz_out, kz*C_in)
        w = weights[k].reshape(kz * C_in, C_out)
        acc = acc + jax.lax.dot_general(
            win.astype(compute_dtype), w.astype(compute_dtype),
            (((2,), (0,)), ((), ())),
            preferred_element_type=compute_dtype,
        )
    return acc


def conv_zmask(
    zmask: jax.Array,  # (P_in, Dz_in) bool
    rules: jax.Array,  # (9, P_out)
    kz: int,
    z_stride: int = 1,
    z_padding: int = 1,
) -> jax.Array:
    """Output active mask: any tap (bev x z) hits an active input."""
    P_in, Dz = zmask.shape
    Dz_out = (Dz + 2 * z_padding - kz) // z_stride + 1
    mpad = jnp.concatenate([zmask, jnp.zeros((1, Dz), bool)], 0)
    out = jnp.zeros((rules.shape[1], Dz_out), bool)
    for k in range(rules.shape[0]):
        g = _zpad(mpad[rules[k]], z_padding)
        for dz in range(kz):
            out = out | g[:, dz: dz + (Dz_out - 1) * z_stride + 1: z_stride]
    return out


def pillars_to_dense_bev(
    feats: jax.Array,  # (P, Dz, C)
    pset: PillarSet,
    hw,
) -> jax.Array:
    """(H, W, C*Dz) dense BEV; c-major channel layout c*Dz + z (matches
    the voxel engine's z-collapse and mmdet3d's .dense().view(N, C*D, ..),
    so converted torch checkpoints line up at the SECOND input)."""
    H, W = hw
    P, Dz, C = feats.shape
    key = _bev_keys(pset.bev_coords, pset.valid, (H, W))
    idx = jnp.where(pset.valid, key, H * W)
    ffold = jnp.transpose(feats, (0, 2, 1)).reshape(P, C * Dz)
    flat = jnp.zeros((H * W + 1, C * Dz), feats.dtype).at[idx].set(
        jnp.where(pset.valid[:, None], ffold, 0.0),
        mode="drop",
    )
    return flat[:-1].reshape(H, W, C * Dz)
