"""Sparse 3D convolution engine: sort/searchsorted rulebooks + gather-GEMM.

TPU-native replacement for spconv's submanifold / strided sparse convolutions
(the reference's ``SparseEncoder`` middle encoder — SURVEY.md §2.3, config
/root/reference/projects/configs/focalformer3d/FocalFormer3D_L.py:198-206).

Representation: a fixed-capacity voxel table per sample —
    features (V, C), coords (V, 3) int32 (z, y, x), valid (V,) bool.
Active voxel keys are linearized ints; lookups are binary searches into the
key-sorted table (O(V log V), fully vectorized).  Convolution is then
``sum_k gather(features, rules[k]) @ W[k]`` — K gathers + K MXU matmuls.
Rulebooks depend only on coordinates, so they are built once per voxel set
and shared by every submanifold layer on that set (spconv ``indice_key``
semantics).

Output sites of a strided conv are derived with a sort-unique over all
candidate output keys (capacity-bounded), matching spconv's "any tap touches
an active input" activation rule.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

INT_MAX = jnp.iinfo(jnp.int32).max


def _as_triple(v) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    return tuple(v)  # type: ignore[return-value]


def kernel_offsets(kernel_size) -> Tuple[Tuple[int, int, int], ...]:
    kz, ky, kx = _as_triple(kernel_size)
    return tuple(
        (dz, dy, dx)
        for dz in range(kz)
        for dy in range(ky)
        for dx in range(kx)
    )


def linear_keys(coords: jax.Array, valid: jax.Array, shape) -> jax.Array:
    D, H, W = shape
    key = (coords[:, 0] * H + coords[:, 1]) * W + coords[:, 2]
    return jnp.where(valid, key, INT_MAX)


@dataclasses.dataclass(frozen=True)
class VoxelTable:
    """Key-sorted index over an active voxel set (one sample)."""

    coords: jax.Array  # (V, 3)
    valid: jax.Array  # (V,)
    sorted_keys: jax.Array  # (V,)
    sorted_idx: jax.Array  # (V,) position -> original table row

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]


jax.tree_util.register_pytree_node(
    VoxelTable,
    lambda t: ((t.coords, t.valid, t.sorted_keys, t.sorted_idx), None),
    lambda _, c: VoxelTable(*c),
)


def build_table(coords: jax.Array, valid: jax.Array, shape) -> VoxelTable:
    keys = linear_keys(coords, valid, shape)
    sorted_idx = jnp.argsort(keys).astype(jnp.int32)
    return VoxelTable(coords, valid, keys[sorted_idx], sorted_idx)


def lookup(table: VoxelTable, query_keys: jax.Array) -> jax.Array:
    """Query keys -> row indices into the table, or V (miss sentinel)."""
    V = table.capacity
    pos = jnp.searchsorted(table.sorted_keys, query_keys, side="left")
    pos = jnp.clip(pos, 0, V - 1)
    hit = (table.sorted_keys[pos] == query_keys) & (query_keys != INT_MAX)
    return jnp.where(hit, table.sorted_idx[pos], V).astype(jnp.int32)


def build_conv_rules(
    in_table: VoxelTable,
    in_shape,
    out_coords: jax.Array,
    out_valid: jax.Array,
    kernel_size,
    stride,
    padding,
) -> jax.Array:
    """Rulebook (K, V_out): input row feeding each output site per tap.

    out[j] = sum_d W[d] * x[j*stride - padding + d]  (d in [0, kernel)^3)
    Missing / inactive inputs map to the V_in sentinel (zero row).
    """
    s = jnp.asarray(_as_triple(stride), jnp.int32)
    p = jnp.asarray(_as_triple(padding), jnp.int32)
    D, H, W = in_shape
    base = out_coords * s[None, :] - p[None, :]
    rules = []
    for off in kernel_offsets(kernel_size):
        ic = base + jnp.asarray(off, jnp.int32)[None, :]
        inb = (
            out_valid
            & (ic[:, 0] >= 0) & (ic[:, 0] < D)
            & (ic[:, 1] >= 0) & (ic[:, 1] < H)
            & (ic[:, 2] >= 0) & (ic[:, 2] < W)
        )
        qk = linear_keys(ic, inb, in_shape)
        rules.append(lookup(in_table, qk))
    return jnp.stack(rules, axis=0)


def build_subm_rules(table: VoxelTable, shape, kernel_size=3) -> jax.Array:
    """Submanifold rulebook: output sites == input sites, stride 1,
    padding (k-1)//2."""
    k = _as_triple(kernel_size)
    pad = tuple((x - 1) // 2 for x in k)
    return build_conv_rules(
        table, shape, table.coords, table.valid, k, (1, 1, 1), pad
    )


def apply_conv(
    features: jax.Array,  # (V_in, C_in)
    rules: jax.Array,  # (K, V_out) with V_in as miss sentinel
    weights: jax.Array,  # (K, C_in, C_out)
    out_valid: jax.Array,  # (V_out,)
    bias: jax.Array | None = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Gather-GEMM-accumulate. Returns (V_out, C_out) masked by out_valid."""
    V_in, C_in = features.shape
    K, C_out = weights.shape[0], weights.shape[2]
    fpad = jnp.concatenate(
        [features, jnp.zeros((1, C_in), features.dtype)], axis=0
    )
    acc = jnp.zeros((rules.shape[1], C_out), compute_dtype)
    for k in range(K):
        g = fpad[rules[k]]
        acc = acc + jnp.dot(
            g.astype(compute_dtype),
            weights[k].astype(compute_dtype),
            preferred_element_type=compute_dtype,
        )
    if bias is not None:
        acc = acc + bias.astype(compute_dtype)[None, :]
    return jnp.where(out_valid[:, None], acc, 0.0).astype(features.dtype)


def conv_out_shape(in_shape, kernel_size, stride, padding):
    k, s, p = _as_triple(kernel_size), _as_triple(stride), _as_triple(padding)
    out = tuple(
        (d + 2 * pi - ki) // si + 1
        for d, ki, si, pi in zip(in_shape, k, s, p)
    )
    if any(d <= 0 for d in out):  # pragma: no cover - config error
        raise ValueError(
            f"sparse conv output shape {out} non-positive for input "
            f"{tuple(in_shape)} kernel {k} stride {s} padding {p}"
        )
    return out


def build_downsample(
    coords: jax.Array,
    valid: jax.Array,
    in_shape,
    kernel_size,
    stride,
    padding,
    out_capacity: int,
):
    """Active output set of a strided sparse conv (sort-unique of candidates).

    Returns (out_coords (Vo,3), out_valid (Vo,), overflow (scalar int32 count
    of dropped sites)). Output slot order is key-sorted (deterministic).
    """
    k = _as_triple(kernel_size)
    s = jnp.asarray(_as_triple(stride), jnp.int32)
    p = jnp.asarray(_as_triple(padding), jnp.int32)
    out_shape = conv_out_shape(in_shape, kernel_size, stride, padding)
    Do, Ho, Wo = out_shape

    cand = []
    for off in kernel_offsets(k):
        num = coords + p[None, :] - jnp.asarray(off, jnp.int32)[None, :]
        j = num // s[None, :]
        exact = jnp.all(j * s[None, :] == num, axis=1)
        inb = (
            valid & exact
            & (j[:, 0] >= 0) & (j[:, 0] < Do)
            & (j[:, 1] >= 0) & (j[:, 1] < Ho)
            & (j[:, 2] >= 0) & (j[:, 2] < Wo)
        )
        cand.append(jnp.where(inb, (j[:, 0] * Ho + j[:, 1]) * Wo + j[:, 2], INT_MAX))
    cand = jnp.concatenate(cand, axis=0)
    skey = jnp.sort(cand)
    is_new = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    is_new &= skey != INT_MAX
    slot = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_unique = jnp.sum(is_new.astype(jnp.int32))
    tgt = jnp.where(is_new & (slot < out_capacity), slot, out_capacity)
    out_keys = jnp.full((out_capacity,), INT_MAX, jnp.int32).at[tgt].set(
        skey, mode="drop"
    )
    out_valid = out_keys != INT_MAX
    zz = jnp.where(out_valid, out_keys // (Ho * Wo), 0)
    rem = jnp.where(out_valid, out_keys % (Ho * Wo), 0)
    out_coords = jnp.stack([zz, rem // Wo, rem % Wo], axis=-1).astype(jnp.int32)
    overflow = jnp.maximum(n_unique - out_capacity, 0)
    return out_coords, out_valid, out_shape, overflow


def to_dense(
    features: jax.Array,  # (V, C)
    coords: jax.Array,
    valid: jax.Array,
    shape,
) -> jax.Array:
    """Scatter the voxel table into a dense (D, H, W, C) grid."""
    D, H, W = shape
    C = features.shape[1]
    key = linear_keys(coords, valid, shape)
    idx = jnp.where(valid, key, D * H * W)
    dense = jnp.zeros((D * H * W, C), features.dtype).at[idx].set(
        jnp.where(valid[:, None], features, 0.0), mode="drop"
    )
    return dense.reshape(D, H, W, C)
