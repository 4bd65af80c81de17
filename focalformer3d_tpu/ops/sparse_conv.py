"""Sparse 3D convolution engine: dense-index-grid rulebooks + gather-GEMM.

TPU-native replacement for spconv's submanifold / strided sparse convolutions
(the reference's ``SparseEncoder`` middle encoder — SURVEY.md §2.3, config
/root/reference/projects/configs/focalformer3d/FocalFormer3D_L.py:198-206).

Representation: a fixed-capacity voxel table per sample —
    features (V, C), coords (V, 3) int32 (z, y, x), valid (V,) bool.
Neighbor lookup uses a transient dense int32 grid over the spatial shape
(row index scattered at each active voxel's linear key): one scatter +
K cheap gathers per rulebook. Measured on a v5 chip, this is ~60x faster
than binary search (`searchsorted` costs ~13.7 ms per 120k-tap on TPU vs
0.4 ms for a dense gather); the grid is a few hundred MB at the 1440^2 x 41
top level and freed after the rulebook is built.  Convolution is then
``sum_k gather(features, rules[k]) @ W[k]`` — K gathers + K MXU matmuls.
Rulebooks depend only on coordinates, so they are built once per voxel set
and shared by every submanifold layer on that set (spconv ``indice_key``
semantics).

Output sites of a strided conv are derived with a scatter-min dedupe +
cumsum compaction over all candidate output keys (capacity-bounded, no
sort), matching spconv's "any tap touches an active input" activation rule.
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
    """z-minor linearization: key = (y*W + x)*D + z.

    z-minor makes the three z-taps of a 3x3x3 kernel CONSECUTIVE keys, so a
    rulebook needs only 9 slice-3 gathers into the index grid instead of 27
    scalar gathers (TPU gathers are latency-bound; 3x fewer fetches)."""
    D, H, W = shape
    key = (coords[:, 1] * W + coords[:, 2]) * D + coords[:, 0]
    return jnp.where(valid, key, INT_MAX)


@dataclasses.dataclass(frozen=True)
class VoxelTable:
    """Dense-grid index over an active voxel set (one sample).

    ``grid`` has prod(shape)+1 entries: grid[key] = table row of the active
    voxel at that linear key, or V (miss). The final slot absorbs invalid
    scatters/lookups.
    """

    coords: jax.Array  # (V, 3)
    valid: jax.Array  # (V,)
    grid: jax.Array  # (prod(shape) + 1,) int32

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]


jax.tree_util.register_pytree_node(
    VoxelTable,
    lambda t: ((t.coords, t.valid, t.grid), None),
    lambda _, c: VoxelTable(*c),
)


def build_table(coords: jax.Array, valid: jax.Array, shape) -> VoxelTable:
    D, H, W = shape
    n = D * H * W
    V = coords.shape[0]
    keys = linear_keys(coords, valid, shape)
    slot = jnp.where(valid, keys, n)
    grid = jnp.full((n + 1,), V, jnp.int32).at[slot].set(
        jnp.arange(V, dtype=jnp.int32), mode="drop"
    )
    return VoxelTable(coords, valid, grid)


def lookup(table: VoxelTable, query_keys: jax.Array) -> jax.Array:
    """Query keys -> row indices into the table, or V (miss sentinel)."""
    V = table.capacity
    n = table.grid.shape[0] - 1
    qk = jnp.where(query_keys == INT_MAX, n, query_keys)
    hit = table.grid[jnp.clip(qk, 0, n)]
    return jnp.where(query_keys == INT_MAX, V, hit).astype(jnp.int32)


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
    Tap order is kernel_offsets order (dz-major, then dy, dx).

    z-minor keys make the kz z-taps of one (dy, dx) column consecutive, so
    the 27 lookups collapse to ky*kx slice-kz gathers (lax.gather with
    slice_sizes) — ~3x fewer latency-bound grid fetches on TPU.
    """
    kz, ky, kx = _as_triple(kernel_size)
    s = jnp.asarray(_as_triple(stride), jnp.int32)
    p = jnp.asarray(_as_triple(padding), jnp.int32)
    D, H, W = in_shape
    V = in_table.capacity
    n = D * H * W
    base = out_coords * s[None, :] - p[None, :]  # (Vo, 3) zyx of dz=dy=dx=0

    # sentinel-pad BOTH ends: starts can be as low as -pz (z-tap underflow
    # at column 0); clipping a negative start would misalign the whole
    # slice, so shift starts by +kz into the leading pad instead.
    gridp = jnp.concatenate([
        jnp.full((kz,), V, jnp.int32),
        in_table.grid,
        jnp.full((kz,), V, jnp.int32),
    ])
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    zi0 = base[:, 0]
    z_ok = (
        (zi0[:, None] + jnp.arange(kz)[None, :] >= 0)
        & (zi0[:, None] + jnp.arange(kz)[None, :] < D)
    )  # (Vo, kz)
    cols = []
    for dy in range(ky):
        for dx in range(kx):
            yi = base[:, 1] + dy
            xi = base[:, 2] + dx
            bev_ok = out_valid & (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            start = (yi * W + xi) * D + zi0 + kz  # +kz: leading pad offset
            start = jnp.clip(jnp.where(bev_ok, start, n + kz), 0, n + kz)
            got = jax.lax.gather(
                gridp, start[:, None], dn, slice_sizes=(kz,),
                mode=jax.lax.GatherScatterMode.CLIP,
            )  # (Vo, kz)
            got = jnp.where(bev_ok[:, None] & z_ok, got, V)
            cols.append(got)
    # (Vo, ky*kx, kz) -> (kz, ky*kx, Vo) -> (K, Vo) in dz-major tap order
    rules = jnp.stack(cols, axis=1)
    rules = jnp.transpose(rules, (2, 1, 0)).reshape(kz * ky * kx, -1)
    return rules.astype(jnp.int32)


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
    V_out = rules.shape[1]
    fpad = jnp.concatenate(
        [features, jnp.zeros((1, C_in), features.dtype)], axis=0
    )
    # one fused gather in (site, tap) order -> (V_out, K*C_in), then a single
    # wide MXU matmul with contraction K*C_in (vs 27 tiny latency-bound
    # gathers + skinny matmuls)
    g = fpad[rules.T.reshape(-1)].reshape(V_out, K * C_in)
    w = weights.reshape(K * C_in, C_out)
    acc = jnp.dot(
        g.astype(compute_dtype), w.astype(compute_dtype),
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
        cand.append(jnp.where(
            inb, (j[:, 1] * Wo + j[:, 2]) * Do + j[:, 0], INT_MAX
        ))
    cand = jnp.concatenate(cand, axis=0)  # (K*V,) linear out keys
    # dedupe without sorting: scatter-min the candidate index per key into a
    # dense grid; a candidate is canonical iff it reads back its own index.
    n_out = Do * Ho * Wo
    M = cand.shape[0]
    order = jnp.arange(M, dtype=jnp.int32)
    cslot = jnp.where(cand == INT_MAX, n_out, cand)
    grid = jnp.full((n_out + 1,), M, jnp.int32).at[cslot].min(
        order, mode="drop"
    )
    is_new = (grid[jnp.clip(cslot, 0, n_out)] == order) & (cand != INT_MAX)
    slot = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_unique = jnp.sum(is_new.astype(jnp.int32))
    tgt = jnp.where(is_new & (slot < out_capacity), slot, out_capacity)
    out_keys = jnp.full((out_capacity,), INT_MAX, jnp.int32).at[tgt].set(
        cand, mode="drop"
    )
    out_valid = out_keys != INT_MAX
    zz = jnp.where(out_valid, out_keys % Do, 0)
    rem = jnp.where(out_valid, out_keys // Do, 0)
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
    key = linear_keys(coords, valid, shape)  # z-minor: (y*W + x)*D + z
    idx = jnp.where(valid, key, D * H * W)
    dense = jnp.zeros((D * H * W, C), features.dtype).at[idx].set(
        jnp.where(valid[:, None], features, 0.0), mode="drop"
    )
    return jnp.transpose(dense.reshape(H, W, D, C), (2, 0, 1, 3))
