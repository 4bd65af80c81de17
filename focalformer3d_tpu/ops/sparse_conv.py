"""Sparse 3D convolution engine: CSR + z-bitmask rulebooks, gather-GEMM.

TPU-native replacement for spconv's submanifold / strided sparse convolutions
(the reference's ``SparseEncoder`` middle encoder — SURVEY.md §2.3, config
/root/reference/projects/configs/focalformer3d/FocalFormer3D_L.py:198-206).

Representation: a fixed-capacity voxel table per sample —
    features (V, C), coords (V, 3) int32 (z, y, x), valid (V,) bool —
indexed by a compressed-sparse-column structure over BEV columns:

    meta (H*W + 1, 4) int32 = [zbits lo-word, zbits hi-word, row_start, count]
    rows (V + 1) int32      = CSR position -> table row (V = miss sentinel)

A neighbor lookup is one 16-byte row fetch from `meta` (shared by all kz
z-taps of a BEV offset) plus bit tests and a `popcount`-rank:

    row(col, z) = rows[row_start[col] + popcount(zbits[col] & ((1<<z)-1))]

Why this design: TPU gathers are latency-bound and scale with the OPERAND
size — fetching from a dense 3D index grid (340 MB at 1440^2 x 41) runs at
~75 M lookups/s, while the meta table is <= 33 MB and one fetch serves three
taps. The strided-conv active set needs no scatter/sort at all: the output
z-bitmasks are pure word arithmetic on the input bitmasks, the BEV union is
9 strided slices, and CSR positions follow from popcount + cumsum.

Convolution is one fused (site, tap)-ordered gather of the feature table
followed by a single wide MXU matmul with contraction K*C_in (apply_conv).
Rulebooks depend only on coordinates, so they are built once per voxel set
and shared by every submanifold layer on that set (spconv ``indice_key``
semantics). Requires D (z extent) <= 64.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    """z-minor linearization: key = (y*W + x)*D + z (CSR order)."""
    D, H, W = shape
    key = (coords[:, 1] * W + coords[:, 2]) * D + coords[:, 0]
    return jnp.where(valid, key, INT_MAX)


# ---------------------------------------------------------------------------
# two-word (64-bit) z-bitmask helpers
# ---------------------------------------------------------------------------

def _zbit(z: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(1 << z) split across two int32 words (z in [0, 64))."""
    lo = jnp.where(z < 32, jnp.left_shift(1, jnp.clip(z, 0, 31)), 0)
    hi = jnp.where(z >= 32, jnp.left_shift(1, jnp.clip(z - 32, 0, 31)), 0)
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


def _low_mask(z: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """bits [0, z) across two int32 words. Note (1<<31)-1 wraps correctly
    in two's-complement int32 arithmetic."""
    lo = jnp.where(
        z < 32, jnp.left_shift(1, jnp.clip(z, 0, 31)) - 1, -1
    )
    hi = jnp.where(
        z >= 32, jnp.left_shift(1, jnp.clip(z - 32, 0, 31)) - 1, 0
    )
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


def _test_bit(w0: jax.Array, w1: jax.Array, z: jax.Array) -> jax.Array:
    lo = jnp.right_shift(w0, jnp.clip(z, 0, 31)) & 1
    hi = jnp.right_shift(w1, jnp.clip(z - 32, 0, 31)) & 1
    return jnp.where(z < 32, lo, hi) == 1


def _rank(w0, w1, z):
    """number of set bits strictly below z."""
    m0, m1 = _low_mask(z)
    return (
        jax.lax.population_count(w0 & m0)
        + jax.lax.population_count(w1 & m1)
    )


# ---------------------------------------------------------------------------
# voxel table
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VoxelTable:
    """CSR + z-bitmask index over an active voxel set (one sample)."""

    coords: jax.Array  # (V, 3) int32 (z, y, x)
    valid: jax.Array  # (V,) bool
    meta: jax.Array  # (H*W + 1, 4) int32 [bits_lo, bits_hi, row_start, cnt]
    rows: jax.Array  # (V + 1,) int32 csr position -> table row (V = miss)

    @property
    def capacity(self) -> int:
        return self.coords.shape[-2]


jax.tree_util.register_pytree_node(
    VoxelTable,
    lambda t: ((t.coords, t.valid, t.meta, t.rows), None),
    lambda _, c: VoxelTable(*c),
)


def _column_bits(coords, valid, shape):
    """Scatter z-bits per BEV column: two (H*W + 1,) int32 word arrays."""
    D, H, W = shape
    n_col = H * W
    col = coords[:, 1] * W + coords[:, 2]
    cslot = jnp.where(valid, col, n_col)
    b0, b1 = _zbit(coords[:, 0])
    bits0 = jnp.zeros((n_col + 1,), jnp.int32).at[cslot].add(
        jnp.where(valid, b0, 0), mode="drop"
    )
    bits1 = jnp.zeros((n_col + 1,), jnp.int32).at[cslot].add(
        jnp.where(valid, b1, 0), mode="drop"
    )
    return bits0, bits1


def exact_cumsum_i32(x: jax.Array) -> jax.Array:
    """Inclusive cumsum of small non-negative int32 values via MXU block
    matmuls (TPU only; falls back to jnp.cumsum elsewhere).

    XLA lowers jnp.cumsum over N elements to a log-depth scan of full
    passes — several ms at the encoder's 2M-column meta scale. Instead:
    rows of 512 are prefix-summed by one (nb, 512) @ (512, 512)
    upper-triangular matmul, block offsets by a tiny scan. Exact when
    every element fits bf16 (< 256 here: per-column voxel counts <= 64)
    and the total < 2^24 (f32 accumulator).
    """
    if jax.default_backend() != "tpu":
        return jnp.cumsum(x)
    return _block_cumsum_i32(x)


def _block_cumsum_i32(x: jax.Array) -> jax.Array:
    n = x.shape[0]
    bs = 512
    nb = -(-n // bs)
    xb = jnp.pad(x, (0, nb * bs - n)).reshape(nb, bs).astype(jnp.bfloat16)
    tri = jnp.asarray(
        np.tril(np.ones((bs, bs), np.float32)).T, jnp.bfloat16
    )  # upper-triangular incl diag: out[j] = sum_{i<=j} x[i]
    incl = jnp.dot(
        xb, tri, preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # (nb, bs)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(incl[:, -1])[:-1]]
    )
    return (incl + offs[:, None]).reshape(-1)[:n]


def _meta_from_bits(bits0, bits1):
    """[bits0, bits1, exclusive-cumsum(count), count] rows; the final
    (overflow) slot gets zero bits."""
    bits0 = bits0.at[-1].set(0)
    bits1 = bits1.at[-1].set(0)
    counts = (
        jax.lax.population_count(bits0) + jax.lax.population_count(bits1)
    )
    row_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), exact_cumsum_i32(counts)[:-1]]
    )
    return jnp.stack([bits0, bits1, row_start, counts], axis=-1)


def build_table_csr(coords: jax.Array, valid: jax.Array,
                    shape) -> VoxelTable:
    """Table over an ALREADY CSR-ORDERED voxel set (column-major,
    z-minor — the order ops/voxelize.py emits): rows are the identity,
    so the per-voxel position gather and rows scatter of build_table
    are skipped. Caller contract: coords sorted by (y*W + x)*D + z."""
    D, H, W = shape
    if D > 64:  # pragma: no cover - config error
        raise ValueError(f"z extent {D} > 64 (bitmask words)")
    V = coords.shape[0]
    bits0, bits1 = _column_bits(coords, valid, shape)
    meta = _meta_from_bits(bits0, bits1)
    rows = jnp.where(valid, jnp.arange(V, dtype=jnp.int32), V)
    rows = jnp.concatenate([rows, jnp.full((1,), V, jnp.int32)])
    return VoxelTable(coords, valid, meta, rows)


def build_table(coords: jax.Array, valid: jax.Array, shape) -> VoxelTable:
    D, H, W = shape
    if D > 64:  # pragma: no cover - config error
        raise ValueError(f"z extent {D} > 64 (bitmask words)")
    V = coords.shape[0]
    n_col = H * W
    bits0, bits1 = _column_bits(coords, valid, shape)
    meta = _meta_from_bits(bits0, bits1)
    col = jnp.where(valid, coords[:, 1] * W + coords[:, 2], n_col)
    pos = meta[col, 2] + _rank(meta[col, 0], meta[col, 1], coords[:, 0])
    pos = jnp.where(valid & (pos < V), pos, V)
    rows = jnp.full((V + 1,), V, jnp.int32).at[pos].set(
        jnp.arange(V, dtype=jnp.int32), mode="drop"
    )
    return VoxelTable(coords, valid, meta, rows)


def widen_meta9(meta: jax.Array, in_shape) -> jax.Array:
    """Widened column meta for 3x3-BEV rule builds: row c+W+1 holds
    meta[c + dy*W + dx] for the 9 (dy, dx) taps as one 144-byte row.
    Shared by every plan build that reads the SAME input table at a level
    (submanifold + strided down), so build it once per level."""
    _, _, W = in_shape
    n_col = meta.shape[0] - 1
    nr = n_col + W + 1
    mp = jnp.concatenate(
        [jnp.zeros((W + 1, 4), meta.dtype), meta,
         jnp.zeros((2 * W + 2, 4), meta.dtype)], 0
    )
    return jnp.concatenate(
        [mp[dy * W + dx:dy * W + dx + nr]
         for dy in range(3) for dx in range(3)],
        axis=1,
    )  # (nr, 36)


def build_conv_rules(
    in_table: VoxelTable,
    in_shape,
    out_coords: jax.Array,
    out_valid: jax.Array,
    kernel_size,
    stride,
    padding,
    use_positions: bool = False,
    meta9: jax.Array | None = None,
) -> jax.Array:
    """Rulebook (K, V_out): input row feeding each output site per tap,
    kernel_offsets (dz-major) order; V_in is the miss sentinel.

    out[j] = sum_d W[d] * x[j*stride - padding + d]  (d in [0, kernel)^3)

    With ``use_positions=True`` the rulebook holds CSR positions instead of
    table rows (valid when the feature table is CSR-ordered, e.g. after
    `csr_reorder` or as produced by `build_downsample`) — this skips a
    K*V_out-element gather per rulebook.
    """
    kz, ky, kx = _as_triple(kernel_size)
    sz, sy, sx = _as_triple(stride)
    pz, py, px = _as_triple(padding)
    D, H, W = in_shape
    V = in_table.capacity
    n_col = H * W

    z0 = out_coords[:, 0] * sz - pz
    meta = in_table.meta
    if ky == 3 and kx == 3:
        # All 9 BEV taps of one output site read meta rows at fixed
        # offsets dy*W + dx from the site's base column, so fetch them as
        # ONE 144-byte row from a widened table: XLA row gathers are
        # row-setup-bound (~190 Mrows/s on this chip regardless of row
        # size), so 1 gather of 9-tuples beats 3 gathers of triples ~3x
        # (and 9 gathers of singles ~9x). meta9[c] holds meta[c + dy*W +
        # dx - (W+1)] for the 9 taps; out-of-range taps read neighboring
        # rows' meta (x wrap-around) and are masked by bev_ok below, as
        # in the narrow path. Zero-padding rows can never produce a hit
        # (zero z-bitmask).
        # base columns span [-(W+1), n_col - 1] (a bottom-row site's dy=0
        # band is still valid), so meta9 rows cover q = base + W + 1 in
        # [0, n_col + W] and mp is right-padded far enough for the
        # largest slice offset (2W + 2).
        nr = n_col + W + 1
        if meta9 is None:
            meta9 = widen_meta9(meta, in_shape)
        base_col = (
            (out_coords[:, 1] * sy - py) * W
            + out_coords[:, 2] * sx - px
        )
        q = jnp.clip(base_col + (W + 1), 0, nr - 1)
        m9 = meta9[jnp.where(out_valid, q, 0)]  # (Vo, 36)
    per_bev = []
    for dy in range(ky):
        yi = out_coords[:, 1] * sy - py + dy
        y_ok = out_valid & (yi >= 0) & (yi < H)
        for dx in range(kx):
            xi = out_coords[:, 2] * sx - px + dx
            bev_ok = y_ok & (xi >= 0) & (xi < W)
            if ky == 3 and kx == 3:
                t = 4 * (dy * 3 + dx)
                w0, w1, start = m9[:, t], m9[:, t + 1], m9[:, t + 2]
            else:
                colq = jnp.where(bev_ok, yi * W + xi, n_col)
                m = meta[colq]  # (Vo, 4) one 16B fetch per BEV tap
                w0, w1, start = m[:, 0], m[:, 1], m[:, 2]
            taps = []
            for dz in range(kz):
                zi = z0 + dz
                ok = bev_ok & (zi >= 0) & (zi < D) & _test_bit(w0, w1, zi)
                pos = start + _rank(w0, w1, zi)
                taps.append(jnp.where(ok, pos, V))
            per_bev.append(jnp.stack(taps, 0))  # (kz, Vo)
    # (ky*kx, kz, Vo) -> (kz, ky*kx, Vo) -> (K, Vo)
    pos_all = jnp.stack(per_bev, 0).transpose(1, 0, 2).reshape(
        kz * ky * kx, -1
    )
    if use_positions:
        return jnp.clip(pos_all, 0, V).astype(jnp.int32)
    return in_table.rows[jnp.clip(pos_all, 0, V)].astype(jnp.int32)


def transposed_conv_rules(
    out_meta: jax.Array,  # column meta of the conv's OUTPUT active set
    out_shape,
    in_coords: jax.Array,  # (V_in, 3) the conv's INPUT sites (CSR order)
    in_valid: jax.Array,
    out_capacity: int,
    kernel_size,
    stride,
    padding,
) -> jax.Array:
    """Transposed rulebook built by DECODE instead of scatter.

    Equals ops.sparse_conv_pallas.transpose_rules(rules, V_in, k)
    (rt[K-1-k, rules[k, j]] = j, misses = out_capacity) but costs one
    meta-gather pass over the input sites instead of a K*V_out-row
    scatter (~100 Mrows/s; the scatter dominated training-side plan
    builds). Derivation: input site i feeds output j through tap d iff
    j*s - p + d = i, i.e. j = (i + p - d)/s exactly divisible and
    active; the rulebook row for tap K-1-k holds, per input site, the
    OUT CSR position reached through mirrored tap k.

    For submanifold convs (stride 1, pad (k-1)//2, out set == in set)
    the transposed rulebook IS the forward rulebook: o_{K-1-k} = -o_k,
    so rt[K-1-k, i] = pos(site_i - o_k) = rules[K-1-k, i] — callers
    should simply reuse the forward plan and never call this.
    """
    kz, ky, kx = _as_triple(kernel_size)
    sz, sy, sx = _as_triple(stride)
    pz, py, px = _as_triple(padding)
    Do, Ho, Wo = out_shape
    n_col_o = Ho * Wo
    K = kz * ky * kx
    z, y, x = in_coords[:, 0], in_coords[:, 1], in_coords[:, 2]
    taps = [None] * K
    for dy in range(ky):
        yn = y + py - dy
        yj = yn // sy
        y_ok = in_valid & (yn == yj * sy) & (yj >= 0) & (yj < Ho)
        for dx in range(kx):
            xn = x + px - dx
            xj = xn // sx
            bev_ok = y_ok & (xn == xj * sx) & (xj >= 0) & (xj < Wo)
            colq = jnp.where(bev_ok, yj * Wo + xj, n_col_o)
            m = out_meta[jnp.clip(colq, 0, n_col_o)]
            w0, w1, start = m[:, 0], m[:, 1], m[:, 2]
            for dz in range(kz):
                zn = z + pz - dz
                zj = zn // sz
                ok = (
                    bev_ok & (zn == zj * sz) & (zj >= 0) & (zj < Do)
                    & _test_bit(w0, w1, zj)
                )
                pos = start + _rank(w0, w1, zj)
                k = dz * ky * kx + dy * kx + dx
                taps[K - 1 - k] = jnp.where(
                    ok & (pos < out_capacity), pos, out_capacity
                )
    return jnp.stack(taps, axis=0).astype(jnp.int32)


def table_from_meta(coords_csr, valid_csr, meta) -> VoxelTable:
    """Table over a CSR-ordered set whose column meta is already known
    (e.g. the out_meta of build_downsample) — rows are the identity."""
    V = coords_csr.shape[0]
    rows = jnp.where(valid_csr, jnp.arange(V, dtype=jnp.int32), V)
    rows = jnp.concatenate([rows, jnp.full((1,), V, jnp.int32)])
    return VoxelTable(coords_csr, valid_csr, meta, rows)


def csr_table(table: VoxelTable, coords_csr, valid_csr) -> VoxelTable:
    """Table over a CSR-reordered voxel set: the active set (and hence
    meta) is unchanged and rows become the identity, so no rebuild is
    needed after ``csr_reorder``."""
    V = table.capacity
    rows = jnp.where(
        valid_csr, jnp.arange(V, dtype=jnp.int32), V
    )
    rows = jnp.concatenate([rows, jnp.full((1,), V, jnp.int32)])
    return VoxelTable(coords_csr, valid_csr, table.meta, rows)


def csr_reorder(table: VoxelTable, *arrays):
    """Permute per-voxel arrays into CSR order (invalid slots -> zeros) and
    return (coords_csr, valid_csr, *arrays_csr).

    After reordering, rulebooks built with ``use_positions=True`` index the
    arrays directly. Downsample outputs are already CSR-ordered."""
    V = table.capacity
    rows = table.rows[:-1]
    valid_csr = rows != V
    safe = jnp.clip(rows, 0, V - 1)
    coords_csr = jnp.where(
        valid_csr[:, None], table.coords[safe], 0
    )
    outs = []
    for a in arrays:
        mask = valid_csr.reshape((-1,) + (1,) * (a.ndim - 1))
        outs.append(jnp.where(mask, a[safe], 0))
    return (coords_csr, valid_csr, *outs)


def build_subm_rules(table: VoxelTable, shape, kernel_size=3,
                     use_positions: bool = False) -> jax.Array:
    """Submanifold rulebook: output sites == input sites, stride 1,
    padding (k-1)//2."""
    k = _as_triple(kernel_size)
    pad = tuple((x - 1) // 2 for x in k)
    return build_conv_rules(
        table, shape, table.coords, table.valid, k, (1, 1, 1), pad,
        use_positions=use_positions,
    )


def apply_conv(
    features: jax.Array,  # (V_in, C_in)
    rules: jax.Array,  # (K, V_out) with V_in as miss sentinel
    weights: jax.Array,  # (K, C_in, C_out)
    out_valid: jax.Array,  # (V_out,)
    bias: jax.Array | None = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Gather-GEMM. Returns (V_out, C_out) masked by out_valid."""
    V_in, C_in = features.shape
    K, C_out = weights.shape[0], weights.shape[2]
    V_out = rules.shape[1]
    fpad = jnp.concatenate(
        [features, jnp.zeros((1, C_in), features.dtype)], axis=0
    )
    # one fused gather in (site, tap) order -> (V_out, K*C_in), then a single
    # wide MXU matmul with contraction K*C_in
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


def _compress_even_bits(x):
    """uint32: keep bits at even positions, packed into the low 16."""
    x = x & 0x55555555
    x = (x | (x >> 1)) & 0x33333333
    x = (x | (x >> 2)) & 0x0F0F0F0F
    x = (x | (x >> 4)) & 0x00FF00FF
    x = (x | (x >> 8)) & 0x0000FFFF
    return x


def _downsample_bits(bits0, bits1, D, Do, kz, sz, pz):
    """z-bitmask of the strided conv's active outputs, per column (word
    arithmetic only): out bit zo set iff any input z = zo*sz - pz + dz.

    For stride 2 this is bit-parallel: u = OR of kz shifted copies, then
    (u << pz)'s even bits compressed — ~16 word passes instead of
    Do*kz (~63 at the 41-deep level)."""
    if sz == 2 and Do <= 32:
        lo = bits0.astype(jnp.uint32)
        hi = bits1.astype(jnp.uint32)
        ulo = jnp.zeros_like(lo)
        uhi = jnp.zeros_like(hi)
        for dz in range(kz):
            n = dz - pz
            if n > 0:  # shift the 64-bit pair right by n
                ulo = ulo | (lo >> n) | (hi << (32 - n))
                uhi = uhi | (hi >> n)
            elif n < 0:  # left by -n
                m = -n
                ulo = ulo | (lo << m)
                uhi = uhi | (hi << m) | (lo >> (32 - m))
            else:
                ulo = ulo | lo
                uhi = uhi | hi
        out = _compress_even_bits(ulo) | (
            _compress_even_bits(uhi) << 16
        )
        mask = jnp.uint32((1 << Do) - 1) if Do < 32 else jnp.uint32(
            0xFFFFFFFF
        )
        return (out & mask).astype(jnp.int32), jnp.zeros_like(bits1)
    o0 = jnp.zeros_like(bits0)
    o1 = jnp.zeros_like(bits1)
    for zo in range(Do):
        hit = jnp.zeros_like(bits0)
        for dz in range(kz):
            zi = zo * sz - pz + dz
            if zi < 0 or zi >= D:
                continue
            w = bits0 if zi < 32 else bits1
            hit = hit | (jnp.right_shift(w, zi % 32) & 1)
        if zo < 32:
            o0 = o0 | jnp.left_shift(hit, zo)
        else:
            o1 = o1 | jnp.left_shift(hit, zo - 32)
    return o0, o1


def downsample_meta(meta: jax.Array, in_shape, kernel_size, stride,
                    padding):
    """Output-set column meta of a strided sparse conv from the input
    meta alone — pure word arithmetic + strided slices, no per-voxel
    scatter (the coordinate list, when needed, comes from
    plan_builder.colz_from_meta). Returns (out_meta, out_shape, total).
    """
    kz, ky, kx = _as_triple(kernel_size)
    sz, sy, sx = _as_triple(stride)
    pz, py, px = _as_triple(padding)
    D, H, W = in_shape
    out_shape = conv_out_shape(in_shape, kernel_size, stride, padding)
    Do, Ho, Wo = out_shape
    z0, z1 = _downsample_bits(
        meta[:-1, 0], meta[:-1, 1], D, Do, kz, sz, pz
    )
    z0 = z0.reshape(H, W)
    z1 = z1.reshape(H, W)
    pad_y = (py, max(0, (Ho - 1) * sy + ky - py - H))
    pad_x = (px, max(0, (Wo - 1) * sx + kx - px - W))
    z0p = jnp.pad(z0, (pad_y, pad_x))
    z1p = jnp.pad(z1, (pad_y, pad_x))
    o0 = jnp.zeros((Ho, Wo), jnp.int32)
    o1 = jnp.zeros((Ho, Wo), jnp.int32)
    for dy in range(ky):
        for dx in range(kx):
            o0 = o0 | jax.lax.slice(
                z0p, (dy, dx),
                (dy + (Ho - 1) * sy + 1, dx + (Wo - 1) * sx + 1), (sy, sx),
            )
            o1 = o1 | jax.lax.slice(
                z1p, (dy, dx),
                (dy + (Ho - 1) * sy + 1, dx + (Wo - 1) * sx + 1), (sy, sx),
            )
    bits0 = jnp.concatenate([o0.reshape(-1), jnp.zeros((1,), jnp.int32)])
    bits1 = jnp.concatenate([o1.reshape(-1), jnp.zeros((1,), jnp.int32)])
    out_meta = _meta_from_bits(bits0, bits1)
    total = out_meta[-2, 2] + out_meta[-2, 3]
    return out_meta, out_shape, total


def build_downsample(
    coords: jax.Array,
    valid: jax.Array,
    in_shape,
    kernel_size,
    stride,
    padding,
    out_capacity: int,
):
    """Active output set of a strided sparse conv.

    Returns (out_coords (Vo,3), out_valid (Vo,), out_shape, overflow
    count, out_meta). Output order is CSR (column-major, z-minor) —
    deterministic; out_meta is the next level's column index (reusable
    via ``table_from_meta`` instead of a fresh build_table).

    No sort/scatter-dedupe: output z-bitmasks are word arithmetic on the
    input bitmasks, the BEV union is ky*kx strided slices, CSR positions
    come from popcount + cumsum, and the coordinate list is one scatter.
    """
    kz, ky, kx = _as_triple(kernel_size)
    sz, sy, sx = _as_triple(stride)
    pz, py, px = _as_triple(padding)
    D, H, W = in_shape
    out_shape = conv_out_shape(in_shape, kernel_size, stride, padding)
    Do, Ho, Wo = out_shape
    V = coords.shape[0]

    in0, in1 = _column_bits(coords, valid, in_shape)
    z0, z1 = _downsample_bits(in0[:-1], in1[:-1], D, Do, kz, sz, pz)
    z0 = z0.reshape(H, W)
    z1 = z1.reshape(H, W)

    # BEV union over taps: out col (yo, xo) sees in col (yo*sy - py + dy, ..)
    pad_y = (py, max(0, (Ho - 1) * sy + ky - py - H))
    pad_x = (px, max(0, (Wo - 1) * sx + kx - px - W))
    z0p = jnp.pad(z0, (pad_y, pad_x))
    z1p = jnp.pad(z1, (pad_y, pad_x))
    o0 = jnp.zeros((Ho, Wo), jnp.int32)
    o1 = jnp.zeros((Ho, Wo), jnp.int32)
    for dy in range(ky):
        for dx in range(kx):
            sl0 = jax.lax.slice(
                z0p, (dy, dx),
                (dy + (Ho - 1) * sy + 1, dx + (Wo - 1) * sx + 1),
                (sy, sx),
            )
            sl1 = jax.lax.slice(
                z1p, (dy, dx),
                (dy + (Ho - 1) * sy + 1, dx + (Wo - 1) * sx + 1),
                (sy, sx),
            )
            o0 = o0 | sl0
            o1 = o1 | sl1

    bits0 = jnp.concatenate([o0.reshape(-1), jnp.zeros((1,), jnp.int32)])
    bits1 = jnp.concatenate([o1.reshape(-1), jnp.zeros((1,), jnp.int32)])
    out_meta = _meta_from_bits(bits0, bits1)
    total = out_meta[-2, 2] + out_meta[-2, 3]  # start + count of last col

    # coordinate list: scatter each output cell's (z, y, x) at its CSR row.
    # Enumerate via input voxels x candidate outputs (only ceil(k/s) output
    # cells per dim can see a given input — 8 combos for k3/s2, not 27;
    # duplicates write identical values).
    ocoords = jnp.zeros((out_capacity + 1, 3), jnp.int32)
    n_col_o = Ho * Wo
    nbz = (kz + sz - 1) // sz
    nby = (ky + sy - 1) // sy
    nbx = (kx + sx - 1) // sx
    for by in range(nby):
        for bx in range(nbx):
            yo = (coords[:, 1] + py) // sy - by
            xo = (coords[:, 2] + px) // sx - bx
            offy = coords[:, 1] + py - yo * sy
            offx = coords[:, 2] + px - xo * sx
            bev_ok = (
                valid & (offy >= 0) & (offy < ky) & (offx >= 0) & (offx < kx)
                & (yo >= 0) & (yo < Ho) & (xo >= 0) & (xo < Wo)
            )
            colq = jnp.where(bev_ok, yo * Wo + xo, n_col_o)
            m = out_meta[colq]
            w0, w1, start = m[:, 0], m[:, 1], m[:, 2]
            for bz in range(nbz):
                zo = (coords[:, 0] + pz) // sz - bz
                offz = coords[:, 0] + pz - zo * sz
                ok = (
                    bev_ok & (offz >= 0) & (offz < kz)
                    & (zo >= 0) & (zo < Do)
                )
                row = start + _rank(w0, w1, zo)
                row = jnp.where(ok & (row < out_capacity), row, out_capacity)
                ocoords = ocoords.at[row].set(
                    jnp.stack([zo, yo, xo], -1), mode="drop"
                )
    out_coords = ocoords[:-1]
    out_valid = (
        jnp.arange(out_capacity) < jnp.minimum(total, out_capacity)
    )
    overflow = jnp.maximum(total - out_capacity, 0)
    return out_coords, out_valid, out_shape, overflow, out_meta


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
