"""Pallas TPU rulebook/tile-plan builder: MXU one-hot meta gathers.

Why: the sparse encoder's per-scan index build (CSR tables, rulebooks,
tile plans) costs ~60% of the encoder stage when done with XLA row
gathers/scatters (~100-215 Mrows/s on this chip — tools/micro_plan_build*.py):
each conv geometry needs ky*kx meta-row fetches per output site
(ops/sparse_conv.build_conv_rules), ~4.5M gathered rows per scan.

This module moves the meta fetch onto the MXU with the same windowed
one-hot trick as the conv kernel (ops/sparse_conv_pallas.py):

  * the per-column meta rows [zbits lo, zbits hi, row_start] are split
    into 8-bit chunks, 16 bf16 lanes per column, packed 8 columns per
    physical (128-lane) row — exact in bf16 (values <= 255);
  * output sites are CSR-ordered, so a tile of T sites reads, per dy
    band, meta columns inside a narrow monotone window; the window is a
    256-row (2048-column) aligned BlockSpec slice selected per
    (tile, band) by scalar-prefetched segment indices — Pallas
    double-buffers the HBM->VMEM streaming automatically;
  * selection is one (kx*T, 256) @ (256, 128) bf16 matmul per band plus
    a constant reconstruction matmul that sums each column's byte
    chunks into 16-bit field halves — K=256 contraction, near-peak MXU;
  * bit tests / popcount ranks / window-relative positions are VPU
    integer ops on the reconstructed words.

Sites whose tap column falls outside the 2048-column window (CSR order
wraps a BEV row, or ultra-sparse tiles) are flagged and resolved exactly
on the XLA side from a fixed-capacity compacted list, in the same spirit
as the conv kernel's overflow spill, so the resulting TilePlan is exact.

Reference semantics: spconv rulebook construction
(/root/reference/... uses spconv's CUDA hash tables; SURVEY.md §2.3);
numerics parity-tested against ops/sparse_conv.build_conv_rules +
ops/sparse_conv_pallas.build_tile_plan (tests/test_plan_builder.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import sparse_conv as sc
from .sparse_conv_pallas import TilePlan, _group_perm, _padded_rows

_LANES = 128
_SEG_ROWS = 256  # chunk rows per window block (= 2048 columns)
_SEG_COLS = _SEG_ROWS * 8
_CPL = 16  # chunk lanes per meta column
_FALIGN = 64  # feature-window start alignment (conv kernel contract)


def _as3(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


# ---------------------------------------------------------------------------
# meta chunk packing
# ---------------------------------------------------------------------------

def pack_meta_chunks(meta: jax.Array) -> jax.Array:
    """(n_col+1, 4) int32 meta -> (Mp, 128) bf16 chunk table.

    Lane layout per column (16 lanes): b0 bytes 0-3, b1 bytes 0-3,
    row_start bytes 0-2, 5 zero pads. 8 columns per physical row; rows
    padded to a multiple of _SEG_ROWS so every window block is valid.
    """
    n = meta.shape[0]
    fields = []
    for w, nb in ((meta[:, 0], 4), (meta[:, 1], 4), (meta[:, 2], 3)):
        for i in range(nb):
            fields.append(jnp.right_shift(w, 8 * i) & 0xFF)
    fields += [jnp.zeros((n,), jnp.int32)] * (_CPL - len(fields))
    chunks = jnp.stack(fields, axis=1).astype(jnp.bfloat16)  # (n, 16)
    ncol_pad = -(-n // (_SEG_ROWS * 8)) * (_SEG_ROWS * 8)
    chunks = jnp.pad(chunks, ((0, ncol_pad - n), (0, 0)))
    return chunks.reshape(ncol_pad // 8, 8 * _CPL)


# reconstruction matrix: masked chunk lanes -> 6 int16-half fields
# fields: b0_lo, b0_hi, b1_lo, b1_hi, st_lo, st_hi (each < 2^16, f32-exact)
def _recon_matrix() -> np.ndarray:
    r = np.zeros((_LANES, _LANES), np.float32)
    for g in range(8):  # packed column slot within the physical row
        base = g * _CPL
        r[base + 0, 0] = 1.0
        r[base + 1, 0] = 256.0
        r[base + 2, 1] = 1.0
        r[base + 3, 1] = 256.0
        r[base + 4, 2] = 1.0
        r[base + 5, 2] = 256.0
        r[base + 6, 3] = 1.0
        r[base + 7, 3] = 256.0
        r[base + 8, 4] = 1.0
        r[base + 9, 4] = 256.0
        r[base + 10, 5] = 1.0
    return r


def _popcount(x):
    """SWAR popcount on int32 (avoids relying on Mosaic population_count)."""
    x = x - (jnp.right_shift(x, 1) & 0x55555555)
    x = (x & 0x33333333) + (jnp.right_shift(x, 2) & 0x33333333)
    x = (x + jnp.right_shift(x, 4)) & 0x0F0F0F0F
    return jnp.right_shift(x * 0x01010101, 24) & 0x3F


def _rank2(b0, b1, z):
    """set bits strictly below z across the (b0, b1) 64-bit pair."""
    m0 = jnp.where(
        z < 32, jnp.left_shift(1, jnp.clip(z, 0, 31)) - 1, -1
    )
    m1 = jnp.where(
        z >= 32, jnp.left_shift(1, jnp.clip(z - 32, 0, 31)) - 1, 0
    )
    return _popcount(b0 & m0) + _popcount(b1 & m1)


def _test2(b0, b1, z):
    lo = jnp.right_shift(b0, jnp.clip(z, 0, 31)) & 1
    hi = jnp.right_shift(b1, jnp.clip(z - 32, 0, 31)) & 1
    return jnp.where(z < 32, lo, hi) == 1


def _plan_kernel(
    seg_ref,  # SMEM (n_sub*G,) int32 window segment per (site-block, band)
    fst_ref,  # SMEM (n_tiles*G,) int32 feature-window start per (tile, band)
    colz_ref,  # VMEM (1, 1, S) int32 packed site col*64+z (-1 pad)
    win_ref,  # VMEM (_SEG_ROWS, 128) bf16 chunk window (auto-sliced)
    rmat_ref,  # VMEM (128, 128) bf16 reconstruction matrix
    out_ref,  # VMEM (1, S, 16) int32 codes, lanes dz*kx+dx
    oh_ref,  # scratch VMEM (kx*S, _SEG_ROWS) bf16
    *,
    g: None,
    kernel_size,
    stride,
    padding,
    in_shape,
    out_w: int,
    window_f: int,
    n_tiles: int,
    subs_per_tile: int,
):
    kz, ky, kx = kernel_size
    sz, sy, sx = stride
    pz, py, px = padding
    D, H, W = in_shape
    i = pl.program_id(0)
    gg = pl.program_id(1)
    G = ky
    T = colz_ref.shape[2]

    # 2D discipline: Mosaic only supports minor-dim insertion on 32-bit
    # types, so every per-site vector is kept as (T, 1) int32/bool and
    # bf16 values are only ever produced from 2D comparisons.
    colz = colz_ref[0, 0:1, :].reshape(T, 1)  # (T, 1) int32
    site_ok = colz >= 0
    czs = jnp.where(site_ok, colz, 0)
    col = czs >> 6
    z = czs & 63
    y = col // out_w
    x = col - y * out_w

    cstart = seg_ref[i * G + gg] * _SEG_COLS
    # the feature window belongs to the CONV tile this site-block is part
    # of (the conv kernel slices one feature window per (tile, band));
    # the column-window segment above is per site-block so sparse tiles
    # spanning > _SEG_COLS columns don't flood the miss list
    fstart = fst_ref[(i // subs_per_tile) * G + gg]

    yi = y * sy - py + gg
    y_ok = site_ok & (yi >= 0) & (yi < H)
    xbase = x * sx - px

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, _SEG_ROWS), 1)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (T, _LANES), 1) // _CPL

    rels = []
    oks = []
    cmiss = []
    for dx in range(kx):
        xi = xbase + dx
        ok = y_ok & (xi >= 0) & (xi < W)  # (T, 1)
        cq = yi * W + xi
        rel = cq - cstart
        in_w = ok & (rel >= 0) & (rel < _SEG_COLS)
        relc = jnp.where(in_w, rel, 0)  # (T, 1)
        oh_ref[dx * T:(dx + 1) * T, :] = (
            ((relc >> 3) == iota_w) & in_w
        ).astype(jnp.bfloat16)
        rels.append(relc)
        oks.append(ok)
        cmiss.append(ok & ~in_w)

    gath = jnp.dot(
        oh_ref[:, :], win_ref[:, :], preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)  # (kx*T, 128)
    # sub-row select then byte->halfword reconstruction on the MXU
    for dx in range(kx):
        piece = gath[dx * T:(dx + 1) * T, :]
        sub = (lane16 == (rels[dx] & 7)).astype(jnp.bfloat16)
        piece = piece * sub
        halves = jnp.dot(
            piece, rmat_ref[:, :], preferred_element_type=jnp.float32
        )  # (T, 128); lanes 0..5 = field halves
        b0 = halves[:, 0:1].astype(jnp.int32) + (
            halves[:, 1:2].astype(jnp.int32) << 16
        )
        b1 = halves[:, 2:3].astype(jnp.int32) + (
            halves[:, 3:4].astype(jnp.int32) << 16
        )
        st = halves[:, 4:5].astype(jnp.int32) + (
            halves[:, 5:6].astype(jnp.int32) << 16
        )
        for dz in range(kz):
            zi = z * sz - pz + dz  # (T, 1)
            hit = (
                oks[dx] & (zi >= 0) & (zi < D) & _test2(b0, b1, zi)
                & ~cmiss[dx]
            )
            pos = st + _rank2(b0, b1, zi)
            relf = pos - fstart
            inw = hit & (relf >= 0) & (relf < window_f)
            code = jnp.where(inw, relf, window_f)  # miss default
            code = jnp.where(
                hit & ~inw, window_f + 1 + pos, code
            )  # feature-window overflow: carry the absolute position
            zvalid = oks[dx] & (zi >= 0) & (zi < D)
            code = jnp.where(
                cmiss[dx] & zvalid, -1, code
            )  # column-window miss: XLA resolves exactly
            k = dz * kx + dx
            out_ref[0, :, k:k + 1] = code


def _run_plan_kernel(
    chunks, colz_sub, segs, fstarts, rmat,
    kernel_size, stride, padding, in_shape, out_w,
    window_f, subs_per_tile, interpret,
):
    kz, ky, kx = kernel_size
    n_sub, S = colz_sub.shape
    G = ky

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_sub, G),
        in_specs=[
            pl.BlockSpec(
                (1, 1, S), lambda i, g, s, f: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_SEG_ROWS, _LANES),
                lambda i, g, s, f: (s[i * G + g], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, S, _CPL), lambda i, g, s, f: (i * G + g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((kx * S, _SEG_ROWS), jnp.bfloat16),
        ],
    )
    codes = pl.pallas_call(
        functools.partial(
            _plan_kernel,
            g=None,
            kernel_size=(kz, ky, kx),
            stride=stride,
            padding=padding,
            in_shape=in_shape,
            out_w=out_w,
            window_f=window_f,
            n_tiles=n_sub,
            subs_per_tile=subs_per_tile,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_sub * G, S, _CPL), jnp.int32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(segs, fstarts, colz_sub[:, None, :], chunks, rmat)
    return codes


def colz_from_coords(coords, valid, w: int) -> jax.Array:
    """(V, 3) zyx int32 + valid -> packed col*64+z with -1 invalid."""
    col = coords[:, 1] * w + coords[:, 2]
    return jnp.where(valid, col * 64 + coords[:, 0], -1)


def colz_from_meta(meta: jax.Array, capacity: int, d: int = 64) -> jax.Array:
    """Expand a CSR column meta into the per-slot packed (col, z) list.

    Replaces the downsample 8-combo coordinate scatter (V-row scatters at
    ~100 Mrows/s) with one tiny block-marker scatter + scan + one
    capacity-row gather. Blocks are 16 columns wide so the per-slot
    gathered cumulative-count row is 64 B (the previous 64-wide blocks
    moved a (capacity, 64) int32 intermediate — 62 MB at the 243k-slot
    nuScenes level — through HBM three times: gather, compare, and a
    take_along_axis that lowers to a second full gather). The preceding
    column's cumulative count is recovered with a masked lane max instead
    of take_along_axis. Returns (capacity,) int32 col*64+z, -1 beyond
    the active count.
    """
    counts = meta[:-1, 3]
    n_col = counts.shape[0]
    bs = 16  # columns per block: 64 B gather rows, <= 1/4 n_col markers
    nblk = -(-n_col // bs)
    cpad = jnp.pad(counts, (0, nblk * bs - n_col))
    bc = cpad.reshape(nblk, bs)
    bcs = jnp.sum(bc, axis=1)
    blk_start = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(bcs)[:-1]]
    )
    total = blk_start[-1] + bcs[-1]

    slot_tgt = jnp.where(
        (bcs > 0) & (blk_start < capacity), blk_start, capacity
    )
    blk_of = jnp.zeros((capacity,), jnp.int32).at[slot_tgt].max(
        jnp.arange(nblk, dtype=jnp.int32), mode="drop"
    )
    blk_of = jax.lax.associative_scan(jnp.maximum, blk_of)

    slots = jnp.arange(capacity, dtype=jnp.int32)
    r_blk = slots - blk_start[blk_of]
    # block-level inclusive prefix first (nblk, bs) — tiny — THEN one row
    # gather per slot
    bcum = jnp.cumsum(bc, axis=1)
    cum = bcum[blk_of]  # (capacity, bs)
    le = cum <= r_blk[:, None]
    col_in = jnp.sum(le.astype(jnp.int32), axis=1)
    col_in = jnp.minimum(col_in, bs - 1)
    # cum is nondecreasing, so the entries <= r are exactly the first
    # col_in; their max is cum[col_in - 1] (0 when col_in == 0)
    prev = jnp.max(jnp.where(le, cum, 0), axis=1)
    r_col = r_blk - prev
    col = blk_of * bs + col_in
    colc = jnp.minimum(col, n_col - 1)
    b0 = meta[colc, 0]
    b1 = meta[colc, 1]
    # z = r_col-th set bit of the column's 64-bit mask: branchless binary
    # search on prefix ranks (6 rank evaluations vs d linear probes)
    z = jnp.zeros((capacity,), jnp.int32)
    for shift in (32, 16, 8, 4, 2, 1):
        if shift >= 2 * d:
            continue
        zc = z + shift
        below = _rank2(b0, b1, zc)
        z = jnp.where(below <= r_col, zc, z)
    live = slots < jnp.minimum(total, capacity)
    return jnp.where(live, colc * 64 + z, -1)


def build_plan_mxu(
    meta: jax.Array,  # (n_col_in + 1, 4) input-level CSR meta
    colz: jax.Array,  # (V_out,) packed output sites, CSR order, -1 invalid
    in_capacity: int,
    kernel_size=3,
    stride=1,
    padding=0,
    in_shape=(41, 1440, 1440),
    out_w: int | None = None,
    tile: int = 256,
    window: int = 256,
    overflow_capacity: int = 4096,
    chunks: jax.Array | None = None,
    interpret: bool | None = None,
) -> TilePlan:
    """MXU-gather tile plan for one conv geometry (exact).

    ``out_w`` is the output grid's W (defaults to the input W for
    submanifold convs). ``chunks`` may be passed to share the packed
    meta across the plans of one level.
    """
    kz, ky, kx = _as3(kernel_size)
    strides = _as3(stride)
    pads = _as3(padding)
    D, H, W = in_shape
    if out_w is None:
        out_w = W
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_col = H * W
    v_out = colz.shape[0]
    n_tiles = -(-v_out // tile)
    padn = n_tiles * tile - v_out
    colz_t = jnp.pad(colz, (0, padn), constant_values=-1).reshape(
        n_tiles, tile
    )
    perm, G = _group_perm((kz, ky, kx))
    vp = _padded_rows(in_capacity)

    if chunks is None:
        chunks = pack_meta_chunks(meta)
    nseg = chunks.shape[0] // _SEG_ROWS

    # Column-window SEGMENTS are assigned per 64-site sub-block: a full
    # 256-site tile of a sparse set can span several thousand columns
    # (256 sites x ~13 cols/site at scan scale), far past the one
    # _SEG_COLS window a single first-site segment covers — that flooded
    # the exact miss list (~1.6M flags at scan scale) and silently
    # truncated past its capacity. Feature-window STARTS stay per conv
    # tile (the conv kernel slices one feature window per tile/band);
    # tap columns and CSR positions are nondecreasing in site order, so
    # each block/tile's first site gives the true minimum.
    sb = min(64, tile)
    if tile % sb:  # pragma: no cover - config error
        raise ValueError(f"tile {tile} not a multiple of {sb}")
    spt = tile // sb
    n_sub = n_tiles * spt
    colz_sub = colz_t.reshape(n_sub, sb)
    sy, sx = strides[1], strides[2]
    py, px = pads[1], pads[2]

    def band_cols(first_colz):
        ok = first_colz >= 0
        col = jnp.where(ok, first_colz >> 6, 0)
        y = col // out_w
        x = col - y * out_w
        return [
            jnp.clip((y * sy - py + g) * W + x * sx - px, 0, n_col - 1)
            for g in range(ky)
        ]

    segs = [
        jnp.clip(cq // _SEG_COLS, 0, nseg - 1).astype(jnp.int32)
        for cq in band_cols(colz_sub[:, 0])
    ]
    fstarts = []
    for cq in band_cols(colz_t[:, 0]):
        st = meta[cq, 2]
        st = jnp.minimum(st, vp - window) & ~(_FALIGN - 1)
        fstarts.append(jnp.maximum(st, 0).astype(jnp.int32))
    seg_arr = jnp.stack(segs, axis=1).reshape(-1)
    fst_arr = jnp.stack(fstarts, axis=1).reshape(-1)

    rmat = jnp.asarray(_recon_matrix(), jnp.bfloat16)
    codes = _run_plan_kernel(
        chunks, colz_sub, seg_arr, fst_arr, rmat,
        (kz, ky, kx), strides, pads, in_shape, out_w,
        window, spt, interpret,
    )  # (n_sub*G, sb, 16)

    codes = codes.reshape(n_tiles, spt, G, sb, _CPL).transpose(
        0, 2, 1, 3, 4
    ).reshape(n_tiles, G, tile, _CPL)[..., : kz * kx]
    # band-major tap layout == plan.perm order (dz-major, dx-minor per band)
    rel_bm = jnp.transpose(codes, (0, 2, 1, 3)).reshape(
        n_tiles, tile, G * kz * kx
    )

    # ---- exact resolution of the flagged codes --------------------------
    K = kz * ky * kx
    ktv = n_tiles * tile
    # band-major position p holds original tap perm[p] (plan.rel layout)
    porig = np.asarray(perm)

    over = rel_bm > window  # feature-window overflow, abs pos carried
    cm = rel_bm < 0  # column-window miss: recompute below
    n_overflow = jnp.sum(over, dtype=jnp.int32) + jnp.sum(
        cm, dtype=jnp.int32
    )

    def compact(mask3, cap):
        # exact tile-major enumeration (tiles ascend, one tile's rules
        # contiguous): cumsum + per-slot binary search — mirrors
        # sparse_conv_pallas._compact_overflow (tools/micro_compact.py
        # for the cost data; a bounded tile capture truncated real
        # scans whose spills spread over more than cap//tile tiles).
        # Full-capacity per-tile budget (tile_ov=cap below): this
        # builder's column-window misses cluster far beyond _TILE_OV
        # on a single tile, and the mxu engine has no rules fallback
        # for submanifold plans — the kernel scans the whole list per
        # tile (seg all-zero), so truncation is purely list capacity.
        flat = mask3.reshape(-1)  # (n_tiles, tile, K) is tile-major
        csum = jnp.cumsum(flat.astype(jnp.int32))
        fi = jnp.searchsorted(
            csum, jnp.arange(1, cap + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        oob = fi >= flat.shape[0]
        tk = tile * K
        idx = jnp.where(oob, 0, fi)
        ti = idx // tk
        rest = idx % tk
        si = rest // K
        ki = rest % K
        truncated = csum[-1] > cap
        seg = jnp.zeros((n_tiles,), jnp.int32)
        return oob, ti, si, ki, seg, truncated

    # single union compaction over both flag kinds — a fixed half/half
    # split let either kind silently truncate at half capacity (the L2
    # chained-encoder divergence: 2.5k feature-window overflows vs a
    # 2048 half)
    oob_u, ti_u, si_u, ki_u, seg, truncated = compact(
        over | cm, overflow_capacity
    )
    n_overflow = jnp.where(
        truncated,
        jnp.maximum(n_overflow, overflow_capacity + 1), n_overflow,
    )
    code_u = rel_bm[ti_u, si_u, ki_u]
    is_over = ~oob_u & (code_u > window)
    tap_u = jnp.asarray(porig)[jnp.minimum(ki_u, K - 1)]
    tap_u = jnp.where(oob_u, 0, tap_u)
    # (a) feature-window overflow: the absolute position is carried in
    # the code
    pos_a = code_u - (window + 1)
    # (b) column-window misses: recompute via a (bounded) XLA meta
    # gather — same math as sparse_conv.build_conv_rules
    dz_b = tap_u // (ky * kx)
    dy_b = (tap_u // kx) % ky
    dx_b = tap_u % kx
    czs = colz_t[ti_u, si_u]
    czs = jnp.where(oob_u | (czs < 0), 0, czs)
    colb = czs >> 6
    zb = czs & 63
    yb = colb // out_w
    xb = colb - yb * out_w
    yi = yb * strides[1] - pads[1] + dy_b
    xi = xb * strides[2] - pads[2] + dx_b
    zi = zb * strides[0] - pads[0] + dz_b
    okb = (
        ~oob_u & (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        & (zi >= 0) & (zi < D)
    )
    colq = jnp.where(okb, yi * W + xi, n_col)
    m = meta[colq]
    hit = okb & sc._test_bit(m[:, 0], m[:, 1], zi)
    pos_b = jnp.where(
        hit, m[:, 2] + sc._rank(m[:, 0], m[:, 1], zi), in_capacity
    )
    pos_u = jnp.where(
        oob_u, in_capacity, jnp.where(is_over, pos_a, pos_b)
    )
    out_u = jnp.where(oob_u, ktv, ti_u * tile + si_u)

    rel = jnp.where(over | cm, window, rel_bm).astype(jnp.int32)

    # trailing active-tile count (see sparse_conv_pallas._kernel): valid
    # output sites are a CSR prefix of colz, so 1 + last tile holding any
    # site bounds every live rule; suffix tiles are skipped by the kernel
    # (overflow entries are corrected outside the kernel either way)
    act = jnp.any(colz_t >= 0, axis=1)
    n_active = jnp.max(
        jnp.where(act, jnp.arange(n_tiles, dtype=jnp.int32) + 1, 0)
    )
    return TilePlan(
        rel=rel,
        starts=jnp.concatenate([fst_arr, n_active[None], seg]),
        ov_pos=pos_u.astype(jnp.int32),
        ov_out=out_u.astype(jnp.int32),
        ov_tap=tap_u.astype(jnp.int32),
        n_overflow=n_overflow,
        v_out=v_out,
        window=window,
        n_groups=G,
        perm=perm,
        tile_ov=overflow_capacity,
    )


def decode_rules(plan: TilePlan, colz: jax.Array, in_capacity: int,
                 meta: jax.Array, kernel_size=3, stride=1, padding=0,
                 in_shape=(41, 1440, 1440), out_w: int | None = None
                 ) -> jax.Array:
    """Absolute (K, V_out) rulebook for the training-side transposed-plan
    build. Recovers in-window positions from plan.rel + plan.starts and
    recomputes the (rare) overflow entries; misses = in_capacity.

    Simpler and exact: re-derive all positions from meta like
    sparse_conv.build_conv_rules (XLA path) — this is training-only and
    dead-code-eliminated in inference.
    """
    kz, ky, kx = _as3(kernel_size)
    sz, sy, sx = _as3(stride)
    pz, py, px = _as3(padding)
    D, H, W = in_shape
    if out_w is None:
        out_w = W
    n_col = H * W
    v_out = colz.shape[0]
    ok0 = colz >= 0
    czs = jnp.where(ok0, colz, 0)
    col = czs >> 6
    z = czs & 63
    y = col // out_w
    x = col - y * out_w
    taps = []
    for dz in range(kz):
        for dy in range(ky):
            for dx in range(kx):
                yi = y * sy - py + dy
                xi = x * sx - px + dx
                zi = z * sz - pz + dz
                ok = (
                    ok0 & (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
                    & (zi >= 0) & (zi < D)
                )
                colq = jnp.where(ok, yi * W + xi, n_col)
                m = meta[colq]
                hit = ok & sc._test_bit(m[:, 0], m[:, 1], zi)
                pos = m[:, 2] + sc._rank(m[:, 0], m[:, 1], zi)
                taps.append(jnp.where(hit, pos, in_capacity))
    return jnp.stack(taps, axis=0).astype(jnp.int32)
