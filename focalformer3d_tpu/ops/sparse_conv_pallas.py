"""Pallas TPU sparse-conv apply: windowed one-hot MXU gather.

Why: XLA's row gather on TPU is rate-bound at ~150-400 Mrows/s regardless
of row width (see tools/micro_gather*.py), which makes the rulebook
gather-GEMM formulation of ops/sparse_conv.py cost a near-constant
~6-9 ms per conv (~170 ms for the encoder's 17 convs). This module
reformulates the gather so it runs on the MXU instead.

Features are CSR-ordered (column-major over BEV, z-minor — see
ops/sparse_conv.py), so a tile of T consecutive output sites reads, for
each of the 3 ``dy`` bands of a k=3 kernel, positions inside a narrow,
nearly monotone window of the input table. The table is packed
``p = 128/C`` rows per physical row — (Vp/p, 128) lanes — and kept in
VMEM; per (tile, band) a window of W/p packed rows is sliced at an
aligned, data-dependent start (scalar-prefetched). Selection then runs
at full lane width with one batched matmul per band:

    oh1  = (rel // p == iota_{W/p})       # (9T, W/p) block one-hot
    gath = oh1 @ win                      # (9T, W/p) @ (W/p, 128)  MXU
    gath *= (lane // C == rel % p)        # full-lane sub-row mask   VPU
    mbuf = concat_lanes(gath per tap)     # (T, 9*128)
    out += mbuf @ Wbig[band]              # Wbig = taps' W tiled p times

Taps are re-ordered band-major (``plan.perm``) so each band is a
contiguous row block. Rules that fall outside their tile window (rare:
dense walls crossing a sparse band) spill into a fixed-capacity
overflow list applied as an XLA gather + scatter-add correction, so the
op stays exact.

The tile plan (window starts, window-relative rules, overflow list) is
built once per voxel-set per level and shared by every conv on that set,
like the rulebooks themselves. Backward uses a transposed rulebook
(every (tap, out) rule seen from its input site) so dx is one more
kernel call, and dW = gathered^T @ dout via a gather-mode pass.

Reference semantics: spconv submanifold / strided sparse conv
(/root/reference/projects/configs/focalformer3d/FocalFormer3D_L.py:198-206);
numerics parity-tested against ops/sparse_conv.apply_conv
(tests/test_sparse_pallas.py).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = jnp.iinfo(jnp.int32).max
_ALIGN = 64  # start alignment: start//p stays a sublane multiple for p<=8
_LANES = 128


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def tap_groups(kernel_size) -> Tuple[int, ...]:
    """Group id (the dy band) per tap in kernel_offsets (dz,dy,dx) order."""
    if isinstance(kernel_size, int):
        kz = ky = kx = kernel_size
    else:
        kz, ky, kx = kernel_size
    return tuple(
        dy for dz in range(kz) for dy in range(ky) for dx in range(kx)
    )


def _group_perm(kernel_size) -> Tuple[Tuple[int, ...], int]:
    """Band-major tap permutation; perm[t'] = original tap index."""
    groups = tap_groups(kernel_size)
    n_groups = max(groups) + 1
    perm = tuple(sorted(range(len(groups)),
                        key=lambda k: (groups[k], k)))
    if len(groups) % n_groups:  # pragma: no cover - geometry invariant
        raise ValueError("taps do not split evenly across bands")
    return perm, n_groups


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """Window-relative rulebook for one conv geometry on one voxel set."""

    rel: jax.Array  # (n_tiles, T, K) int32 in [0, W]; W = miss. Band-major
    # taps on the minor (lane) axis so per-tap extracts broadcast along
    # lanes without relayout.
    starts: jax.Array  # (n_tiles * (G + 1) + 1,) int32: per-(tile, band)
    # window row starts (64-aligned), then the ACTIVE tile count (output
    # sites are a CSR prefix, so fully-padded tiles are a suffix the
    # kernel skips), then per-tile spill-segment starts (8-aligned) into
    # the SORTED overflow list — the correction is applied in-kernel as
    # a per-tile one-hot dot (an XLA scatter-add of the spill rows
    # measured 3-4 ms/conv: TPU scatters serialize)
    ov_pos: jax.Array  # (M,) int32 input positions, grouped by tile
    # (contiguous per-tile segments; tap-major inside a tile, NOT
    # sorted by output site)
    ov_out: jax.Array  # (M,) int32 output sites (n_tiles * T = drop)
    ov_tap: jax.Array  # (M,) int32 tap index (original order)
    n_overflow: jax.Array  # () int32 true overflow count (may exceed M);
    # forced past the capacity when a per-tile segment exceeds the
    # kernel's scan budget, so ONE n_overflow > M check covers all
    # truncation modes (the enumeration itself is exact)
    v_out: int  # true number of output sites (<= n_tiles * T)
    window: int
    n_groups: int
    perm: Tuple[int, ...]  # band-major tap permutation
    # per-tile spill-segment budget the kernel scans (rows); builders
    # whose lists aren't tile-groupable under _TILE_OV set this to the
    # full capacity (full-list scan, the pre-segmentation contract)
    tile_ov: int = 512

    @property
    def tile(self) -> int:
        return self.rel.shape[1]


jax.tree_util.register_pytree_node(
    TilePlan,
    lambda p: (
        (p.rel, p.starts, p.ov_pos, p.ov_out, p.ov_tap, p.n_overflow),
        (p.v_out, p.window, p.n_groups, p.perm, p.tile_ov),
    ),
    lambda aux, c: TilePlan(*c, *aux),
)


# per-tile spill-segment budget: the kernel reads a fixed-size slice of
# the tile-grouped spill list per tile; segments longer than this force
# the truncation signal (-> checked XLA fallback)
_TILE_OV = 512

# tiles fused into one kernel grid step: per-step overhead measured
# ~2.5 us independent of per-step dot count/size (micro_dotshape2.py),
# so 4 tiles/step saves ~1.1 ms per 600-tile conv for +3x out-block VMEM
_STEP_TILES = 4


def _compact_overflow(overflow, pos3, n_tiles, tile, miss_sentinel,
                      overflow_capacity, tile_ov=_TILE_OV):
    """Tile-grouped spill compaction + per-tile segment starts.

    overflow: (K, n_tiles, tile) bool spill mask; pos3: matching int32
    positions (misses may be any value where overflow is False).
    Enumerates spills TILE-MAJOR (tiles ascend, rules of one tile
    contiguous), so the kernel's per-tile correction can slice its
    segment directly — and EXACTLY for any spill distribution up to
    the list capacity: a cumsum over the tile-major mask + one binary
    search per list slot (2.8 ms/plan at production shapes,
    tools/micro_compact.py). A flat jnp.nonzero measured 38.5 ms
    (sorts), and the earlier bounded two-stage tile capture silently
    required n_spill_tiles <= capacity//tile = 16 — real scans spread
    ~1.4k spills over ~200 tiles, forcing every down conv onto the XLA
    fallback. Returns (ov_pos, ov_out, ov_tap, n_overflow, seg); seg
    (n_tiles,) int32 8-aligned starts such that
    [seg[i], seg[i] + _TILE_OV) covers tile i's spills (slack rows
    fail the in-kernel site compare). n_overflow is the TRUE spill
    count, forced past the capacity only when a per-tile segment
    exceeds the kernel's scan budget — so the callers' single
    n_overflow > capacity check covers both truncation modes.
    """
    if overflow_capacity % 8 or tile_ov % 8:  # pragma: no cover
        # seg starts are &~7-aligned and clipped to max(m - mt, 0): the
        # kernel's pl.multiple_of(seg, 8) hint is only sound when both
        # bounds are themselves 8-aligned (ADVICE r4)
        raise ValueError("overflow capacity and tile_ov must be 8-aligned")
    K = overflow.shape[0]
    m = overflow_capacity
    ov_tm = jnp.transpose(overflow, (1, 0, 2))  # (n_tiles, K, tile)
    csum = jnp.cumsum(ov_tm.reshape(-1).astype(jnp.int32))
    n_overflow = csum[-1]
    # index of the (j+1)-th set bit; j >= n_overflow lands past the end
    ov_idx = jnp.searchsorted(
        csum, jnp.arange(1, m + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    oob = ov_idx >= csum.shape[0]
    kt = K * tile
    idx = jnp.where(oob, 0, ov_idx)
    ov_ti = idx // kt
    rest = idx % kt
    ov_k = (rest // tile).astype(jnp.int32)
    ov_t = rest % tile
    ov_pos = jnp.where(
        oob, miss_sentinel, pos3[ov_k, ov_ti, ov_t]
    ).astype(jnp.int32)
    ov_pos = jnp.where(ov_pos < 0, miss_sentinel, ov_pos)
    ov_out = jnp.where(
        oob, n_tiles * tile, ov_ti * tile + ov_t
    ).astype(jnp.int32)

    # exact per-tile counts -> 8-aligned contiguous segment starts
    cnt = jnp.sum(ov_tm, axis=(1, 2), dtype=jnp.int32)  # (n_tiles,)
    ends = jnp.cumsum(cnt)
    mt = min(tile_ov, m)
    seg = jnp.clip((ends - cnt) & ~7, 0, max(m - mt, 0))
    over_budget = jnp.max(jnp.where(cnt > 0, ends - seg, 0)) > mt
    n_overflow = jnp.where(
        over_budget,
        jnp.maximum(n_overflow, overflow_capacity + 1), n_overflow,
    )
    return ov_pos, ov_out, ov_k, n_overflow, seg


def _padded_rows(capacity: int) -> int:
    """Feature-table rows incl. the zero pad row, rounded for packing."""
    return -(-(capacity + 1) // _ALIGN) * _ALIGN


def build_tile_plan(
    rules: jax.Array,  # (K, V_out) int32 CSR positions, V_in_cap = miss
    in_capacity: int,
    kernel_size=3,
    tile: int = 256,
    window: int = 1024,
    overflow_capacity: int = 8192,
    tile_ov: int = _TILE_OV,
) -> TilePlan:
    """Per-tile band windows + window-relative rules (+ overflow spill).

    ``tile_ov`` is the per-tile spill-segment budget the kernel scans;
    plans whose worst spilling tile exceeds it force the truncation
    signal (r4 driver bench: one L2-subm tile carried 878 spills vs the
    default 512 budget — tools/micro_tilespill.py)."""
    if window % _ALIGN:  # pragma: no cover - config error
        raise ValueError(f"window {window} must be a multiple of {_ALIGN}")
    K, v_out = rules.shape
    groups = tap_groups(kernel_size)
    perm, n_groups = _group_perm(kernel_size)
    n_tiles = -(-v_out // tile)
    pad = n_tiles * tile - v_out
    vp = _padded_rows(in_capacity)
    if vp < window:  # pragma: no cover - config error
        raise ValueError(f"capacity {in_capacity} < window {window}")

    pos = jnp.pad(rules, ((0, 0), (0, pad)), constant_values=in_capacity)
    pos = pos.reshape(K, n_tiles, tile)
    valid = pos < in_capacity

    starts = []
    for g in range(n_groups):
        taps = tuple(k for k in range(K) if groups[k] == g)
        p = jnp.where(valid[taps, :], pos[taps, :], INT_MAX)
        lo = jnp.min(p, axis=(0, 2))  # (n_tiles,)
        lo = jnp.where(lo == INT_MAX, 0, lo)
        lo = jnp.minimum(lo, vp - window) & ~(_ALIGN - 1)
        starts.append(lo.astype(jnp.int32))
    starts_kt = jnp.stack(
        [starts[groups[k]] for k in range(K)], axis=0
    )  # (K, n_tiles)

    rel = pos - starts_kt[:, :, None]
    in_win = valid & (rel >= 0) & (rel < window)
    relf = jnp.where(in_win, rel, window).astype(jnp.int32)

    # Two-stage, tile-major overflow compaction (see _compact_overflow).
    ov_pos, ov_out, ov_k, n_overflow, seg = _compact_overflow(
        valid & ~in_win, pos, n_tiles, tile, in_capacity,
        overflow_capacity, tile_ov,
    )

    # 1 + index of the last tile with any live rule (not a popcount, so
    # non-prefix validity is still handled by covering through the last
    # active tile)
    act = jnp.any(valid, axis=(0, 2))
    n_active = jnp.max(
        jnp.where(act, jnp.arange(n_tiles, dtype=jnp.int32) + 1, 0)
    )
    return TilePlan(
        rel=jnp.transpose(relf, (1, 2, 0))[:, :, perm],
        starts=jnp.concatenate(
            [jnp.stack(starts, axis=-1).reshape(-1), n_active[None], seg]
        ),
        ov_pos=ov_pos,
        ov_out=ov_out,
        ov_tap=ov_k,
        n_overflow=n_overflow,
        v_out=v_out,
        window=window,
        n_groups=n_groups,
        perm=perm,
        tile_ov=min(tile_ov, overflow_capacity),
    )


def transpose_rules(
    rules: jax.Array, in_capacity: int, kernel_size=3
) -> jax.Array:
    """Transposed rulebook: (K, V_in) mapping input sites to the output
    site they feed through the mirrored tap (at most one per tap, since
    the conv geometry is a function of the output site).

    rules_T[K-1-k, rules[k, j]] = j; misses stay at V_out sentinel.
    Used for dx: dx = apply(dout, plan(rules_T), transpose(flip(W))).
    """
    K, v_out = rules.shape
    rt = jnp.full((K, in_capacity + 1), v_out, jnp.int32)
    j = jnp.broadcast_to(
        jnp.arange(v_out, dtype=jnp.int32)[None, :], (K, v_out)
    )
    safe = jnp.minimum(rules, in_capacity)
    rt = rt.at[K - 1 - jnp.arange(K)[:, None], safe].set(j, mode="drop")
    return rt[:, :in_capacity]


def _pack_factor(c: int) -> int:
    if _LANES % c == 0:
        return _LANES // c
    if c % _LANES == 0:
        return 1
    raise ValueError(f"channel count {c} must divide or be a multiple "
                     f"of {_LANES}")  # pragma: no cover


def _fused_default(pack: int) -> bool:
    """Per-tap fused dots (v2) vs bulk gather+mask+concat staging (v1).

    Measured per pack factor on the r5 TPU probe
    (tools/micro_kernel_v2.py, bench scan, production windows): v2 wins
    at pack 8 (C=16 subm -18%, down -13%) and pack 2 (C=64 subm -11%,
    down -20%), loses at pack 4 (C=32 subm +5%, down +34%). Both
    variants are bit-identical (same operand rounding)."""
    return pack != 4


def _pad_c(a: jax.Array, axis: int) -> jax.Array:
    """Pad a channel axis so it divides (or is a multiple of) 128."""
    c = a.shape[axis]
    cp = 16
    while cp < c:
        cp *= 2
    cp = max(cp, -(-c // _LANES) * _LANES if c > _LANES else cp)
    if cp == c:
        return a
    pads = [(0, 0)] * a.ndim
    pads[axis] = (0, cp - c)
    return jnp.pad(a, pads)


def _pack_table(features: jax.Array, capacity: int) -> jax.Array:
    """(V, C) -> (Vp/p, p*C) bf16 with zero padding.

    Cast here (not at the custom-vjp boundary) so cotangents stay in the
    caller's dtype; the kernel computes in bf16 on the MXU regardless,
    and the bf16 table halves the kernel's VMEM footprint."""
    vp = _padded_rows(capacity)
    c = features.shape[1]
    p = _pack_factor(c)
    xp = jnp.pad(
        features.astype(jnp.bfloat16), ((0, vp - features.shape[0]), (0, 0))
    )
    return xp.reshape(vp // p, p * c)


def _kernel(
    starts_ref,  # SMEM (B, n_tiles*(G+1)+1) int32: row starts (64-aligned)
    # + active tile count + per-tile spill-segment starts (8-aligned)
    x_ref,  # VMEM (1, Vp/p, p*C) packed table (this sample's block)
    rel_ref,  # VMEM (1, 1, T, K) int32, band-major tap order on lanes
    wbig_ref,  # VMEM (G, tpg*CL, Cout) band-tiled weights
    cb_ref,  # VMEM (1, M, Cout) f32 per-spill contributions (sorted)
    ovo_ref,  # VMEM (1, M, 1) int32 spill output sites (sorted)
    out_ref,  # VMEM (1, T, N_out)
    oh_ref,  # scratch VMEM (tpg*T, WB) bf16
    mb_ref,  # scratch VMEM (T, tpg*CL) bf16
    *,
    n_groups: int,
    pack: int,
    window: int,
    gather_mode: bool,
    tile_ov: int,
    fused_taps: bool = False,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    G = n_groups
    S = rel_ref.shape[1]  # tiles per grid step
    T, K = rel_ref.shape[2], rel_ref.shape[3]
    tpg = K // G
    cl = x_ref.shape[2]  # p * C
    c = cl // pack
    wb = window // pack
    n_tiles = pl.num_programs(1) * S
    # trailing starts element = active tile count (CSR-prefix outputs, so
    # fully-padded tiles form a suffix): skip their two MXU dots entirely
    # — real scans fill 60-80% of capacity, the rest is pure padding
    count = starts_ref[b, n_tiles * G]

    # S tiles per grid step: the measured per-grid-step overhead is
    # ~2.5 us regardless of per-step dot work (tools/micro_dotshape2.py
    # — 27 small dots cost the same step as 3 big ones), so fusing 4
    # tiles into one step cuts ~75% of it (~1.1 ms/conv at 600 tiles)
    for s in range(S):
        t_id = i * S + s
        rel = rel_ref[0, s]  # (T, K)

        @pl.when(t_id >= count)
        def _pad_tile(s=s):
            out_ref[0, s * T:(s + 1) * T, :] = jnp.zeros(
                (T, out_ref.shape[2]), out_ref.dtype
            )

        @pl.when(t_id < count)
        def _live_tile(s=s, t_id=t_id, rel=rel):
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, wb), 1)
            lane_blk = jax.lax.broadcasted_iota(jnp.int32, (T, cl), 1) // c

            acc = None
            for g in range(G):
                start = pl.multiple_of(
                    starts_ref[b, t_id * G + g], _ALIGN
                )
                win = x_ref[
                    0, pl.ds(pl.multiple_of(start // pack, 8), wb), :
                ].astype(jnp.bfloat16)  # (wb, cl)
                if fused_taps and not gather_mode:
                    # v2: per-tap fused dots — no oh/gath/mb staging
                    # round trips (wbig_ref is (K, cl, Cout) here).
                    # Rounding matches v1 exactly: gather output rows
                    # are exact bf16 table values, masked, then one
                    # bf16 dot with f32 accumulate per tap.
                    for j in range(tpg):
                        r = rel[:, g * tpg + j][:, None]  # (T, 1)
                        oh = (r // pack == iota_w).astype(jnp.bfloat16)
                        piece = jnp.dot(
                            oh, win, preferred_element_type=jnp.float32
                        )
                        if pack > 1:
                            piece = jnp.where(
                                lane_blk == (r % pack), piece, 0.0
                            )
                        part = jnp.dot(
                            piece.astype(jnp.bfloat16),
                            wbig_ref[g * tpg + j],
                            preferred_element_type=jnp.float32,
                        )
                        acc = part if acc is None else acc + part
                    continue
                for j in range(tpg):
                    r = rel[:, g * tpg + j][:, None]  # (T, 1)
                    oh_ref[j * T:(j + 1) * T, :] = (
                        r // pack == iota_w
                    ).astype(jnp.bfloat16)
                gath = jnp.dot(
                    oh_ref[:, :], win, preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)  # (tpg*T, cl)
                # fused sub-row mask + lane-concat into mb_ref
                for j in range(tpg):
                    piece = gath[j * T:(j + 1) * T, :]
                    if pack > 1:
                        r = rel[:, g * tpg + j][:, None]
                        piece = piece * (
                            lane_blk == (r % pack)
                        ).astype(jnp.bfloat16)
                    if gather_mode:
                        t0 = (g * tpg + j) * cl
                        out_ref[0, s * T:(s + 1) * T, t0:t0 + cl] = (
                            piece.astype(out_ref.dtype)
                        )
                    else:
                        mb_ref[:, j * cl:(j + 1) * cl] = piece
                if not gather_mode:
                    part = jnp.dot(
                        mb_ref[:, :], wbig_ref[g],
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
            if not gather_mode:
                # window-spill correction, in-kernel: the tile's slice of
                # the sorted spill list is folded in as one (MT, T)^T @
                # (MT, Cout) dot — an XLA scatter-add of the same rows
                # measured 3-4 ms/conv (TPU scatters serialize). Slack
                # rows from adjacent tiles fail the site compare and
                # contribute zero.
                m = cb_ref.shape[1]
                mt = min(tile_ov, m)
                seg = pl.multiple_of(
                    starts_ref[b, n_tiles * G + 1 + t_id], 8
                )
                ov = ovo_ref[0, pl.ds(seg, mt), :]  # (MT, 1)
                cb = cb_ref[0, pl.ds(seg, mt), :]  # (MT, Cout) f32
                site = t_id * T + jax.lax.broadcasted_iota(
                    jnp.int32, (mt, T), 1
                )
                oh_t = (ov == site).astype(jnp.float32)  # (MT, T)
                corr = jax.lax.dot_general(
                    oh_t, cb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (T, Cout)
                out_ref[0, s * T:(s + 1) * T, :] = (
                    acc + corr
                ).astype(out_ref.dtype)


def _run_kernel(
    features: jax.Array,  # (B, V_in_cap, C) CSR-ordered, C lane-compatible
    plan: TilePlan,  # leaves batched with leading B
    weights: jax.Array,  # (K, C, Cout) original tap order
    in_capacity: int,
    gather_mode: bool,
    out_dtype,
    interpret: bool | None = None,
    contrib: jax.Array | None = None,  # (B, M, Cout) f32 sorted spills
    fused_taps: bool | None = None,  # None = per-pack default
):
    K, C, cout = weights.shape
    B, n_tiles, T, _ = plan.rel.shape
    G = plan.n_groups
    tpg = K // G
    pack = _pack_factor(C)
    cl = pack * C
    xp = jax.vmap(lambda f: _pack_table(f, in_capacity))(features)
    n_out = K * cl if gather_mode else cout
    if interpret is None:
        interpret = _interpret_default()

    # tiles per grid step (see _kernel): amortizes the ~2.5 us per-step
    # overhead. gather_mode keeps S=1 — its out block is K*cl wide and
    # S=4 would quadruple an already-large VMEM block.
    S = 1 if gather_mode else min(_STEP_TILES, n_tiles)
    rel = plan.rel
    starts = plan.starts
    if n_tiles % S:
        pad_t = S - n_tiles % S
        ntp = n_tiles + pad_t
        rel = jnp.pad(rel, ((0, 0), (0, pad_t), (0, 0), (0, 0)),
                      constant_values=plan.window)
        # starts layout: (n_tiles*G band starts, count, n_tiles seg)
        starts = jnp.concatenate([
            jnp.pad(starts[:, : n_tiles * G], ((0, 0), (0, pad_t * G))),
            starts[:, n_tiles * G: n_tiles * G + 1],
            jnp.pad(starts[:, n_tiles * G + 1:], ((0, 0), (0, pad_t))),
        ], axis=1)
        n_tiles = ntp
    if contrib is None or gather_mode:
        # zero correction (gather mode handles spills separately in the
        # dW path; probe callers measure the bare kernel): dummy blocks,
        # the site compare masks whatever the clamped slices read
        contrib = jnp.zeros((B, 8, n_out), jnp.float32)
        ov_out = jnp.full((B, 8, 1), n_tiles * T, jnp.int32)
    else:
        ov_out = plan.ov_out[..., None]

    if fused_taps is None:
        fused_taps = _fused_default(pack)
    fused = fused_taps and not gather_mode
    # band-tiled weights: Wbig[g][j*cl + b*C + c, o] = W[perm[g*tpg+j]][c, o]
    # (fused variant keeps per-tap matrices: (K, cl, Cout))
    wperm = weights[jnp.asarray(plan.perm)]  # (K, C, Cout)
    wbig = jnp.tile(wperm.astype(jnp.bfloat16), (1, pack, 1))
    if not fused:
        wbig = wbig.reshape(G, tpg * cl, cout)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles // S),
        in_specs=[
            pl.BlockSpec(
                (1,) + xp.shape[1:], lambda b, i, s: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, S, T, K), lambda b, i, s: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1,) + contrib.shape[1:], lambda b, i, s: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + ov_out.shape[1:], lambda b, i, s: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, S * T, n_out), lambda b, i, s: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            # the fused variant builds its one-hots and pieces as values
            pltpu.VMEM((8, _LANES) if fused else
                       (tpg * T, plan.window // pack), jnp.bfloat16),
            pltpu.VMEM((8, _LANES) if fused else (T, tpg * cl),
                       jnp.bfloat16),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            n_groups=G,
            pack=pack,
            window=plan.window,
            gather_mode=gather_mode,
            tile_ov=plan.tile_ov,
            fused_taps=fused,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * T, n_out), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, xp, rel, wbig, contrib, ov_out)
    return out


def _spill_contrib(features, weights, plan, in_capacity):
    """Per-spill output-row contributions (B, M, Cout) f32, grouped by
    tile (contiguous per-tile segments, tap-major inside a tile — NOT
    sorted by output site). Fed to the kernel's per-tile one-hot
    correction dot; rounding matches the old scatter path exactly
    (bf16 operands, f32 accumulate, one tap per row)."""
    K, C, cout = weights.shape
    wf = jnp.transpose(weights.astype(jnp.bfloat16), (1, 0, 2)).reshape(
        C, K * cout
    )

    def one(xb, pos, tap):
        safe = jnp.minimum(pos, in_capacity - 1)
        xg = jnp.where(
            (pos < in_capacity)[:, None], xb[safe], 0
        ).astype(jnp.bfloat16)
        at = jnp.dot(
            xg, wf, preferred_element_type=jnp.float32
        ).reshape(-1, K, cout)
        return jnp.take_along_axis(at, tap[:, None, None], axis=1)[:, 0]

    return jax.vmap(one)(features, plan.ov_pos, plan.ov_tap)


def _apply_overflow_one(out, features, weights, ov_pos, ov_out, ov_tap,
                        in_capacity):
    """Exact correction for rules that missed their tile window (1 sample).

    Per-tap masked dots at the kernel's bf16 MXU precision (f32
    accumulate). Cost is K * M * C * cout FLOPs regardless of the true
    spill count, so the overflow CAPACITY should be sized to measured
    production spills (SparseEncoder.plan_overflow), not padded "for
    safety" — truncation is surfaced via plan.n_overflow diagnostics.
    """
    K, C, cout = weights.shape
    M = ov_pos.shape[0]
    xp = jnp.concatenate(
        [features[:in_capacity],
         jnp.zeros((1, C), features.dtype)], axis=0
    )
    xg = xp[jnp.minimum(ov_pos, in_capacity)].astype(
        jnp.bfloat16)  # (M, C)
    wb = weights.astype(jnp.bfloat16)
    # ONE dot against every tap's weights, then a per-row tap select:
    # same K*M*C*cout FLOPs as K masked dots, but 1 MXU op + 1 M-row
    # gather instead of 27 dot+where pairs (the masked-dot loop cost
    # ~3 ms/conv of pure op-dispatch at M=16k — micro_mxu_probe r4)
    # f32 materialization kept deliberately: the correction must match
    # the kernel's f32-accumulate precision bit-for-bit with the XLA
    # oracle (tests/test_sparse_pallas.py::test_overflow_spill_exact);
    # at the down-conv list size (32k, cout=128) this costs ~450 MB of
    # HBM traffic ~= 1 ms — the price of unconditional exactness
    all_taps = jnp.dot(
        xg, jnp.transpose(wb, (1, 0, 2)).reshape(C, K * cout),
        preferred_element_type=jnp.float32,
    ).reshape(M, K, cout)
    contrib = jnp.take_along_axis(
        all_taps, ov_tap[:, None, None], axis=1
    )[:, 0]
    return out.at[ov_out].add(
        contrib.astype(out.dtype), mode="drop"
    )


def _apply_overflow(out, features, weights, plan, in_capacity):
    """Batched window-spill correction (see _apply_overflow_one)."""
    return jax.vmap(
        lambda o, f, p, j, t: _apply_overflow_one(
            o, f, weights, p, j, t, in_capacity
        )
    )(out, features, plan.ov_pos, plan.ov_out, plan.ov_tap)


def _float0_like(tree):
    return jax.tree.map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), tree
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _conv_core(interpret, in_capacity, fused_taps, x, w, plan, plan_t):
    out = _run_kernel(
        x, plan, w, in_capacity, False, jnp.float32, interpret,
        contrib=_spill_contrib(x, w, plan, in_capacity),
        fused_taps=fused_taps,
    )
    return out[:, : plan.v_out]


def _conv_core_fwd(interpret, in_capacity, fused_taps, x, w, plan, plan_t):
    out = _conv_core(interpret, in_capacity, fused_taps, x, w, plan,
                     plan_t)
    return out, (x, w, plan, plan_t)


def _conv_core_bwd(interpret, in_capacity, fused_taps, res, g):
    x, w, plan, plan_t = res
    B = x.shape[0]
    v_out = plan.v_out
    gb = _pad_c(g.astype(jnp.bfloat16), 2)
    # dx: transposed conv (flipped taps, transposed channel matrices).
    # plan_t covers the same rule set seen from the input sites, and its
    # own overflow correction makes dx exact.
    w_t = _pad_c(jnp.transpose(w[::-1], (0, 2, 1)), 1)  # (K, Cout_p, C)
    dx = _run_kernel(
        gb, plan_t, w_t, v_out, False, jnp.float32, interpret,
        contrib=_spill_contrib(gb, w_t, plan_t, v_out),
    )
    dx = dx[:, :in_capacity]
    # dw = gathered^T @ g; gather-mode output is band-major with each
    # tap's block p-expanded. The sub-row mask left exactly ONE nonzero
    # sub-block per (row, tap), so summing the p lane blocks BEFORE the
    # dot is an exact selection (no rounding) and cuts the dot's FLOPs
    # by the pack factor (8x at the C=16 level). The dot contracts over
    # (B, v_out) jointly, summing sample contributions.
    gath = _run_kernel(
        x, plan, w, in_capacity, True, jnp.bfloat16, interpret
    )[:, :v_out]
    gf = g.astype(jnp.float32)
    K, C, cout = w.shape
    pack = _pack_factor(C)
    if pack > 1:
        gath = gath.reshape(B, v_out, K, pack, C).sum(axis=3).reshape(
            B, v_out, K * C
        )
    dwp = jnp.dot(
        gath.astype(jnp.float32).reshape(B * v_out, K * C).T,
        gf.reshape(B * v_out, -1),
        preferred_element_type=jnp.float32,
    ).reshape(K, C, cout)  # band-major taps
    inv = np.argsort(np.asarray(plan.perm))
    dw = dwp[jnp.asarray(inv)]

    # gather-mode drops overflow rules; add their dw contributions.
    def ov_dw(xb, gfb, ov_pos, ov_out, ov_tap):
        xp = jnp.concatenate(
            [xb, jnp.zeros((1, xb.shape[1]), xb.dtype)], axis=0
        )
        ov_x = xp[jnp.minimum(ov_pos, in_capacity)].astype(jnp.float32)
        gpad = jnp.concatenate(
            [gfb, jnp.zeros((1, gfb.shape[1]), gfb.dtype)], axis=0
        )
        ov_g = gpad[jnp.minimum(ov_out, v_out)]
        live = (ov_pos < in_capacity)[:, None]
        parts = []
        for k in range(K):
            m = (ov_tap == k)[:, None] & live
            parts.append(jnp.dot(
                jnp.where(m, ov_x, 0.0).T, ov_g,
                preferred_element_type=jnp.float32,
            ))
        return jnp.stack(parts, 0)

    dw = dw + jnp.sum(
        jax.vmap(ov_dw)(x, gf, plan.ov_pos, plan.ov_out, plan.ov_tap),
        axis=0,
    )
    return (
        dx.astype(x.dtype),
        dw.astype(w.dtype),
        _float0_like(plan),
        _float0_like(plan_t),
    )


_conv_core.defvjp(_conv_core_fwd, _conv_core_bwd)


def apply_conv_pallas_batched(
    features: jax.Array,  # (B, V_in, C) CSR-ordered
    plan: TilePlan,  # leaves batched with leading B
    plan_t: TilePlan,  # plan of the transposed rulebook (for dx)
    weights: jax.Array,  # (K, C, Cout) kernel_offsets order
    out_valid: jax.Array,  # (B, V_out)
    bias: jax.Array | None = None,
    kernel_size=3,
    out_dtype=None,
    interpret: bool | None = None,
    fused_taps: bool | None = None,  # None = per-pack default
) -> jax.Array:
    """Batched sparse conv apply, differentiable (custom VJP).

    Returns (B, V_out, Cout). One kernel launch with a (B, n_tiles) grid —
    the batch dimension shares the compiled program and pipelines table
    loads across samples instead of dispatching B separate kernels
    (VERDICT r3 item 3: the per-sample Python unroll made batch-4 slower
    than batch-1).

    Numerically equivalent (at bf16 MXU precision) to vmapping
    ops/sparse_conv.apply_conv over rulebooks with use_positions=True on
    CSR-ordered features. ``kernel_size`` is carried by the plans (via
    their tap permutation); the argument is accepted for call-site
    clarity only.
    """
    del kernel_size
    if interpret is None:
        interpret = _interpret_default()
    if out_dtype is None:
        out_dtype = features.dtype
    features = _pad_c(features, 2)
    weights = _pad_c(weights, 1)
    in_capacity = features.shape[1]
    out = _conv_core(
        bool(interpret), in_capacity, fused_taps, features, weights,
        plan, plan_t,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)[None, None, :]
    out = jnp.where(out_valid[..., None], out, 0.0)
    return out.astype(out_dtype)


def apply_conv_pallas(
    features: jax.Array,  # (V_in, C) CSR-ordered
    plan: TilePlan,
    plan_t: TilePlan,  # plan of the transposed rulebook (for dx)
    weights: jax.Array,  # (K, C, Cout) kernel_offsets order
    out_valid: jax.Array,  # (V_out,)
    bias: jax.Array | None = None,
    kernel_size=3,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """Single-sample wrapper over apply_conv_pallas_batched (B = 1)."""
    batched = jax.tree.map(lambda a: a[None], (features, plan, plan_t,
                                               out_valid))
    fb, plan_b, plan_tb, vb = batched
    out = apply_conv_pallas_batched(
        fb, plan_b, plan_tb, weights, vb, bias=bias,
        kernel_size=kernel_size, out_dtype=out_dtype, interpret=interpret,
    )
    return out[0]


def build_plan_direct(
    in_table,  # sparse_conv.VoxelTable over the input set
    in_shape,
    out_coords: jax.Array,  # (V_out, 3) CSR-ordered
    out_valid: jax.Array,
    kernel_size=3,
    stride=1,
    padding=0,
    tile: int = 256,
    window: int = 512,
    overflow_capacity: int = 8192,
    with_rules: bool = False,
    tile_ov: int = _TILE_OV,
):
    """Fused rulebook + tile-plan construction.

    Builds the window-relative rulebook straight in the kernel's
    (n_tiles, T, K) layout: window starts come from the meta row-start of
    each tile's first site's minimal band column (meta starts are
    monotone in column index, so clamping only widens the window — any
    residual span overflow goes through the exact spill list). This
    replaces sparse_conv.build_conv_rules + build_tile_plan for the
    forward path; when ``with_rules`` the absolute (K, V_out) positions
    are also returned (needed to build the transposed plan for the
    backward pass — dead-code-eliminated by XLA in inference).
    """
    from . import sparse_conv as sc

    if isinstance(kernel_size, int):
        kz = ky = kx = kernel_size
    else:
        kz, ky, kx = kernel_size
    sz, sy, sx = (
        (stride,) * 3 if isinstance(stride, int) else tuple(stride)
    )
    pz, py, px = (
        (padding,) * 3 if isinstance(padding, int) else tuple(padding)
    )
    D, H, W = in_shape
    V = in_table.capacity
    n_col = H * W
    v_out = out_coords.shape[0]
    perm, n_groups = _group_perm((kz, ky, kx))
    n_tiles = -(-v_out // tile)
    padn = n_tiles * tile - v_out
    vp = _padded_rows(V)
    if window % _ALIGN or vp < window:  # pragma: no cover - config error
        raise ValueError(f"bad window {window} for capacity {V}")

    oc = jnp.pad(out_coords, ((0, padn), (0, 0)))
    ov = jnp.pad(out_valid, (0, padn))
    meta = in_table.meta

    # packed meta rows for the kx x-taps (see sparse_conv.build_conv_rules)
    if kx > 1:
        core = meta[:-1]
        shifts = []
        for dx in range(kx):
            off = dx - 1
            if off < 0:
                s = jnp.concatenate([meta[-1:], core[:off]], 0)
            elif off == 0:
                s = core
            else:
                s = jnp.concatenate([core[off:], meta[-1:]], 0)
            shifts.append(s)
        metap = jnp.concatenate(shifts, axis=1)
        metap = jnp.concatenate(
            [metap, jnp.zeros((1, 4 * kx), jnp.int32)], 0
        )
    else:
        metap = meta

    # window starts: first site of each tile, minimal column of each band
    first = oc[::tile]  # (n_tiles, 3)
    starts = []
    for g in range(ky):
        yg = first[:, 1] * sy - py + g
        xg = first[:, 2] * sx - px
        colg = jnp.clip(yg * W + xg, 0, n_col - 1)
        st = meta[colg, 2]
        st = jnp.minimum(st, vp - window) & ~(_ALIGN - 1)
        starts.append(st.astype(jnp.int32))
    if ky == 1:
        starts = starts * n_groups
    starts_site = [
        jnp.repeat(s, tile, total_repeat_length=n_tiles * tile)
        for s in starts
    ]

    z0 = oc[:, 0] * sz - pz
    rel_taps = [None] * (kz * ky * kx)
    pos_taps = [None] * (kz * ky * kx) if with_rules else None
    for dy in range(ky):
        yi = oc[:, 1] * sy - py + dy
        y_ok = ov & (yi >= 0) & (yi < H)
        st_g = starts_site[dy if ky > 1 else 0]
        if kx > 1:
            xc = oc[:, 2] * sx - px + 1
            colq = jnp.where(
                y_ok, jnp.clip(yi * W + xc, 0, n_col - 1), n_col
            )
            m3 = metap[colq]
        for dx in range(kx):
            xi = oc[:, 2] * sx - px + dx
            bev_ok = y_ok & (xi >= 0) & (xi < W)
            if kx > 1:
                w0 = jnp.where(bev_ok, m3[:, 4 * dx], 0)
                w1 = jnp.where(bev_ok, m3[:, 4 * dx + 1], 0)
                start_c = m3[:, 4 * dx + 2]
            else:
                colq = jnp.where(bev_ok, yi * W + xi, n_col)
                m = metap[colq]
                w0, w1, start_c = m[:, 0], m[:, 1], m[:, 2]
            for dz in range(kz):
                zi = z0 + dz
                ok = (
                    bev_ok & (zi >= 0) & (zi < D)
                    & sc._test_bit(w0, w1, zi)
                )
                pos = start_c + sc._rank(w0, w1, zi)
                k = dz * ky * kx + dy * kx + dx
                rel_taps[k] = (jnp.where(ok, pos, -1), st_g)
                if with_rules:
                    pos_taps[k] = jnp.where(ok, pos, V)

    rel_abs = jnp.stack([p for p, _ in rel_taps], 0)  # (K, Vp) or -1 miss
    st_all = jnp.stack([s for _, s in rel_taps], 0)
    rel = rel_abs - st_all
    ok_all = rel_abs >= 0
    in_win = ok_all & (rel >= 0) & (rel < window)
    relf = jnp.where(in_win, rel, window).astype(jnp.int32)
    relf = relf.reshape(-1, n_tiles, tile)

    # two-stage, tile-major overflow compaction (see _compact_overflow)
    K = relf.shape[0]
    ov_pos, ov_out, ov_k, n_overflow, seg = _compact_overflow(
        (ok_all & ~in_win).reshape(-1, n_tiles, tile),
        rel_abs.reshape(K, n_tiles, tile), n_tiles, tile, V,
        overflow_capacity, tile_ov,
    )

    st_flat = jnp.stack(
        starts, axis=-1
    ).reshape(-1) if ky > 1 else jnp.repeat(
        starts[0][:, None], n_groups, axis=1
    ).reshape(-1)
    # trailing active-tile count (see build_tile_plan / _kernel): 1 + last
    # tile holding any live rule; suffix tiles are skipped by the kernel
    act = jnp.any(ok_all.reshape(-1, n_tiles, tile), axis=(0, 2))
    n_active = jnp.max(
        jnp.where(act, jnp.arange(n_tiles, dtype=jnp.int32) + 1, 0)
    )
    plan = TilePlan(
        rel=jnp.transpose(relf, (1, 2, 0))[:, :, perm],
        starts=jnp.concatenate([st_flat, n_active[None], seg]),
        ov_pos=ov_pos,
        ov_out=ov_out,
        ov_tap=ov_k,
        n_overflow=n_overflow,
        v_out=v_out,
        window=window,
        n_groups=n_groups,
        perm=perm,
        tile_ov=min(tile_ov, overflow_capacity),
    )
    if with_rules:
        rules = jnp.stack(pos_taps, 0)[:, :v_out]
        return plan, rules
    return plan
