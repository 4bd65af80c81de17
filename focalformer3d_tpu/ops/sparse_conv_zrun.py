"""Pallas TPU sparse-conv apply, z-run formulation (the r4 PERF.md spec).

The windowed one-hot kernel (ops/sparse_conv_pallas.py) issues one
selection row per (site, tap): 27 one-hot rows/site for a k=3 conv, plus
a mask/concat staging pass and a second band matmul. Its measured rate is
VMEM-row bound at 0.7-0.9 G rows/s against a 1.7 G rows/s bare-gather
floor (docs/PERF.md r4).

This module exploits the CSR order (column-major over BEV, z-minor): for
one output site and one BEV neighbor (dy, dx), the kz=3 z-taps read
*consecutive* CSR positions whenever present — the ranks of z-1, z, z+1
inside one column are adjacent. So per (site, dy, dx) the kernel issues
ONE selection row against a 4-block stacked operand:

    Yext  = win @ Wcat[g]            # (wb, kx*3*p*Cout) one dot per band
    A_dz  = Yext[:, dx block]        # per-tap partial products X@W_dz
    Ycat  = [A0 | S1(A1) | S2(A2) | S1(A2)]   # unpacked-row shifts
    G     = onehot(anchor) @ Ycat    # (T, 4*p*Cout)  MXU
    out  += mask(pattern, subrow) . G summed over the 4*p blocks

where S1/S2 shift the *unpacked* row index by 1/2 (so the single anchor
row reaches the whole z-run) and the 4th block (A2 shifted by 1) makes
the one non-contiguous pattern — z-1 and z+1 present, z absent — exact
in-kernel. Anchors: a* = pos(first present z-tap) - (its tap index), so
pos(z-1)=a*, pos(z)=a*+1, pos(z+1)=a*+2 (or a*+1 in the 4th-block
pattern). 9 selection rows/site instead of 27, no mask/concat staging,
no second matmul, and the plan stores one (anchor, pattern) int per
(site, dy, dx) instead of 3 positions — 3x smaller plan arrays.

Rules that fall outside their tile window spill into the same
fixed-capacity, tile-grouped overflow list as the one-hot kernel
(per-run entries), applied in-kernel as a per-tile one-hot dot; true
spill counts beyond the list capacity reroute the conv through the exact
XLA engine (models/sparse_encoder.py), so the op stays exact.

The backward pass reuses the one-hot kernel's custom VJP machinery
(ops/sparse_conv_pallas._conv_core_bwd): the old-format plans ride along
as residuals and are dead-code-eliminated by XLA in inference.

Reference semantics: spconv submanifold / strided sparse conv
(/root/reference/projects/configs/focalformer3d/FocalFormer3D_L.py:198-206);
parity-tested against ops/sparse_conv.apply_conv
(tests/test_sparse_zrun.py).
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

from . import sparse_conv as sc
from . import sparse_conv_pallas as scp
from .sparse_conv_pallas import (
    _ALIGN,
    _LANES,
    _STEP_TILES,
    _TILE_OV,
    _compact_overflow,
    _interpret_default,
    _pack_factor,
    _pad_c,
    _pack_table,
    _padded_rows,
    _float0_like,
)

# z-run block -> (unpacked-row offset from the anchor, z-tap index)
_BLK_OFF = (0, 1, 2, 1)
_BLK_DZ = (0, 1, 2, 2)


@dataclasses.dataclass(frozen=True)
class ZPlan:
    """Anchor/pattern rulebook for one conv geometry on one voxel set."""

    code: jax.Array  # (n_tiles, T, R) int32, R = ky*kx combos in
    # (dy-band, dx) order; value = (window-relative anchor << 4) | pattern
    # with pattern bits (e0..e3) enabling the 4 stacked blocks; pattern 0
    # = dead row (no taps, padded site, or window spill)
    starts: jax.Array  # (n_tiles * (G + 1) + 1,): per-(tile, band) window
    # row starts (64-aligned), the active tile count, then per-tile
    # spill-segment starts (8-aligned) — same layout as TilePlan.starts
    ov_pos: jax.Array  # (M,) int32 spill anchor positions (absolute),
    # grouped by tile (contiguous per-tile segments)
    ov_out: jax.Array  # (M,) int32 spill output sites (n_tiles*T = drop)
    ov_code: jax.Array  # (M,) int32 (combo r << 4) | pattern per spill run
    n_overflow: jax.Array  # () int32 true spilled-RUN count; forced past
    # the capacity when a per-tile segment exceeds the kernel scan budget
    v_out: int
    window: int
    kz: int
    ky: int
    kx: int
    tile_ov: int = _TILE_OV

    @property
    def tile(self) -> int:
        return self.code.shape[-2]


jax.tree_util.register_pytree_node(
    ZPlan,
    lambda p: (
        (p.code, p.starts, p.ov_pos, p.ov_out, p.ov_code, p.n_overflow),
        (p.v_out, p.window, p.kz, p.ky, p.kx, p.tile_ov),
    ),
    lambda aux, c: ZPlan(*c, *aux),
)


def build_zplan(
    table: sc.VoxelTable,
    in_shape,
    out_coords: jax.Array,  # (V_out, 3) zyx, CSR-ordered
    out_valid: jax.Array,
    kernel_size=3,
    stride=1,
    padding=0,
    tile: int = 256,
    window: int = 512,
    overflow_capacity: int = 4096,
    tile_ov: int = _TILE_OV,
    meta9: jax.Array | None = None,
) -> ZPlan:
    """Anchor/pattern plan straight from the column meta (one rank per
    (site, dy, dx) instead of kz tests+ranks — and no (27, V) rulebook
    materialization). Window starts come from the meta row-start of each
    tile's first site's band column (CSR order makes it the tile
    minimum), as in sparse_conv_pallas.build_plan_direct."""
    kz, ky, kx = sc._as_triple(kernel_size)
    sz, sy, sx = sc._as_triple(stride)
    pz, py, px = sc._as_triple(padding)
    if kz != 3:  # pragma: no cover - geometry invariant of this model
        raise ValueError("z-run plans require kz == 3")
    if window % _ALIGN:  # pragma: no cover - config error
        raise ValueError(f"window {window} must be a multiple of {_ALIGN}")
    if overflow_capacity % 8 or tile_ov % 8:  # pragma: no cover
        raise ValueError("overflow capacity and tile_ov must be 8-aligned")
    D, H, W = in_shape
    V = table.capacity
    n_col = H * W
    meta = table.meta
    v_out = out_coords.shape[0]
    n_tiles = -(-v_out // tile)
    padn = n_tiles * tile - v_out
    vp = _padded_rows(V)
    if vp < window:  # pragma: no cover - config error
        raise ValueError(f"capacity {V} < window {window}")
    R = ky * kx

    oc = jnp.pad(out_coords, ((0, padn), (0, 0)))
    ov = jnp.pad(out_valid, (0, padn))

    # per-(tile, band) window starts from the first site's band column
    first = oc[::tile]  # (n_tiles, 3)
    starts = []
    for g in range(ky):
        yg = first[:, 1] * sy - py + g
        xg = first[:, 2] * sx - px
        colg = jnp.clip(yg * W + xg, 0, n_col - 1)
        st = meta[colg, 2]
        st = jnp.minimum(st, vp - window) & ~(_ALIGN - 1)
        starts.append(st.astype(jnp.int32))
    st_site = [
        jnp.repeat(s, tile, total_repeat_length=n_tiles * tile)
        for s in starts
    ]

    if ky == 3 and kx == 3:
        # single widened-meta gather for all 9 BEV taps (see
        # sparse_conv.build_conv_rules)
        nr = n_col + W + 1
        if meta9 is None:
            meta9 = sc.widen_meta9(meta, in_shape)
        base_col = (oc[:, 1] * sy - py) * W + oc[:, 2] * sx - px
        q = jnp.clip(base_col + (W + 1), 0, nr - 1)
        m9 = meta9[jnp.where(ov, q, 0)]  # (V_out, 36)

    z0 = oc[:, 0] * sz - pz
    codes = []  # (V_out,) per (dy, dx) combo, band-major
    sp_mask = []  # spill masks per combo
    sp_pos = []  # spill anchor positions per combo
    for dy in range(ky):
        yi = oc[:, 1] * sy - py + dy
        y_ok = ov & (yi >= 0) & (yi < H)
        stg = st_site[dy]
        for dx in range(kx):
            xi = oc[:, 2] * sx - px + dx
            bev_ok = y_ok & (xi >= 0) & (xi < W)
            if ky == 3 and kx == 3:
                t = 4 * (dy * 3 + dx)
                w0, w1, stc = m9[:, t], m9[:, t + 1], m9[:, t + 2]
            else:
                colq = jnp.where(bev_ok, yi * W + xi, n_col)
                m = meta[colq]
                w0, w1, stc = m[:, 0], m[:, 1], m[:, 2]
            # presence of the 3 consecutive z taps
            bm = bev_ok & (z0 >= 0) & (z0 < D) & sc._test_bit(w0, w1, z0)
            b0 = (
                bev_ok & (z0 + 1 >= 0) & (z0 + 1 < D)
                & sc._test_bit(w0, w1, z0 + 1)
            )
            bp = (
                bev_ok & (z0 + 2 >= 0) & (z0 + 2 < D)
                & sc._test_bit(w0, w1, z0 + 2)
            )
            r0 = sc._rank(w0, w1, jnp.maximum(z0, 0))
            # virtual anchor = slot of the z-1 tap
            delta = jnp.where(bm, 0, jnp.where(b0, 1, 2))
            a = stc + r0 - delta
            e0 = bm
            e1 = b0
            e2 = bp & (b0 | ~bm)
            e3 = bp & bm & ~b0
            pat = (
                e0.astype(jnp.int32)
                + (e1.astype(jnp.int32) << 1)
                + (e2.astype(jnp.int32) << 2)
                + (e3.astype(jnp.int32) << 3)
            )
            present = pat > 0
            maxoff = jnp.where(
                e2, 2, jnp.where(e1 | e3, 1, 0)
            )
            rel = a - stg
            in_win = present & (rel >= 0) & (rel + maxoff < window)
            codes.append(
                jnp.where(in_win, (rel << 4) | pat, 0).astype(jnp.int32)
            )
            sp_mask.append(present & ~in_win)
            # spilled runs carry (anchor + 4 << 4) | pattern: virtual
            # anchors reach -2, and _compact_overflow maps NEGATIVE
            # values to the miss sentinel — the +4 bias keeps real
            # entries non-negative
            sp_pos.append(((a + 4) << 4) | pat)

    code = jnp.stack(codes, axis=-1)  # (n_tiles*tile, R)
    code = code.reshape(n_tiles, tile, R)

    # tile-grouped spill compaction over RUNS (R combos, not 27 taps)
    ovm = jnp.stack(sp_mask, 0).reshape(R, n_tiles, tile)
    ovp = jnp.stack(sp_pos, 0).reshape(R, n_tiles, tile).astype(jnp.int32)
    ov_ap, ov_out, ov_r, n_overflow, seg = _compact_overflow(
        ovm, ovp, n_tiles, tile, 0, overflow_capacity, tile_ov
    )
    # split the packed value; pattern 0 (the miss sentinel) = dead entry
    ov_pat = ov_ap & 15
    ov_pos = jnp.where(
        ov_pat > 0, (ov_ap >> 4) - 4, V
    ).astype(jnp.int32)
    ov_code = ((ov_r << 4) | ov_pat).astype(jnp.int32)

    act = jnp.any(code > 0, axis=(1, 2)) | jnp.any(ovm, axis=(0, 2))
    n_active = jnp.max(
        jnp.where(act, jnp.arange(n_tiles, dtype=jnp.int32) + 1, 0)
    )
    return ZPlan(
        code=code,
        starts=jnp.concatenate(
            [jnp.stack(starts, axis=-1).reshape(-1), n_active[None], seg]
        ),
        ov_pos=ov_pos,
        ov_out=ov_out,
        ov_code=ov_code,
        n_overflow=n_overflow,
        v_out=v_out,
        window=window,
        kz=kz,
        ky=ky,
        kx=kx,
        tile_ov=min(tile_ov, overflow_capacity),
    )


def _build_wext(weights: jax.Array, kz: int, ky: int, kx: int,
                pack: int) -> jax.Array:
    """(K, C, Cout) kernel_offsets order -> (ky, pack*C, kx*kz*pack*Cout)
    band-stacked block-diagonal weights. Output lane layout per band:
    [dx][dz][sub-row][cout], so Yext = win_packed @ wext[g] yields every
    per-tap partial product X @ W_dz at packed-row resolution."""
    K, C, cout = weights.shape
    w = weights.astype(jnp.bfloat16).reshape(kz, ky, kx, C, cout)
    eye = jnp.eye(pack, dtype=jnp.bfloat16)
    # out[g, (s, c), (dx, dz, s2, o)] = w[dz, g, dx, c, o] * eye[s, s2]
    wz = jnp.einsum("zgxco,st->gscxzto", w, eye)
    return wz.reshape(ky, pack * C, kx * kz * pack * cout)


def _shift1(a: jax.Array, pack: int, cout: int) -> jax.Array:
    """Shift the UNPACKED row index by 1: out[w] = a[w + 1] where a is
    packed (wb, pack*cout) with sub-rows on lanes. Wrapped tail rows are
    never selected (the builder guarantees anchor + maxoff < window).

    Operands must be 32-bit: Mosaic's tpu.dynamic_rotate rejects bf16
    ("Rotate with non-32-bit data"), so callers shift the f32 Yext and
    cast to bf16 only when staging into ycat."""
    wb = a.shape[0]
    r1 = pltpu.roll(a, wb - 1, 0)  # rows up by 1
    if pack == 1:
        return r1
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    z = jnp.where(lane < cout, r1, a)
    return pltpu.roll(z, a.shape[1] - cout, 1)  # lanes left by cout


def _zkernel(
    starts_ref,  # SMEM (B, n_tiles*(G+1)+1) int32
    x_ref,  # VMEM (1, Vp/p, p*C) packed table (this sample)
    code_ref,  # VMEM (1, S, T, R) int32 anchor/pattern codes
    wext_ref,  # VMEM (G, p*C, kx*kz*p*Cout) band-stacked weights
    cb_ref,  # VMEM (1, M, Cout) f32 per-spill contributions (tile-grouped)
    ovo_ref,  # VMEM (1, M, 1) int32 spill output sites
    out_ref,  # VMEM (1, S*T, Cout)
    oh_ref,  # scratch VMEM (T, wb) bf16
    ycat_ref,  # scratch VMEM (wb, 4*p*Cout) bf16
    *,
    kz: int,
    n_groups: int,
    kx: int,
    pack: int,
    window: int,
    cout: int,
    tile_ov: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    G = n_groups
    S = code_ref.shape[1]
    T = code_ref.shape[2]
    pc = pack * cout
    wb = window // pack
    n_tiles = pl.num_programs(1) * S
    count = starts_ref[b, n_tiles * G]

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, wb), 1)
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (T, 4 * pc), 1)
    sigma = lane_g // pc
    sub = (lane_g - sigma * pc) // cout
    # stacked-identity reduction matrix: sum the 4*pack cout-blocks of
    # gsel with ONE MXU dot (Mosaic can't reshape lanes (T, 4pc) ->
    # (T, 4p, cout)). gsel entries are one-hot-selected bf16 values, so
    # the bf16 cast before this dot is lossless and the f32-accumulated
    # dot matches the "partials rounded to bf16, summed in f32" contract
    red_i = jax.lax.broadcasted_iota(jnp.int32, (4 * pc, cout), 0)
    red_j = jax.lax.broadcasted_iota(jnp.int32, (4 * pc, cout), 1)
    red = (red_i % cout == red_j).astype(jnp.bfloat16)

    for s in range(S):
        t_id = i * S + s

        @pl.when(t_id >= count)
        def _pad_tile(s=s):
            out_ref[0, s * T:(s + 1) * T, :] = jnp.zeros(
                (T, out_ref.shape[2]), out_ref.dtype
            )

        @pl.when(t_id < count)
        def _live_tile(s=s, t_id=t_id):
            acc = jnp.zeros((T, cout), jnp.float32)
            for g in range(G):
                start = pl.multiple_of(
                    starts_ref[b, t_id * G + g], _ALIGN
                )
                win = x_ref[
                    0, pl.ds(pl.multiple_of(start // pack, 8), wb), :
                ].astype(jnp.bfloat16)  # (wb, p*C)
                yext = jnp.dot(
                    win, wext_ref[g], preferred_element_type=jnp.float32
                )  # (wb, kx*kz*pc) f32: rotates must be 32-bit on Mosaic
                for dx in range(kx):
                    a0 = yext[:, dx * 3 * pc:dx * 3 * pc + pc]
                    a1 = yext[:, dx * 3 * pc + pc:dx * 3 * pc + 2 * pc]
                    a2 = yext[:, dx * 3 * pc + 2 * pc:(dx + 1) * 3 * pc]
                    s1 = _shift1(a1, pack, cout)
                    s21 = _shift1(a2, pack, cout)
                    s22 = _shift1(s21, pack, cout)
                    ycat_ref[:, 0:pc] = a0.astype(jnp.bfloat16)
                    ycat_ref[:, pc:2 * pc] = s1.astype(jnp.bfloat16)
                    ycat_ref[:, 2 * pc:3 * pc] = s22.astype(jnp.bfloat16)
                    ycat_ref[:, 3 * pc:4 * pc] = s21.astype(jnp.bfloat16)
                    codev = code_ref[0, s, :, g * kx + dx][:, None]
                    rel = codev >> 4  # (T, 1)
                    pat = codev & 15
                    oh_ref[:, :] = (
                        (rel // pack == iota_w) & (pat > 0)
                    ).astype(jnp.bfloat16)
                    gsel = jnp.dot(
                        oh_ref[:, :], ycat_ref[:, :],
                        preferred_element_type=jnp.float32,
                    )  # (T, 4*pc)
                    keep = (jnp.right_shift(pat, sigma) & 1) == 1
                    if pack > 1:
                        keep = keep & (sub == rel % pack)
                    gs = jnp.where(keep, gsel, 0.0).astype(jnp.bfloat16)
                    acc = acc + jnp.dot(
                        gs, red, preferred_element_type=jnp.float32
                    )
            # per-tile window-spill correction (same scheme as the
            # one-hot kernel: the tile's slice of the tile-grouped spill
            # list folded in as one one-hot dot)
            m = cb_ref.shape[1]
            mt = min(tile_ov, m)
            seg = pl.multiple_of(
                starts_ref[b, n_tiles * G + 1 + t_id], 8
            )
            ovs = ovo_ref[0, pl.ds(seg, mt), :]  # (MT, 1)
            cb = cb_ref[0, pl.ds(seg, mt), :]  # (MT, Cout) f32
            site = t_id * T + jax.lax.broadcasted_iota(
                jnp.int32, (mt, T), 1
            )
            oh_t = (ovs == site).astype(jnp.float32)
            corr = jax.lax.dot_general(
                oh_t, cb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, s * T:(s + 1) * T, :] = (
                acc + corr
            ).astype(out_ref.dtype)


def _spill_contrib_z(features, weights, zplan, in_capacity):
    """Per-spilled-run output contributions (B, M, Cout) f32, grouped by
    tile like the plan's spill list. Rounding matches the kernel: each
    z-tap partial is rounded to bf16 (the Ycat staging dtype), summed in
    f32."""
    K, C, cout = weights.shape
    R = zplan.ky * zplan.kx
    # tap k = dz * R + combo  (kernel_offsets dz-major order)
    wf = jnp.transpose(
        weights.astype(jnp.bfloat16).reshape(zplan.kz, R, C, cout),
        (2, 0, 1, 3),
    ).reshape(C, zplan.kz * R * cout)

    def one(xb, pos, code):
        combo = code >> 4
        pat = code & 15
        xpad = jnp.concatenate(
            [xb[:in_capacity], jnp.zeros((2, C), xb.dtype)], axis=0
        )
        out = jnp.zeros((pos.shape[0], cout), jnp.float32)
        for blk, (off, dz) in enumerate(zip(_BLK_OFF, _BLK_DZ)):
            en = (jnp.right_shift(pat, blk) & 1) == 1
            p = jnp.clip(pos + off, 0, in_capacity + 1)
            xg = jnp.where(en[:, None], xpad[p], 0).astype(jnp.bfloat16)
            at = jnp.dot(
                xg, wf, preferred_element_type=jnp.float32
            ).reshape(-1, zplan.kz * R, cout)
            sel = jnp.take_along_axis(
                at, (dz * R + combo)[:, None, None], axis=1
            )[:, 0]
            out = out + sel.astype(jnp.bfloat16).astype(jnp.float32)
        return out

    return jax.vmap(one)(features, zplan.ov_pos, zplan.ov_code)


def _run_zkernel(
    features: jax.Array,  # (B, V_in_cap, C) CSR-ordered, padded channels
    zplan: ZPlan,  # leaves batched with leading B
    weights: jax.Array,  # (K, C, Cout) original tap order, padded channels
    in_capacity: int,
    interpret: bool | None = None,
    contrib: jax.Array | None = None,
):
    K, C, cout = weights.shape
    B, n_tiles, T, R = zplan.code.shape
    kz, ky, kx = zplan.kz, zplan.ky, zplan.kx
    G = ky
    pack = _pack_factor(C)
    xp = jax.vmap(lambda f: _pack_table(f, in_capacity))(features)
    if interpret is None:
        interpret = _interpret_default()

    S = min(_STEP_TILES, n_tiles)
    code = zplan.code
    starts = zplan.starts
    if n_tiles % S:
        pad_t = S - n_tiles % S
        ntp = n_tiles + pad_t
        code = jnp.pad(code, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        starts = jnp.concatenate([
            jnp.pad(starts[:, : n_tiles * G], ((0, 0), (0, pad_t * G))),
            starts[:, n_tiles * G: n_tiles * G + 1],
            jnp.pad(starts[:, n_tiles * G + 1:], ((0, 0), (0, pad_t))),
        ], axis=1)
        n_tiles = ntp
    if contrib is None:
        contrib = jnp.zeros((B, 8, cout), jnp.float32)
        ov_out = jnp.full((B, 8, 1), n_tiles * T, jnp.int32)
    else:
        ov_out = zplan.ov_out[..., None]

    wext = _build_wext(weights, kz, ky, kx, pack)
    pc = pack * cout
    wb = zplan.window // pack

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles // S),
        in_specs=[
            pl.BlockSpec(
                (1,) + xp.shape[1:], lambda b, i, s: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, S, T, R), lambda b, i, s: (b, i, 0, 0),
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
            (1, S * T, cout), lambda b, i, s: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((T, wb), jnp.bfloat16),
            pltpu.VMEM((wb, 4 * pc), jnp.bfloat16),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _zkernel,
            kz=kz,
            n_groups=G,
            kx=kx,
            pack=pack,
            window=zplan.window,
            cout=cout,
            tile_ov=zplan.tile_ov,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tiles * T, cout), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, xp, code, wext, contrib, ov_out)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _zconv_core(interpret, in_capacity, x, w, zplan, plan, plan_t):
    out = _run_zkernel(
        x, zplan, w, in_capacity, interpret,
        contrib=_spill_contrib_z(x, w, zplan, in_capacity),
    )
    return out[:, : zplan.v_out]


def _zconv_core_fwd(interpret, in_capacity, x, w, zplan, plan, plan_t):
    out = _zconv_core(interpret, in_capacity, x, w, zplan, plan, plan_t)
    return out, (x, w, zplan, plan, plan_t)


def _zconv_core_bwd(interpret, in_capacity, res, g):
    """dx/dw via the one-hot kernel's backward (the old-format plans ride
    along as residuals; XLA dead-code-eliminates them in inference)."""
    x, w, zplan, plan, plan_t = res
    dx, dw, f_plan, f_plan_t = scp._conv_core_bwd(
        interpret, in_capacity, None, (x, w, plan, plan_t), g
    )
    return dx, dw, _float0_like(zplan), f_plan, f_plan_t


_zconv_core.defvjp(_zconv_core_fwd, _zconv_core_bwd)


def apply_conv_zrun_batched(
    features: jax.Array,  # (B, V_in, C) CSR-ordered
    zplan: ZPlan,  # leaves batched with leading B
    plan,  # TilePlan for the backward pass (or None in pure inference)
    plan_t,  # transposed TilePlan for dx
    weights: jax.Array,  # (K, C, Cout) kernel_offsets order
    out_valid: jax.Array,  # (B, V_out)
    bias: jax.Array | None = None,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """Batched z-run sparse conv apply, differentiable (custom VJP via
    the one-hot kernel's backward)."""
    if interpret is None:
        interpret = _interpret_default()
    if out_dtype is None:
        out_dtype = features.dtype
    features = _pad_c(features, 2)
    weights = _pad_c(weights, 1)
    in_capacity = features.shape[1]
    out = _zconv_core(
        bool(interpret), in_capacity, features, weights, zplan, plan,
        plan_t,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)[None, None, :]
    out = jnp.where(out_valid[..., None], out, 0.0)
    return out.astype(out_dtype)


def apply_conv_zrun(
    features: jax.Array,  # (V_in, C)
    zplan: ZPlan,
    plan,
    plan_t,
    weights: jax.Array,
    out_valid: jax.Array,
    bias: jax.Array | None = None,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """Single-sample wrapper over apply_conv_zrun_batched (B = 1)."""
    fb, zp, vb = jax.tree.map(
        lambda a: a[None], (features, zplan, out_valid)
    )
    pb = jax.tree.map(lambda a: a[None], plan) if plan is not None else None
    ptb = (
        jax.tree.map(lambda a: a[None], plan_t)
        if plan_t is not None else None
    )
    out = apply_conv_zrun_batched(
        fb, zp, pb, ptb, weights, vb, bias=bias, out_dtype=out_dtype,
        interpret=interpret,
    )
    return out[0]
