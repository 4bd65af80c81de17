"""VoxelNet sparse middle encoder (spconv SparseEncoder parity, TPU-native).

Architecture mirrors mmdet3d's SparseEncoder with block_type='basicblock' as
configured by the reference (FocalFormer3D_L.py:198-206):

    conv_input: SubM(in->16) + BN + ReLU
    stage1: 2x SparseBasicBlock(16)            + SparseConv(16->32,  s2, p1)
    stage2: 2x SparseBasicBlock(32)            + SparseConv(32->64,  s2, p1)
    stage3: 2x SparseBasicBlock(64)            + SparseConv(64->128, s2, p(0,1,1))
    stage4: 2x SparseBasicBlock(128)
    conv_out: SparseConv(128->out, k(3,1,1), s(2,1,1), p0) + BN + ReLU
    -> dense BEV (H, W, D_out*C)

Two interchangeable backends (identical parameters, identical outputs — see
tests/test_pillar_conv.py):

  engine='voxel' (default): per-voxel rulebooks with a dense index grid,
      slice-kz gathers, and one fused gather + wide MXU matmul per conv
      (ops/sparse_conv.py). Wins at nuScenes scale (Dz=41: dense-z pillars
      overcompute ~20-40x on the z axis).
  engine='pillar': sparse-BEV / dense-Z pillars (ops/pillar_conv.py) — 9
      contiguous BEV-neighbor gathers + dense z-window matmuls; preferable
      when Dz is small or columns are tall/dense.

Weights are stored as (27, Cin, Cout) with kernel_offsets (dz, dy, dx)
ordering in both engines; the pillar engine reshapes to (9 bev, 3 z) taps.
Voxel tables / pillar sets are fixed capacity per stage.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pillar_conv as pc
from ..ops import sparse_conv_zrun as scz
from ..ops import plan_builder as pb
from ..ops import sparse_conv as sc
from ..ops import sparse_conv_pallas as scp
from .layers import MaskedBatchNorm


def _ds3(r):
    return r[0], r[1], r[4]


def _batched_pallas_conv(feats, plans, w, valid, kernel_size=3,
                         bias=None):
    """Batched pallas conv: one kernel launch with a (B, n_tiles) grid.

    ``plans`` is (plan, plan_t, rules-or-None[, zplan]). With a 4-tuple
    the z-run kernel (ops/sparse_conv_zrun.py) carries the forward — one
    anchored selection row per (site, BEV tap) instead of one per tap —
    and the one-hot plans ride along for its backward. When the absolute
    rulebook is available, exactness is STRUCTURAL: if any plan's true
    window-spill count exceeds its overflow-list capacity (so rules
    would be silently dropped — the r3 driver bench measured 53k spills
    against a 4k list), a lax.cond reroutes this conv through the exact
    XLA gather-GEMM path. The fallback branch costs nothing when not
    taken; the reference's spconv is unconditionally exact (SURVEY
    §2.3), so must we be.
    """
    zplan = None
    if len(plans) == 4:
        plan, plan_t, rules, zplan = plans
    else:
        plan, plan_t, rules = plans
    if zplan is not None:
        out = scz.apply_conv_zrun_batched(
            feats, zplan, plan, plan_t, w, valid, bias=bias,
        )
    else:
        out = scp.apply_conv_pallas_batched(
            feats, plan, plan_t, w, valid, bias=bias,
            kernel_size=kernel_size,
        )
    if rules is None:
        return out
    m_cap = plan.ov_pos.shape[-1]
    truncated = jnp.any(plan.n_overflow > m_cap)
    if zplan is not None:
        truncated |= jnp.any(
            zplan.n_overflow > zplan.ov_pos.shape[-1]
        )
    if plan_t is not plan:
        # the transposed plan feeds the backward dx: a spill list it
        # overruns would silently drop corrections there (ADVICE r4
        # medium), so it participates in the reroute predicate too
        truncated |= jnp.any(plan_t.n_overflow > plan_t.ov_pos.shape[-1])

    def exact_xla(feats_, w_):
        y = jax.vmap(
            lambda f, r, v: sc.apply_conv(f, r, w_, v, bias)
        )(feats_, rules, valid)
        return y.astype(out.dtype)

    return jax.lax.cond(
        truncated, exact_xla, lambda f_, w_: out, feats, w
    )


def _conv_param(module, name, k, cin, cout):
    """Kaiming-ish init for a (K, Cin, Cout) sparse conv weight."""
    fan_in = k * cin
    std = (2.0 / fan_in) ** 0.5
    return module.param(
        name, lambda key: std * jax.random.normal(key, (k, cin, cout))
    )


def _w27_to_pillar(w27: jax.Array) -> jax.Array:
    """(27, Cin, Cout) kernel_offsets (dz,dy,dx) order -> (9, 3, Cin, Cout)
    pillar order (bev tap dy*3+dx, z tap dz)."""
    c_in, c_out = w27.shape[1], w27.shape[2]
    return jnp.transpose(
        w27.reshape(3, 3, 3, c_in, c_out), (1, 2, 0, 3, 4)
    ).reshape(9, 3, c_in, c_out)


# ---------------------------------------------------------------------------
# voxel-engine blocks
# ---------------------------------------------------------------------------

class _SubMConvBN(nn.Module):
    features: int
    kernel: int = 3
    act: bool = True

    @nn.compact
    def __call__(self, feats, rules, valid, train: bool = False,
                 plans=None):
        K = rules.shape[1] if plans is None else 27
        w = _conv_param(self, "w", K, feats.shape[-1], self.features)
        bn = MaskedBatchNorm(features=self.features)
        if not train:
            # fold BN into the conv (inference): y = conv(x; w*g) + b
            g, b = bn(None, None, return_affine=True)
            if plans is None:
                y = jax.vmap(sc.apply_conv, in_axes=(0, 0, None, 0, None))(
                    feats, rules, w * g[None, None, :], valid, b
                )
            else:
                y = _batched_pallas_conv(
                    feats, plans, w * g[None, None, :], valid, bias=b,
                )
        else:
            if plans is None:
                y = jax.vmap(sc.apply_conv, in_axes=(0, 0, None, 0))(
                    feats, rules, w, valid
                )
            else:
                y = _batched_pallas_conv(feats, plans, w, valid)
            y = bn(y, valid, train)
        y = jnp.where(valid[..., None], y, 0.0)
        return nn.relu(y) if self.act else y


class _SparseBasicBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, feats, rules, valid, train: bool = False,
                 plans=None):
        identity = feats
        y = _SubMConvBN(self.features, act=True, name="conv0")(
            feats, rules, valid, train, plans
        )
        y = _SubMConvBN(self.features, act=False, name="conv1")(
            y, rules, valid, train, plans
        )
        return jnp.where(valid[..., None], nn.relu(y + identity), 0.0)


class _DownConvBN(nn.Module):
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)

    @nn.compact
    def __call__(self, feats, rules, out_valid, train: bool = False,
                 plans=None):
        ks = self.kernel_size
        K = ks[0] * ks[1] * ks[2]
        w = _conv_param(self, "w", K, feats.shape[-1], self.features)
        bn = MaskedBatchNorm(features=self.features)
        if not train:
            g, b = bn(None, None, return_affine=True)
            if plans is None:
                y = jax.vmap(sc.apply_conv, in_axes=(0, 0, None, 0, None))(
                    feats, rules, w * g[None, None, :], out_valid, b
                )
            else:
                y = _batched_pallas_conv(
                    feats, plans, w * g[None, None, :], out_valid,
                    kernel_size=ks, bias=b,
                )
        else:
            if plans is None:
                y = jax.vmap(sc.apply_conv, in_axes=(0, 0, None, 0))(
                    feats, rules, w, out_valid
                )
            else:
                y = _batched_pallas_conv(
                    feats, plans, w, out_valid, kernel_size=ks
                )
            y = bn(y, out_valid, train)
        y = jnp.where(out_valid[..., None], y, 0.0)
        return nn.relu(y)


# ---------------------------------------------------------------------------
# dense-grid blocks (same parameter names/shapes as the sparse blocks, so
# checkpoints and the torch converter are engine-agnostic)
# ---------------------------------------------------------------------------

def _dense_conv(x, w27, ks, stride, padding, gain=None, bias=None):
    """lax 3D conv with the sparse weight layout (K, Cin, Cout),
    kernel_offsets (dz, dy, dx) order -> DHWIO."""
    kz, ky, kx = ks
    cin, cout = w27.shape[1], w27.shape[2]
    w = w27.reshape(kz, ky, kx, cin, cout)
    if gain is not None:
        w = w * gain[None, None, None, None, :]
    pads = [(p, p) if isinstance(p, int) else p for p in padding]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), stride, pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


class _DenseConvBN(nn.Module):
    """SubM/regular sparse conv on a dense grid: identical math (inactive
    cells are zero, output re-masked), identical parameters. At >=3%
    occupancy the XLA dense conv beats any gather scheme on the MXU."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple = (1, 1, 1)
    act: bool = True

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        ks = self.kernel_size
        K = ks[0] * ks[1] * ks[2]
        w = _conv_param(self, "w", K, x.shape[-1], self.features)
        bn = MaskedBatchNorm(features=self.features)
        if not train:
            g, b = bn(None, None, return_affine=True)
            y = _dense_conv(x, w, ks, self.stride, self.padding, g, b)
        else:
            # f32 under training: a bf16 conv with preferred f32 output
            # has no valid transpose (the cotangent arrives f32 against
            # bf16 operands and lax.conv rejects the mix); XLA
            # accumulates f32 on the MXU either way, so this only
            # widens the operand reads on the training path
            y = _dense_conv(
                x.astype(jnp.float32), w, ks, self.stride, self.padding
            )
            y = bn(y, mask, train)
        y = jnp.where(mask[..., None], y, 0.0)
        return nn.relu(y) if self.act else y


class _DenseBasicBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        identity = x
        y = _DenseConvBN(self.features, act=True, name="conv0")(
            x, mask, train
        )
        y = _DenseConvBN(self.features, act=False, name="conv1")(
            y, mask, train
        )
        return jnp.where(mask[..., None], nn.relu(y + identity), 0.0)


# ---------------------------------------------------------------------------
# pillar-engine blocks (same parameter names/shapes)
# ---------------------------------------------------------------------------

class _PSubMConvBN(nn.Module):
    features: int
    act: bool = True

    @nn.compact
    def __call__(self, feats, rules, zmask, train: bool = False):
        w = _conv_param(self, "w", 27, feats.shape[-1], self.features)
        wp = _w27_to_pillar(w)
        y = jax.vmap(pc.pillar_conv, in_axes=(0, 0, None))(feats, rules, wp)
        y = MaskedBatchNorm()(y, zmask, train)
        y = jnp.where(zmask[..., None], y, 0.0)
        return nn.relu(y) if self.act else y


class _PSparseBasicBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, feats, rules, zmask, train: bool = False):
        identity = feats
        y = _PSubMConvBN(self.features, act=True, name="conv0")(
            feats, rules, zmask, train
        )
        y = _PSubMConvBN(self.features, act=False, name="conv1")(
            y, rules, zmask, train
        )
        return jnp.where(zmask[..., None], nn.relu(y + identity), 0.0)


class _PDownConvBN(nn.Module):
    features: int
    kz: int = 3
    z_stride: int = 2
    z_padding: int = 1
    bev_taps: int = 9  # 1 for the (3,1,1) conv_out

    @nn.compact
    def __call__(self, feats, rules, out_zmask, train: bool = False):
        k_total = self.bev_taps * self.kz
        w = _conv_param(self, "w", k_total, feats.shape[-1], self.features)
        if self.bev_taps == 9:
            wp = _w27_to_pillar(w)
        else:  # z-only kernel (kz,Cin,Cout) -> (1, kz, Cin, Cout)
            wp = w[None]
        y = jax.vmap(
            pc.pillar_conv, in_axes=(0, 0, None, None, None)
        )(feats, rules, wp, self.z_stride, self.z_padding)
        y = MaskedBatchNorm()(y, out_zmask, train)
        y = jnp.where(out_zmask[..., None], y, 0.0)
        return nn.relu(y)


class SparseEncoder(nn.Module):
    sparse_shape: Tuple[int, int, int] = (41, 1440, 1440)  # (D, H, W)
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128)
    )
    # stride-2 paddings between stages (last entry of each stage's paddings)
    down_paddings: Sequence[Tuple[int, int, int]] = (
        (1, 1, 1), (1, 1, 1), (0, 1, 1)
    )
    # fixed voxel-table / pillar-set capacities per resolution level
    capacities: Sequence[int] = (120000, 90000, 60000, 40000)
    out_capacity: int = 40000
    # 'voxel' | 'pillar' | 'pallas' (one-hot Pallas kernel, production
    # TPU path) | 'pallas_zrun' (z-run apply variant; exact but measured
    # slower — tools/micro_zrun.py) | 'pallas_mxu' (MXU plan builder)
    engine: str = "voxel"
    # first level to run on a DENSE grid (4 = never). Coarse levels are
    # 3-30% occupied on real scans, where XLA's dense conv3d on the MXU
    # beats any gather scheme AND needs no rulebook/plan build or
    # capacity bound; level-2 grids are ~360^2 x 11 so activations fit
    # easily. Parameters are identical across engines.
    dense_from: int = 4
    # voxel sets from ops/voxelize.py arrive CSR-ordered; the detector
    # sets this so the level-0 reorder pass and rows scatter are skipped
    assume_csr: bool = False
    # Tile/window sizing, validated by the r4 on-TPU sweep
    # (tools/micro_enc_profile.py at tile 128 / window 256 vs 256/512):
    # conv applies are VMEM-traffic/row bound, NOT MAC bound — apply
    # time is FLAT in window and tile size, so windows are sized wide
    # enough that the spill census (tools/micro_spills.py, radial
    # 200k-pt scan) stays within the overflow lists: subm spans p99.9
    # <= 410 @ tile 256 -> 512; down spans reach 1662 on the L2->L3
    # transition -> 1792 (a tighter window + bigger overflow list
    # measured net-SLOWER: the two-stage spill compaction cost grows
    # with list capacity while the kernel gains nothing). Exactness
    # never depends on this sizing: true spill counts beyond a list (or
    # more spilling tiles than its compaction captures) reroute the
    # conv through the exact XLA gather path (_batched_pallas_conv),
    # and spills surface via the 'diagnostics' sow.
    plan_tile: int = 256
    plan_tile_down: int = 256
    plan_window: int = 512
    plan_window_down: int = 1792
    # overflow-list capacities (per conv family): the exact correction
    # costs K*M*C*cout FLOPs and the compaction cost scales with the
    # capacity, so both stay at ~3x the worst per-plan spill measured
    # at the production windows (1366, L2 subm; down ~0 at 1792).
    plan_overflow: int = 4096
    plan_overflow_down: int = 4096
    # per-tile spill-segment budget the kernel scans (rows). Subm spills
    # cluster: the r4 driver scan put 878 of L2's 1366 spills on ONE
    # tile (tools/micro_tilespill.py), so the subm budget is 1024; down
    # plans measured 0 spills at window 1792 and keep the cheaper 512.
    plan_tile_ov: int = 1024
    plan_tile_ov_down: int = 512
    # False drops the checked exact-XLA reroute from the graph so XLA
    # cost analysis reports taken-path bytes (telemetry compiles only —
    # see ModelConfig.sparse_exact_fallback)
    exact_fallback: bool = True

    @nn.compact
    def __call__(self, features, coords, valid, train: bool = False):
        """features (B, V0, Cin), coords (B, V0, 3) zyx, valid (B, V0).

        Returns BEV features (B, H/8, W/8, output_channels * D_out).
        """
        if self.engine == "pillar":
            return self._pillar_forward(features, coords, valid, train)
        return self._voxel_forward(features, coords, valid, train)

    # ------------------------------------------------------------------
    def _pillar_forward(self, features, coords, valid, train):
        Dz, H, W = self.sparse_shape
        n_stage = len(self.encoder_channels)
        hw = (H, W)

        pset, x, zmask = jax.vmap(
            pc.build_pillars, in_axes=(0, 0, 0, None, None)
        )(coords, valid, features, tuple(self.sparse_shape),
          self.capacities[0])
        rules = jax.vmap(pc.bev_rules, in_axes=(0, None))(pset, hw)

        x = _PSubMConvBN(self.encoder_channels[0][0], name="conv_input")(
            x, rules, zmask, train
        )

        for i, blocks in enumerate(self.encoder_channels):
            ch = blocks[0]
            n_basic = len(blocks) - 1 if i < n_stage - 1 else len(blocks)
            for j in range(n_basic):
                x = _PSparseBasicBlock(ch, name=f"stage{i}_block{j}")(
                    x, rules, zmask, train
                )
            if i < n_stage - 1:
                out_ch = blocks[-1]
                pz, py, px = self.down_paddings[i]
                cap = self.capacities[i + 1]
                out_hw = (
                    (hw[0] + 2 * py - 3) // 2 + 1,
                    (hw[1] + 2 * px - 3) // 2 + 1,
                )
                out_set = jax.vmap(
                    pc.downsample_bev_set,
                    in_axes=(0, None, None, None, None, None),
                )(pset, hw, out_hw, cap, 2, py)
                rules_d = jax.vmap(
                    pc.bev_rules_strided, in_axes=(0, 0, None, None, None)
                )(out_set, pset, hw, 2, py)
                out_zmask = jax.vmap(
                    pc.conv_zmask, in_axes=(0, 0, None, None, None)
                )(zmask, rules_d, 3, 2, pz)
                x = _PDownConvBN(
                    out_ch, kz=3, z_stride=2, z_padding=pz,
                    name=f"down{i}",
                )(x, rules_d, out_zmask, train)
                pset, zmask, hw = out_set, out_zmask, out_hw
                rules = jax.vmap(pc.bev_rules, in_axes=(0, None))(pset, hw)

        # conv_out: k(3,1,1) s(2,1,1) p0 — BEV identity taps, z collapse
        # (pset is batched here: capacity is the second-to-last axis, NOT
        # pset.capacity, which would read the batch dim)
        P = pset.bev_coords.shape[-2]

        def id_rules(valid_p):
            idx = jnp.arange(P, dtype=jnp.int32)
            return jnp.where(valid_p, idx, P)[None]  # (1, P)

        rules_o = jax.vmap(id_rules)(pset.valid)
        out_zmask = jax.vmap(
            pc.conv_zmask, in_axes=(0, 0, None, None, None)
        )(zmask, rules_o, 3, 2, 0)
        x = _PDownConvBN(
            self.output_channels, kz=3, z_stride=2, z_padding=0, bev_taps=1,
            name="conv_out",
        )(x, rules_o, out_zmask, train)

        return jax.vmap(pc.pillars_to_dense_bev, in_axes=(0, 0, None))(
            x, pset, hw
        )

    # ------------------------------------------------------------------
    def _voxel_forward(self, features, coords, valid, train):
        shape = tuple(self.sparse_shape)
        n_stage = len(self.encoder_channels)
        pallas = self.engine in ("pallas", "pallas_zrun", "pallas_mxu")
        # 'pallas_zrun' swaps the z-run forward kernel in (one anchored
        # selection row per (site, BEV tap) — docs/PERF.md r4 spec).
        # Measured SLOWER than the one-hot kernel on the r5 TPU probe
        # (tools/micro_zrun.py: subm ~1.1x, down ~1.8-2x — the 4-block
        # ycat widens the selection dot 1.33x and the per-dx staging
        # scales with the window), so 'pallas' keeps the one-hot apply.
        zrun = self.engine == "pallas_zrun"
        overflow_counts = []  # per-plan true spill counts (see sow below)

        def make_plans_mxu(meta, chunks, colz_out, shp, in_cap, out_cap,
                           ks, stride, pad, out_w):
            """Batched MXU-gather plan build (ops/plan_builder.py). The
            transposed plan for the backward pass is built from an XLA
            rulebook decode — dead-code-eliminated by XLA in inference."""
            strided = (stride if isinstance(stride, int) else
                       max(stride)) > 1
            base_w = self.plan_window_down if strided else self.plan_window
            win = min(base_w, scp._padded_rows(in_cap))
            win_t = min(base_w, scp._padded_rows(out_cap))
            tile = self.plan_tile_down if strided else self.plan_tile
            ov = self.plan_overflow_down if strided else self.plan_overflow
            B = meta.shape[0]
            subm = stride == 1 or stride == (1, 1, 1)
            pairs = []
            for b in range(B):
                plan = pb.build_plan_mxu(
                    meta[b], colz_out[b], in_cap, ks, stride, pad, shp,
                    out_w, tile=tile, window=win, overflow_capacity=ov,
                    chunks=chunks[b],
                )
                if subm:
                    # submanifold rulebooks are their own transpose
                    # (sc.transposed_conv_rules docstring)
                    pairs.append((plan, plan, None))
                    continue
                rules = pb.decode_rules(
                    None, colz_out[b], in_cap, meta[b], ks, stride, pad,
                    shp, out_w,
                )
                rules_t = scp.transpose_rules(rules, in_cap, ks)
                plan_t = scp.build_tile_plan(
                    rules_t, out_cap, ks, tile, win_t, ov,
                    self.plan_tile_ov_down,
                )
                pairs.append((plan, plan_t, rules))
            pair = jax.tree.map(lambda *x: jnp.stack(x), *pairs)
            overflow_counts.append(pair[0].n_overflow)
            return pair

        def make_plans(table, shp, out_coords, out_valid, in_cap, out_cap,
                       ks, stride, pad, window=None, out_meta=None,
                       out_shape=None, meta9=None):
            """Batched fused plan build (+ transposed plan for backward,
            dead-code-eliminated by XLA in inference).

            Transposed plans: submanifold rulebooks are their own
            transpose (offset enumeration is symmetric — see
            sc.transposed_conv_rules), so stride-1 plans are reused as
            plan_t outright; strided plans decode the transposed
            rulebook from the OUT meta instead of scattering K*V rows.
            """
            subm = stride == 1 or stride == (1, 1, 1)
            win = min(window or self.plan_window, scp._padded_rows(in_cap))
            win_t = min(window or self.plan_window,
                        scp._padded_rows(out_cap))
            tile = self.plan_tile if subm else self.plan_tile_down
            ov = self.plan_overflow if subm else self.plan_overflow_down
            tov = self.plan_tile_ov if subm else self.plan_tile_ov_down
            if meta9 is None:
                # widened meta is only consumed by 3x3-BEV rule builds;
                # callers hoist it per level so subm + down share one
                meta9 = (
                    jax.vmap(lambda m: sc.widen_meta9(m, shp))(table.meta)
                    if ks == 3 else table.meta
                )

            def one(t, oc, o_v, m9, om=None):
                rules = sc.build_conv_rules(
                    t, shp, oc, o_v, ks, stride, pad, use_positions=True,
                    meta9=m9,
                )
                plan = scp.build_tile_plan(
                    rules, in_cap, ks, tile, win, ov, tov
                )
                zp = None
                if zrun:
                    zp = scz.build_zplan(
                        t, shp, oc, o_v, ks, stride, pad, tile=tile,
                        window=win, overflow_capacity=ov, tile_ov=tov,
                        meta9=m9 if ks == 3 else None,
                    )
                rules_fb = rules if self.exact_fallback else None
                if subm:
                    return (plan, plan, rules_fb, zp) if zrun else (
                        plan, plan, rules_fb)
                if om is None:
                    rules_t = scp.transpose_rules(rules, in_cap, ks)
                else:
                    rules_t = sc.transposed_conv_rules(
                        om, out_shape, t.coords, t.valid, out_cap, ks,
                        stride, pad,
                    )
                plan_t = scp.build_tile_plan(
                    rules_t, out_cap, ks, tile, win_t, ov, tov
                )
                return (plan, plan_t, rules_fb, zp) if zrun else (
                    plan, plan_t, rules_fb)

            if subm or out_meta is None:
                pair = jax.vmap(one)(table, out_coords, out_valid, meta9)
            else:
                pair = jax.vmap(one)(
                    table, out_coords, out_valid, meta9, out_meta
                )
            overflow_counts.append(pair[0].n_overflow)
            return pair

        if self.engine == "pallas_mxu":
            return self._mxu_forward(
                features, coords, valid, train, make_plans_mxu,
                overflow_counts,
            )

        # rulebooks hold CSR positions directly, so the level-0 table must
        # be CSR-ordered: either the voxelizer already emits that order
        # (assume_csr) or reorder once here.
        if self.assume_csr:
            features = jnp.where(valid[..., None], features, 0)
            table = jax.vmap(sc.build_table_csr, in_axes=(0, 0, None))(
                coords, valid, shape
            )
        else:
            table0 = jax.vmap(sc.build_table, in_axes=(0, 0, None))(
                coords, valid, shape
            )
            coords, valid, features = jax.vmap(sc.csr_reorder)(
                table0, features
            )
            table = jax.vmap(sc.csr_table)(table0, coords, valid)
        cap = features.shape[1]
        if pallas:
            rules = None
            m9 = jax.vmap(lambda m: sc.widen_meta9(m, shape))(table.meta)
            plans = make_plans(
                table, shape, coords, valid, cap, cap, 3, 1, (1, 1, 1),
                meta9=m9,
            )
        else:
            rules = jax.vmap(
                sc.build_subm_rules, in_axes=(0, None, None, None)
            )(table, shape, 3, True)
            plans = None
        x = _SubMConvBN(self.encoder_channels[0][0], name="conv_input")(
            features, rules, valid, train, plans
        )

        for i, blocks in enumerate(self.encoder_channels):
            ch = blocks[0]
            n_basic = len(blocks) - 1 if i < n_stage - 1 else len(blocks)
            for j in range(n_basic):
                x = _SparseBasicBlock(ch, name=f"stage{i}_block{j}")(
                    x, rules, valid, train, plans
                )
            if i < n_stage - 1:
                out_ch = blocks[-1]
                pad = tuple(self.down_paddings[i])
                out_cap = self.capacities[i + 1]
                out_shape = sc.conv_out_shape(shape, 3, 2, pad)
                if pallas:
                    # meta-chain downsample: the output active set from
                    # word arithmetic on the column bitmasks + one colz
                    # expansion — replaces build_downsample's 8-combo
                    # per-voxel scatters (measured 18 ms vs ~5 ms at the
                    # 120k->175k nuScenes level)
                    out_meta, total = jax.vmap(
                        lambda m: sc.downsample_meta(m, shape, 3, 2,
                                                     pad)[::2]
                    )(table.meta)
                    out_valid = (
                        jnp.arange(out_cap)[None, :]
                        < jnp.minimum(total, out_cap)[:, None]
                    )
                    colz = jax.vmap(
                        lambda m: pb.colz_from_meta(
                            m, out_cap, d=out_shape[0]
                        )
                    )(out_meta)
                    czs = jnp.where(colz >= 0, colz, 0)
                    ccol = czs >> 6
                    out_coords = jnp.stack(
                        [czs & 63, ccol // out_shape[2],
                         ccol % out_shape[2]], axis=-1,
                    )
                    down_rules = None
                    down_plans = make_plans(
                        table, shape, out_coords, out_valid, cap, out_cap,
                        3, 2, pad, window=self.plan_window_down,
                        out_meta=out_meta, out_shape=out_shape, meta9=m9,
                    )
                else:
                    out_coords, out_valid, out_meta = jax.vmap(
                        lambda c, v: _ds3(
                            sc.build_downsample(c, v, shape, 3, 2, pad,
                                                out_cap)
                        )
                    )(coords, valid)
                    down_rules = jax.vmap(
                        lambda t, oc, ov: sc.build_conv_rules(
                            t, shape, oc, ov, 3, 2, pad, use_positions=True
                        )
                    )(table, out_coords, out_valid)
                    down_plans = None
                x = _DownConvBN(out_ch, name=f"down{i}")(
                    x, down_rules, out_valid, train, down_plans
                )
                coords, valid, shape = out_coords, out_valid, out_shape
                cap = out_cap
                if i + 1 == self.dense_from:
                    dense = jax.vmap(sc.to_dense, in_axes=(0, 0, 0, None))(
                        x, coords, valid, shape
                    )
                    mask = jax.vmap(
                        sc.to_dense, in_axes=(0, 0, 0, None)
                    )(
                        jnp.ones((*valid.shape, 1), jnp.float32), coords,
                        valid, shape,
                    )[..., 0] > 0
                    return self._dense_tail(
                        dense, mask, i + 1, train, overflow_counts
                    )
                table = jax.vmap(sc.table_from_meta)(
                    coords, valid, out_meta
                )
                if pallas:
                    rules = None
                    m9 = jax.vmap(
                        lambda m: sc.widen_meta9(m, shape)
                    )(table.meta)
                    plans = make_plans(
                        table, shape, coords, valid, cap, cap, 3, 1,
                        (1, 1, 1), meta9=m9,
                    )
                else:
                    rules = jax.vmap(
                        sc.build_subm_rules, in_axes=(0, None, None, None)
                    )(table, shape, 3, True)
                    plans = None

        ks_out = (3, 1, 1)
        out_shape = sc.conv_out_shape(shape, ks_out, (2, 1, 1), 0)
        if pallas:
            out_meta, total = jax.vmap(
                lambda m: sc.downsample_meta(m, shape, ks_out, (2, 1, 1),
                                             0)[::2]
            )(table.meta)
            out_valid = (
                jnp.arange(self.out_capacity)[None, :]
                < jnp.minimum(total, self.out_capacity)[:, None]
            )
            colz = jax.vmap(
                lambda m: pb.colz_from_meta(
                    m, self.out_capacity, d=out_shape[0]
                )
            )(out_meta)
            czs = jnp.where(colz >= 0, colz, 0)
            ccol = czs >> 6
            out_coords = jnp.stack(
                [czs & 63, ccol // out_shape[2], ccol % out_shape[2]],
                axis=-1,
            )
            down_rules = None
            down_plans = make_plans(
                table, shape, out_coords, out_valid, cap,
                self.out_capacity, ks_out, (2, 1, 1), 0,
                window=self.plan_window_down,
                out_meta=out_meta, out_shape=out_shape,
            )
        else:
            out_coords, out_valid = jax.vmap(
                lambda c, v: sc.build_downsample(
                    c, v, shape, ks_out, (2, 1, 1), 0, self.out_capacity
                )[:2]
            )(coords, valid)
            down_rules = jax.vmap(
                lambda t, oc, ov: sc.build_conv_rules(
                    t, shape, oc, ov, ks_out, (2, 1, 1), 0,
                    use_positions=True,
                )
            )(table, out_coords, out_valid)
            down_plans = None
        x = _DownConvBN(
            self.output_channels, kernel_size=ks_out, name="conv_out"
        )(x, down_rules, out_valid, train, down_plans)

        self._sow_overflow(overflow_counts)

        dense = jax.vmap(sc.to_dense, in_axes=(0, 0, 0, None))(
            x, out_coords, out_valid, out_shape
        )  # (B, D', H', W', C)
        B, Dz, H, W, C = dense.shape
        # c-major z-collapse (channel = c*Dz + d) matching mmdet3d
        # SparseEncoder's .dense().view(N, C*D, H, W) so converted
        # torch checkpoints line up at the SECOND first-conv input
        return jnp.transpose(dense, (0, 2, 3, 4, 1)).reshape(B, H, W, C * Dz)

    # ------------------------------------------------------------------
    def _sow_overflow(self, overflow_counts):
        if not overflow_counts:
            return
        # Surface the true window-spill counts: the exact-correction list
        # holds at most plan_overflow rules per plan, so max > capacity
        # means rules were DROPPED and outputs are no longer exact.
        worst = jnp.max(jnp.stack([jnp.max(c) for c in overflow_counts]))
        self.sow("diagnostics", "max_plan_overflow", worst)
        self.sow(
            "diagnostics", "plan_overflow_truncated",
            (worst > self.plan_overflow).astype(jnp.int32),
        )

    def _dense_tail(self, x, mask, start, train, overflow_counts):
        """Run levels >= ``start`` (and conv_out) on the dense grid.

        x: (B, D, H, W, C) with zeros at inactive cells; mask (B, D, H, W).
        Exact sparse-conv semantics: inactive inputs contribute zero and
        outputs are re-masked to the active output set (any-tap-hit rule
        via a max-pool of the mask). Returns the (B, H, W, Dz*C) BEV map.
        """
        n_stage = len(self.encoder_channels)
        in_dtype = x.dtype
        if self.engine in ("pallas", "pallas_zrun", "pallas_mxu"):
            # the pallas sparse levels already compute at bf16 MXU
            # precision (tables are packed bf16); keep the dense tail
            # consistent — accumulation stays f32 inside the convs
            x = x.astype(jnp.bfloat16)

        def pool_mask(m, window, strides, padding):
            return jax.lax.reduce_window(
                m, False, jax.lax.bitwise_or,
                (1, *window), (1, *strides),
                ((0, 0), *padding),
            )

        for i in range(start, n_stage):
            blocks = self.encoder_channels[i]
            ch = blocks[0]
            n_basic = len(blocks) - 1 if i < n_stage - 1 else len(blocks)
            for j in range(n_basic):
                x = _DenseBasicBlock(ch, name=f"stage{i}_block{j}")(
                    x, mask, train
                )
            if i < n_stage - 1:
                out_ch = blocks[-1]
                pad = tuple(self.down_paddings[i])
                out_mask = pool_mask(
                    mask, (3, 3, 3), (2, 2, 2), tuple((p, p) for p in pad)
                )
                x = _DenseConvBN(
                    out_ch, kernel_size=(3, 3, 3), stride=(2, 2, 2),
                    padding=pad, name=f"down{i}",
                )(x, out_mask, train)
                mask = out_mask

        out_mask = pool_mask(mask, (3, 1, 1), (2, 1, 1), ((0, 0),) * 3)
        x = _DenseConvBN(
            self.output_channels, kernel_size=(3, 1, 1), stride=(2, 1, 1),
            padding=(0, 0, 0), name="conv_out",
        )(x, out_mask, train)
        self._sow_overflow(overflow_counts)
        B, Dz, H, W, C = x.shape
        # c-major z-collapse — see _voxel_forward's return
        bev = jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(B, H, W, C * Dz)
        return bev.astype(in_dtype)

    # ------------------------------------------------------------------
    def _mxu_forward(self, features, coords, valid, train, make_plans,
                     overflow_counts):
        """Pallas-engine forward with the MXU index build: per-level CSR
        column metas (word arithmetic + one small scatter at level 0),
        coordinate lists derived from meta (plan_builder.colz_from_meta),
        and tile plans built by the one-hot meta-gather kernel. No
        per-voxel XLA gathers/scatters on the rulebook path."""
        shape = tuple(self.sparse_shape)
        n_stage = len(self.encoder_channels)
        if self.assume_csr:
            features = jnp.where(valid[..., None], features, 0)
            meta = jax.vmap(sc.build_table_csr, in_axes=(0, 0, None))(
                coords, valid, shape
            ).meta  # (B, n_col+1, 4)
        else:
            table0 = jax.vmap(sc.build_table, in_axes=(0, 0, None))(
                coords, valid, shape
            )
            coords, valid, features = jax.vmap(sc.csr_reorder)(
                table0, features
            )
            meta = table0.meta  # active set unchanged by the reorder
        colz = jax.vmap(pb.colz_from_coords, in_axes=(0, 0, None))(
            coords, valid, shape[2]
        )
        chunks = jax.vmap(pb.pack_meta_chunks)(meta)
        cap = features.shape[1]

        plans = make_plans(
            meta, chunks, colz, shape, cap, cap, 3, 1, (1, 1, 1), shape[2]
        )
        x = _SubMConvBN(self.encoder_channels[0][0], name="conv_input")(
            features, None, valid, train, plans
        )

        for i, blocks in enumerate(self.encoder_channels):
            ch = blocks[0]
            n_basic = len(blocks) - 1 if i < n_stage - 1 else len(blocks)
            for j in range(n_basic):
                x = _SparseBasicBlock(ch, name=f"stage{i}_block{j}")(
                    x, None, valid, train, plans
                )
            if i < n_stage - 1:
                out_ch = blocks[-1]
                pad = tuple(self.down_paddings[i])
                out_cap = self.capacities[i + 1]
                out_shape = sc.conv_out_shape(shape, 3, 2, pad)
                out_meta, total = jax.vmap(
                    lambda m: sc.downsample_meta(m, shape, 3, 2, pad)[::2]
                )(meta)
                out_valid = (
                    jnp.arange(out_cap)[None, :]
                    < jnp.minimum(total, out_cap)[:, None]
                )
                colz_out = jax.vmap(
                    lambda m: pb.colz_from_meta(m, out_cap, d=shape[0])
                )(out_meta)
                down_plans = make_plans(
                    meta, chunks, colz_out, shape, cap, out_cap, 3, 2,
                    pad, out_shape[2],
                )
                x = _DownConvBN(out_ch, name=f"down{i}")(
                    x, None, out_valid, train, down_plans
                )
                shape, cap, valid = out_shape, out_cap, out_valid
                meta, colz = out_meta, colz_out
                chunks = jax.vmap(pb.pack_meta_chunks)(meta)
                plans = make_plans(
                    meta, chunks, colz, shape, cap, cap, 3, 1, (1, 1, 1),
                    shape[2],
                )

        ks_out, st_out = (3, 1, 1), (2, 1, 1)
        out_shape = sc.conv_out_shape(shape, ks_out, st_out, 0)
        out_cap = self.out_capacity
        out_meta, total = jax.vmap(
            lambda m: sc.downsample_meta(m, shape, ks_out, st_out, 0)[::2]
        )(meta)
        out_valid = (
            jnp.arange(out_cap)[None, :]
            < jnp.minimum(total, out_cap)[:, None]
        )
        colz_out = jax.vmap(
            lambda m: pb.colz_from_meta(m, out_cap, d=shape[0])
        )(out_meta)
        down_plans = make_plans(
            meta, chunks, colz_out, shape, cap, out_cap, ks_out, st_out,
            0, out_shape[2],
        )
        x = _DownConvBN(
            self.output_channels, kernel_size=ks_out, name="conv_out"
        )(x, None, out_valid, train, down_plans)

        self._sow_overflow(overflow_counts)

        czs = jnp.where(colz_out >= 0, colz_out, 0)
        col = czs >> 6
        coords_f = jnp.stack(
            [czs & 63, col // out_shape[2], col % out_shape[2]], axis=-1
        )
        dense = jax.vmap(sc.to_dense, in_axes=(0, 0, 0, None))(
            x, coords_f, out_valid, out_shape
        )
        B, Dz, H, W, C = dense.shape
        # c-major z-collapse (channel = c*Dz + d) matching mmdet3d
        # SparseEncoder's .dense().view(N, C*D, H, W) so converted
        # torch checkpoints line up at the SECOND first-conv input
        return jnp.transpose(dense, (0, 2, 3, 4, 1)).reshape(B, H, W, C * Dz)
