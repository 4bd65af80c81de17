"""VoxelNet sparse middle encoder (spconv SparseEncoder parity, TPU-native).

Architecture mirrors mmdet3d's SparseEncoder with block_type='basicblock' as
configured by the reference (FocalFormer3D_L.py:198-206):

    conv_input: SubM(in->16) + BN + ReLU
    stage1: 2x SparseBasicBlock(16)            + SparseConv(16->32,  s2, p1)
    stage2: 2x SparseBasicBlock(32)            + SparseConv(32->64,  s2, p1)
    stage3: 2x SparseBasicBlock(64)            + SparseConv(64->128, s2, p(0,1,1))
    stage4: 2x SparseBasicBlock(128)
    conv_out: SparseConv(128->out, k(3,1,1), s(2,1,1), p0) + BN + ReLU
    -> dense (D', H, W, C) -> BEV (H, W, D'*C)

All sparse convolutions use the gather-GEMM rulebook engine from
ops.sparse_conv; submanifold rulebooks are built once per voxel set and
shared across the blocks of a stage (spconv indice_key semantics).  Voxel
tables are fixed capacity per stage; overflow drops lowest-key voxels.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import sparse_conv as sc
from .layers import MaskedBatchNorm


def _conv_param(module, name, k, cin, cout):
    """Kaiming-ish init for a (K, Cin, Cout) sparse conv weight."""
    fan_in = k * cin
    std = (2.0 / fan_in) ** 0.5
    return module.param(
        name, lambda key: std * jax.random.normal(key, (k, cin, cout))
    )


class _SubMConvBN(nn.Module):
    features: int
    kernel: int = 3
    act: bool = True

    @nn.compact
    def __call__(self, feats, rules, valid, train: bool = False):
        K = rules.shape[1]
        w = _conv_param(self, "w", K, feats.shape[-1], self.features)
        y = jax.vmap(sc.apply_conv, in_axes=(0, 0, None, 0))(
            feats, rules, w, valid
        )
        y = MaskedBatchNorm()(y, valid, train)
        y = jnp.where(valid[..., None], y, 0.0)
        return nn.relu(y) if self.act else y


class _SparseBasicBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, feats, rules, valid, train: bool = False):
        identity = feats
        y = _SubMConvBN(self.features, act=True)(feats, rules, valid, train)
        y = _SubMConvBN(self.features, act=False)(y, rules, valid, train)
        return jnp.where(valid[..., None], nn.relu(y + identity), 0.0)


class _DownConvBN(nn.Module):
    features: int

    @nn.compact
    def __call__(self, feats, rules, out_valid, train: bool = False):
        K = rules.shape[1]
        w = _conv_param(self, "w", K, feats.shape[-1], self.features)
        y = jax.vmap(sc.apply_conv, in_axes=(0, 0, None, 0))(
            feats, rules, w, out_valid
        )
        y = MaskedBatchNorm()(y, out_valid, train)
        y = jnp.where(out_valid[..., None], y, 0.0)
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
    # fixed voxel-table capacities per resolution level
    capacities: Sequence[int] = (120000, 90000, 60000, 40000)
    out_capacity: int = 40000

    @nn.compact
    def __call__(self, features, coords, valid, train: bool = False):
        """features (B, V0, Cin), coords (B, V0, 3) zyx, valid (B, V0).

        Returns BEV features (B, H/8, W/8, output_channels * D_out).
        """
        shape = tuple(self.sparse_shape)
        n_stage = len(self.encoder_channels)

        # --- conv_input (SubM in->16) on the stage-0 voxel set ---
        table = jax.vmap(sc.build_table, in_axes=(0, 0, None))(
            coords, valid, shape
        )
        rules = jax.vmap(sc.build_subm_rules, in_axes=(0, None, None))(
            table, shape, 3
        )
        x = _SubMConvBN(self.encoder_channels[0][0], name="conv_input")(
            features, rules, valid, train
        )

        for i, blocks in enumerate(self.encoder_channels):
            ch = blocks[0]
            n_basic = len(blocks) - 1 if i < n_stage - 1 else len(blocks)
            for j in range(n_basic):
                x = _SparseBasicBlock(ch, name=f"stage{i}_block{j}")(
                    x, rules, valid, train
                )
            if i < n_stage - 1:
                out_ch = blocks[-1]
                pad = tuple(self.down_paddings[i])
                cap = self.capacities[i + 1]
                out_shape = sc.conv_out_shape(shape, 3, 2, pad)
                out_coords, out_valid = jax.vmap(
                    lambda c, v: sc.build_downsample(
                        c, v, shape, 3, 2, pad, cap
                    )[:2]
                )(coords, valid)
                down_rules = jax.vmap(
                    lambda t, oc, ov: sc.build_conv_rules(
                        t, shape, oc, ov, 3, 2, pad
                    )
                )(table, out_coords, out_valid)
                x = _DownConvBN(out_ch, name=f"down{i}")(
                    x, down_rules, out_valid, train
                )
                coords, valid, shape = out_coords, out_valid, out_shape
                table = jax.vmap(sc.build_table, in_axes=(0, 0, None))(
                    coords, valid, shape
                )
                rules = jax.vmap(sc.build_subm_rules, in_axes=(0, None, None))(
                    table, shape, 3
                )

        # --- conv_out: z-collapse (3,1,1)/(2,1,1)/p0 ---
        out_shape = sc.conv_out_shape(shape, (3, 1, 1), (2, 1, 1), 0)
        out_coords, out_valid = jax.vmap(
            lambda c, v: sc.build_downsample(
                c, v, shape, (3, 1, 1), (2, 1, 1), 0, self.out_capacity
            )[:2]
        )(coords, valid)
        down_rules = jax.vmap(
            lambda t, oc, ov: sc.build_conv_rules(
                t, shape, oc, ov, (3, 1, 1), (2, 1, 1), 0
            )
        )(table, out_coords, out_valid)
        x = _DownConvBN(self.output_channels, name="conv_out")(
            x, down_rules, out_valid, train
        )

        dense = jax.vmap(sc.to_dense, in_axes=(0, 0, 0, None))(
            x, out_coords, out_valid, out_shape
        )  # (B, D', H', W', C)
        B, Dz, H, W, C = dense.shape
        # (B, H, W, D'*C) — z folded into channels (reference collapses z=2
        # x 128ch into a 256-ch BEV map, focalformer3d SURVEY §2.3)
        return jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(B, H, W, Dz * C)
