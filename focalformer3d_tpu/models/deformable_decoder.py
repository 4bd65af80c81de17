"""Box-level deformable transformer decoder (DeformableDETR-style).

JAX counterpart of the mmdet/mmcv stack the reference builds via configs
(DeformableDetrTransformerDecoder, 3 layers of self-attn + MSDeformAttn +
FFN — FocalFormer3D_L.py:286-310). Reference points stay fixed across the
inner layers (the reference passes no reg_branches; focal_decoder.py:927-933
re-derives query positions from the prediction head instead).
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.msda import msda_sample


class MSDeformAttention(nn.Module):
    """Multi-scale deformable attention (mmcv semantics, incl. grid-bias
    init of the sampling offsets)."""

    embed_dim: int = 128
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        query,  # (B, Q, C)
        value_levels: Sequence[jax.Array],  # [(B, H_l, W_l, C)]
        reference_points,  # (B, Q, 2) normalized [0, 1]
        query_pos=None,
        train: bool = False,
    ):
        B, Q, C = query.shape
        nH, L, P = self.num_heads, self.num_levels, self.num_points
        identity = query
        if query_pos is not None:
            query = query + query_pos

        def offset_bias_init(key):
            thetas = jnp.arange(nH, dtype=jnp.float32) * (2 * math.pi / nH)
            grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
            grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
            grid = jnp.tile(grid[:, None, None, :], (1, L, P, 1))
            scale = jnp.arange(1, P + 1, dtype=jnp.float32)[None, None, :, None]
            return (grid * scale).reshape(-1)

        offsets = nn.Dense(
            nH * L * P * 2, kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: offset_bias_init(key),
            dtype=self.dtype, name="sampling_offsets",
        )(query).reshape(B, Q, nH, L, P, 2).astype(jnp.float32)
        attn = nn.Dense(nH * L * P, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        dtype=self.dtype, name="attention_weights")(query)
        attn = jax.nn.softmax(attn.reshape(B, Q, nH, L * P), axis=-1)
        attn = attn.reshape(B, Q, nH, L, P)

        # value_proj shared across levels
        vp = nn.Dense(C, dtype=self.dtype, name="value_proj")
        values = [vp(v) for v in value_levels]

        norm = jnp.stack(
            [jnp.asarray([v.shape[2], v.shape[1]], jnp.float32)
             for v in value_levels]
        )  # (L, 2) = (W_l, H_l)
        loc = (
            reference_points[:, :, None, None, None, :]
            + offsets / norm[None, None, None, :, None, :]
        )  # (B, Q, nH, L, P, 2)

        out = jax.vmap(
            lambda vl, l, a: msda_sample(vl, l, a, nH), in_axes=(0, 0, 0)
        )(values, loc, attn)
        out = nn.Dense(C, dtype=self.dtype, name="output_proj")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return (identity + out).astype(out.dtype)


class MultiHeadSelfAttention(nn.Module):
    embed_dim: int = 128
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, query, query_pos=None, attn_mask=None, train=False):
        # attn_mask: (B, Q, Q) bool, True = blocked (torch convention)
        B, Q, C = query.shape
        nH = self.num_heads
        Dh = C // nH
        qk_in = query + query_pos if query_pos is not None else query
        q = nn.Dense(C, dtype=self.dtype, name="q")(qk_in).reshape(
            B, Q, nH, Dh)
        k = nn.Dense(C, dtype=self.dtype, name="k")(qk_in).reshape(
            B, Q, nH, Dh)
        v = nn.Dense(C, dtype=self.dtype, name="v")(query).reshape(
            B, Q, nH, Dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(Dh)
        if attn_mask is not None:
            big_neg = jnp.asarray(-1e9, logits.dtype)
            logits = jnp.where(attn_mask[:, None, :, :], big_neg, logits)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Q, C)
        out = nn.Dense(C, dtype=self.dtype, name="out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return (query + out).astype(out.dtype)


class DecoderLayer(nn.Module):
    embed_dim: int = 128
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    ffn_dim: int = 1024
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, query, value_levels, reference_points,
                 query_pos=None, attn_mask=None, train=False):
        dt = self.dtype
        query = MultiHeadSelfAttention(
            self.embed_dim, self.num_heads, self.dropout, dt,
            name="self_attn"
        )(query, query_pos, attn_mask, train)
        query = nn.LayerNorm(dtype=dt, name="norm1")(query)
        query = MSDeformAttention(
            self.embed_dim, self.num_heads, self.num_levels, self.num_points,
            self.dropout, dt, name="cross_attn",
        )(query, value_levels, reference_points, query_pos, train)
        query = nn.LayerNorm(dtype=dt, name="norm2")(query)
        y = nn.Dense(self.ffn_dim, dtype=dt, name="ffn1")(query)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.embed_dim, dtype=dt, name="ffn2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        query = nn.LayerNorm(dtype=dt, name="norm3")(query + y)
        return query


class DeformableDecoder(nn.Module):
    num_layers: int = 3
    embed_dim: int = 128
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    ffn_dim: int = 1024
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, query, value_levels, reference_points,
                 query_pos=None, attn_mask=None, train=False):
        for i in range(self.num_layers):
            query = DecoderLayer(
                self.embed_dim, self.num_heads, self.num_levels,
                self.num_points, self.ffn_dim, self.dropout, self.dtype,
                name=f"layer{i}",
            )(query, value_levels, reference_points, query_pos, attn_mask,
              train)
        return query
