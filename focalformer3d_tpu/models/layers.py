"""Shared NN building blocks (flax.linen, NHWC, TPU-native layouts).

Counterparts of the torch blocks the reference composes (ConvModule/BN/ReLU,
torchvision BasicBlock & MobileNetV2 InvertedResidual, the DINO MLP and sine
embeddings, and the TransFusion FFN prediction head — see
/root/reference/projects/mmdet3d_plugin/models/utils/{utils.py,decoder_utils.py}
and necks/focal_encoder.py:36-52).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv2d + BatchNorm + optional activation, NHWC."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bias: bool = False
    activation: Optional[Callable] = nn.relu
    bn_momentum: float = 0.9  # running-average decay (torch momentum 0.1)
    bn_eps: float = 1e-5
    # compute dtype (params stay float32); bfloat16 halves HBM traffic on
    # the bandwidth-bound dense BEV path — see VERDICT r2 perf item 1c
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME" if self.strides == 1 else [
                ((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)
            ] * 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        # Under pjit data parallelism the batch axis is globally visible, so
        # plain BatchNorm is automatically SyncBN (XLA inserts the
        # cross-device reductions) — no axis_name plumbing needed.
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
        )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm over a masked set of rows (sparse voxel tables).

    x: (..., C); mask broadcastable to x[..., 0]. Statistics are computed over
    valid rows only (padded table slots would otherwise poison the stats).
    Under pjit data parallelism the reduction spans the global batch, giving
    SyncBN semantics for free.
    """

    momentum: float = 0.99  # spconv BN momentum 0.01
    epsilon: float = 1e-3
    features: int | None = None  # required for affine() before __call__

    @nn.compact
    def __call__(self, x, mask, train: bool = False,
                 return_affine: bool = False):
        """Normalize x, or with ``return_affine`` return the (g, b) of the
        inference-time affine equivalent bn(x) == x * g + b so the caller
        can fold BN into preceding conv weights (x may be None then;
        ``features`` must be set)."""
        C = self.features if x is None else x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if return_affine:
            g = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            return g, bias - ra_mean.value * g

        if train:
            m = mask.astype(jnp.float32)[..., None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / cnt
            var = (
                jnp.sum(m * (x - mean) ** 2, axis=tuple(range(x.ndim - 1)))
                / cnt
            )
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class BasicBlock2d(nn.Module):
    """torchvision-style residual BasicBlock (2 conv3x3 + skip)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBN(self.features, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, activation=None, dtype=self.dtype)(y, train)
        return nn.relu(y + identity)


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (stride 1), NHWC.

    Matches torchvision semantics used by FocalEncoderLayer 'bevfusionmb2'
    (focal_encoder.py:36-38): expand 1x1 (skipped when expand_ratio==1) ->
    depthwise 3x3 -> project 1x1; residual only when in==out.
    """

    features: int
    expand_ratio: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand_ratio
        use_res = cin == self.features
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(y)
            y = nn.activation.relu6(y)
        y = nn.Conv(
            hidden, (3, 3), padding="SAME",
            feature_group_count=hidden, use_bias=False, dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.activation.relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        return (x + y).astype(y.dtype) if use_res else y


class MLP(nn.Module):
    """DINO-style MLP (utils.py:16-28): relu between, linear out."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))
        return nn.Dense(self.output_dim, dtype=self.dtype)(x)


class PredictionFFN(nn.Module):
    """Per-branch prediction head over query features.

    The reference uses Conv1d(k=1) stacks per branch with BN1d
    (decoder_utils.py:495-578); over (B, Q, C) layouts that is exactly Dense
    + BatchNorm over the flattened (B*Q) rows.  heatmap branch's final bias
    initialized to -2.19 (focal prior).
    """

    heads: Dict[str, Tuple[int, int]]  # name -> (out_ch, num_conv)
    head_conv: int = 64
    init_bias: float = -2.19
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, Q, C)
        out = {}
        for name, (classes, num_conv) in self.heads.items():
            y = x
            for i in range(num_conv - 1):
                # bias='auto' + BN1d in the reference ConvModule -> no bias
                y = nn.Dense(self.head_conv, use_bias=False,
                             dtype=self.dtype, name=f"{name}_fc{i}")(y)
                y = nn.BatchNorm(
                    use_running_average=not train, dtype=self.dtype,
                    name=f"{name}_bn{i}"
                )(y)
                y = nn.relu(y)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "heatmap"
                else nn.initializers.zeros
            )
            y = nn.Dense(
                classes, use_bias=True, bias_init=bias_init,
                dtype=self.dtype, name=f"{name}_out",
            )(y)
            # heads feed box decode / losses: keep outputs float32
            out[name] = y.astype(jnp.float32)
        return out


def sine_embed_2d(pos: jax.Array, num_feats: int = 128) -> jax.Array:
    """(..., 2) normalized positions -> (..., 2*num_feats) sine embedding.

    Mirrors gen_sineembed_for_position (utils.py:40-66): per-coordinate
    interleaved sin/cos with 10000^(2i/128) temperatures, y block then x.
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    x = pos[..., 0] * scale
    y = pos[..., 1] * scale
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], axis=-1)
    px = px.reshape(*px.shape[:-2], -1)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], axis=-1)
    py = py.reshape(*py.shape[:-2], -1)
    return jnp.concatenate([py, px], axis=-1)


def sine_embed_all(pos: jax.Array, num_feats: int = 128) -> jax.Array:
    """(..., D) -> (..., D*num_feats): per-dim embedding
    (gen_sineembed_for_position_all, utils.py:30-38)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    p = pos[..., None] * scale / dim_t
    e = jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1)
    e = e.reshape(*e.shape[:-2], -1)
    return e.reshape(*pos.shape[:-1], -1)
