"""SECOND BEV backbone + SECONDFPN neck (dense convs, NHWC).

Structure per the reference config (FocalFormer3D_L.py:207-222):
  SECOND: in 256, blocks [(128, 5 layers, s1), (256, 5 layers, s2)]
  SECONDFPN: in [128, 256] -> out [256, 256]; level0 1x1 conv (stride 1,
  use_conv_for_no_stride), level1 2x deconv; outputs concatenated -> 512ch.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN


class SECOND(nn.Module):
    out_channels: Sequence[int] = (128, 256)
    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, (ch, n, s) in enumerate(
            zip(self.out_channels, self.layer_nums, self.layer_strides)
        ):
            x = ConvBN(ch, 3, strides=s, bn_momentum=0.99, bn_eps=1e-3,
                       dtype=self.dtype, name=f"block{i}_conv0")(x, train)
            for j in range(n):
                x = ConvBN(ch, 3, bn_momentum=0.99, bn_eps=1e-3,
                           dtype=self.dtype,
                           name=f"block{i}_conv{j + 1}")(x, train)
            outs.append(x)
        return outs


class SECONDFPN(nn.Module):
    out_channels: Sequence[int] = (256, 256)
    upsample_strides: Sequence[int] = (1, 2)
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        ups = []
        for i, (x, ch, s) in enumerate(
            zip(feats, self.out_channels, self.upsample_strides)
        ):
            if s == 1:
                y = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"deblock{i}_conv")(x)
            else:
                y = nn.ConvTranspose(
                    ch, (s, s), strides=(s, s), use_bias=False,
                    dtype=self.dtype, name=f"deblock{i}_deconv",
                )(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"deblock{i}_bn")(y)
            ups.append(nn.relu(y))
        return jnp.concatenate(ups, axis=-1)
