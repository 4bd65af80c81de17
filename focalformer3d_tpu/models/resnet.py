"""ResNet image backbone + FPN neck (NHWC, flax).

TPU-native counterparts of the mmdet `ResNet` / `FPN` modules that the LC
fusion configs require (reference config
/root/reference/projects/configs/focalformer3d/FocalFormer3D_LC.py:146-159:
ResNet-50, out_indices (0,1,2,3), frozen_stages=1, norm_eval=True; FPN
in [256,512,1024,2048] -> 256ch x 5 outs).

Freezing (`frozen_stages`, `norm_eval`) is handled functionally: the caller
passes ``train=False`` (BN in inference mode) and excludes the frozen
parameter subtrees from the optimizer via the training-layer param filters —
there is no in-module `requires_grad` state in JAX.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class _BNReLU(nn.Module):
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    """torchvision/mmdet 'pytorch-style' bottleneck: stride on the 3x3."""

    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = _BNReLU(name="bn1")(y, train)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(y)
        y = _BNReLU(name="bn2")(y, train)
        y = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = _BNReLU(relu=False, name="bn3")(y, train)
        if self.downsample:
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride,) * 2, use_bias=False, name="ds_conv",
            )(x)
            identity = _BNReLU(relu=False, name="ds_bn")(identity, train)
        return nn.relu(y + identity)


class BasicBlockR(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        y = _BNReLU(name="bn1")(y, train)
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2")(y)
        y = _BNReLU(relu=False, name="bn2")(y, train)
        if self.downsample:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride,) * 2,
                use_bias=False, name="ds_conv",
            )(x)
            identity = _BNReLU(relu=False, name="ds_bn")(identity, train)
        return nn.relu(y + identity)


_ARCH = {
    18: (BasicBlockR, (2, 2, 2, 2)),
    34: (BasicBlockR, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
}


class ResNet(nn.Module):
    """Returns the feature maps at out_indices (strides 4/8/16/32)."""

    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    norm_eval: bool = True  # BN frozen even in train mode (mmdet norm_eval)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, ...]:
        block, layers = _ARCH[self.depth]
        bn_train = train and not self.norm_eval
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = _BNReLU(name="bn1")(x, bn_train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        planes = 64
        for stage, n_blocks in enumerate(layers):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                first = b == 0
                need_ds = first and (
                    stride != 1 or x.shape[-1] != planes * block.expansion
                )
                x = block(
                    planes, stride if first else 1, need_ds,
                    name=f"layer{stage + 1}_{b}",
                )(x, bn_train)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)


class FPN(nn.Module):
    """mmdet-style FPN: lateral 1x1 + top-down sum + 3x3 output convs; extra
    outputs (num_outs > inputs) via stride-2 max-pool on the last output."""

    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                laterals[i - 1].shape[:-1] + (laterals[i].shape[-1],),
                method="nearest",
            )
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    name=f"fpn_conv{i}")(l)
            for i, l in enumerate(laterals)
        ]
        while len(outs) < self.num_outs:
            outs.append(
                nn.max_pool(outs[-1], (1, 1), strides=(2, 2), padding="VALID")
            )
        return tuple(outs)
