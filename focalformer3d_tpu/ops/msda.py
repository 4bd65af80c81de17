"""Multi-scale deformable attention sampling core (MSDeformAttn).

Functional replacement for mmcv's CUDA ``MultiScaleDeformableAttention``
kernel (decoder cross-attention, config
/root/reference/projects/configs/focalformer3d/FocalFormer3D_L.py:297-302:
3 levels, 4 points, 8 heads). The learned projections live in
``models/deformable_decoder.py``; this module is the pure sampling +
weighted-sum math so it can be unit-tested against a NumPy oracle and later
swapped for a fused Pallas kernel without touching the model.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .bilinear import grid_sample_norm


def msda_sample(
    value_levels: Sequence[jax.Array],  # per level (H_l, W_l, C)
    locations: jax.Array,  # (Q, nH, L, P, 2) in [0, 1] per level
    weights: jax.Array,  # (Q, nH, L, P), softmaxed over (L, P)
    num_heads: int,
) -> jax.Array:
    """Returns (Q, C). Bilinear-samples each level per head at the given
    normalized locations and sums with attention weights (grid_sample
    align_corners=False convention, matching mmcv's kernel)."""
    L = len(value_levels)
    C = value_levels[0].shape[-1]
    Dh = C // num_heads
    Q = locations.shape[0]
    # accumulate in f32 (the bilinear lerp weights are f32); cast back to
    # the value dtype at the end so a bf16 pipeline stays bf16
    out = jnp.zeros((Q, num_heads, Dh), jnp.float32)
    for lvl in range(L):
        v = value_levels[lvl]
        H, W = v.shape[0], v.shape[1]
        vh = v.reshape(H, W, num_heads, Dh)
        grid = 2.0 * locations[:, :, lvl] - 1.0  # (Q, nH, P, 2)
        for h in range(num_heads):
            s = grid_sample_norm(vh[:, :, h], grid[:, h])  # (Q, P, Dh)
            out = out.at[:, h].add(
                jnp.sum(
                    s.astype(jnp.float32)
                    * weights[:, h, lvl][..., None].astype(jnp.float32),
                    axis=1,
                )
            )
    return out.reshape(Q, C).astype(value_levels[0].dtype)
