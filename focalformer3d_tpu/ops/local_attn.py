"""k x k local-window cross-attention on 2D maps (locatt replacement).

TPU-native equivalent of the reference's in-repo CUDA extension
``locatt_ops`` (similar/weighting kernels,
/root/reference/projects/mmdet3d_plugin/models/utils/ops/locatt_ops/) used by
``LocalContextAttentionBlock`` with kernel 9 (encoder_utils.py:109-163).

Instead of per-pixel gather kernels, logits for all window offsets are built
as shifted elementwise dot products (streaming over the k^2 offsets keeps the
peak footprint at (H, W, k^2) rather than (H, W, k^2, C)), softmaxed, then
the same shifts accumulate the weighted values — shift+FMA passes that XLA
fuses well.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_with_pad(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """out[p] = x[p + (dy, dx)] with zero padding outside; x is (H, W, C)."""
    H, W = x.shape[0], x.shape[1]
    a_top, a_bot = max(-dy, 0), max(dy, 0)
    a_lft, a_rgt = max(-dx, 0), max(dx, 0)
    xp = jnp.pad(x, ((a_top, a_bot), (a_lft, a_rgt), (0, 0)))
    y0, x0 = dy + a_top, dx + a_lft  # == max(dy, 0), max(dx, 0)
    return xp[y0:y0 + H, x0:x0 + W]


def local_attention(
    query: jax.Array,  # (H, W, C) projected query map
    key: jax.Array,  # (H, W, C)
    value: jax.Array,  # (H, W, C)
    kernel_size: int = 9,
    mask_outside: bool = True,
) -> jax.Array:
    """Per-pixel attention over the kernel_size^2 neighborhood; (H, W, C).

    logits[p, d] = <query[p], key[p + d]>; out[p] = sum_d softmax_d(logits) *
    value[p + d]. Out-of-image neighbors are excluded from the softmax.
    """
    H, W, C = query.shape
    r = kernel_size // 2
    offsets = [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]

    ones = jnp.ones((H, W, 1), query.dtype)
    logits = []
    valid = []
    for dy, dx in offsets:
        ks = _shift_with_pad(key, dy, dx)
        logits.append(jnp.sum(query * ks, axis=-1))
        if mask_outside:
            valid.append(_shift_with_pad(ones, dy, dx)[..., 0] > 0.5)
    logits = jnp.stack(logits, axis=-1)  # (H, W, K)
    if mask_outside:
        logits = jnp.where(jnp.stack(valid, axis=-1), logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1)

    out = jnp.zeros_like(value)
    for i, (dy, dx) in enumerate(offsets):
        vs = _shift_with_pad(value, dy, dx)
        out = out + vs * w[..., i:i + 1]
    return out
