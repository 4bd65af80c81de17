"""GridMask image augmentation (pure JAX, PRNG-keyed).

Counterpart of the reference GridMask module
(/root/reference/projects/mmdet3d_plugin/models/utils/grid_mask.py:69-123),
applied to multi-view images before the backbone
(detectors/focalformer3d.py:146-147) with (use_h=True, use_w=True, rotate=1,
offset=False, ratio=0.5, mode=1, prob=0.7).

The reference's strip loops + PIL rotate become modular arithmetic (rotate=1
means r = randint(1) = 0 always, so rotation is a no-op in every shipped
config and is dropped here). mode=1 keeps the strips and zeroes the rest.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(
    key: jax.Array,
    imgs: jax.Array,  # (..., H, W, C)
    ratio: float = 0.5,
    mode: int = 1,
    prob: float = 0.7,
) -> jax.Array:
    H, W = imgs.shape[-3], imgs.shape[-2]
    k_apply, k_d, k_h, k_w = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k_apply, prob)
    d = jax.random.randint(k_d, (), 2, H)
    l = jnp.clip(jnp.floor(d * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    # randint with a traced upper bound is not expressible; draw wide + mod d.
    st_h = jax.random.randint(k_h, (), 0, 2**30) % d
    st_w = jax.random.randint(k_w, (), 0, 2**30) % d

    # Reference builds the mask over a 1.5x canvas and center-crops; the crop
    # offset (hh-h)//2 shifts the phase.
    off_h = (jnp.floor(1.5 * H).astype(jnp.int32) - H) // 2
    off_w = (jnp.floor(1.5 * W).astype(jnp.int32) - W) // 2
    ii = jnp.arange(H)
    jj = jnp.arange(W)
    row_hit = ((ii + off_h - st_h) % d) < l  # inside a zeroed h-strip
    col_hit = ((jj + off_w - st_w) % d) < l
    mask = ~(row_hit[:, None] | col_hit[None, :])  # 1 = keep (mode 0)
    if mode == 1:
        mask = ~mask
    mask = mask.astype(imgs.dtype)[..., None]
    out = imgs * mask
    return jnp.where(apply, out, imgs)
