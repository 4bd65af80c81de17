"""Microbenchmark 2: primitive-level rates inside the index build.

Times the individual primitives that compose build_table_csr /
build_conv_rules / build_tile_plan / build_downsample at level-0 geometry
(V=120k, H*W=2.07M) so the index-build redesign targets the real cost:

  - scatter-add of V rows into the 2M-column bit arrays
  - cumsum over 2M columns (meta row starts)
  - 1-tap vs 9-tap vs packed-wide meta row gathers
  - the 8-combo downsample coordinate scatter
  - nonzero(size=...) overflow compaction
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters


def main():
    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.models.detector import preprocess_points
    from focalformer3d_tpu.ops import sparse_conv as sc

    cfg = get_config("FocalFormer3D_L")["model"]
    rng = np.random.RandomState(0)
    batch = synthetic.make_batch(
        rng, batch_size=1, n_points=200000, n_boxes=24, max_gts=32,
        num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range,
    )
    points = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["points_mask"])
    shape = tuple(cfg.sparse_shape)
    D, H, W = shape
    n_col = H * W

    vox = jax.jit(lambda p, m: preprocess_points(cfg, p, m))(points, mask)
    coords = vox["coords"][0]
    valid = vox["voxel_mask"][0]
    _ = float(coords[0, 0])
    V = coords.shape[0]

    # 1. column-bits scatter (V adds into 2 x (n_col+1) arrays)
    t = timeit(jax.jit(lambda c, v: sum(
        jnp.sum(b % 7) for b in sc._column_bits(c, v, shape))),
        coords, valid)
    print(f"_column_bits scatter:   {t*1e3:8.2f} ms", flush=True)

    bits0, bits1 = jax.jit(lambda c, v: sc._column_bits(c, v, shape))(
        coords, valid)
    _ = float(bits0[0])

    # 2. meta cumsum over n_col
    t = timeit(jax.jit(lambda b0, b1: jnp.sum(
        sc._meta_from_bits(b0, b1) % 7)), bits0, bits1)
    print(f"_meta_from_bits cumsum: {t*1e3:8.2f} ms", flush=True)

    meta = jax.jit(sc._meta_from_bits)(bits0, bits1)
    _ = float(meta[0, 0])

    col = jnp.where(valid, coords[:, 1] * W + coords[:, 2], n_col)
    _ = float(col[0])

    # 3. meta gathers: 1 tap, 9 taps, 1 wide (9x-packed rows)
    t = timeit(jax.jit(lambda m, c: jnp.sum(m[c] % 7)), meta, col)
    print(f"meta gather 1 tap:      {t*1e3:8.2f} ms", flush=True)

    def nine(m, c):
        s = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                cq = jnp.clip(c + dy * W + dx, 0, n_col)
                s = s + jnp.sum(m[cq] % 7)
        return s

    t = timeit(jax.jit(nine), meta, col)
    print(f"meta gather 9 taps:     {t*1e3:8.2f} ms", flush=True)

    meta9 = jnp.concatenate(
        [jnp.roll(meta, -dy * W - dx, axis=0)
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=1
    )  # (n_col+1, 36)
    _ = float(meta9[0, 0])
    t = timeit(jax.jit(lambda m, c: jnp.sum(m[c] % 7)), meta9, col)
    print(f"meta gather 1x36 wide:  {t*1e3:8.2f} ms", flush=True)

    # packing build cost
    t = timeit(jax.jit(lambda m: jnp.sum(jnp.concatenate(
        [jnp.roll(m, -dy * W - dx, axis=0)
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=1) % 7)), meta)
    print(f"meta9 pack build:       {t*1e3:8.2f} ms", flush=True)

    # 4. downsample coordinate scatter-equivalent: 8 gather+scatter combos
    def combo_scatter(c, v, m):
        ocoords = jnp.zeros((90000 + 1, 3), jnp.int32)
        for by in range(2):
            for bx in range(2):
                yo = (c[:, 1] + 1) // 2 - by
                xo = (c[:, 2] + 1) // 2 - bx
                ok = v & (yo >= 0) & (xo >= 0)
                colq = jnp.where(ok, jnp.clip(yo * W + xo, 0, n_col), n_col)
                mm = m[colq]
                row = jnp.where(ok, mm[:, 2] % 90000, 90000)
                for bz in range(2):
                    zo = (c[:, 0] + 1) // 2 - bz
                    ocoords = ocoords.at[row].set(
                        jnp.stack([zo, yo, xo], -1), mode="drop")
        return jnp.sum(ocoords % 7)

    t = timeit(jax.jit(combo_scatter), coords, valid, meta)
    print(f"8-combo gather+scatter: {t*1e3:8.2f} ms", flush=True)

    # 5. nonzero compaction over (27, V)
    big = (jnp.arange(27 * V).reshape(27, V) % 997) == 0
    _ = float(big[0, 0])
    t = timeit(jax.jit(lambda b: jnp.sum(
        jnp.nonzero(b.reshape(-1), size=4096, fill_value=0)[0] % 7)), big)
    print(f"nonzero(size) 27xV:     {t*1e3:8.2f} ms", flush=True)

    # 6. elementwise pass over (27, V) int32 (baseline bandwidth)
    a = jnp.arange(27 * V, dtype=jnp.int32).reshape(27, V)
    _ = float(a[0, 0])
    t = timeit(jax.jit(lambda x: jnp.sum((x * 3 + 1) % 7)), a)
    print(f"elementwise 27xV:       {t*1e3:8.2f} ms", flush=True)

    # 7. argsort 200k (voxelize's dominant op?)
    keys = jax.random.randint(jax.random.PRNGKey(0), (200000,), 0, 1 << 30)
    _ = float(keys[0])
    t = timeit(jax.jit(lambda k: jnp.sum(jnp.argsort(k) % 7)), keys)
    print(f"argsort 200k:           {t*1e3:8.2f} ms", flush=True)

    # 8. cumsum 200k f32 x8 (voxelize prefix sums)
    x = jax.random.normal(jax.random.PRNGKey(1), (200000, 8))
    _ = float(x[0, 0])
    t = timeit(jax.jit(lambda x: jnp.sum(jnp.cumsum(x, axis=0) % 7)), x)
    print(f"cumsum 200k x8:         {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
