"""Decompose hard_voxelize_simple cost on TPU (VERDICT r2 item 7).

Stages timed separately at bench scale (200k points, radial scan):
  key compute | argsort | cumsum(points) | run-start scatter | gathers
plus build_table_csr's column-bit scatter + meta cumsum, which run
immediately after in the detector preprocess.

Usage: python tools/micro_voxelize.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from focalformer3d_tpu.configs import get_config
from focalformer3d_tpu.data import synthetic
from focalformer3d_tpu.ops import voxelize as vx
from focalformer3d_tpu.ops import sparse_conv as sc


def timeit(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = get_config("FocalFormer3D_L")["model"]
    vcfg = cfg.voxel
    rng = np.random.RandomState(0)
    batch = synthetic.make_batch(
        rng, batch_size=1, n_points=200000, n_boxes=24, max_gts=32,
        num_classes=cfg.decoder.num_classes,
        pc_range=vcfg.point_cloud_range, mode="radial",
    )
    points = jnp.asarray(batch["points"][0])
    mask = jnp.asarray(batch["points_mask"][0])
    N = points.shape[0]
    V = vcfg.max_voxels_test or vcfg.max_voxels

    full = jax.jit(lambda p, m: vx.hard_voxelize_simple(
        type(vcfg)(**{**vcfg.__dict__, "max_voxels": V}), p, m
    )["features"].sum())
    print(f"full hard_voxelize_simple: {timeit(full, points, mask)*1e3:7.2f} ms",
          flush=True)

    def keys(p, m):
        coords, valid = vx.point_voxel_coords(vcfg, p, m)
        return vx._linear_key(coords, valid, vcfg.grid_size)

    print(f"  key compute:  {timeit(jax.jit(lambda p, m: keys(p, m).sum()), points, mask)*1e3:7.2f} ms", flush=True)

    key = jax.jit(keys)(points, mask)

    print(f"  argsort:      {timeit(jax.jit(lambda k: jnp.argsort(k, stable=True).sum()), key)*1e3:7.2f} ms", flush=True)

    order = jax.jit(lambda k: jnp.argsort(k, stable=True))(key)

    def csum(p, o, k):
        sv = k[o] < jnp.iinfo(jnp.int32).max
        return jnp.cumsum(jnp.where(sv[:, None], p[o], 0.0), axis=0)

    print(f"  gather+cumsum:{timeit(jax.jit(lambda p, o, k: csum(p, o, k).sum()), points, order, key)*1e3:7.2f} ms", flush=True)

    def scat(k, o):
        sk = k[o]
        sv = sk < jnp.iinfo(jnp.int32).max
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]]) & sv
        vid = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        pos = jnp.arange(N, dtype=jnp.int32)
        vslot = jnp.where(is_start & (vid <= V), vid, V + 1 + pos)
        return jnp.full((V + 1,), N, jnp.int32).at[vslot].set(
            pos, mode="drop", unique_indices=True)

    print(f"  runstart scat:{timeit(jax.jit(lambda k, o: scat(k, o).sum()), key, order)*1e3:7.2f} ms", flush=True)

    # table build that follows in preprocess
    vout = jax.jit(lambda p, m: vx.hard_voxelize_simple(
        type(vcfg)(**{**vcfg.__dict__, "max_voxels": V}), p, m))(
            points, mask)
    shape = tuple(cfg.sparse_shape)

    print(f"  build_table_csr: {timeit(jax.jit(lambda c, v: sc.build_table_csr(c, v, shape).meta.sum()), vout['coords'], vout['voxel_mask'])*1e3:7.2f} ms", flush=True)

    def colbits(c, v):
        b0, b1 = sc._column_bits(c, v, shape)
        return b0.sum() + b1.sum()

    print(f"    column-bit scatter: {timeit(jax.jit(colbits), vout['coords'], vout['voxel_mask'])*1e3:7.2f} ms", flush=True)

    def metacs(c, v):
        b0, b1 = sc._column_bits(c, v, shape)
        return sc._meta_from_bits(b0, b1).sum()

    print(f"    + meta cumsum:      {timeit(jax.jit(metacs), vout['coords'], vout['voxel_mask'])*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
