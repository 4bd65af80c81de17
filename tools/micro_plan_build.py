"""Microbenchmark: sparse-encoder index-build internals on TPU.

The encoder-stage split (tools/micro_encoder_split.py) shows the plan
build is ~60% of the stage (64 ms of 108 ms at 120k voxels). This
script times each component at level-0 geometry and compares the
unfused path (build_conv_rules + build_tile_plan) against the fused
build_plan_direct, to drive the index-build optimization.
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


def plansum(p):
    return jnp.sum(p.rel % 7) + jnp.sum(p.starts % 7) + jnp.sum(p.ov_pos % 7)


def main():
    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.models.detector import preprocess_points
    from focalformer3d_tpu.ops import sparse_conv as sc
    from focalformer3d_tpu.ops import sparse_conv_pallas as scp

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

    vox = jax.jit(lambda p, m: preprocess_points(cfg, p, m))(points, mask)
    coords = vox["coords"][0]
    valid = vox["voxel_mask"][0]
    _ = float(coords[0, 0])
    V = coords.shape[0]
    print(f"V={V} occ={int(valid.sum())}", flush=True)

    # table build
    t = timeit(jax.jit(
        lambda c, v: sc.build_table_csr(c, v, shape).meta), coords, valid)
    print(f"build_table_csr:      {t*1e3:8.2f} ms", flush=True)

    table = jax.jit(lambda c, v: sc.build_table_csr(c, v, shape))(
        coords, valid)
    table = jax.tree.map(lambda a: a.block_until_ready(), table)

    # subm rulebook
    rules_fn = jax.jit(lambda t_: sc.build_subm_rules(t_, shape, 3, True))
    t = timeit(rules_fn, table)
    print(f"build_subm_rules:     {t*1e3:8.2f} ms", flush=True)
    rules = rules_fn(table)
    _ = float(rules[0, 0])

    # tile plan from rules
    tp_fn = jax.jit(lambda r: plansum(
        scp.build_tile_plan(r, V, 3, 256, 256, 4096)))
    t = timeit(tp_fn, rules)
    print(f"build_tile_plan:      {t*1e3:8.2f} ms", flush=True)

    # fused direct plan (no rules materialization)
    bd_fn = jax.jit(lambda t_, c, v: plansum(scp.build_plan_direct(
        t_, shape, c, v, 3, 1, (1, 1, 1), 256, 256, 4096)))
    t = timeit(bd_fn, table, coords, valid)
    print(f"build_plan_direct:    {t*1e3:8.2f} ms", flush=True)

    # downsample set
    ds_fn = jax.jit(lambda c, v: sc.build_downsample(
        c, v, shape, 3, 2, (1, 1, 1), 90000)[0])
    t = timeit(ds_fn, coords, valid)
    print(f"build_downsample:     {t*1e3:8.2f} ms", flush=True)

    # strided rulebook (level0 -> level1)
    oc, ov, _os, _ovf, om = jax.jit(lambda c, v: sc.build_downsample(
        c, v, shape, 3, 2, (1, 1, 1), 90000))(coords, valid)
    _ = float(oc[0, 0])
    sr_fn = jax.jit(lambda t_, oc_, ov_: sc.build_conv_rules(
        t_, shape, oc_, ov_, 3, 2, (1, 1, 1), use_positions=True))
    t = timeit(sr_fn, table, oc, ov)
    print(f"build_conv_rules(s2): {t*1e3:8.2f} ms", flush=True)

    # fused direct plan for the strided conv
    bd2_fn = jax.jit(lambda t_, oc_, ov_: plansum(scp.build_plan_direct(
        t_, shape, oc_, ov_, 3, 2, (1, 1, 1), 256, 256, 4096)))
    t = timeit(bd2_fn, table, oc, ov)
    print(f"build_plan_direct(s2):{t*1e3:8.2f} ms", flush=True)

    # MXU-gather plan builder (ops/plan_builder.py), subm + strided —
    # now exact at tile 256 (sub-block segments + union spill list)
    from focalformer3d_tpu.ops import plan_builder as pb

    chunks = jax.jit(pb.pack_meta_chunks)(table.meta)
    _ = float(chunks[0, 0])
    colz = jax.jit(lambda c, v: pb.colz_from_coords(c, v, shape[2]))(
        coords, valid)
    mx_fn = jax.jit(lambda m, cz, ch: plansum(pb.build_plan_mxu(
        m, cz, V, 3, 1, (1, 1, 1), shape, shape[2], tile=256,
        window=512, overflow_capacity=16384, chunks=ch)))
    t = timeit(mx_fn, table.meta, colz, chunks)
    print(f"build_plan_mxu:       {t*1e3:8.2f} ms", flush=True)

    # out shape must be STATIC here (jitted build_downsample returns
    # traced scalars; a traced out_w would be captured by the kernel)
    os2 = sc.conv_out_shape(shape, 3, 2, (1, 1, 1))
    colz_o = jax.jit(lambda c, v: pb.colz_from_coords(c, v, os2[2]))(
        oc, ov)
    mx2_fn = jax.jit(lambda m, cz, ch: plansum(pb.build_plan_mxu(
        m, cz, V, 3, 2, (1, 1, 1), shape, os2[2], tile=256,
        window=896, overflow_capacity=16384, chunks=ch)))
    t = timeit(mx2_fn, table.meta, colz_o, chunks)
    print(f"build_plan_mxu(s2):   {t*1e3:8.2f} ms", flush=True)

    # pack + colz costs that the mxu path adds per level
    t = timeit(jax.jit(pb.pack_meta_chunks), table.meta)
    print(f"pack_meta_chunks:     {t*1e3:8.2f} ms", flush=True)
    cz_fn = jax.jit(lambda m: pb.colz_from_meta(m, 245760, d=21))
    t = timeit(cz_fn, om)
    print(f"colz_from_meta(L1):   {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
