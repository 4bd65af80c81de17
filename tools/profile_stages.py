"""Per-stage latency breakdown of FocalFormer3D-L inference on one chip.

Times each stage as its own jitted program (voxelize, VFE, sparse-encoder
rulebook builds, sparse-encoder full, SECOND, FPN, FocalEncoder,
FocalDecoder, get_bboxes) with chained-input timing (axon backend does not
sync on block_until_ready).
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
    s = jnp.zeros((), jnp.float32)
    out = fn(*args, s)
    s = (jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0] * 0).astype(
        jnp.float32)
    out = fn(*args, s)
    s = (jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0] * 0).astype(
        jnp.float32)
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, s)
        s = (jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0] * 0).astype(
            jnp.float32)
    _ = float(s)
    return (time.perf_counter() - t0) / iters


def main():
    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.models.detector import preprocess_points
    from focalformer3d_tpu.models.sparse_encoder import SparseEncoder
    from focalformer3d_tpu.models.second import SECOND, SECONDFPN
    from focalformer3d_tpu.models.focal_encoder import FocalEncoder
    from focalformer3d_tpu.models.focal_decoder import FocalDecoder
    from focalformer3d_tpu.models import focal_decoder as fd
    from focalformer3d_tpu.models.vfe import hard_simple_vfe
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
    key = jax.random.PRNGKey(0)

    # ---- stage 1: voxelize ----
    @jax.jit
    def s_vox(points, mask, chain):
        out = preprocess_points(cfg, points + chain, mask)
        return out

    t = timeit(s_vox, points, mask)
    print(f"voxelize:            {t*1e3:8.2f} ms", flush=True)
    vox = s_vox(points, mask, jnp.zeros((), jnp.float32))
    nvox = int(vox["voxel_mask"].sum())
    print(f"  (occupied voxels: {nvox})", flush=True)

    # ---- VFE (fused into voxelize for HardSimpleVFE) ----
    feats = vox["features"]

    # ---- sparse encoder: rulebook builds only ----
    shape0 = tuple(cfg.sparse_shape)
    caps = cfg.capacities

    @jax.jit
    def s_builds(coords, valid, feats, chain):
        shape = shape0
        feats = feats + chain
        outs = []
        table0 = jax.vmap(sc.build_table, in_axes=(0, 0, None))(
            coords, valid, shape)
        coords, valid, feats = jax.vmap(sc.csr_reorder)(table0, feats)
        table = jax.vmap(sc.build_table, in_axes=(0, 0, None))(
            coords, valid, shape)
        rules = jax.vmap(sc.build_subm_rules, in_axes=(0, None, None, None))(
            table, shape, 3, True)
        outs.append(rules)
        pads = cfg.down_paddings
        for i in range(3):
            pad = tuple(pads[i])
            cap = caps[i + 1]
            out_shape = sc.conv_out_shape(shape, 3, 2, pad)
            out_coords, out_valid = jax.vmap(
                lambda c, v: sc.build_downsample(c, v, shape, 3, 2, pad, cap)[:2]
            )(coords, valid)
            down_rules = jax.vmap(
                lambda t_, oc, ov: sc.build_conv_rules(
                    t_, shape, oc, ov, 3, 2, pad, use_positions=True)
            )(table, out_coords, out_valid)
            outs.append(down_rules)
            coords, valid, shape = out_coords, out_valid, out_shape
            table = jax.vmap(sc.build_table, in_axes=(0, 0, None))(
                coords, valid, shape)
            rules = jax.vmap(
                sc.build_subm_rules, in_axes=(0, None, None, None))(
                table, shape, 3, True)
            outs.append(rules)
        return outs

    t = timeit(s_builds, vox["coords"], vox["voxel_mask"], feats)
    print(f"encoder rulebooks:   {t*1e3:8.2f} ms", flush=True)

    # ---- sparse encoder full ----
    enc = SparseEncoder(
        sparse_shape=cfg.sparse_shape,
        output_channels=cfg.sparse_out_channels,
        encoder_channels=cfg.encoder_channels,
        down_paddings=cfg.down_paddings,
        capacities=cfg.capacities,
        out_capacity=cfg.out_capacity,
    )
    evars = jax.jit(enc.init)(key, feats, vox["coords"], vox["voxel_mask"])

    @jax.jit
    def s_enc(evars, feats, coords, valid, chain):
        return enc.apply(evars, feats + chain, coords, valid)

    t = timeit(s_enc, evars, feats, vox["coords"], vox["voxel_mask"])
    print(f"sparse encoder:      {t*1e3:8.2f} ms", flush=True)
    bev = s_enc(evars, feats, vox["coords"], vox["voxel_mask"],
                jnp.zeros((), jnp.float32))
    print(f"  bev shape {bev.shape}", flush=True)

    # ---- SECOND + FPN ----
    sec = SECOND(out_channels=cfg.second_channels,
                 layer_nums=cfg.second_layers)
    svars = jax.jit(sec.init)(key, bev)

    @jax.jit
    def s_sec(svars, bev, chain):
        return sec.apply(svars, bev + chain)

    t = timeit(s_sec, svars, bev)
    print(f"SECOND:              {t*1e3:8.2f} ms", flush=True)
    secout = s_sec(svars, bev, jnp.zeros((), jnp.float32))

    fpn = SECONDFPN(out_channels=cfg.fpn_channels)
    fvars = jax.jit(fpn.init)(key, secout)

    @jax.jit
    def s_fpn(fvars, secout, chain):
        return fpn.apply(fvars, jax.tree.map(lambda x: x + chain, secout))

    t = timeit(s_fpn, fvars, secout)
    print(f"SECONDFPN:           {t*1e3:8.2f} ms", flush=True)
    fpn_bev = s_fpn(fvars, secout, jnp.zeros((), jnp.float32))

    # ---- FocalEncoder ----
    neck = FocalEncoder(
        num_layers=cfg.neck_layers, hidden=cfg.hidden, iterbev=cfg.iterbev,
        iterbev_wo_img=True, multistage_heatmap=cfg.decoder.multistage_heatmap,
        extra_feat=cfg.extra_feat, input_img=False, input_pts=True,
        cam_proj="", iter_bev_cam=cfg.iter_bev_cam,
        max_points_height=cfg.max_points_height, lss=cfg.lss,
        bev_shape=cfg.bev_shape,
    )
    nvars = jax.jit(lambda k, f: neck.init(k, None, f))(key, fpn_bev)

    @jax.jit
    def s_neck(nvars, fpn_bev, chain):
        return neck.apply(nvars, None, fpn_bev + chain)

    t = timeit(s_neck, nvars, fpn_bev)
    print(f"FocalEncoder:        {t*1e3:8.2f} ms", flush=True)
    pts_feat_conv, stage_feats = s_neck(nvars, fpn_bev,
                                        jnp.zeros((), jnp.float32))

    # ---- FocalDecoder ----
    dec = FocalDecoder(cfg.decoder)
    dvars = jax.jit(lambda k, p, s: dec.init(k, p, s, False))(
        key, pts_feat_conv, stage_feats)

    @jax.jit
    def s_dec(dvars, pts_feat_conv, stage_feats, chain):
        return dec.apply(dvars, pts_feat_conv + chain, stage_feats, False)

    t = timeit(s_dec, dvars, pts_feat_conv, stage_feats)
    print(f"FocalDecoder:        {t*1e3:8.2f} ms", flush=True)
    out = s_dec(dvars, pts_feat_conv, stage_feats,
                jnp.zeros((), jnp.float32))

    # ---- get_bboxes ----
    @jax.jit
    def s_gb(out, chain):
        out = dict(out)
        out["center"] = out["center"] + chain
        return fd.get_bboxes(cfg.decoder, out, 200)

    t = timeit(s_gb, out)
    print(f"get_bboxes:          {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
