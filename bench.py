"""Benchmark: FocalFormer3D-L single-scan inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no FPS numbers
(/root/reference/tools/analysis_tools/benchmark.py exists but no committed
results); public measurements of TransFusion-class LiDAR detectors on A100
are ~8 scans/s.  The driver target is >=2x A100 per-scan throughput
(BASELINE.md), so vs_baseline = scans_per_sec / 16.0.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(engine: str | None = None):
    import dataclasses
    import os

    from focalformer3d_tpu.utils.platform import setup as _setup

    _setup()  # persistent compile cache: cold full-model compiles are ~15 min

    import jax
    import jax.numpy as jnp

    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.data import synthetic
    from focalformer3d_tpu.models.detector import (
        FocalFormer3D, preprocess_points, with_compute_dtype,
    )
    from focalformer3d_tpu.models import focal_decoder as fd

    cfg = get_config("FocalFormer3D_L")["model"]
    # deployment inference runs bfloat16 on the dense BEV path (params and
    # head outputs stay f32; see tests/test_model_smoke.py bf16-vs-f32)
    bench_dtype = os.environ.get("FF3D_BENCH_DTYPE", "bfloat16")
    if bench_dtype != "float32":
        cfg = with_compute_dtype(cfg, bench_dtype)
    if engine is not None:
        cfg = dataclasses.replace(cfg, sparse_engine=engine)
    model = FocalFormer3D(cfg)

    rng = np.random.RandomState(0)
    n_points = 200000  # ~10-sweep nuScenes scan
    # radial beam-model clouds: ring structure + 1/r density matching real
    # nuScenes scans (the uniform mode is the unrealistic worst case for
    # CSR window density and downsample dilation — VERDICT r2 item 5)
    batch = synthetic.make_batch(
        rng, batch_size=1, n_points=n_points, n_boxes=24, max_gts=32,
        num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range, mode="radial",
    )
    points = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["points_mask"])

    vox0 = preprocess_points(cfg, points, mask)
    # jitted init: eager per-op dispatch on TPU is minutes for this model
    init = jax.jit(
        lambda k, v: model.init({"params": k}, v, None, False)
    )
    variables = init(jax.random.PRNGKey(0), vox0)

    # NOTE: on the remote-TPU (axon) backend jax.block_until_ready does NOT
    # synchronize; a 1-element host fetch does. Device execution is in-order,
    # so dispatching all iterations and fetching the last output measures
    # pipelined throughput (host dispatch overlaps device compute), which is
    # the deployment-relevant scans/sec number.
    @jax.jit
    def infer(variables, points, mask, eps):
        vox = preprocess_points(cfg, points + eps, mask)
        out = model.apply(variables, vox, None, False)
        dec = fd.get_bboxes(cfg.decoder, out, 200)
        return dec, dec["scores"].sum() * 0.0

    # one AOT compilation serves the timing loop AND the cost analysis
    # (a second lower().compile() would re-hit the compile cache)
    try:
        _compiled = infer.lower(
            variables, points, mask, jnp.float32(0)).compile()
    except Exception:
        _compiled = None

    # warmup / compile
    res, eps = infer(variables, points, mask, jnp.float32(0))
    _ = float(eps)
    res, eps = infer(variables, points, mask, eps)
    _ = float(eps)

    extra = {}
    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        res, last = infer(variables, points, mask, eps)
    _ = float(last)  # host fetch of the last queued result syncs the queue
    p50 = (time.perf_counter() - t0) / iters
    scans_per_sec = 1.0 / p50

    # per-stage breakdown (stderr; stdout stays one JSON line for the
    # driver): pipelined deltas between cumulative cuts of the graph
    try:
        from focalformer3d_tpu.models.sparse_encoder import SparseEncoder

        enc = SparseEncoder(
            sparse_shape=cfg.sparse_shape,
            output_channels=cfg.sparse_out_channels,
            encoder_channels=cfg.encoder_channels,
            down_paddings=cfg.down_paddings,
            capacities=cfg.capacities,
            out_capacity=cfg.out_capacity,
            engine="pallas" if jax.default_backend() == "tpu" else "voxel",
            assume_csr=True,
            dense_from=cfg.sparse_dense_from_eval,
        )
        ev = {"params": variables["params"]["pts_middle_encoder"],
              "batch_stats": variables.get("batch_stats", {}).get(
                  "pts_middle_encoder", {})}

        @jax.jit
        def cut_vox(points, mask):
            v = preprocess_points(cfg, points, mask)
            return v["features"].sum()

        @jax.jit
        def cut_enc(ev, points, mask):
            v = preprocess_points(cfg, points, mask)
            return enc.apply(
                ev, v["features"], v["coords"], v["voxel_mask"]
            ).sum()

        @jax.jit
        def cut_model(variables, points, mask):
            v = preprocess_points(cfg, points, mask)
            out = model.apply(variables, v, None, False)
            return out["center"].sum()

        def ptime(fn, *args, iters=10):
            r = fn(*args)
            _ = float(jnp.ravel(r)[0])
            r = fn(*args)
            _ = float(jnp.ravel(r)[0])
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(*args)
            _ = float(jnp.ravel(r)[0])
            return (time.perf_counter() - t0) / iters * 1e3

        t_v = ptime(cut_vox, points, mask)
        t_e = ptime(cut_enc, ev, points, mask)
        t_m = ptime(cut_model, variables, points, mask)
        t_full = p50 * 1e3
        extra["p50_latency_ms"] = round(t_full, 1)
        print(
            f"stage breakdown (ms/scan): voxelize+vfe {t_v:.1f} | "
            f"sparse encoder {t_e - t_v:.1f} | backbone+neck+decoder "
            f"{t_m - t_e:.1f} | get_bboxes {max(t_full - t_m, 0):.1f} | "
            f"total {t_full:.1f}",
            file=sys.stderr,
        )
        # on-TPU numeric parity of the production (Mosaic-compiled)
        # engine vs the XLA voxel engine at the bench scan (VERDICT r4
        # weak 4: interpret-mode tests don't exercise Mosaic codegen)
        if jax.default_backend() == "tpu":
            enc_ref = SparseEncoder(
                sparse_shape=cfg.sparse_shape,
                output_channels=cfg.sparse_out_channels,
                encoder_channels=cfg.encoder_channels,
                down_paddings=cfg.down_paddings,
                capacities=cfg.capacities,
                out_capacity=cfg.out_capacity,
                engine="voxel",
                assume_csr=True,
                dense_from=cfg.sparse_dense_from_eval,
            )

            @jax.jit
            def parity(ev, points, mask):
                v = preprocess_points(cfg, points, mask)
                args = (v["features"], v["coords"], v["voxel_mask"])
                y_p = enc.apply(ev, *args)
                y_x = enc_ref.apply(ev, *args)
                scale = jnp.max(jnp.abs(y_x))
                return jnp.max(jnp.abs(y_p - y_x)) / (scale + 1e-12)

            rel = float(parity(ev, points, mask))
            extra["pallas_vs_xla_max_rel_diff"] = round(rel, 6)
            print(f"pallas-vs-XLA encoder max rel diff {rel:.2e} "
                  f"(bf16 tolerance ~1e-2)", file=sys.stderr)
    except Exception as e:  # breakdown must never break the gate metric
        print(f"stage breakdown unavailable: {e}", file=sys.stderr)

    try:
        # HBM bytes/scan from XLA's cost model (arithmetic-intensity
        # observability — VERDICT r2 item 1d). The production graph
        # carries the exact-XLA fallback branch of every conv's
        # lax.cond, and cost_analysis counts BOTH branches (VERDICT r4
        # item 3: 122 -> 399 GB with no real traffic change), so the
        # headline bytes come from a fallback-free compile of the same
        # model (identical math whenever truncated=false, which this
        # bench measures); the both-branches number is kept as _graph.
        cost = _compiled.cost_analysis() if _compiled else None
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else None
        if cost:
            extra["bytes_accessed_per_scan_graph"] = int(
                cost.get("bytes accessed", 0))
            extra["gflops_per_scan"] = round(
                cost.get("flops", 0.0) / 1e9, 1)
        cfg_nf = dataclasses.replace(cfg, sparse_exact_fallback=False)
        model_nf = FocalFormer3D(cfg_nf)

        @jax.jit
        def infer_nf(variables, points, mask, eps):
            vox = preprocess_points(cfg_nf, points + eps, mask)
            out = model_nf.apply(variables, vox, None, False)
            dec = fd.get_bboxes(cfg_nf.decoder, out, 200)
            return dec, dec["scores"].sum() * 0.0

        cost_nf = infer_nf.lower(
            variables, points, mask, jnp.float32(0)).compile(
        ).cost_analysis()
        if isinstance(cost_nf, (list, tuple)):
            cost_nf = cost_nf[0] if cost_nf else None
        if cost_nf:
            extra["bytes_accessed_per_scan"] = int(
                cost_nf.get("bytes accessed", 0))
    except Exception as e:
        print(f"cost analysis unavailable: {e}", file=sys.stderr)

    try:
        # batched deployment throughput (pipelined, batch B): amortizes
        # index-build + weight traffic; reported alongside the batch-1
        # headline (the driver metric stays single-scan)
        bsz = int(os.environ.get("FF3D_BENCH_BATCH", "4"))
        if bsz > 1:
            batch_b = synthetic.make_batch(
                rng, batch_size=bsz, n_points=n_points, n_boxes=24,
                max_gts=32, num_classes=cfg.decoder.num_classes,
                pc_range=cfg.voxel.point_cloud_range, mode="radial",
            )
            pb_ = jnp.asarray(batch_b["points"])
            mb_ = jnp.asarray(batch_b["points_mask"])
            res, eps_b = infer(variables, pb_, mb_, jnp.float32(0))
            _ = float(eps_b)
            res, eps_b = infer(variables, pb_, mb_, eps_b)
            _ = float(eps_b)
            t0 = time.perf_counter()
            for _ in range(max(iters // bsz, 5)):
                res, last_b = infer(variables, pb_, mb_, eps_b)
            _ = float(last_b)
            dt = (time.perf_counter() - t0) / max(iters // bsz, 5)
            extra[f"scans_per_sec_batch{bsz}"] = round(bsz / dt, 3)
            print(f"batch-{bsz} throughput: {bsz / dt:.2f} scans/s",
                  file=sys.stderr)
    except Exception as e:
        print(f"batched bench unavailable: {e}", file=sys.stderr)

    try:
        # occupancy + pallas-plan spill diagnostics (bench realism +
        # exactness observability — VERDICT r2 items 1d/5, ADVICE medium 1)
        occ = int(jnp.sum(vox0["voxel_mask"]))
        _, diag = jax.jit(
            lambda v, x: model.apply(v, x, None, False,
                                     mutable=["diagnostics"])
        )(variables, vox0)
        d = diag["diagnostics"].get("pts_middle_encoder", {})
        ovf = int(jnp.max(jnp.asarray(
            d.get("max_plan_overflow", (0,))[0])))
        trunc = int(jnp.max(jnp.asarray(
            d.get("plan_overflow_truncated", (0,))[0])))
        extra.update(occupied_voxels=occ, max_plan_overflow=ovf,
                     plan_overflow_truncated=bool(trunc))
        print(f"occupancy {occ} | max plan overflow {ovf} | "
              f"truncated {bool(trunc)}", file=sys.stderr)
    except Exception as e:  # diagnostics must never break the gate metric
        print(f"diagnostics unavailable: {e}", file=sys.stderr)

    # which sparse engine actually produced the gate number (VERDICT r3
    # item 5: the silent voxel-engine fallback masked a broken pallas path)
    eng = engine
    if eng is None:
        eng = ("pallas" if jax.default_backend() == "tpu" else "voxel")
    print(json.dumps({
        "metric": "nuScenes-L single-scan inference throughput (1 chip)",
        "value": round(scans_per_sec, 3),
        "unit": "scans/sec",
        "vs_baseline": round(scans_per_sec / 16.0, 3),
        "compute_dtype": bench_dtype,
        "engine": eng,
        **extra,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # driver gate must always get its JSON line
        print(f"PRIMARY BENCH PATH FAILED ({e!r}); falling back to the "
              f"XLA voxel engine — the JSON line below is NOT the "
              f"production pallas path (see the 'engine' key)",
              file=sys.stderr)
        main(engine="voxel")
