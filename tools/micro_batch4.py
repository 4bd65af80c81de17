"""Where does batch-4 lose vs batch-1? (VERDICT r4 item: 4.07 < 5.01)

Times the bench's cumulative graph cuts (voxelize+vfe | + sparse
encoder | + backbone/neck/decoder) at batch 1 and batch 4 on the same
radial scans, pipelined (chained-input timing, 1-element host fetch),
and reports per-scan ms per stage side by side. A stage whose per-scan
time GROWS with batch is the serialization; a stage that shrinks is
amortizing.

Usage: python tools/micro_batch4.py [B]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focalformer3d_tpu.utils.platform import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np

from focalformer3d_tpu.configs import get_config
from focalformer3d_tpu.data import synthetic
from focalformer3d_tpu.models.detector import (
    FocalFormer3D, preprocess_points, with_compute_dtype,
)
from focalformer3d_tpu.models import focal_decoder as fd
from focalformer3d_tpu.models.sparse_encoder import SparseEncoder


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = get_config("FocalFormer3D_L")["model"]
    cfg = with_compute_dtype(cfg, "bfloat16")
    model = FocalFormer3D(cfg)
    rng = np.random.RandomState(0)
    n_points = 200000

    def make(b):
        batch = synthetic.make_batch(
            rng, batch_size=b, n_points=n_points, n_boxes=24, max_gts=32,
            num_classes=cfg.decoder.num_classes,
            pc_range=cfg.voxel.point_cloud_range, mode="radial",
        )
        return (jnp.asarray(batch["points"]),
                jnp.asarray(batch["points_mask"]))

    p1, m1 = make(1)
    pb, mb = make(bsz)
    init = jax.jit(lambda k, v: model.init({"params": k}, v, None, False))
    variables = init(jax.random.PRNGKey(0), preprocess_points(cfg, p1, m1))

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

    # encoder-internal cut: plan/index build only (zero-channel apply is
    # impossible to cut cleanly, so approximate with enc applied to
    # stop-gradient features — the plan build depends only on coords)
    @jax.jit
    def cut_vox(points, mask):
        v = preprocess_points(cfg, points, mask)
        return v["features"].sum()

    @jax.jit
    def cut_enc(ev, points, mask):
        v = preprocess_points(cfg, points, mask)
        return enc.apply(
            ev, v["features"], v["coords"], v["voxel_mask"]).sum()

    @jax.jit
    def cut_model(variables, points, mask):
        v = preprocess_points(cfg, points, mask)
        out = model.apply(variables, v, None, False)
        return out["center"].sum()

    @jax.jit
    def infer(variables, points, mask, eps):
        vox = preprocess_points(cfg, points + eps, mask)
        out = model.apply(variables, vox, None, False)
        dec = fd.get_bboxes(cfg.decoder, out, 200)
        return dec, dec["scores"].sum() * 0.0

    def ptime(fn, *args, iters=12):
        r = fn(*args)
        _ = float(jnp.ravel(r)[0])
        r = fn(*args)
        _ = float(jnp.ravel(r)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        _ = float(jnp.ravel(r)[0])
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"backend: {jax.default_backend()}  B={bsz}", flush=True)
    for label, (pp, mm, b) in (("B=1", (p1, m1, 1)),
                               (f"B={bsz}", (pb, mb, bsz))):
        t_v = ptime(cut_vox, pp, mm)
        t_e = ptime(cut_enc, ev, pp, mm)
        t_m = ptime(cut_model, variables, pp, mm)

        def full(v_, p_, m_, e_):
            return infer(v_, p_, m_, e_)[1]

        r = full(variables, pp, mm, jnp.float32(0))
        _ = float(r)
        t0 = time.perf_counter()
        it = 12
        for _ in range(it):
            r = full(variables, pp, mm, r)
        _ = float(r)
        t_f = (time.perf_counter() - t0) / it * 1e3
        print(
            f"  {label}: per-scan ms  vox+vfe {t_v / b:6.1f} | "
            f"encoder {(t_e - t_v) / b:6.1f} | bb+neck+dec "
            f"{(t_m - t_e) / b:6.1f} | full {t_f / b:6.1f}  "
            f"(cut totals {t_v:.0f}/{t_e:.0f}/{t_m:.0f}/{t_f:.0f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
