"""Benchmark: Pallas windowed sparse-conv apply vs XLA gather-GEMM on TPU
at production level sizes."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.ops import sparse_conv_pallas as scp


def timeit(fn, *args, iters=20):
    s = jnp.zeros((), jnp.float32)
    out = fn(*args, s)
    s = (jnp.ravel(out)[0] * 0).astype(jnp.float32)
    out = fn(*args, s)
    s = (jnp.ravel(out)[0] * 0).astype(jnp.float32)
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, s)
        s = (jnp.ravel(out)[0] * 0).astype(jnp.float32)
    _ = float(s)
    return (time.perf_counter() - t0) / iters


def make_level(rng, shape, V):
    D, H, W = shape
    # cluster voxels like a lidar scan: ~2 z hits per active column
    ncol = V // 2
    cols = rng.choice(H * W, size=ncol, replace=False)
    z = rng.randint(0, D, size=(ncol, 2))
    keys = np.unique(
        (np.repeat(cols, 2) * D + z.reshape(-1)).astype(np.int64))
    rng.shuffle(keys)
    keys = keys[:V]
    coords = np.stack(
        [keys % D, keys // D // W, (keys // D) % W], -1).astype(np.int32)
    n = len(keys)
    coords = np.pad(coords, ((0, V - n), (0, 0)))
    valid = np.arange(V) < n
    return jnp.asarray(coords), jnp.asarray(valid)


def main():
    rng = np.random.RandomState(0)
    levels = [
        ((41, 1440, 1440), 120000, 16, 16),
        ((21, 720, 720), 90000, 32, 32),
        ((11, 360, 360), 60000, 64, 64),
        ((5, 180, 180), 40000, 128, 128),
    ]
    for shape, V, C, Cout in levels:
        coords, valid = make_level(rng, shape, V)
        feats = jnp.asarray(
            rng.randn(V, C).astype(np.float32)).astype(jnp.bfloat16)
        feats = jnp.where(valid[:, None], feats, 0)
        table0 = sc.build_table(coords, valid, shape)
        coords, valid, feats = sc.csr_reorder(table0, feats)
        table = sc.build_table(coords, valid, shape)
        rules = sc.build_subm_rules(table, shape, 3, use_positions=True)
        w = jnp.asarray(
            rng.randn(27, C, Cout).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)

        @jax.jit
        def xla_conv(feats, rules, w, valid, chain):
            return sc.apply_conv(
                feats + chain.astype(feats.dtype), rules, w, valid)

        t_x = timeit(xla_conv, feats, rules, w, valid)

        print(f"V={V}: xla {t_x*1e3:.2f} ms", flush=True)
        for tile, window in ((256, 512), (256, 1024), (512, 1024)):
            plan = scp.build_tile_plan(rules, V, 3, tile, window,
                                       overflow_capacity=8192)
            rules_t = scp.transpose_rules(rules, V, 3)
            plan_t = scp.build_tile_plan(rules_t, V, 3, tile, window,
                                         overflow_capacity=8192)
            nov = int(plan.n_overflow)

            @jax.jit
            def pal_conv(feats, w, valid, plan, plan_t, chain):
                return scp.apply_conv_pallas(
                    feats + chain.astype(feats.dtype), plan, plan_t, w,
                    valid, interpret=False)

            try:
                t_p = timeit(pal_conv, feats, w, valid, plan, plan_t)
                # grad step too (fwd+bwd)
                @jax.jit
                def pal_grad(feats, w, valid, plan, plan_t, chain):
                    def loss(f, ww):
                        return jnp.sum(
                            scp.apply_conv_pallas(
                                f + chain.astype(f.dtype), plan, plan_t,
                                ww, valid, interpret=False
                            ).astype(jnp.float32) ** 2)
                    g = jax.grad(loss, argnums=1)(feats, w)
                    return g

                t_g = timeit(pal_grad, feats, w, valid, plan, plan_t)
                print(
                    f"V={V:7d} C={C:4d} T={tile:4d} W={window:5d} "
                    f"ov={nov:6d}: pallas {t_p*1e3:7.2f} ms "
                    f"(grad {t_g*1e3:7.2f}) | xla {t_x*1e3:7.2f} ms",
                    flush=True)
            except Exception as e:
                print(f"V={V} T={tile} W={window}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
