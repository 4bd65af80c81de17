"""MXU ceiling + sparse-conv kernel bottleneck attribution (TPU).

Three probes, driving the round-3 conv-apply optimization
(VERDICT r2 item 1a — the kernel runs at ~27 TFLOP/s effective and is
"flat across window/tile", i.e. NOT FLOP-bound; this tool finds what is
binding):

  1. matmul ceiling: jnp.dot rates at the kernel's exact shapes
     ((tpg*T, wb) @ (wb, 128) one-hot dot; (T, tpg*cl) @ (., cout)
     weight dot) and a big aligned matmul for the chip peak.
  2. kernel phase split: variants of the production kernel with
     (a) the one-hot build hoisted (dots-only), (b) the dots replaced
     by a sum (oh-build-only). base - a - b ~= serialization overhead.
  3. scratch double-buffering: per-tap accumulate dots without the
     mb_ref concat staging buffer.

Usage: python tools/micro_mxu_probe.py [--levels 0 1 2]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.ops import sparse_conv_pallas as scp


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


def probe_matmuls():
    print("== matmul ceiling ==", flush=True)
    rng = np.random.RandomState(0)
    shapes = [
        # big aligned: chip peak reference
        (8192, 1024, 1024),
        # one-hot dot shapes (tpg*T, wb, cl): window 512 @ pack 8/4/2
        (2304, 64, 128),
        (2304, 128, 128),
        (2304, 256, 128),
        # weight dot (T, tpg*cl, cout)
        (256, 1152, 128),
        (256, 1152, 16),
        # batched-tile variants (2 tiles fused)
        (4608, 64, 128),
        (512, 1152, 128),
    ]
    for m, k, n in shapes:
        a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        b = jnp.asarray(rng.randn(k, n), jnp.bfloat16)
        f = jax.jit(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32).sum())
        t = timeit(f, a, b)
        fl = 2 * m * k * n
        print(f"  ({m:5d},{k:4d})@({k:4d},{n:4d}): {t*1e6:8.1f} us  "
              f"{fl/t/1e12:6.1f} TF/s", flush=True)

    # grid-looped matmul: same dot repeated over a pallas grid, measures
    # per-grid-step overhead vs one big dot
    m, k, n = 2304, 64, 128
    n_tiles = 600
    a = jnp.asarray(rng.randn(n_tiles, m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(k, n), jnp.bfloat16)

    def gk(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(
            a_ref[0], b_ref[:, :], preferred_element_type=jnp.float32
        )

    gf = pl.pallas_call(
        gk,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, m, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=jax.default_backend() != "tpu",
    )
    f = jax.jit(lambda a, b: gf(a, b).sum())
    t = timeit(f, a, b)
    fl = 2 * m * k * n * n_tiles
    print(f"  grid({n_tiles})x({m},{k})@({k},{n}): {t*1e3:8.2f} ms  "
          f"{fl/t/1e12:6.1f} TF/s  ({t/n_tiles*1e6:.2f} us/step)",
          flush=True)


# --------------------------------------------------------------------------
# kernel phase variants: copies of scp._kernel with pieces disabled
# --------------------------------------------------------------------------

def _variant_kernel(starts_ref, x_ref, rel_ref, wbig_ref, out_ref,
                    oh_ref, mb_ref, oh2_ref, *, n_groups, pack, window,
                    mode):
    i = pl.program_id(0)
    G = n_groups
    rel = rel_ref[0]
    T, K = rel.shape
    tpg = K // G
    cl = x_ref.shape[1]
    c = cl // pack
    wb = window // pack
    count = starts_ref[pl.num_programs(0) * G]

    @pl.when(i >= count)
    def _pad():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    @pl.when(i < count)
    def _live():
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, wb), 1)
        lane_blk = jax.lax.broadcasted_iota(jnp.int32, (T, cl), 1) // c

        if mode == "merged":
            # one block-diagonal dot per tile: all 3 bands' one-hots in a
            # (K*T, G*wb) matrix against stacked windows (G*wb, cl) —
            # tests whether issuing 1 big dot beats G smaller ones
            acc = None
            for g in range(G):
                start = pl.multiple_of(starts_ref[i * G + g], scp._ALIGN)
                win = x_ref[
                    pl.ds(pl.multiple_of(start // pack, 8), wb), :
                ].astype(jnp.bfloat16)
                mb_ref[g * wb:(g + 1) * wb, :cl] = win
                for j in range(tpg):
                    r = rel[:, g * tpg + j][:, None]
                    for gg in range(G):
                        blk = (r // pack == iota_w) if gg == g else (
                            jnp.zeros((T, wb), jnp.bool_))
                        oh_ref[
                            (g * tpg + j) * T:(g * tpg + j + 1) * T,
                            gg * wb:(gg + 1) * wb,
                        ] = blk.astype(jnp.bfloat16)
            gath = jnp.dot(
                oh_ref[:, :], mb_ref[: G * wb, :cl],
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)  # (K*T, cl)
            for g in range(G):
                for j in range(tpg):
                    piece = gath[(g * tpg + j) * T:(g * tpg + j + 1) * T]
                    if pack > 1:
                        r = rel[:, g * tpg + j][:, None]
                        piece = piece * (
                            lane_blk == (r % pack)).astype(jnp.bfloat16)
                    part = jnp.dot(
                        piece, wbig_ref[g, j * cl:(j + 1) * cl, :],
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
            out_ref[:, :] = acc.astype(out_ref.dtype)
            return

        acc = None
        for g in range(G):
            ohr = oh2_ref if (mode == "dbuf" and g % 2) else oh_ref
            if mode != "dots_only":
                for j in range(tpg):
                    r = rel[:, g * tpg + j][:, None]
                    ohr[j * T:(j + 1) * T, :] = (
                        r // pack == iota_w
                    ).astype(jnp.bfloat16)
            if mode == "oh_only":
                # cheap reduction keeps the oh build live
                part = jnp.sum(ohr[:, :], axis=1, keepdims=True)[:T]
                acc = part if acc is None else acc + part
                continue
            start = pl.multiple_of(starts_ref[i * G + g], scp._ALIGN)
            win = x_ref[
                pl.ds(pl.multiple_of(start // pack, 8), wb), :
            ].astype(jnp.bfloat16)
            gath = jnp.dot(
                ohr[:, :], win, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
            if mode == "pertap":
                for j in range(tpg):
                    piece = gath[j * T:(j + 1) * T, :]
                    if pack > 1:
                        r = rel[:, g * tpg + j][:, None]
                        piece = piece * (
                            lane_blk == (r % pack)).astype(jnp.bfloat16)
                    part = jnp.dot(
                        piece, wbig_ref[g, j * cl:(j + 1) * cl, :],
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
            else:
                for j in range(tpg):
                    piece = gath[j * T:(j + 1) * T, :]
                    if pack > 1:
                        r = rel[:, g * tpg + j][:, None]
                        piece = piece * (
                            lane_blk == (r % pack)).astype(jnp.bfloat16)
                    mb_ref[:, j * cl:(j + 1) * cl] = piece
                part = jnp.dot(
                    mb_ref[:, :], wbig_ref[g],
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
        if mode == "oh_only":
            out_ref[:, :] = jnp.broadcast_to(
                acc.astype(out_ref.dtype), out_ref.shape)
        else:
            out_ref[:, :] = acc.astype(out_ref.dtype)


def run_variant(features, plan, weights, in_capacity, mode):
    K, C, cout = weights.shape
    T = plan.tile
    n_tiles = plan.rel.shape[0]
    G = plan.n_groups
    tpg = K // G
    pack = scp._pack_factor(C)
    cl = pack * C
    xp = scp._pack_table(features, in_capacity)
    wperm = weights[jnp.asarray(plan.perm)]
    wbig = jnp.tile(wperm.astype(jnp.bfloat16), (1, pack, 1)).reshape(
        G, tpg * cl, cout)

    if mode == "dots_only":
        # constant one-hot: hoist the VPU build out of the loop entirely
        pass

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, K), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, cout), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(
                (K * T, G * (plan.window // pack)) if mode == "merged"
                else (tpg * T, plan.window // pack), jnp.bfloat16),
            pltpu.VMEM(
                (G * (plan.window // pack), cl) if mode == "merged"
                else (T, tpg * cl), jnp.bfloat16),
            pltpu.VMEM((tpg * T, plan.window // pack), jnp.bfloat16),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_variant_kernel, n_groups=G, pack=pack,
                          window=plan.window, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * T, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(plan.starts, xp, plan.rel, wbig)
    return out


def make_level(rng, v, c, cout, shape, window):
    """Random CSR voxel set at a level's scale + subm plan."""
    D, H, W = shape
    n = v
    cols = np.sort(rng.choice(H * W, size=n, replace=True))
    zs = rng.randint(0, D, size=n)
    key = np.unique(cols.astype(np.int64) * D + zs)
    rng.shuffle(key)
    key = np.sort(key[: min(len(key), v)])
    coords = np.stack(
        [key % D, (key // D) // W, (key // D) % W], 1
    ).astype(np.int32)
    pad = v - len(key)
    coords = np.pad(coords, ((0, pad), (0, 0)))
    valid = np.arange(v) < len(key)
    coords = jnp.asarray(coords)
    valid = jnp.asarray(valid)
    feats = jnp.asarray(rng.randn(v, c), jnp.float32)
    table = sc.build_table_csr(coords, valid, shape)
    rules = sc.build_conv_rules(
        table, shape, coords, valid, 3, 1, (1, 1, 1), use_positions=True)
    plan = scp.build_tile_plan(rules, v, 3, 256, window, 16384)
    w = jnp.asarray(rng.randn(27, c, cout) * 0.1, jnp.float32)
    return feats, plan, w, valid


def probe_kernel(levels):
    rng = np.random.RandomState(0)
    cfgs = {
        0: (153600, 16, 16, (41, 1440, 1440), 512),
        1: (243712, 32, 32, (21, 720, 720), 512),
        2: (187392, 64, 64, (11, 360, 360), 512),
    }
    for lv in levels:
        v, c, cout, shape, window = cfgs[lv]
        feats, plan, w, valid = make_level(rng, v, c, cout, shape, window)
        print(f"== level {lv}: V={v} C={c} window={window} "
              f"tiles={plan.rel.shape[0]} ==", flush=True)
        base = jax.jit(lambda f, w: scp.apply_conv_pallas(
            f, plan, plan, w, valid).sum())
        t0 = timeit(base, feats, w)
        print(f"  production apply: {t0*1e3:7.2f} ms "
              f"({t0/plan.rel.shape[0]*1e6:.2f} us/tile)", flush=True)
        # decompose the production wrapper: raw batched kernel (pack +
        # pallas_call, no overflow correction / custom-vjp / masking)
        pb1 = jax.tree.map(lambda a: a[None], plan)
        raw = jax.jit(lambda f, w: scp._run_kernel(
            scp._pad_c(f, 1)[None], pb1, scp._pad_c(w, 1),
            f.shape[0], False, jnp.float32).sum())
        t1 = timeit(raw, feats, w)
        print(f"  raw batched kernel: {t1*1e3:7.2f} ms "
              f"(wrapper overhead {max(t0 - t1, 0)*1e3:.2f} ms)",
              flush=True)
        for mode in ("full", "pertap", "dbuf", "merged", "oh_only",
                     "dots_only"):
            def wrap(f_, w_, m=mode):
                fp = scp._pad_c(f_, 1)
                wp = scp._pad_c(w_, 1)
                return run_variant(fp, plan, wp, fp.shape[0], m).sum()

            f = jax.jit(wrap)
            t = timeit(f, feats, w)
            print(f"  {mode:10s}: {t*1e3:7.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--skip-matmul", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    if not args.skip_matmul:
        probe_matmuls()
    probe_kernel(args.levels)


if __name__ == "__main__":
    main()
