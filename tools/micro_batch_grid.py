"""A/B: (B, n_tiles) batched kernel grid vs B=1-specialized flat grid.

The r4 batched grid (one launch per conv for any B) uses 3D/4D blocks
with leading size-1 batch dims. micro_mxu_probe measured the production
apply at 6.8 ms vs 3.9 ms for the same math in a flat-grid variant —
if the leading-1 block shapes cost relayouts, B=1 inference pays ~2.5
ms x 17 convs. This probe times the same plan through both launch
shapes.

Usage: python tools/micro_batch_grid.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focalformer3d_tpu.utils.platform import setup

setup()

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
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / iters


def _kernel_flat(starts_ref, x_ref, rel_ref, wbig_ref, out_ref,
                 oh_ref, mb_ref, *, n_groups, pack, window):
    """scp._kernel with the batch dim stripped (2D/3D blocks)."""
    i = pl.program_id(0)
    G = n_groups
    rel = rel_ref[0]  # (T, K)
    T, K = rel.shape
    tpg = K // G
    cl = x_ref.shape[1]
    c = cl // pack
    wb = window // pack
    count = starts_ref[pl.num_programs(0) * G]

    @pl.when(i >= count)
    def _pad_tile():
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0])

    @pl.when(i < count)
    def _live_tile():
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, wb), 1)
        lane_blk = jax.lax.broadcasted_iota(jnp.int32, (T, cl), 1) // c
        acc = None
        for g in range(G):
            for j in range(tpg):
                r = rel[:, g * tpg + j][:, None]
                oh_ref[j * T:(j + 1) * T, :] = (
                    r // pack == iota_w
                ).astype(jnp.bfloat16)
            start = pl.multiple_of(starts_ref[i * G + g], scp._ALIGN)
            win = x_ref[
                pl.ds(pl.multiple_of(start // pack, 8), wb), :
            ].astype(jnp.bfloat16)
            gath = jnp.dot(
                oh_ref[:, :], win, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
            for j in range(tpg):
                piece = gath[j * T:(j + 1) * T, :]
                if pack > 1:
                    r = rel[:, g * tpg + j][:, None]
                    piece = piece * (
                        lane_blk == (r % pack)
                    ).astype(jnp.bfloat16)
                mb_ref[:, j * cl:(j + 1) * cl] = piece
            part = jnp.dot(
                mb_ref[:, :], wbig_ref[g],
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        out_ref[0, :, :] = acc.astype(out_ref.dtype)


def run_flat(features, plan, weights, in_capacity):
    K, C, cout = weights.shape
    n_tiles, T, _ = plan.rel.shape
    G = plan.n_groups
    tpg = K // G
    pack = scp._pack_factor(C)
    cl = pack * C
    xp = scp._pack_table(features, in_capacity)
    wperm = weights[jnp.asarray(plan.perm)]
    wbig = jnp.tile(wperm.astype(jnp.bfloat16), (1, pack, 1)).reshape(
        G, tpg * cl, cout
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(xp.shape, lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, K), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, cout), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tpg * T, plan.window // pack), jnp.bfloat16),
            pltpu.VMEM((T, tpg * cl), jnp.bfloat16),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_flat, n_groups=G, pack=pack, window=plan.window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, T, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(plan.starts, xp, plan.rel, wbig)
    return out


def main():
    from tools.micro_mxu_probe import make_level

    rng = np.random.RandomState(0)
    for lv, (v, c, cout, shape, window) in {
        0: (153600, 16, 16, (41, 1440, 1440), 512),
        1: (243712, 32, 32, (21, 720, 720), 512),
    }.items():
        feats, plan, w, valid = make_level(rng, v, c, cout, shape, window)
        fp = scp._pad_c(feats, 1)
        wp = scp._pad_c(w, 1)
        print(f"== level {lv}: V={v} C={c} ==", flush=True)
        prod = jax.jit(lambda f, ww: scp.apply_conv_pallas(
            f, plan, plan, ww, valid).sum())
        t = timeit(prod, feats, w)
        print(f"  production (B,1 grid + overflow): {t*1e3:7.2f} ms",
              flush=True)
        pb1 = jax.tree.map(lambda a: a[None], plan)
        bat = jax.jit(lambda f, ww: scp._run_kernel(
            f[None], pb1, ww, fp.shape[0], False, jnp.float32).sum())
        t = timeit(bat, fp, wp)
        print(f"  batched grid, kernel only:        {t*1e3:7.2f} ms",
              flush=True)
        flat = jax.jit(lambda f, ww: run_flat(
            f, plan, ww, fp.shape[0]).sum())
        t = timeit(flat, fp, wp)
        print(f"  flat grid, kernel only:           {t*1e3:7.2f} ms",
              flush=True)

        # bisect the wrapper: kernel + overflow correction (no mask/bias)
        cap = fp.shape[0]

        def k_ov(f, ww):
            out = scp._run_kernel(
                f[None], pb1, ww, cap, False, jnp.float32)
            out = scp._apply_overflow(out, f[None], ww, pb1, cap)
            return out.sum()

        t = timeit(jax.jit(k_ov), fp, wp)
        print(f"  batched + overflow:               {t*1e3:7.2f} ms",
              flush=True)

        def k_post(f, ww):
            out = scp._run_kernel(
                f[None], pb1, ww, cap, False, jnp.float32)
            out = out[:, : plan.v_out]
            out = jnp.where(valid[None, :, None], out, 0.0)
            return out.astype(jnp.bfloat16).sum()

        t = timeit(jax.jit(k_post), fp, wp)
        print(f"  batched + slice/mask/cast:        {t*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
