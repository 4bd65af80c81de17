"""Dense-tail formulation probe: conv3d vs z-shifted conv2d on TPU.

micro_dense_from measured XLA conv3d at only 11-32 TF/s on the v5e at
the L2 shapes, killing the dense_from=2 plan. A 3D conv over (D,H,W) is
also expressible as 2D convs with D merged into the batch:

  variant A (3x conv2d):  y = sum_dz conv2d(shift_z(x, dz), W[dz])
  variant B (1x conv2d):  y = conv2d(concat_z_shifts(x), W_all)  # Cin*3
  variant C: plain conv2d (no z mixing) as the ceiling reference

All at the dense-L2 block shapes (11,360,360,64->64 subm; stride-2 down
64->128). Repeats run inside one jit (fori_loop) so the axon tunnel's
per-call dispatch cost is excluded.

Usage: python tools/micro_conv2d_tail.py
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


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / iters


def rep8(one, *args, same_shape=False):
    """Time one() with 8 in-jit repeats. When the op maps x -> same
    shape, carry the full output through a nonlinearity (DCE-proof);
    otherwise perturb x with a scalar reduced from the FULL previous
    output (blocks slice-propagation: every element feeds the chain)."""

    @jax.jit
    def f(*a):
        x = a[0]

        def body(_, c):
            if same_shape:
                return one(jnp.abs(c).astype(x.dtype), *a[1:])
            s = jnp.max(jnp.abs(c)).astype(x.dtype)
            return one(x + 1e-6 * s, *a[1:])

        return jax.lax.fori_loop(0, 8, body, one(*a), unroll=True)

    return timeit(f, *args) / 8


def conv2d(x, w, stride=(1, 1), pads=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w, stride, pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    D, H, W, C, CO = 11, 360, 360, 64, 64
    x = jnp.asarray(rng.randn(D, H, W, C), jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(3, 3, 3, C, CO) * 0.02, jnp.bfloat16)

    # C: plain conv2d ceiling (one dz tap's worth of work)
    t = rep8(lambda x_, w_: conv2d(x_, w_), x, w3[1], same_shape=True)
    fl = 2 * D * H * W * 9 * C * CO
    print(f"  C plain conv2d (D as batch): {t*1e3:7.2f} ms "
          f"{fl/t/1e12:6.1f} TF/s", flush=True)

    # A: 3 z-shifted conv2ds summed (subm: stride 1, same z count)
    def subm_a(x_, w_):
        y = conv2d(x_, w_[1])
        # dz=0 tap reads z-1 -> shift input down the z axis
        y += conv2d(
            jnp.concatenate([jnp.zeros_like(x_[:1]), x_[:-1]], 0), w_[0]
        )
        y += conv2d(
            jnp.concatenate([x_[1:], jnp.zeros_like(x_[:1])], 0), w_[2]
        )
        return y

    t = rep8(subm_a, x, w3, same_shape=True)
    fl3 = 3 * fl
    print(f"  A 3x shifted conv2d (subm):  {t*1e3:7.2f} ms "
          f"{fl3/t/1e12:6.1f} TF/s", flush=True)

    # B: one conv2d over z-concat channels
    def subm_b(x_, w_):
        xc = jnp.concatenate(
            [jnp.concatenate([jnp.zeros_like(x_[:1]), x_[:-1]], 0),
             x_,
             jnp.concatenate([x_[1:], jnp.zeros_like(x_[:1])], 0)],
            axis=-1,
        )
        wc = jnp.concatenate([w_[0], w_[1], w_[2]], axis=2)
        return conv2d(xc, wc)

    t = rep8(subm_b, x, w3, same_shape=True)
    print(f"  B concat-z conv2d (subm):    {t*1e3:7.2f} ms "
          f"{fl3/t/1e12:6.1f} TF/s", flush=True)

    # numerics: A == B == conv3d
    y3 = jax.lax.conv_general_dilated(
        x[None], jnp.transpose(w3, (0, 1, 2, 3, 4)), (1, 1, 1),
        [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)[0]
    ya = subm_a(x, w3)
    yb = subm_b(x, w3)
    print("  A vs conv3d max err:", float(jnp.max(jnp.abs(
        ya.astype(jnp.float32) - y3.astype(jnp.float32)))), flush=True)
    print("  B vs conv3d max err:", float(jnp.max(jnp.abs(
        yb.astype(jnp.float32) - y3.astype(jnp.float32)))), flush=True)

    # down conv: stride (2,2,2), pad (0,1,1), 64->128.
    # out z slices d read input z = 2d+dz (pad_z=0), dz in 0..2
    CO2 = 128
    wd = jnp.asarray(rng.randn(3, 3, 3, C, CO2) * 0.02, jnp.bfloat16)

    def down_a(x_, w_):
        outs = []
        for dz in range(3):
            xi = x_[dz::2][: (D - 3) // 2 + 1]
            outs.append(conv2d(xi, w_[dz], stride=(2, 2)))
        return outs[0] + outs[1] + outs[2]

    t = rep8(down_a, x, wd)
    od, oh, ow = (D - 3) // 2 + 1, (H + 2 - 3) // 2 + 1, (W + 2 - 3) // 2 + 1
    fld = 2 * od * oh * ow * 27 * C * CO2
    print(f"  A down conv (s2, 64->128):   {t*1e3:7.2f} ms "
          f"{fld/t/1e12:6.1f} TF/s", flush=True)

    y3d = jax.lax.conv_general_dilated(
        x[None], wd, (2, 2, 2), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)[0]
    yda = down_a(x, wd)
    print("  down A vs conv3d max err:", float(jnp.max(jnp.abs(
        yda.astype(jnp.float32) - y3d.astype(jnp.float32)))),
        "shapes", yda.shape, y3d.shape, flush=True)


if __name__ == "__main__":
    main()
