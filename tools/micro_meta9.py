"""widen_meta9 formulation shootout (r5: meta9 dominates the index build).

The production widen_meta9 concatenates 9 shifted row-slices of the
padded meta on axis=1 — on TPU that lowers to nine 16-byte-wide strided
writes into 144-byte rows. Candidates measured at L0/L1/L2 grid sizes:

  concat   — production: jnp.concatenate([slice x9], axis=1)
  stack    — jnp.stack(axis=1).reshape: one fused generator loop?
  gather   — mp[idx] row gather (nr, 9, 4), the known-slow baseline
  pallas   — streaming stencil kernel: grid over row blocks, each step
             reads its (Nb + 2W+2, 4) input window once and assembles
             the (Nb, 36) output from 9 static shifted slices in VMEM

plus a correctness check of each against concat.

Usage: python tools/micro_meta9.py
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


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / iters


def widen_concat(meta, W):
    n_col = meta.shape[0] - 1
    nr = n_col + W + 1
    mp = jnp.concatenate(
        [jnp.zeros((W + 1, 4), meta.dtype), meta,
         jnp.zeros((2 * W + 2, 4), meta.dtype)], 0)
    return jnp.concatenate(
        [mp[dy * W + dx:dy * W + dx + nr]
         for dy in range(3) for dx in range(3)], axis=1)


def widen_stack(meta, W):
    n_col = meta.shape[0] - 1
    nr = n_col + W + 1
    mp = jnp.concatenate(
        [jnp.zeros((W + 1, 4), meta.dtype), meta,
         jnp.zeros((2 * W + 2, 4), meta.dtype)], 0)
    parts = [mp[dy * W + dx:dy * W + dx + nr]
             for dy in range(3) for dx in range(3)]
    return jnp.stack(parts, axis=1).reshape(nr, 36)


def widen_gather(meta, W):
    n_col = meta.shape[0] - 1
    nr = n_col + W + 1
    mp = jnp.concatenate(
        [jnp.zeros((W + 1, 4), meta.dtype), meta,
         jnp.zeros((2 * W + 2, 2 * W + 2 + 4 - meta.shape[1] and 4),
                   meta.dtype)], 0)
    offs = jnp.asarray([dy * W + dx for dy in range(3) for dx in range(3)],
                       jnp.int32)
    idx = jnp.arange(nr, dtype=jnp.int32)[:, None] + offs[None, :]
    return mp[idx].reshape(nr, 36)


_NB = 4096


def _widen_kernel(mp_ref, o_ref, *, W, nb):
    # mp block: (nb + 2W + 2 rounded, 4); out block: (nb, 36)
    for t, (dy, dx) in enumerate(
            (dy, dx) for dy in range(3) for dx in range(3)):
        off = dy * W + dx
        o_ref[:, 4 * t:4 * t + 4] = mp_ref[pl.ds(off, nb), :]


def widen_pallas(meta, W):
    n_col = meta.shape[0] - 1
    nr = n_col + W + 1
    nb = _NB
    nrp = -(-nr // nb) * nb
    halo = 2 * W + 2
    mp = jnp.concatenate(
        [jnp.zeros((W + 1, 4), meta.dtype), meta,
         jnp.zeros((halo + nrp - nr, 4), meta.dtype)], 0)
    # block i input: rows [i*nb, i*nb + nb + halo) — express as a
    # BlockSpec over an overlapping view via index_map on a padded array
    hb = -(-(nb + halo) // nb)  # input blocks spanned
    out = pl.pallas_call(
        functools.partial(_widen_kernel, W=W, nb=nb),
        grid=(nrp // nb,),
        in_specs=[pl.BlockSpec(
            ((hb + 1) * nb, 4), lambda i: (i, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb, 36), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrp, 36), meta.dtype),
        interpret=jax.default_backend() != "tpu",
    )(jnp.pad(mp, ((0, (hb + 1) * nb), (0, 0))))
    return out[:nr]


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    for W, name in ((1440, "L0"), (720, "L1"), (360, "L2")):
        n_col = W * W
        meta = jnp.asarray(
            rng.randint(0, 2**30, size=(n_col + 1, 4)), jnp.int32)
        ref = None
        for label, fn in (("concat", widen_concat),
                          ("stack", widen_stack),
                          ("pallas", widen_pallas)):
            try:
                jf = jax.jit(functools.partial(fn, W=W))
                t = timeit(jf, meta)
                out = jf(meta)
                if ref is None:
                    ref = out
                    ok = "ref"
                else:
                    ok = ("OK" if bool(jnp.all(out == ref)) else
                          "MISMATCH")
                print(f"  {name} W={W} {label:8s}: {t*1e3:7.2f} ms  {ok}",
                      flush=True)
            except Exception as e:
                msg = (str(e).splitlines() or [repr(e)])[0][:100]
                print(f"  {name} W={W} {label:8s}: FAILED {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
