"""Cost of exact spill compaction primitives on TPU.

The overflow compaction must enumerate ALL spills tile-major (the
in-kernel correction slices per-tile segments). The two-stage capture
bounds the nonzero input to tcap*K*tile elements but silently requires
n_spill_tiles <= tcap = overflow_capacity//tile (16 at production
sizes) — the driver scan spreads spills over more tiles than that, so
the capture truncates (BENCH r4: forced 4097 -> every down conv takes
the XLA fallback). Candidate exact replacements, timed at production
scale (K=27, n_tiles=600, tile=256 -> 4.2M mask):

  flat    — jnp.nonzero(size=4096) over the tile-major transposed mask
  cumsum  — cumsum of the flat mask (lower bound for any scan approach)
  searchs — per-slot binary search over the cumsum (gather-based)

Usage: python tools/micro_compact.py
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

K, n_tiles, tile = 27, 600, 256
m = 4096
rng = np.random.RandomState(0)
# ~1.4k spills spread over ~200 tiles (the production pattern)
mask_np = np.zeros((K, n_tiles, tile), bool)
tiles = rng.choice(n_tiles, 200, replace=False)
for t in tiles:
    k = rng.randint(0, K, 7)
    s = rng.randint(0, tile, 7)
    mask_np[k, t, s] = True
mask = jnp.asarray(mask_np)
print(f"total spills: {mask_np.sum()} over {len(tiles)} tiles")


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"  {name:28s}: {dt * 1e3:7.2f} ms", flush=True)
    return out


@jax.jit
def flat_tm(mask):
    tm = jnp.transpose(mask, (1, 0, 2))  # (n_tiles, K, tile) tile-major
    (fi,) = jnp.nonzero(tm.reshape(-1), size=m, fill_value=tm.size)
    return fi.astype(jnp.float32)


@jax.jit
def flat_orig(mask):
    (fi,) = jnp.nonzero(mask.reshape(-1), size=m, fill_value=mask.size)
    return fi.astype(jnp.float32)


@jax.jit
def just_cumsum(mask):
    tm = jnp.transpose(mask, (1, 0, 2)).reshape(-1)
    return jnp.cumsum(tm.astype(jnp.int32))[-1].astype(jnp.float32)


@jax.jit
def searchs(mask):
    tm = jnp.transpose(mask, (1, 0, 2)).reshape(-1)
    c = jnp.cumsum(tm.astype(jnp.int32))
    q = jnp.arange(1, m + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(c, q, side="left")
    return idx.astype(jnp.float32)


@jax.jit
def capture16(mask):
    tcap = 16
    tile_any = jnp.any(mask, axis=(0, 2))
    (tidx,) = jnp.nonzero(tile_any, size=tcap, fill_value=n_tiles)
    tsafe = jnp.minimum(tidx, n_tiles - 1)
    sub = jnp.transpose(mask[:, tsafe, :], (1, 0, 2)) & (
        tidx < n_tiles)[:, None, None]
    (fi,) = jnp.nonzero(sub.reshape(-1), size=m, fill_value=sub.size)
    return fi.astype(jnp.float32)


timeit("capture tcap=16 (status quo)", capture16, mask)
timeit("flat nonzero, tile-major", flat_tm, mask)
timeit("flat nonzero, orig layout", flat_orig, mask)
timeit("cumsum only", just_cumsum, mask)
timeit("cumsum + searchsorted", searchs, mask)

# correctness cross-check on CPU-sized slice
a = np.asarray(flat_tm(mask))
b = np.flatnonzero(np.transpose(mask_np, (1, 0, 2)).reshape(-1))
ok = np.array_equal(a[: len(b)].astype(np.int64), b)
print(f"flat_tm matches numpy flatnonzero: {ok}")
