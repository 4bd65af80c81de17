"""Parity tests: MXU plan builder vs the XLA rulebook/tile-plan path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from focalformer3d_tpu.ops import plan_builder as pb
from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.ops import sparse_conv_pallas as scp


def make_set(rng, D, H, W, n, cap):
    """Random CSR-ordered voxel set (coords (cap,3), valid (cap,))."""
    keys = rng.choice(D * H * W, size=n, replace=False)
    keys = np.sort(keys)  # (y*W+x)*D + z CSR order
    z = keys % D
    c = keys // D
    y = c // W
    x = c % W
    coords = np.zeros((cap, 3), np.int32)
    coords[:n] = np.stack([z, y, x], -1)
    valid = np.zeros((cap,), bool)
    valid[:n] = True
    return jnp.asarray(coords), jnp.asarray(valid)


GEOMS = [
    # (D, H, W, n, cap, kernel, stride, padding, dense)
    (13, 32, 32, 300, 384, 3, 1, (1, 1, 1), False),
    (13, 32, 32, 300, 384, 3, 2, (1, 1, 1), False),
    (25, 16, 16, 900, 1024, 3, 1, (1, 1, 1), True),  # dense columns
    (13, 48, 48, 120, 256, 3, 1, (1, 1, 1), False),  # sparse: window misses
    (13, 32, 32, 300, 384, (3, 1, 1), (2, 1, 1), 0, False),  # conv_out
]


@pytest.mark.parametrize("geom", [
    g if i < 2 else pytest.param(g, marks=pytest.mark.slow)
    for i, g in enumerate(GEOMS)
])
def test_plan_mxu_conv_parity(geom):
    """apply_conv_pallas output is identical under the MXU-built plan and
    the reference XLA-built plan (same features/weights), for submanifold,
    strided, and z-collapse geometries."""
    D, H, W, n, cap, ks, st, pad, dense = geom
    import zlib
    rng = np.random.RandomState(zlib.adler32(str(geom).encode()) % 2**31)
    shape = (D, H, W)
    coords, valid = make_set(rng, D, H, W, n, cap)
    table = sc.build_table_csr(coords, valid, shape)

    kst = (ks, ks, ks) if isinstance(ks, int) else ks
    stt = (st, st, st) if isinstance(st, int) else st
    if stt == (1, 1, 1):
        out_coords, out_valid, out_w = coords, valid, W
        out_cap = cap
    else:
        out_cap = cap
        out_coords, out_valid, _os, _ov, _om = sc.build_downsample(
            coords, valid, shape, ks, st, pad, out_cap
        )
        out_w = sc.conv_out_shape(shape, ks, st, pad)[2]

    rules = sc.build_conv_rules(
        table, shape, out_coords, out_valid, ks, st, pad,
        use_positions=True,
    )
    window = min(256, scp._padded_rows(cap))
    plan_ref = scp.build_tile_plan(rules, cap, ks, 64, window, 8192)

    colz = pb.colz_from_coords(out_coords, out_valid, out_w)
    plan_mxu = pb.build_plan_mxu(
        table.meta, colz, cap, ks, st, pad, shape, out_w,
        tile=64, window=window, overflow_capacity=8192,
    )

    K = rules.shape[0]
    cin = 8
    cout = 16
    feats = jnp.asarray(
        rng.normal(0, 1, (cap, cin)).astype(np.float32)
    ) * valid[:, None]
    w = jnp.asarray(rng.normal(0, 0.3, (K, cin, cout)).astype(np.float32))

    # transposed plan (backward) — shared, only forward plans differ
    rules_t = scp.transpose_rules(rules, cap, ks)
    win_t = min(256, scp._padded_rows(out_cap))
    plan_t = scp.build_tile_plan(rules_t, out_cap, ks, 64, win_t, 8192)

    y_ref = scp.apply_conv_pallas(
        feats, plan_ref, plan_t, w, out_valid, kernel_size=ks,
    )
    y_mxu = scp.apply_conv_pallas(
        feats, plan_mxu, plan_t, w, out_valid, kernel_size=ks,
    )
    np.testing.assert_allclose(
        np.asarray(y_mxu), np.asarray(y_ref), rtol=2e-2, atol=2e-2
    )
    # the plans must resolve every rule: same live-rule count
    nref = int(jnp.sum(rules < cap))
    live = int(jnp.sum(plan_mxu.rel < plan_mxu.window)) + int(
        jnp.sum(plan_mxu.ov_pos < cap))
    assert live == nref, (live, nref)


@pytest.mark.parametrize("geom", GEOMS[:3])
def test_decode_rules_matches(geom):
    D, H, W, n, cap, ks, st, pad, dense = geom
    rng = np.random.RandomState(0)
    shape = (D, H, W)
    coords, valid = make_set(rng, D, H, W, n, cap)
    table = sc.build_table_csr(coords, valid, shape)
    stt = (st, st, st) if isinstance(st, int) else st
    if stt == (1, 1, 1):
        out_coords, out_valid, out_w = coords, valid, W
    else:
        out_coords, out_valid = sc.build_downsample(
            coords, valid, shape, ks, st, pad, cap)[:2]
        out_w = sc.conv_out_shape(shape, ks, st, pad)[2]
    rules = sc.build_conv_rules(
        table, shape, out_coords, out_valid, ks, st, pad,
        use_positions=True,
    )
    colz = pb.colz_from_coords(out_coords, out_valid, out_w)
    got = pb.decode_rules(
        None, colz, cap, table.meta, ks, st, pad, shape, out_w
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(rules))


def test_colz_from_meta_matches_coords():
    """Downsample coordinate list derived from meta alone equals the
    scatter-built coordinates of build_downsample (CSR order)."""
    rng = np.random.RandomState(7)
    D, H, W, n, cap = 13, 32, 32, 500, 640
    shape = (D, H, W)
    coords, valid = make_set(rng, D, H, W, n, cap)
    out_cap = 640
    oc, ov, oshape, _ovf, om = sc.build_downsample(
        coords, valid, shape, 3, 2, (1, 1, 1), out_cap
    )
    want = pb.colz_from_coords(oc, ov, oshape[2])
    got = pb.colz_from_meta(om, out_cap)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_colz_from_meta_level0():
    """Also exact on a level-0-style set (identity CSR)."""
    rng = np.random.RandomState(9)
    D, H, W, n, cap = 25, 24, 24, 700, 768
    coords, valid = make_set(rng, D, H, W, n, cap)
    table = sc.build_table_csr(coords, valid, (D, H, W))
    want = pb.colz_from_coords(coords, valid, W)
    got = pb.colz_from_meta(table.meta, cap)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
