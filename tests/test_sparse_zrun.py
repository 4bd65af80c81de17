"""Parity tests: z-run Pallas sparse-conv apply vs ops/sparse_conv.

Runs in interpret mode on the CPU test backend. Inputs are
bf16-representable so the bf16 MXU path is exact and comparisons can be
tight. Covers every z-run pattern, including the 4th-block case
(z-1 and z+1 present, z absent) and negative virtual anchors.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.ops import sparse_conv_pallas as scp
from focalformer3d_tpu.ops import sparse_conv_zrun as scz


def _bf16_vals(rng, shape, scale=1.0):
    v = rng.randint(-8, 9, size=shape).astype(np.float32) * scale
    return jnp.asarray(v)


def _voxel_set(rng, shape, n, capacity):
    D, H, W = shape
    keys = rng.choice(D * H * W, size=n, replace=False)
    z, yx = keys // (H * W), keys % (H * W)
    coords = np.stack([z, yx // W, yx % W], -1).astype(np.int32)
    coords = np.pad(coords, ((0, capacity - n), (0, 0)))
    valid = np.arange(capacity) < n
    return jnp.asarray(coords), jnp.asarray(valid)


def _csr_setup(rng, shape=(8, 16, 16), n=60, capacity=96, cin=8,
               coords=None, valid=None):
    if coords is None:
        coords, valid = _voxel_set(rng, shape, n, capacity)
    feats = _bf16_vals(rng, (coords.shape[0], cin), 0.25)
    feats = jnp.where(valid[:, None], feats, 0.0)
    table0 = sc.build_table(coords, valid, shape)
    coords, valid, feats = sc.csr_reorder(table0, feats)
    table = sc.build_table(coords, valid, shape)
    return table, coords, valid, feats, shape


def _zrun_subm(table, coords, valid, feats, shape, w, window=128,
               overflow_cap=64, tile=16):
    V = coords.shape[0]
    zplan = scz.build_zplan(
        table, shape, coords, valid, 3, 1, (1, 1, 1), tile=tile,
        window=window, overflow_capacity=overflow_cap,
    )
    rules = sc.build_subm_rules(table, shape, 3, use_positions=True)
    plan = scp.build_tile_plan(rules, V, 3, tile=tile, window=window,
                               overflow_capacity=4096)
    return zplan, plan, rules


@pytest.mark.parametrize("window,overflow_cap", [(128, 64), (64, 4096)])
def test_zrun_subm_parity(window, overflow_cap):
    rng = np.random.RandomState(0)
    table, coords, valid, feats, shape = _csr_setup(rng)
    V = coords.shape[0]
    w = _bf16_vals(rng, (27, feats.shape[1], 12), 1 / 16)
    zplan, plan, rules = _zrun_subm(
        table, coords, valid, feats, shape, w, window, overflow_cap
    )
    assert int(zplan.n_overflow) <= overflow_cap
    ref = sc.apply_conv(feats, rules, w, valid)
    out = scz.apply_conv_zrun(
        feats, zplan, plan, plan, w, valid, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_zrun_all_patterns():
    """Hand-built columns exercising every (z-1, z, z+1) presence
    pattern, including the 4th-block (1,0,1) case and negative virtual
    anchors (a site whose column starts the table)."""
    shape = (8, 4, 4)
    cols = [
        (0, 0, [0, 1, 2]),     # all present
        (0, 1, [3, 4]),        # (1,1,0) at z=4
        (0, 2, [2, 4]),        # (1,0,1) at z=3: 4th block
        (0, 3, [5]),           # isolated
        (1, 0, [0]),           # z=0: z-1 out of range, anchor = pos-1
        (1, 1, [0, 2, 4, 6]),  # alternating: (1,0,1) everywhere
        (1, 2, [6, 7]),        # top edge
        (2, 0, [1, 2, 3, 4, 5]),  # dense run
    ]
    pts = [(z, y, x) for (y, x, zs) in cols for z in zs]
    n = len(pts)
    capacity = 32
    coords = np.zeros((capacity, 3), np.int32)
    coords[:n] = np.asarray(pts, np.int32)
    valid = np.arange(capacity) < n
    rng = np.random.RandomState(3)
    table, coords, valid, feats, shape = _csr_setup(
        rng, shape, cin=8,
        coords=jnp.asarray(coords), valid=jnp.asarray(valid),
    )
    w = _bf16_vals(rng, (27, 8, 12), 1 / 16)
    zplan, plan, rules = _zrun_subm(
        table, coords, valid, feats, shape, w, window=64,
        overflow_cap=64, tile=8,
    )
    ref = sc.apply_conv(feats, rules, w, valid)
    out = scz.apply_conv_zrun(
        feats, zplan, plan, plan, w, valid, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("ks,stride,pad", [
    (3, 2, (1, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
])
def test_zrun_down_parity(ks, stride, pad):
    rng = np.random.RandomState(2)
    table, coords, valid, feats, shape = _csr_setup(rng)
    V = coords.shape[0]
    cap_out = 64
    out_coords, out_valid, out_shape, _, _ = sc.build_downsample(
        coords, valid, shape, ks, stride, pad, cap_out
    )
    rules = sc.build_conv_rules(
        table, shape, out_coords, out_valid, ks, stride, pad,
        use_positions=True,
    )
    K = rules.shape[0]
    w = _bf16_vals(rng, (K, feats.shape[1], 12), 1 / 16)
    ref = sc.apply_conv(feats, rules, w, out_valid)

    zplan = scz.build_zplan(
        table, shape, out_coords, out_valid, ks, stride, pad, tile=16,
        window=64, overflow_capacity=4096,
    )
    plan = scp.build_tile_plan(rules, V, ks, tile=16, window=64,
                               overflow_capacity=4096)
    rules_t = scp.transpose_rules(rules, V, ks)
    plan_t = scp.build_tile_plan(rules_t, cap_out, ks, tile=16, window=64,
                                 overflow_capacity=4096)
    out = scz.apply_conv_zrun(
        feats, zplan, plan, plan_t, w, out_valid, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_zrun_grads():
    rng = np.random.RandomState(1)
    table, coords, valid, feats, shape = _csr_setup(rng)
    V = coords.shape[0]
    rules = sc.build_subm_rules(table, shape, 3, use_positions=True)
    w = _bf16_vals(rng, (27, feats.shape[1], 12), 1 / 16)
    r = _bf16_vals(rng, (V, 12), 0.5)

    zplan = scz.build_zplan(
        table, shape, coords, valid, 3, 1, (1, 1, 1), tile=16,
        window=64, overflow_capacity=4096,
    )
    plan = scp.build_tile_plan(rules, V, 3, tile=16, window=64,
                               overflow_capacity=4096)

    def loss_ref(f, ww):
        return jnp.sum(sc.apply_conv(f, rules, ww, valid) * r)

    def loss_z(f, ww):
        return jnp.sum(
            scz.apply_conv_zrun(f, zplan, plan, plan, ww, valid,
                                interpret=True) * r
        )

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    gx_z, gw_z = jax.grad(loss_z, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gx_z), np.asarray(gx_r),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_z), np.asarray(gw_r),
                               atol=1e-4)


def test_zrun_batched():
    rng = np.random.RandomState(4)
    shape = (8, 16, 16)
    tables, featss, valids, rules_all = [], [], [], []
    for b in range(2):
        table, coords, valid, feats, _ = _csr_setup(
            rng, shape, n=40 + 15 * b
        )
        tables.append(table)
        featss.append(feats)
        valids.append(valid)
        rules_all.append(
            sc.build_subm_rules(table, shape, 3, use_positions=True)
        )
    V = featss[0].shape[0]
    w = _bf16_vals(rng, (27, featss[0].shape[1], 12), 1 / 16)

    zplans, plans = [], []
    for table in tables:
        zplans.append(scz.build_zplan(
            table, shape, table.coords, table.valid, 3, 1, (1, 1, 1),
            tile=16, window=64, overflow_capacity=4096,
        ))
        rules = sc.build_subm_rules(table, shape, 3, use_positions=True)
        plans.append(scp.build_tile_plan(
            rules, V, 3, tile=16, window=64, overflow_capacity=4096
        ))
    zb = jax.tree.map(lambda *x: jnp.stack(x), *zplans)
    pb = jax.tree.map(lambda *x: jnp.stack(x), *plans)
    fb = jnp.stack(featss)
    vb = jnp.stack(valids)
    out = scz.apply_conv_zrun_batched(
        fb, zb, pb, pb, w, vb, interpret=True
    )
    for b in range(2):
        ref = sc.apply_conv(featss[b], rules_all[b], w, valids[b])
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref), atol=1e-5
        )


def test_zrun_spill_exact():
    """A window too small for the set forces spills; the tile-grouped
    correction must keep the op exact (n_overflow stays within list
    capacity here)."""
    rng = np.random.RandomState(6)
    table, coords, valid, feats, shape = _csr_setup(rng, n=60)
    w = _bf16_vals(rng, (27, feats.shape[1], 12), 1 / 16)
    zplan, plan, rules = _zrun_subm(
        table, coords, valid, feats, shape, w, window=64,
        overflow_cap=512, tile=8,
    )
    assert int(zplan.n_overflow) > 0  # the point of the test
    assert int(zplan.n_overflow) <= 512
    ref = sc.apply_conv(feats, rules, w, valid)
    out = scz.apply_conv_zrun(
        feats, zplan, plan, plan, w, valid, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
