"""Parity tests: Pallas windowed sparse-conv apply vs ops/sparse_conv.

Runs in interpret mode on the CPU test backend. Inputs are
bf16-representable so the bf16 MXU path is exact and comparisons can be
tight.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.ops import sparse_conv_pallas as scp


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


def _csr_setup(rng, shape=(8, 16, 16), n=60, capacity=96, cin=8):
    coords, valid = _voxel_set(rng, shape, n, capacity)
    feats = _bf16_vals(rng, (capacity, cin), 0.25)
    feats = jnp.where(valid[:, None], feats, 0.0)
    table0 = sc.build_table(coords, valid, shape)
    coords, valid, feats = sc.csr_reorder(table0, feats)
    table = sc.build_table(coords, valid, shape)
    return table, coords, valid, feats, shape


@pytest.mark.parametrize("window,overflow_cap", [(128, 64), (64, 4096)])
def test_subm_parity(window, overflow_cap):
    rng = np.random.RandomState(0)
    table, coords, valid, feats, shape = _csr_setup(rng)
    V = coords.shape[0]
    rules = sc.build_subm_rules(table, shape, 3, use_positions=True)
    w = _bf16_vals(rng, (27, feats.shape[1], 12), 1 / 16)

    ref = sc.apply_conv(feats, rules, w, valid)

    plan = scp.build_tile_plan(
        rules, V, 3, tile=16, window=window,
        overflow_capacity=overflow_cap,
    )
    assert int(plan.n_overflow) <= overflow_cap
    rules_t = scp.transpose_rules(rules, V, 3)
    plan_t = scp.build_tile_plan(
        rules_t, V, 3, tile=16, window=window,
        overflow_capacity=overflow_cap,
    )
    out = scp.apply_conv_pallas(
        feats, plan, plan_t, w, valid, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("fused", [False, True])
def test_subm_parity_both_variants(fused):
    """v1 (bulk gather+mask+concat) and v2 (per-tap fused dots) must be
    bit-identical to the XLA engine at bf16-exact inputs; the production
    per-pack default (scp._fused_default) picks between them, so both
    branches stay covered regardless of the policy table."""
    rng = np.random.RandomState(11)
    table, coords, valid, feats, shape = _csr_setup(rng)
    V = coords.shape[0]
    rules = sc.build_subm_rules(table, shape, 3, use_positions=True)
    w = _bf16_vals(rng, (27, feats.shape[1], 12), 1 / 16)
    ref = sc.apply_conv(feats, rules, w, valid)
    plan = scp.build_tile_plan(rules, V, 3, tile=16, window=128,
                               overflow_capacity=64)
    out = scp.apply_conv_pallas_batched(
        feats[None], jax.tree.map(lambda a: a[None], plan),
        jax.tree.map(lambda a: a[None], plan), w, valid[None],
        interpret=True, fused_taps=fused,
    )[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_subm_grads():
    rng = np.random.RandomState(1)
    table, coords, valid, feats, shape = _csr_setup(rng)
    V = coords.shape[0]
    rules = sc.build_subm_rules(table, shape, 3, use_positions=True)
    w = _bf16_vals(rng, (27, feats.shape[1], 12), 1 / 16)
    r = _bf16_vals(rng, (V, 12), 0.5)

    plan = scp.build_tile_plan(rules, V, 3, tile=16, window=64,
                               overflow_capacity=4096)
    rules_t = scp.transpose_rules(rules, V, 3)
    plan_t = scp.build_tile_plan(rules_t, V, 3, tile=16, window=64,
                                 overflow_capacity=4096)

    def loss_ref(f, ww):
        return jnp.sum(sc.apply_conv(f, rules, ww, valid) * r)

    def loss_pal(f, ww):
        return jnp.sum(
            scp.apply_conv_pallas(f, plan, plan_t, ww, valid,
                                  interpret=True) * r
        )

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    gx_p, gw_p = jax.grad(loss_pal, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               atol=1e-4)


@pytest.mark.parametrize("ks,stride,pad", [
    (3, 2, (1, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
])
def test_down_parity(ks, stride, pad):
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

    plan = scp.build_tile_plan(rules, V, ks, tile=16, window=64,
                               overflow_capacity=4096)
    rules_t = scp.transpose_rules(rules, V, ks)
    plan_t = scp.build_tile_plan(rules_t, cap_out, ks, tile=16, window=64,
                                 overflow_capacity=4096)
    out = scp.apply_conv_pallas(
        feats, plan, plan_t, w, out_valid, kernel_size=ks, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # grads too
    r = _bf16_vals(rng, (cap_out, 12), 0.5)

    def loss_ref(f, ww):
        return jnp.sum(sc.apply_conv(f, rules, ww, out_valid) * r)

    def loss_pal(f, ww):
        return jnp.sum(
            scp.apply_conv_pallas(f, plan, plan_t, ww, out_valid,
                                  kernel_size=ks, interpret=True) * r
        )

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    gx_p, gw_p = jax.grad(loss_pal, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               atol=1e-4)


def test_transpose_rules_roundtrip():
    rng = np.random.RandomState(3)
    table, coords, valid, feats, shape = _csr_setup(rng)
    V = coords.shape[0]
    rules = np.asarray(sc.build_subm_rules(table, shape, 3,
                                           use_positions=True))
    rt = np.asarray(scp.transpose_rules(jnp.asarray(rules), V, 3))
    # every rule (k, j) -> i appears as (26-k, i) -> j and vice versa
    K, Vo = rules.shape
    fwd = {(k, j, rules[k, j]) for k in range(K) for j in range(Vo)
           if rules[k, j] < V}
    bwd = {(26 - k, rt[k, i], i) for k in range(K) for i in range(V)
           if rt[k, i] < Vo}
    assert fwd == bwd


def test_overflow_spill_exact():
    """Adversarial layout: a dense neighbor band overflows the window and
    must be recovered exactly by the correction path."""
    rng = np.random.RandomState(4)
    D, H, W = 16, 4, 32
    shape = (D, H, W)
    coords = [(0, 0, 0), (0, 0, 31)]
    for x in range(W):
        for z in range(3):
            coords.append((z + 1, 1, x))
    n = len(coords)
    cap = 128
    coords = np.pad(np.asarray(coords, np.int32), ((0, cap - n), (0, 0)))
    valid = np.arange(cap) < n
    coords, valid = jnp.asarray(coords), jnp.asarray(valid)
    feats = _bf16_vals(rng, (cap, 16), 0.25)
    feats = jnp.where(valid[:, None], feats, 0.0)
    table0 = sc.build_table(coords, valid, shape)
    coords, valid, feats = sc.csr_reorder(table0, feats)
    table = sc.build_table(coords, valid, shape)
    rules = sc.build_subm_rules(table, shape, 3, use_positions=True)
    w = _bf16_vals(rng, (27, 16, 8), 1 / 16)
    ref = sc.apply_conv(feats, rules, w, valid)
    plan = scp.build_tile_plan(rules, cap, 3, tile=64, window=64,
                               overflow_capacity=4096)
    assert int(plan.n_overflow) > 0
    rules_t = scp.transpose_rules(rules, cap, 3)
    plan_t = scp.build_tile_plan(rules_t, cap, 3, tile=64, window=64,
                                 overflow_capacity=4096)
    out = scp.apply_conv_pallas(feats, plan, plan_t, w, valid,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_encoder_engine_parity():
    """SparseEncoder(engine='pallas') matches engine='voxel' end-to-end."""
    from focalformer3d_tpu.models.sparse_encoder import SparseEncoder

    rng = np.random.RandomState(7)
    shape = (8, 32, 32)
    caps = (256, 192, 128)
    coords, valid = _voxel_set(rng, shape, 200, caps[0])
    feats = _bf16_vals(rng, (caps[0], 5), 0.25)
    feats = jnp.where(valid[:, None], feats, 0.0)
    kw = dict(
        sparse_shape=shape,
        output_channels=16,
        encoder_channels=((4, 4, 8), (8, 8)),
        down_paddings=((1, 1, 1),),
        capacities=caps[:2],
        out_capacity=caps[2],
        plan_tile=16,
        plan_window=64,
    )
    enc_v = SparseEncoder(engine="voxel", **kw)
    enc_p = SparseEncoder(engine="pallas", **kw)
    key = jax.random.PRNGKey(0)
    fb = feats[None]
    cb = coords[None]
    vb = valid[None]
    vars_v = enc_v.init(key, fb, cb, vb)
    out_v = enc_v.apply(vars_v, fb, cb, vb)
    out_p = enc_p.apply(vars_v, fb, cb, vb)  # same params
    # pallas computes the conv applies in bf16 (MXU); voxel engine is f32
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_v), atol=1e-2
    )


@pytest.mark.parametrize("case", ["subm", "down", "convout"])
def test_build_plan_direct_matches(case):
    """Fused plan construction produces the same conv outputs as
    build_conv_rules + build_tile_plan."""
    rng = np.random.RandomState(11)
    table, coords, valid, feats, shape = _csr_setup(rng)
    V = coords.shape[0]
    if case == "subm":
        ks, stride, pad = 3, 1, (1, 1, 1)
        out_coords, out_valid, cap_out = coords, valid, V
    else:
        ks = (3, 1, 1) if case == "convout" else 3
        stride = (2, 1, 1) if case == "convout" else 2
        pad = (0, 0, 0) if case == "convout" else (1, 1, 1)
        cap_out = 64
        out_coords, out_valid, _, _, _ = sc.build_downsample(
            coords, valid, shape, ks, stride, pad, cap_out
        )
    rules_ref = sc.build_conv_rules(
        table, shape, out_coords, out_valid, ks, stride, pad,
        use_positions=True,
    )
    K = rules_ref.shape[0]
    w = _bf16_vals(rng, (K, feats.shape[1], 12), 1 / 16)
    ref = sc.apply_conv(feats, rules_ref, w, out_valid)

    plan, rules = scp.build_plan_direct(
        table, shape, out_coords, out_valid, ks, stride, pad,
        tile=16, window=64, overflow_capacity=4096, with_rules=True,
    )
    np.testing.assert_array_equal(np.asarray(rules),
                                  np.asarray(rules_ref))
    rules_t = scp.transpose_rules(rules, V, ks)
    plan_t = scp.build_tile_plan(rules_t, cap_out, ks, tile=16, window=64,
                                 overflow_capacity=4096)
    out = scp.apply_conv_pallas(
        feats, plan, plan_t, w, out_valid, kernel_size=ks, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_transposed_conv_rules_matches_scatter_transpose():
    """sc.transposed_conv_rules (meta decode) == transpose_rules (scatter)
    on a strided geometry, and a submanifold rulebook is its own
    transpose — the facts make_plans relies on to skip the K*V-row
    scatter in training-side plan builds."""
    rng = np.random.RandomState(11)
    shape = (9, 20, 22)
    D, H, W = shape
    cap = 256
    keys = np.unique(rng.randint(0, D * H * W, size=400))[:200]
    coords = np.zeros((cap, 3), np.int32)
    coords[:len(keys), 0] = keys % D
    coords[:len(keys), 1] = (keys // D) // W
    coords[:len(keys), 2] = (keys // D) % W
    # CSR order
    lin = (coords[:, 1] * W + coords[:, 2]) * D + coords[:, 0]
    valid = np.arange(cap) < len(keys)
    lin = np.where(valid, lin, 2**31 - 1)
    o = np.argsort(lin)
    coords, valid = jnp.asarray(coords[o]), jnp.asarray(valid[o])
    table = sc.build_table_csr(coords, valid, shape)

    # subm: rules are their own transpose
    rules = sc.build_subm_rules(table, shape, 3, True)
    rt = scp.transpose_rules(rules, cap, 3)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(rules))

    # strided: decode == scatter transpose
    for pad in ((1, 1, 1), (0, 1, 1)):
        out_cap = 256
        oc, ovd, oshape, _, ometa = sc.build_downsample(
            coords, valid, shape, 3, 2, pad, out_cap)
        rules_s = sc.build_conv_rules(
            table, shape, oc, ovd, 3, 2, pad, use_positions=True)
        rt_ref = scp.transpose_rules(rules_s, cap, 3)
        rt_dec = sc.transposed_conv_rules(
            ometa, oshape, coords, valid, out_cap, 3, 2, pad)
        np.testing.assert_array_equal(
            np.asarray(rt_dec), np.asarray(rt_ref), err_msg=str(pad))

    # conv_out geometry k(3,1,1) s(2,1,1) p0
    oc, ovd, oshape, _, ometa = sc.build_downsample(
        coords, valid, shape, (3, 1, 1), (2, 1, 1), 0, 256)
    rules_o = sc.build_conv_rules(
        table, shape, oc, ovd, (3, 1, 1), (2, 1, 1), 0,
        use_positions=True)
    rt_ref = scp.transpose_rules(rules_o, cap, (3, 1, 1))
    rt_dec = sc.transposed_conv_rules(
        ometa, oshape, coords, valid, 256, (3, 1, 1), (2, 1, 1), 0)
    np.testing.assert_array_equal(np.asarray(rt_dec), np.asarray(rt_ref))


def test_batched_apply_parity():
    """apply_conv_pallas_batched over a (B, n_tiles) grid == per-sample
    XLA gather-GEMM, including samples with different active sets."""
    rng = np.random.RandomState(5)
    B = 3
    feats_b, plans, plans_t, valids, rules_b = [], [], [], [], []
    w = _bf16_vals(rng, (27, 8, 12), 1 / 16)
    for b in range(B):
        table, coords, valid, feats, shape = _csr_setup(
            rng, n=40 + 10 * b)
        V = coords.shape[0]
        rules = sc.build_subm_rules(table, shape, 3, use_positions=True)
        plan = scp.build_tile_plan(rules, V, 3, tile=16, window=64,
                                   overflow_capacity=4096)
        feats_b.append(feats)
        plans.append(plan)
        plans_t.append(plan)
        valids.append(valid)
        rules_b.append(rules)
    fb = jnp.stack(feats_b)
    vb = jnp.stack(valids)
    plan_b = jax.tree.map(lambda *x: jnp.stack(x), *plans)
    out = scp.apply_conv_pallas_batched(
        fb, plan_b, plan_b, w, vb, interpret=True
    )
    for b in range(B):
        ref = sc.apply_conv(feats_b[b], rules_b[b], w, valids[b])
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref), atol=1e-5, err_msg=str(b)
        )


def test_truncation_reroutes_to_exact_xla():
    """When true window spills exceed the overflow-list capacity, the
    encoder's conv wrapper must reroute through the exact XLA path
    instead of silently dropping rules (the r3 driver-bench bug:
    53334 spills vs capacity 4096, outputs silently wrong)."""
    from focalformer3d_tpu.models.sparse_encoder import _batched_pallas_conv

    rng = np.random.RandomState(7)
    table, coords, valid, feats, shape = _csr_setup(
        rng, shape=(8, 24, 24), n=400, capacity=512)
    V = coords.shape[0]
    rules = np.array(
        sc.build_subm_rules(table, shape, 3, use_positions=True))
    # doctor the rulebook with far-away positions (a rulebook is just a
    # (tap, site) -> position map; the conv doesn't care about geometry):
    # guarantees window spills well past the tiny overflow capacity.
    # Redirect into OTHER live rows (padding rows are zero and would
    # contribute nothing, masking the truncation).
    live = np.argwhere(rules[13] < 400)[:, 0]
    rules[13, live[:30]] = (rules[13, live[:30]] + 211) % 400
    rules = jnp.asarray(rules)
    w = _bf16_vals(rng, (27, feats.shape[1], 12), 1 / 16)
    # pathological plan: tiny window + tiny overflow list -> truncation
    plan = scp.build_tile_plan(rules, V, 3, tile=16, window=64,
                               overflow_capacity=8)
    assert int(plan.n_overflow) > plan.ov_pos.shape[-1]
    ref = sc.apply_conv(feats, rules, w, valid)
    truncated = scp.apply_conv_pallas(
        feats, plan, plan, w, valid, interpret=True
    )
    # sanity: the raw pallas path IS wrong here (rules were dropped)
    assert not np.allclose(np.asarray(truncated), np.asarray(ref))
    plans = (
        jax.tree.map(lambda a: a[None], plan),
        jax.tree.map(lambda a: a[None], plan),
        rules[None],
    )
    out = _batched_pallas_conv(feats[None], plans, w, valid[None])
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref), atol=1e-5
    )


def test_compact_overflow_many_tiles_exact():
    """Spills spread over MORE tiles than capacity//tile are enumerated
    exactly, tile-major (the r4 driver-bench bug: the old two-stage tile
    capture silently required n_spill_tiles <= capacity//tile = 16 and
    force-flagged truncation on real scans spreading ~1.4k spills over
    ~200 tiles, sending every down conv through the XLA fallback)."""
    rng = np.random.RandomState(3)
    K, n_tiles, tile, m = 5, 60, 16, 1024
    mask = np.zeros((K, n_tiles, tile), bool)
    # 15 spills in each of 48 tiles = 720 total; the old capture bound
    # was max(8, 1024 // 16) = 64 tiles -- use a tight m to also check
    # segment-start clipping: starts run past m - _TILE_OV = 512
    for t in range(48):
        mask[rng.randint(0, K, 15), t, rng.randint(0, tile, 15)] = True
    pos3 = rng.randint(0, 500, size=(K, n_tiles, tile)).astype(np.int32)
    ov_pos, ov_out, ov_k, n_ov, seg = scp._compact_overflow(
        jnp.asarray(mask), jnp.asarray(pos3), n_tiles, tile, 999, m
    )
    n = int(mask.sum())
    assert n <= m and int(n_ov) == n  # exact count, no forced flag
    # tile-major oracle
    tm = np.transpose(mask, (1, 0, 2)).reshape(-1)
    flat_idx = np.flatnonzero(tm)
    ti, rest = flat_idx // (K * tile), flat_idx % (K * tile)
    kk, tt = rest // tile, rest % tile
    np.testing.assert_array_equal(np.asarray(ov_out)[:n], ti * tile + tt)
    np.testing.assert_array_equal(np.asarray(ov_k)[:n], kk)
    np.testing.assert_array_equal(np.asarray(ov_pos)[:n], pos3[kk, ti, tt])
    assert np.all(np.asarray(ov_out)[n:] == n_tiles * tile)
    assert np.all(np.asarray(ov_pos)[n:] == 999)
    # every tile's spill rows live inside its kernel scan segment
    segs = np.asarray(seg)
    assert np.all(segs % 8 == 0) and np.all(segs <= m - scp._TILE_OV)
    for i in np.unique(ti):
        rows = np.nonzero(ti == i)[0]
        assert segs[i] <= rows.min()
        assert rows.max() < segs[i] + scp._TILE_OV


def test_tile_ov_budget_configurable():
    """A single-tile spill cluster beyond the default 512-row segment
    budget forces the truncation signal at tile_ov=512 but is accepted
    (exact count) at tile_ov=1024 — the r4 driver-bench L2-subm case:
    878 of 1366 spills on one tile (tools/micro_tilespill.py)."""
    rng = np.random.RandomState(5)
    K, n_tiles, tile, m = 27, 8, 64, 4096
    mask = np.zeros((K, n_tiles, tile), bool)
    # 878 spills on tile 3 (dense cluster), a few elsewhere
    flat = rng.choice(K * tile, size=878, replace=False)
    mask[flat // tile, 3, flat % tile] = True
    mask[0, 0, 1] = True
    mask[2, 6, 5] = True
    pos3 = rng.randint(0, 500, size=(K, n_tiles, tile)).astype(np.int32)
    n = int(mask.sum())

    _, _, _, n_ov512, _ = scp._compact_overflow(
        jnp.asarray(mask), jnp.asarray(pos3), n_tiles, tile, 999, m,
        tile_ov=512,
    )
    assert int(n_ov512) == m + 1  # forced -> checked XLA fallback

    ov_pos, ov_out, ov_k, n_ov, seg = scp._compact_overflow(
        jnp.asarray(mask), jnp.asarray(pos3), n_tiles, tile, 999, m,
        tile_ov=1024,
    )
    assert int(n_ov) == n  # exact, no forced flag
    tm = np.transpose(mask, (1, 0, 2)).reshape(-1)
    flat_idx = np.flatnonzero(tm)
    ti, rest = flat_idx // (K * tile), flat_idx % (K * tile)
    kk, tt = rest // tile, rest % tile
    np.testing.assert_array_equal(np.asarray(ov_out)[:n], ti * tile + tt)
    segs = np.asarray(seg)
    for i in np.unique(ti):
        rows = np.nonzero(ti == i)[0]
        assert segs[i] <= rows.min()
        assert rows.max() < segs[i] + 1024
