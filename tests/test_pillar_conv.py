"""Pillar (sparse-BEV / dense-Z) engine: unit + exact-parity tests against
the per-voxel gather-GEMM engine."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from focalformer3d_tpu.ops import pillar_conv as pc
from focalformer3d_tpu.ops import sparse_conv as sc
from focalformer3d_tpu.models.sparse_encoder import SparseEncoder, _w27_to_pillar

SHAPE = (7, 16, 16)  # (Dz, H, W)


def _rand_voxels(rng, v_cap=64, n_active=40, shape=SHAPE, c=5):
    Dz, H, W = shape
    # unique random voxel coords
    keys = rng.choice(Dz * H * W, n_active, replace=False)
    coords = np.zeros((v_cap, 3), np.int32)
    coords[:n_active, 0] = keys // (H * W)
    coords[:n_active, 1] = (keys % (H * W)) // W
    coords[:n_active, 2] = keys % W
    valid = np.zeros(v_cap, bool)
    valid[:n_active] = True
    feats = rng.randn(v_cap, c).astype(np.float32) * valid[:, None]
    return (jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid))


class TestBuildPillars:
    def test_dense_roundtrip(self):
        rng = np.random.RandomState(0)
        feats, coords, valid = _rand_voxels(rng)
        pset, pf, zm = pc.build_pillars(coords, valid, feats, SHAPE, 48)
        dense_p = np.asarray(
            pc.pillars_to_dense_bev(pf, pset, SHAPE[1:])
        )
        table = sc.build_table(coords, valid, SHAPE)
        dense_v = np.asarray(sc.to_dense(feats, coords, valid, SHAPE))
        dense_v = np.transpose(dense_v, (1, 2, 3, 0)).reshape(
            SHAPE[1], SHAPE[2], -1
        )
        np.testing.assert_allclose(dense_p, dense_v, atol=1e-6)
        # zmask count equals active voxels
        assert int(np.asarray(zm).sum()) == int(np.asarray(valid).sum())

    def test_capacity_overflow_drops(self):
        rng = np.random.RandomState(1)
        feats, coords, valid = _rand_voxels(rng, n_active=40)
        pset, pf, zm = pc.build_pillars(coords, valid, feats, SHAPE, 8)
        assert int(np.asarray(pset.valid).sum()) == 8


class TestConvParity:
    def _conv_both(self, rng, z_kernel=(3, 3, 3), stride=1, pad=(1, 1, 1)):
        feats, coords, valid = _rand_voxels(rng)
        w27 = jnp.asarray(
            rng.randn(27, feats.shape[1], 6).astype(np.float32)
        )
        # voxel engine
        table = sc.build_table(coords, valid, SHAPE)
        rules = sc.build_subm_rules(table, SHAPE, 3)
        y_v = sc.apply_conv(feats, rules, w27, valid)
        dense_v = np.asarray(sc.to_dense(y_v, coords, valid, SHAPE))
        dense_v = np.transpose(dense_v, (1, 2, 3, 0)).reshape(
            SHAPE[1], SHAPE[2], -1
        )
        # pillar engine
        pset, pf, zm = pc.build_pillars(coords, valid, feats, SHAPE, 48)
        prules = pc.bev_rules(pset, SHAPE[1:])
        y_p = pc.pillar_conv(pf, prules, _w27_to_pillar(w27))
        y_p = jnp.where(zm[..., None], y_p, 0.0)
        dense_p = np.asarray(pc.pillars_to_dense_bev(y_p, pset, SHAPE[1:]))
        return dense_v, dense_p

    def test_subm_conv_exact(self):
        rng = np.random.RandomState(2)
        dense_v, dense_p = self._conv_both(rng)
        np.testing.assert_allclose(dense_p, dense_v, rtol=1e-4, atol=1e-5)

    def test_downsample_active_set_parity(self):
        rng = np.random.RandomState(3)
        feats, coords, valid = _rand_voxels(rng)
        pad = (1, 1, 1)
        oc, ov, out_shape, _, _ = sc.build_downsample(
            coords, valid, SHAPE, 3, 2, pad, 512
        )
        # voxel-engine active set -> dense occupancy
        occ_v = np.zeros(out_shape, bool)
        ocn, ovn = np.asarray(oc), np.asarray(ov)
        occ_v[ocn[ovn, 0], ocn[ovn, 1], ocn[ovn, 2]] = True

        pset, pf, zm = pc.build_pillars(coords, valid, feats, SHAPE, 48)
        out_hw = (out_shape[1], out_shape[2])
        out_set = pc.downsample_bev_set(pset, SHAPE[1:], out_hw, 64, 2, 1)
        rules_d = pc.bev_rules_strided(out_set, pset, SHAPE[1:], 2, 1)
        out_zm = pc.conv_zmask(zm, rules_d, 3, 2, pad[0])
        occ_p = np.zeros(out_shape, bool)
        bc = np.asarray(out_set.bev_coords)
        pv = np.asarray(out_set.valid)
        zmn = np.asarray(out_zm)
        for p in range(len(pv)):
            if pv[p]:
                occ_p[:, bc[p, 0], bc[p, 1]] = zmn[p]
        np.testing.assert_array_equal(occ_p, occ_v)

    def test_down_conv_values_parity(self):
        rng = np.random.RandomState(4)
        feats, coords, valid = _rand_voxels(rng)
        pad = (1, 1, 1)
        w27 = jnp.asarray(rng.randn(27, 5, 4).astype(np.float32))
        oc, ov, out_shape, _, _ = sc.build_downsample(
            coords, valid, SHAPE, 3, 2, pad, 512
        )
        table = sc.build_table(coords, valid, SHAPE)
        rules = sc.build_conv_rules(table, SHAPE, oc, ov, 3, 2, pad)
        y_v = sc.apply_conv(feats, rules, w27, ov)
        dense_v = np.asarray(sc.to_dense(y_v, oc, ov, out_shape))
        dense_v = np.transpose(dense_v, (1, 2, 3, 0)).reshape(
            out_shape[1], out_shape[2], -1
        )

        pset, pf, zm = pc.build_pillars(coords, valid, feats, SHAPE, 48)
        out_hw = (out_shape[1], out_shape[2])
        out_set = pc.downsample_bev_set(pset, SHAPE[1:], out_hw, 64, 2, 1)
        rules_d = pc.bev_rules_strided(out_set, pset, SHAPE[1:], 2, 1)
        out_zm = pc.conv_zmask(zm, rules_d, 3, 2, pad[0])
        y_p = pc.pillar_conv(pf, rules_d, _w27_to_pillar(w27), 2, pad[0])
        y_p = jnp.where(out_zm[..., None], y_p, 0.0)
        dense_p = np.asarray(
            pc.pillars_to_dense_bev(y_p, out_set, out_hw)
        )
        np.testing.assert_allclose(dense_p, dense_v, rtol=1e-4, atol=1e-5)


class TestEncoderParity:
    @pytest.mark.slow
    def test_full_encoder_engines_match(self):
        rng = np.random.RandomState(5)
        shape = (25, 64, 64)
        kw = dict(
            sparse_shape=shape,
            output_channels=32,
            encoder_channels=((8, 8, 16), (16, 16, 24), (24, 24, 32),
                              (32, 32)),
            down_paddings=((1, 1, 1), (1, 1, 1), (0, 1, 1)),
            # non-overflowing capacities: active sets must match exactly
            # (the engines drop overflow at different granularities —
            # 3D sites vs BEV columns)
            capacities=(512, 3000, 3000, 3000),
            out_capacity=3000,
        )
        enc_v = SparseEncoder(engine="voxel", **kw)
        enc_p = SparseEncoder(engine="pillar", **kw)

        v_cap, n_active = 512, 300
        Dz, H, W = shape
        keys = rng.choice(Dz * H * W, n_active, replace=False)
        coords = np.zeros((v_cap, 3), np.int32)
        coords[:n_active, 0] = keys // (H * W)
        coords[:n_active, 1] = (keys % (H * W)) // W
        coords[:n_active, 2] = keys % W
        valid = np.zeros(v_cap, bool)
        valid[:n_active] = True
        feats = (rng.randn(v_cap, 5) * valid[:, None]).astype(np.float32)
        args = (
            jnp.asarray(feats)[None], jnp.asarray(coords)[None],
            jnp.asarray(valid)[None],
        )
        vars_v = enc_v.init(jax.random.PRNGKey(0), *args, False)
        out_v = np.asarray(enc_v.apply(vars_v, *args, False))
        out_p = np.asarray(enc_p.apply(vars_v, *args, False))  # same params
        assert out_v.shape == out_p.shape
        # equivalence up to f32 accumulation order: the engines sum the 27
        # taps in different orders, so compare relative to the activation
        # magnitude (unnormalized 13-conv chain -> values are large).
        scale = np.abs(out_v).max()
        assert scale > 0
        np.testing.assert_allclose(
            out_p / scale, out_v / scale, atol=1e-5
        )


class TestDenseTail:
    def _setup(self, rng):
        shape = (25, 64, 64)
        kw = dict(
            sparse_shape=shape,
            output_channels=32,
            encoder_channels=((8, 8, 16), (16, 16, 24), (24, 24, 32),
                              (32, 32)),
            down_paddings=((1, 1, 1), (1, 1, 1), (0, 1, 1)),
            capacities=(512, 3000, 3000, 3000),
            out_capacity=3000,
        )
        v_cap, n_active = 512, 300
        Dz, H, W = shape
        keys = rng.choice(Dz * H * W, n_active, replace=False)
        coords = np.zeros((v_cap, 3), np.int32)
        coords[:n_active, 0] = keys // (H * W)
        coords[:n_active, 1] = (keys % (H * W)) // W
        coords[:n_active, 2] = keys % W
        valid = np.zeros(v_cap, bool)
        valid[:n_active] = True
        feats = (rng.randn(v_cap, 5) * valid[:, None]).astype(np.float32)
        args = (
            jnp.asarray(feats)[None], jnp.asarray(coords)[None],
            jnp.asarray(valid)[None],
        )
        return kw, args

    def test_dense_tail_matches_sparse(self):
        """dense_from=2 (levels 2/3 + conv_out on the dense grid) equals
        the all-sparse voxel engine on the SAME parameters — submanifold
        masking, strided dilation, and conv_out z-collapse included."""
        rng = np.random.RandomState(7)
        kw, args = self._setup(rng)
        enc_s = SparseEncoder(engine="voxel", dense_from=4, **kw)
        variables = enc_s.init(jax.random.PRNGKey(0), *args, False)
        out_s = np.asarray(enc_s.apply(variables, *args, False))
        for start in (1, 2, 3):
            enc_d = SparseEncoder(engine="voxel", dense_from=start, **kw)
            out_d = np.asarray(enc_d.apply(variables, *args, False))
            scale = np.abs(out_s).max()
            np.testing.assert_allclose(
                out_d / scale, out_s / scale, atol=1e-5,
                err_msg=f"dense_from={start}",
            )

    def test_dense_tail_train_step_stats(self):
        """Training mode: masked BN statistics over the dense grid match
        the sparse path's masked stats (active sites only)."""
        rng = np.random.RandomState(8)
        kw, args = self._setup(rng)
        enc_s = SparseEncoder(engine="voxel", dense_from=4, **kw)
        enc_d = SparseEncoder(engine="voxel", dense_from=2, **kw)
        variables = enc_s.init(jax.random.PRNGKey(0), *args, False)
        out_s, mut_s = enc_s.apply(
            variables, *args, True, mutable=["batch_stats"]
        )
        out_d, mut_d = enc_d.apply(
            variables, *args, True, mutable=["batch_stats"]
        )
        scale = float(np.abs(np.asarray(out_s)).max())
        np.testing.assert_allclose(
            np.asarray(out_d) / scale, np.asarray(out_s) / scale, atol=1e-5
        )
        fs = jax.tree_util.tree_leaves_with_path(mut_s["batch_stats"])
        fd = dict(jax.tree_util.tree_leaves_with_path(
            mut_d["batch_stats"]))
        for path, leaf_s in fs:
            leaf_d = fd[path]
            np.testing.assert_allclose(
                np.asarray(leaf_d), np.asarray(leaf_s), rtol=1e-4,
                atol=1e-5, err_msg=str(path),
            )


class TestMxuEngineParity:
    @pytest.mark.slow
    def test_pallas_mxu_engine_matches_voxel(self):
        """engine='pallas_mxu' (MXU-gather plan builder + pallas conv,
        interpret mode on CPU) equals the voxel engine on the SAME
        parameters, bf16-tolerance (the pallas table packs bf16)."""
        rng = np.random.RandomState(6)
        shape = (25, 64, 64)
        kw = dict(
            sparse_shape=shape,
            output_channels=32,
            encoder_channels=((8, 8, 16), (16, 16, 24), (24, 24, 32),
                              (32, 32)),
            down_paddings=((1, 1, 1), (1, 1, 1), (0, 1, 1)),
            capacities=(512, 3000, 3000, 3000),
            out_capacity=3000,
            plan_window=256,
            plan_overflow=4096,
        )
        enc_v = SparseEncoder(engine="voxel", **kw)
        enc_m = SparseEncoder(engine="pallas_mxu", **kw)

        v_cap, n_active = 512, 300
        Dz, H, W = shape
        keys = rng.choice(Dz * H * W, n_active, replace=False)
        coords = np.zeros((v_cap, 3), np.int32)
        coords[:n_active, 0] = keys // (H * W)
        coords[:n_active, 1] = (keys % (H * W)) // W
        coords[:n_active, 2] = keys % W
        valid = np.zeros(v_cap, bool)
        valid[:n_active] = True
        feats = (rng.randn(v_cap, 5) * valid[:, None]).astype(np.float32)
        args = (
            jnp.asarray(feats)[None], jnp.asarray(coords)[None],
            jnp.asarray(valid)[None],
        )
        vars_v = enc_v.init(jax.random.PRNGKey(0), *args, False)
        out_v = np.asarray(enc_v.apply(vars_v, *args, False))
        out_m = np.asarray(enc_m.apply(vars_v, *args, False))
        assert out_v.shape == out_m.shape
        scale = np.abs(out_v).max()
        assert scale > 0
        # bf16 table + bf16 MXU accumulate per conv across a 13-conv chain
        np.testing.assert_allclose(
            out_m / scale, out_v / scale, atol=3e-2
        )


class TestPallasEncoderGrads:
    @pytest.mark.slow
    def test_pallas_engine_grads_match_voxel(self):
        """Gradient parity of the full pallas-engine encoder vs the voxel
        engine (same params): exercises the transposed-plan path — subm
        plans reused as their own transpose, strided plans decoded from
        the OUT meta (sc.transposed_conv_rules) instead of scattered."""
        rng = np.random.RandomState(12)
        shape = (9, 24, 24)
        kw = dict(
            sparse_shape=shape, output_channels=16,
            encoder_channels=((8, 8, 16), (16, 16)),
            down_paddings=((1, 1, 1),),
            capacities=(128, 512), out_capacity=512,
            plan_window=128, plan_overflow=4096,
        )
        enc_v = SparseEncoder(engine="voxel", **kw)
        enc_p = SparseEncoder(engine="pallas", **kw)
        Dz, H, W = shape
        v_cap, n_active = 128, 90
        keys = rng.choice(Dz * H * W, n_active, replace=False)
        coords = np.zeros((v_cap, 3), np.int32)
        coords[:n_active, 0] = keys // (H * W)
        coords[:n_active, 1] = (keys % (H * W)) // W
        coords[:n_active, 2] = keys % W
        valid = np.zeros(v_cap, bool)
        valid[:n_active] = True
        feats = (rng.randn(v_cap, 5) * valid[:, None]).astype(np.float32)
        args = (
            jnp.asarray(feats)[None], jnp.asarray(coords)[None],
            jnp.asarray(valid)[None],
        )
        variables = enc_v.init(jax.random.PRNGKey(0), *args, False)

        def loss(enc):
            def f(params, x):
                out = enc.apply(
                    {**variables, "params": params}, x, *args[1:], False
                )
                return jnp.sum(out * out)
            return f

        gv, gxv = jax.grad(loss(enc_v), argnums=(0, 1))(
            variables["params"], args[0])
        gp, gxp = jax.grad(loss(enc_p), argnums=(0, 1))(
            variables["params"], args[0])
        scale = max(float(jnp.abs(gxv).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(gxp) / scale, np.asarray(gxv) / scale,
            atol=2e-2,
        )
        flat_v = jax.tree_util.tree_leaves_with_path(gv)
        flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
        for path, leaf in flat_v:
            other = flat_p[path]
            s = max(float(jnp.abs(leaf).max()), 1e-6)
            # weight grads accumulate bf16 gather noise through the
            # 7-conv chain + squared loss; op-level dw error is ~0.3%
            # (see test_subm_grads) — 0.1 normalized still catches any
            # structural rulebook/plan_t error (those are O(1) wrong)
            np.testing.assert_allclose(
                np.asarray(other) / s, np.asarray(leaf) / s, atol=1e-1,
                err_msg=str(path),
            )

    @pytest.mark.slow
    def test_pallas_dense_tail_train_grads(self):
        """Regression: engine='pallas' with a dense tail casts activations
        to bf16, whose conv had no valid transpose under train=True
        (cotangent arrived f32 against bf16 operands). Grads must lower,
        be finite, and match the voxel engine."""
        rng = np.random.RandomState(13)
        shape = (9, 24, 24)
        kw = dict(
            sparse_shape=shape, output_channels=16,
            encoder_channels=((8, 8, 16), (16, 16)),
            down_paddings=((1, 1, 1),),
            capacities=(128, 512), out_capacity=512,
            plan_window=128, plan_overflow=4096,
            dense_from=1,
        )
        enc_v = SparseEncoder(engine="voxel", **kw)
        enc_p = SparseEncoder(engine="pallas", **kw)
        Dz, H, W = shape
        v_cap, n_active = 128, 90
        keys = rng.choice(Dz * H * W, n_active, replace=False)
        coords = np.zeros((v_cap, 3), np.int32)
        coords[:n_active, 0] = keys // (H * W)
        coords[:n_active, 1] = (keys % (H * W)) // W
        coords[:n_active, 2] = keys % W
        valid = np.zeros(v_cap, bool)
        valid[:n_active] = True
        feats = (rng.randn(v_cap, 5) * valid[:, None]).astype(np.float32)
        args = (
            jnp.asarray(feats)[None], jnp.asarray(coords)[None],
            jnp.asarray(valid)[None],
        )
        variables = enc_v.init(jax.random.PRNGKey(0), *args, False)

        def loss(enc):
            def f(params):
                out, _ = enc.apply(
                    {**variables, "params": params}, *args, True,
                    mutable=["batch_stats"],
                )
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return f

        gv = jax.grad(loss(enc_v))(variables["params"])
        gp = jax.grad(loss(enc_p))(variables["params"])
        flat_v = jax.tree_util.tree_leaves_with_path(gv)
        flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
        for path, leaf in flat_v:
            other = flat_p[path]
            assert bool(jnp.all(jnp.isfinite(other))), path
            # the engines run at different precisions (pallas bf16 vs
            # voxel f32), so elementwise grads drift ~10% through the
            # deep chain + squared loss; direction must agree tightly
            a = np.asarray(leaf).ravel()
            b = np.asarray(other).ravel()
            denom = np.linalg.norm(a) * np.linalg.norm(b)
            if denom > 1e-8:
                cos = float(np.dot(a, b) / denom)
                assert cos > 0.98, (str(path), cos)
