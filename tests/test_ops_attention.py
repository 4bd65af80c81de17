import numpy as np
import jax.numpy as jnp

from focalformer3d_tpu.ops import bilinear, local_attn, msda


class TestBilinear:
    def test_exact_at_texel_centers(self):
        rng = np.random.RandomState(0)
        feat = rng.randn(5, 7, 3).astype(np.float32)
        xy = jnp.asarray([[2.0, 3.0], [0.0, 0.0], [6.0, 4.0]])
        out = np.asarray(bilinear.bilinear_sample(jnp.asarray(feat), xy))
        np.testing.assert_allclose(out[0], feat[3, 2], atol=1e-6)
        np.testing.assert_allclose(out[1], feat[0, 0], atol=1e-6)
        np.testing.assert_allclose(out[2], feat[4, 6], atol=1e-6)

    def test_midpoint_average(self):
        feat = np.zeros((2, 2, 1), np.float32)
        feat[0, 0, 0], feat[0, 1, 0], feat[1, 0, 0], feat[1, 1, 0] = 1, 2, 3, 4
        out = bilinear.bilinear_sample(jnp.asarray(feat), jnp.asarray([[0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(out)[0, 0], 2.5, atol=1e-6)

    def test_outside_zero(self):
        feat = np.ones((4, 4, 1), np.float32)
        out = bilinear.bilinear_sample(jnp.asarray(feat), jnp.asarray([[-5.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(out)[0, 0], 0.0)

    def test_grid_sample_norm_matches_torch(self):
        import torch
        import torch.nn.functional as F
        rng = np.random.RandomState(1)
        feat = rng.randn(6, 8, 4).astype(np.float32)
        grid = rng.uniform(-1.2, 1.2, (10, 2)).astype(np.float32)
        got = np.asarray(bilinear.grid_sample_norm(jnp.asarray(feat), jnp.asarray(grid)))
        t_feat = torch.from_numpy(feat).permute(2, 0, 1)[None]  # (1,C,H,W)
        t_grid = torch.from_numpy(grid)[None, None]  # (1,1,10,2)
        exp = F.grid_sample(t_feat, t_grid, mode="bilinear",
                            padding_mode="zeros", align_corners=False)
        exp = exp[0, :, 0].T.numpy()  # (10, C)
        np.testing.assert_allclose(got, exp, atol=1e-5)


class TestMSDA:
    def test_uniform_weights_average(self):
        rng = np.random.RandomState(0)
        C, nH = 8, 2
        levels = [jnp.asarray(rng.randn(6, 6, C).astype(np.float32)),
                  jnp.asarray(rng.randn(3, 3, C).astype(np.float32))]
        Q, L, P = 4, 2, 3
        loc = jnp.asarray(rng.uniform(0.2, 0.8, (Q, nH, L, P, 2)).astype(np.float32))
        w = jnp.full((Q, nH, L, P), 1.0 / (L * P), jnp.float32)
        out = np.asarray(msda.msda_sample(levels, loc, w, nH))
        assert out.shape == (Q, C)
        # oracle: manual per-head bilinear
        from focalformer3d_tpu.ops.bilinear import grid_sample_norm
        exp = np.zeros((Q, nH, C // nH), np.float32)
        for lvl in range(L):
            v = np.asarray(levels[lvl]).reshape(*levels[lvl].shape[:2], nH, C // nH)
            for h in range(nH):
                s = np.asarray(grid_sample_norm(
                    jnp.asarray(v[:, :, h]), 2 * loc[:, h, lvl] - 1))
                exp[:, h] += (s * np.asarray(w)[:, h, lvl][..., None]).sum(1)
        np.testing.assert_allclose(out, exp.reshape(Q, C), atol=1e-5)


class TestLocalAttention:
    def test_uniform_key_gives_window_mean(self):
        rng = np.random.RandomState(0)
        H, W, C = 7, 7, 4
        q = np.zeros((H, W, C), np.float32)  # zero query -> uniform weights
        k = rng.randn(H, W, C).astype(np.float32)
        v = rng.randn(H, W, C).astype(np.float32)
        out = np.asarray(local_attn.local_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kernel_size=3))
        # center pixel: mean over the 3x3 window
        exp = v[2:5, 2:5].reshape(9, C).mean(0)
        np.testing.assert_allclose(out[3, 3], exp, atol=1e-5)
        # corner pixel: mean over the 4 valid neighbors
        exp_corner = v[:2, :2].reshape(4, C).mean(0)
        np.testing.assert_allclose(out[0, 0], exp_corner, atol=1e-5)

    def test_peaked_attention_selects_neighbor(self):
        H, W, C = 5, 5, 2
        q = np.zeros((H, W, C), np.float32)
        k = np.zeros((H, W, C), np.float32)
        v = np.zeros((H, W, C), np.float32)
        # make key at (2,3) hugely aligned with query at (2,2)
        q[2, 2] = [10.0, 0.0]
        k[2, 3] = [10.0, 0.0]
        v[2, 3] = [1.0, 7.0]
        out = np.asarray(local_attn.local_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kernel_size=3))
        np.testing.assert_allclose(out[2, 2], [1.0, 7.0], atol=1e-3)
