"""Numeric layout-parity of the checkpoint converter against live torch.

Each test builds the torch module the reference uses (plain torch — the
reference's mmcv/mmdet3d wrappers reduce to these), converts its weights with
the utils.convert transforms, loads them into the corresponding flax module,
and compares outputs. This proves the transposes / splits / tap orders are
exactly right, complementing tests/test_convert.py's name-coverage proof."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

from focalformer3d_tpu.models.deformable_decoder import (
    MSDeformAttention, MultiHeadSelfAttention,
)
from focalformer3d_tpu.models.layers import (
    ConvBN, InvertedResidual, PredictionFFN,
)
from focalformer3d_tpu.models.second import SECONDFPN
from focalformer3d_tpu.ops import sparse_conv
from focalformer3d_tpu.utils.convert import (
    t2f_conv, t2f_conv1d, t2f_deconv, t2f_linear, t2f_spconv,
)

TOL = dict(rtol=2e-4, atol=2e-4)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _nchw(x_nhwc):
    return _t(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _nhwc(x_nchw):
    return np.transpose(x_nchw.detach().numpy(), (0, 2, 3, 1))


def _rand_bn_state(rng, c):
    return dict(
        weight=rng.normal(1.0, 0.1, c).astype(np.float32),
        bias=rng.normal(0, 0.1, c).astype(np.float32),
        mean=rng.normal(0, 0.1, c).astype(np.float32),
        var=rng.uniform(0.5, 1.5, c).astype(np.float32),
    )


def _torch_bn(bn_mod, st):
    bn_mod.weight.data = _t(st["weight"])
    bn_mod.bias.data = _t(st["bias"])
    bn_mod.running_mean.data = _t(st["mean"])
    bn_mod.running_var.data = _t(st["var"])


def test_convbn_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.normal(0, 1, (2, 9, 9, 5)).astype(np.float32)
    w = rng.normal(0, 0.2, (8, 5, 3, 3)).astype(np.float32)
    st = _rand_bn_state(rng, 8)

    conv = torch.nn.Conv2d(5, 8, 3, padding=1, bias=False)
    conv.weight.data = _t(w)
    bn = torch.nn.BatchNorm2d(8).eval()
    _torch_bn(bn, st)
    with torch.no_grad():
        ref = _nhwc(torch.relu(bn(conv(_nchw(x)))))

    variables = {
        "params": {"Conv_0": {"kernel": t2f_conv(w)},
                   "BatchNorm_0": {"scale": st["weight"],
                                   "bias": st["bias"]}},
        "batch_stats": {"BatchNorm_0": {"mean": st["mean"],
                                        "var": st["var"]}},
    }
    got = np.asarray(ConvBN(8, 3).apply(variables, jnp.asarray(x),
                                        train=False))
    np.testing.assert_allclose(got, ref, **TOL)


def test_secondfpn_deconv_matches_torch():
    rng = np.random.RandomState(1)
    x0 = rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
    x1 = rng.normal(0, 1, (1, 4, 4, 6)).astype(np.float32)
    wc = rng.normal(0, 0.2, (5, 4, 1, 1)).astype(np.float32)  # conv lvl 0
    wd = rng.normal(0, 0.2, (6, 5, 2, 2)).astype(np.float32)  # deconv (I,O,k,k)
    st0, st1 = _rand_bn_state(rng, 5), _rand_bn_state(rng, 5)

    conv = torch.nn.Conv2d(4, 5, 1, bias=False)
    conv.weight.data = _t(wc)
    dec = torch.nn.ConvTranspose2d(6, 5, 2, stride=2, bias=False)
    dec.weight.data = _t(wd)
    bn0 = torch.nn.BatchNorm2d(5, eps=1e-3).eval()
    bn1 = torch.nn.BatchNorm2d(5, eps=1e-3).eval()
    _torch_bn(bn0, st0)
    _torch_bn(bn1, st1)
    with torch.no_grad():
        r0 = torch.relu(bn0(conv(_nchw(x0))))
        r1 = torch.relu(bn1(dec(_nchw(x1))))
        ref = _nhwc(torch.cat([r0, r1], dim=1))

    variables = {
        "params": {
            "deblock0_conv": {"kernel": t2f_conv(wc)},
            "deblock1_deconv": {"kernel": t2f_deconv(wd)},
            "deblock0_bn": {"scale": st0["weight"], "bias": st0["bias"]},
            "deblock1_bn": {"scale": st1["weight"], "bias": st1["bias"]},
        },
        "batch_stats": {
            "deblock0_bn": {"mean": st0["mean"], "var": st0["var"]},
            "deblock1_bn": {"mean": st1["mean"], "var": st1["var"]},
        },
    }
    got = np.asarray(SECONDFPN((5, 5), (1, 2)).apply(
        variables, [jnp.asarray(x0), jnp.asarray(x1)], train=False))
    np.testing.assert_allclose(got, ref, **TOL)


def test_self_attention_matches_torch_mha():
    rng = np.random.RandomState(2)
    E, nH, B, Q = 32, 4, 2, 7
    x = rng.normal(0, 1, (B, Q, E)).astype(np.float32)
    pos = rng.normal(0, 1, (B, Q, E)).astype(np.float32)

    mha = torch.nn.MultiheadAttention(E, nH, dropout=0.0,
                                      batch_first=True).eval()
    ipw = rng.normal(0, 0.2, (3 * E, E)).astype(np.float32)
    ipb = rng.normal(0, 0.1, (3 * E,)).astype(np.float32)
    opw = rng.normal(0, 0.2, (E, E)).astype(np.float32)
    opb = rng.normal(0, 0.1, (E,)).astype(np.float32)
    mha.in_proj_weight.data = _t(ipw)
    mha.in_proj_bias.data = _t(ipb)
    mha.out_proj.weight.data = _t(opw)
    mha.out_proj.bias.data = _t(opb)
    qk = _t(x + pos)
    with torch.no_grad():
        attn_out, _ = mha(qk, qk, _t(x), need_weights=False)
        ref = (x + attn_out.numpy())  # our module returns query + out

    variables = {"params": {
        "q": {"kernel": t2f_linear(ipw[:E]), "bias": ipb[:E]},
        "k": {"kernel": t2f_linear(ipw[E:2 * E]), "bias": ipb[E:2 * E]},
        "v": {"kernel": t2f_linear(ipw[2 * E:]), "bias": ipb[2 * E:]},
        "out": {"kernel": t2f_linear(opw), "bias": opb},
    }}
    got = np.asarray(MultiHeadSelfAttention(E, nH, dropout=0.0).apply(
        variables, jnp.asarray(x), jnp.asarray(pos), None, False))
    np.testing.assert_allclose(got, ref, **TOL)


def _torch_msda(query, values, ref_pts, weights):
    """Pure-torch multi-scale deformable attention oracle
    (grid_sample align_corners=False, zero padding), mirroring the mmcv
    kernel's definition on (B=1) inputs."""
    w_so, b_so, w_aw, b_aw, w_vp, b_vp, w_op, b_op, nH, P = weights
    B, Q, E = query.shape
    L = len(values)
    Dh = E // nH
    off = torch.nn.functional.linear(query, w_so, b_so).view(
        B, Q, nH, L, P, 2)
    aw = torch.nn.functional.linear(query, w_aw, b_aw).view(
        B, Q, nH, L * P)
    aw = torch.softmax(aw, dim=-1).view(B, Q, nH, L, P)
    out = torch.zeros(B, Q, nH, Dh)
    for lvl, v in enumerate(values):
        Hl, Wl = v.shape[1], v.shape[2]
        vp = torch.nn.functional.linear(v, w_vp, b_vp)  # (B, H, W, E)
        vp = vp.permute(0, 3, 1, 2).reshape(B * nH, Dh, Hl, Wl)
        norm = torch.tensor([Wl, Hl], dtype=torch.float32)
        loc = ref_pts[:, :, None, None, :] + \
            off[:, :, :, lvl] / norm  # (B, Q, nH, P, 2)
        grid = 2 * loc - 1
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * nH, Q, P, 2)
        s = torch.nn.functional.grid_sample(
            vp, grid, mode="bilinear", padding_mode="zeros",
            align_corners=False)  # (B*nH, Dh, Q, P)
        s = s.view(B, nH, Dh, Q, P).permute(0, 3, 1, 4, 2)  # (B,Q,nH,P,Dh)
        out += (s * aw[:, :, :, lvl, :, None]).sum(dim=3)
    out = out.reshape(B, Q, E)
    return query + torch.nn.functional.linear(out, w_op, b_op)


def test_msda_matches_torch_oracle():
    rng = np.random.RandomState(3)
    E, nH, L, P, B, Q = 16, 4, 2, 3, 1, 5
    query = rng.normal(0, 1, (B, Q, E)).astype(np.float32)
    vals = [rng.normal(0, 1, (B, 8 // (1 + l), 10 // (1 + l), E))
            .astype(np.float32) for l in range(L)]
    ref_pts = rng.uniform(0.15, 0.85, (B, Q, 2)).astype(np.float32)

    w_so = rng.normal(0, 0.2, (nH * L * P * 2, E)).astype(np.float32)
    b_so = rng.normal(0, 0.2, (nH * L * P * 2,)).astype(np.float32)
    w_aw = rng.normal(0, 0.2, (nH * L * P, E)).astype(np.float32)
    b_aw = rng.normal(0, 0.1, (nH * L * P,)).astype(np.float32)
    w_vp = rng.normal(0, 0.2, (E, E)).astype(np.float32)
    b_vp = rng.normal(0, 0.1, (E,)).astype(np.float32)
    w_op = rng.normal(0, 0.2, (E, E)).astype(np.float32)
    b_op = rng.normal(0, 0.1, (E,)).astype(np.float32)

    with torch.no_grad():
        ref = _torch_msda(
            _t(query), [_t(v) for v in vals], _t(ref_pts),
            (_t(w_so), _t(b_so), _t(w_aw), _t(b_aw), _t(w_vp), _t(b_vp),
             _t(w_op), _t(b_op), nH, P),
        ).numpy()

    variables = {"params": {
        "sampling_offsets": {"kernel": t2f_linear(w_so), "bias": b_so},
        "attention_weights": {"kernel": t2f_linear(w_aw), "bias": b_aw},
        "value_proj": {"kernel": t2f_linear(w_vp), "bias": b_vp},
        "output_proj": {"kernel": t2f_linear(w_op), "bias": b_op},
    }}
    got = np.asarray(MSDeformAttention(E, nH, L, P, dropout=0.0).apply(
        variables, jnp.asarray(query), [jnp.asarray(v) for v in vals],
        jnp.asarray(ref_pts), None, False))
    np.testing.assert_allclose(got, ref, **TOL)


def test_spconv_weight_layout_matches_torch_conv3d():
    """spconv (kz,ky,kx,I,O) -> repo (K,I,O) tap order: validate a subm conv
    against torch F.conv3d on the dense-ized grid (outputs compared at the
    active sites, submanifold semantics)."""
    rng = np.random.RandomState(4)
    shape, cap, cin, cout = (5, 7, 7), 48, 4, 6
    flat = rng.choice(np.prod(shape), size=25, replace=False)
    D, H, W = shape
    coords = np.stack(
        [flat // (H * W), (flat // W) % H, flat % W], -1).astype(np.int32)
    feats = rng.normal(0, 1, (25, cin)).astype(np.float32)
    coords_p = np.zeros((cap, 3), np.int32)
    coords_p[:25] = coords
    feats_p = np.zeros((cap, cin), np.float32)
    feats_p[:25] = feats
    valid = np.zeros(cap, bool)
    valid[:25] = True
    dense = np.zeros(shape + (cin,), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats

    w_spconv = rng.normal(0, 0.2, (3, 3, 3, cin, cout)).astype(np.float32)
    # torch conv3d weight layout (O, I, kz, ky, kx)
    w_torch = np.transpose(w_spconv, (4, 3, 0, 1, 2))
    with torch.no_grad():
        ref = torch.nn.functional.conv3d(
            _t(dense[None]).permute(0, 4, 1, 2, 3), _t(w_torch), padding=1
        )[0].permute(1, 2, 3, 0).numpy()

    table = sparse_conv.build_table(
        jnp.asarray(coords_p), jnp.asarray(valid), shape)
    rules = sparse_conv.build_subm_rules(table, shape, 3)
    out = np.asarray(sparse_conv.apply_conv(
        jnp.asarray(feats_p), rules, jnp.asarray(t2f_spconv(w_spconv)),
        jnp.asarray(valid)))
    for v in range(25):
        z, y, x = coords[v]
        np.testing.assert_allclose(out[v], ref[z, y, x], **TOL)


def test_prediction_ffn_matches_torch_conv1d():
    rng = np.random.RandomState(5)
    B, Q, C, hc, out_c = 2, 6, 16, 8, 3
    x = rng.normal(0, 1, (B, Q, C)).astype(np.float32)
    w0 = rng.normal(0, 0.3, (hc, C, 1)).astype(np.float32)
    st = _rand_bn_state(rng, hc)
    w1 = rng.normal(0, 0.3, (out_c, hc, 1)).astype(np.float32)
    b1 = rng.normal(0, 0.1, (out_c,)).astype(np.float32)

    conv0 = torch.nn.Conv1d(C, hc, 1, bias=False)
    conv0.weight.data = _t(w0)
    bn = torch.nn.BatchNorm1d(hc).eval()
    _torch_bn(bn, st)
    conv1 = torch.nn.Conv1d(hc, out_c, 1)
    conv1.weight.data = _t(w1)
    conv1.bias.data = _t(b1)
    with torch.no_grad():
        # torch FFN runs on (B, C, Q)
        t = _t(x).permute(0, 2, 1)
        ref = conv1(torch.relu(bn(conv0(t)))).permute(0, 2, 1).numpy()

    variables = {
        "params": {
            "center_fc0": {"kernel": t2f_conv1d(w0)},
            "center_bn0": {"scale": st["weight"], "bias": st["bias"]},
            "center_out": {"kernel": t2f_conv1d(w1), "bias": b1},
        },
        "batch_stats": {"center_bn0": {"mean": st["mean"],
                                       "var": st["var"]}},
    }
    got = PredictionFFN({"center": (out_c, 2)}, head_conv=hc).apply(
        variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got["center"]), ref, **TOL)


def test_inverted_residual_matches_torchvision_layout():
    rng = np.random.RandomState(6)
    c = 8
    x = rng.normal(0, 1, (1, 6, 6, c)).astype(np.float32)

    # torchvision InvertedResidual(c, c, stride=1, expand_ratio=2) replica
    hidden = 2 * c
    conv_e = torch.nn.Conv2d(c, hidden, 1, bias=False)
    bn_e = torch.nn.BatchNorm2d(hidden).eval()
    conv_d = torch.nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden,
                             bias=False)
    bn_d = torch.nn.BatchNorm2d(hidden).eval()
    conv_p = torch.nn.Conv2d(hidden, c, 1, bias=False)
    bn_p = torch.nn.BatchNorm2d(c).eval()
    we = rng.normal(0, 0.3, (hidden, c, 1, 1)).astype(np.float32)
    wd = rng.normal(0, 0.3, (hidden, 1, 3, 3)).astype(np.float32)
    wp = rng.normal(0, 0.3, (c, hidden, 1, 1)).astype(np.float32)
    ste, std, stp = (_rand_bn_state(rng, hidden), _rand_bn_state(rng, hidden),
                     _rand_bn_state(rng, c))
    conv_e.weight.data = _t(we)
    conv_d.weight.data = _t(wd)
    conv_p.weight.data = _t(wp)
    _torch_bn(bn_e, ste)
    _torch_bn(bn_d, std)
    _torch_bn(bn_p, stp)
    relu6 = torch.nn.ReLU6()
    with torch.no_grad():
        t = _nchw(x)
        y = relu6(bn_e(conv_e(t)))
        y = relu6(bn_d(conv_d(y)))
        y = bn_p(conv_p(y))
        ref = _nhwc(t + y)

    variables = {
        "params": {
            "Conv_0": {"kernel": t2f_conv(we)},
            "BatchNorm_0": {"scale": ste["weight"], "bias": ste["bias"]},
            "Conv_1": {"kernel": t2f_conv(wd)},
            "BatchNorm_1": {"scale": std["weight"], "bias": std["bias"]},
            "Conv_2": {"kernel": t2f_conv(wp)},
            "BatchNorm_2": {"scale": stp["weight"], "bias": stp["bias"]},
        },
        "batch_stats": {
            "BatchNorm_0": {"mean": ste["mean"], "var": ste["var"]},
            "BatchNorm_1": {"mean": std["mean"], "var": std["var"]},
            "BatchNorm_2": {"mean": stp["mean"], "var": stp["var"]},
        },
    }
    got = np.asarray(InvertedResidual(c, 2).apply(
        variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, **TOL)


def test_hardvfe_matches_mmdet3d_semantics():
    """HardVFE (Waymo config: extras off, feat_channels=[64]) vs a torch
    re-creation of mmdet3d's VFELayer, including the padded-slot quirk:
    padded point slots are zeroed only at the INPUT, so after
    Linear(no bias)+BN(eval)+ReLU they carry relu(BN(0)) and participate
    in the per-voxel max (mmdet3d VFELayer applies no re-mask)."""
    from focalformer3d_tpu.models.vfe import HardVFE

    rng = np.random.RandomState(9)
    V, P, D, C = 12, 6, 5, 16
    voxels = rng.normal(0, 1, (1, V, P, D)).astype(np.float32)
    num_points = rng.randint(1, P + 1, (1, V)).astype(np.int32)
    num_points[0, -2:] = 0  # empty voxel slots
    slot = np.arange(P)[None, None, :]
    voxels = voxels * (slot < num_points[..., None])[..., None]
    coords = rng.randint(0, 10, (1, V, 3)).astype(np.int32)

    w = rng.normal(0, 0.3, (C, D)).astype(np.float32)
    st = _rand_bn_state(rng, C)

    with torch.no_grad():
        x = torch.nn.functional.linear(_t(voxels[0]), _t(w))  # (V, P, C)
        bn = torch.nn.BatchNorm1d(C, eps=1e-3).eval()
        _torch_bn(bn, st)
        x = bn(x.permute(0, 2, 1)).permute(0, 2, 1)
        x = torch.relu(x)
        ref = x.max(dim=1).values.numpy()  # (V, C) padded slots included
        ref = ref * (num_points[0, :, None] > 0)

    variables = {
        "params": {
            "vfe_fc0": {"kernel": t2f_linear(w)},
            "vfe_bn0": {"scale": st["weight"], "bias": st["bias"]},
        },
        "batch_stats": {
            "vfe_bn0": {"mean": st["mean"], "var": st["var"]},
        },
    }
    got = np.asarray(HardVFE(feat_channels=(C,)).apply(
        variables, jnp.asarray(voxels), jnp.asarray(num_points),
        jnp.asarray(coords), False))[0]
    np.testing.assert_allclose(got, ref, **TOL)
