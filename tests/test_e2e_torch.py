"""Composed full-forward golden test against a plain-torch reference oracle.

The per-module torch oracles in test_convert_torch.py prove each converter
layout transform; this test proves the COMPOSITION: voxel features ->
SparseEncoder -> SECOND/SECONDFPN -> FocalEncoder(mb2) -> FocalDecoder
(reuse_first multistage masking, peak NMS, top-k, RoI pooling, two decoder
rounds) -> get_bboxes, on the Tiny_L topology with a reference-shaped fake
checkpoint loaded through utils.convert on the flax side and consumed
directly by a line-for-line torch re-creation of the reference dataflow on
the other (eval mode, so BN uses running stats and dropout is off).

Reference dataflow mirrored here:
  /root/reference/projects/mmdet3d_plugin/models/dense_heads/focal_decoder.py:522-992
  /root/reference/projects/mmdet3d_plugin/models/necks/focal_encoder.py:55-222
  /root/reference/projects/mmdet3d_plugin/core/bbox/coders/transfusion_bbox_coder.py:54-116
  mmdet3d SparseEncoder (dense-emulated: submanifold = conv3d re-masked to
  the input active set; strided = conv3d masked to the dilated set), SECOND,
  SECONDFPN, torchvision MobileNetV2 InvertedResidual.

Any divergence in masking order, top-k bookkeeping, query_pos updates, RoI
layout, or score composition shows up as a stagewise mismatch here.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from focalformer3d_tpu.configs import get_config
from focalformer3d_tpu.data import synthetic
from focalformer3d_tpu.models import focal_decoder as fd
from focalformer3d_tpu.models.detector import FocalFormer3D, preprocess_points
from focalformer3d_tpu.utils.convert import convert_tree
from focalformer3d_tpu.utils.ref_keys import make_fake_state_dict

torch.set_grad_enabled(False)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


# ---------------------------------------------------------------------------
# torch oracle building blocks (eval mode)
# ---------------------------------------------------------------------------

def bn(x, sd, p, eps):
    """Eval BatchNorm over channel dim 1 for any rank."""
    shape = (1, -1) + (1,) * (x.dim() - 2)
    w, b = sd[p + ".weight"].view(shape), sd[p + ".bias"].view(shape)
    m = sd[p + ".running_mean"].view(shape)
    v = sd[p + ".running_var"].view(shape)
    return (x - m) / torch.sqrt(v + eps) * w + b


def conv3d_spconv(x, sd, key, stride=1, padding=1):
    """spconv weight (kz,ky,kx,I,O) -> torch conv3d."""
    w = sd[key].permute(4, 3, 0, 1, 2)
    return F.conv3d(x, w, stride=stride, padding=padding)


def occ_pool(occ, k, s, p):
    """Strided sparse conv output active set: any-tap-hit."""
    return F.max_pool3d(occ, kernel_size=k, stride=s, padding=p)


class TorchSparseEncoder:
    """mmdet3d SparseEncoder (basicblock variant) dense emulation."""

    def __init__(self, sd, cfg):
        self.sd = sd
        self.cfg = cfg

    def __call__(self, dense, occ):
        # dense (1, C, D, H, W); occ (1, 1, D, H, W) float {0,1}
        sd, cfg = self.sd, self.cfg
        eps = 1e-3
        pe = "pts_middle_encoder"
        x = conv3d_spconv(dense, sd, f"{pe}.conv_input.0.weight")
        x = F.relu(bn(x, sd, f"{pe}.conv_input.1", eps)) * occ
        enc = cfg.encoder_channels
        for s, blocks in enumerate(enc):
            for j in range(len(blocks)):
                p = f"{pe}.encoder_layers.encoder_layer{s + 1}.{j}"
                if j == len(blocks) - 1 and s != len(enc) - 1:
                    pad = tuple(cfg.down_paddings[s])
                    occ2 = occ_pool(occ, 3, 2, pad)
                    x = conv3d_spconv(x, sd, f"{p}.0.weight", 2, pad)
                    x = F.relu(bn(x, sd, f"{p}.1", eps)) * occ2
                    occ = occ2
                else:
                    idn = x
                    y = conv3d_spconv(x, sd, f"{p}.conv1.weight")
                    y = F.relu(bn(y, sd, f"{p}.bn1", eps)) * occ
                    y = conv3d_spconv(y, sd, f"{p}.conv2.weight")
                    y = bn(y, sd, f"{p}.bn2", eps) * occ
                    x = F.relu(y + idn) * occ
        occ2 = occ_pool(occ, (3, 1, 1), (2, 1, 1), 0)
        x = conv3d_spconv(x, sd, f"{pe}.conv_out.0.weight", (2, 1, 1), 0)
        x = F.relu(bn(x, sd, f"{pe}.conv_out.1", eps)) * occ2
        # z-collapse: (1, C, D, H, W) -> (1, C*D, H, W) (mmdet3d .view)
        B, C, D, H, W = x.shape
        return x.reshape(B, C * D, H, W)


def torch_second_fpn(x, sd, cfg):
    eps = 1e-3
    for i, out in enumerate(cfg.second_channels):
        n_convs = cfg.second_layers[i] + 1
        stride = (1, 2)[i] if i < 2 else 2
        for k in range(n_convs):
            j = 3 * k
            w = sd[f"pts_backbone.blocks.{i}.{j}.weight"]
            x = F.conv2d(x, w, stride=stride if k == 0 else 1, padding=1)
            x = F.relu(bn(x, sd, f"pts_backbone.blocks.{i}.{j + 1}", eps))
        if i == 0:
            x0 = x
    ups = []
    for i, (feat, s) in enumerate(zip((x0, x), (1, 2))):
        w = sd[f"pts_neck.deblocks.{i}.0.weight"]
        if s == 1:
            y = F.conv2d(feat, w)
        else:
            y = F.conv_transpose2d(feat, w, stride=s)
        ups.append(F.relu(bn(y, sd, f"pts_neck.deblocks.{i}.1", eps)))
    return torch.cat(ups, dim=1)


def inverted_residual(x, sd, p, expand):
    """torchvision MobileNetV2 InvertedResidual, stride 1, eval."""
    eps = 1e-5
    cin = x.shape[1]
    y = x
    if expand != 1:
        y = F.conv2d(y, sd[f"{p}.conv.0.0.weight"])
        y = F.relu6(bn(y, sd, f"{p}.conv.0.1", eps))
        y = F.conv2d(y, sd[f"{p}.conv.1.0.weight"], padding=1,
                     groups=y.shape[1])
        y = F.relu6(bn(y, sd, f"{p}.conv.1.1", eps))
        y = F.conv2d(y, sd[f"{p}.conv.2.weight"])
        y = bn(y, sd, f"{p}.conv.3", eps)
    else:
        y = F.conv2d(y, sd[f"{p}.conv.0.0.weight"], padding=1,
                     groups=y.shape[1])
        y = F.relu6(bn(y, sd, f"{p}.conv.0.1", eps))
        y = F.conv2d(y, sd[f"{p}.conv.1.weight"])
        y = bn(y, sd, f"{p}.conv.2", eps)
    return x + y if y.shape[1] == cin else y


def convmodule(x, sd, p, stride=1, k=3, act=True):
    """mmcv ConvModule conv(bias auto->no)+BN+ReLU."""
    w = sd[f"{p}.conv.weight"]
    x = F.conv2d(x, w, stride=stride, padding=k // 2)
    x = bn(x, sd, f"{p}.bn", 1e-5)
    return F.relu(x) if act else x


def torch_focal_encoder(pts_feats, sd, cfg):
    """FocalEncoder mb2, iterbev_wo_img, 1 layer, extra_feat (ref
    necks/focal_encoder.py:203-221, layer forward :55-87)."""
    x = F.conv2d(pts_feats, sd["imgpts_neck.shared_conv_pts.weight"],
                 sd["imgpts_neck.shared_conv_pts.bias"], padding=1)
    pts_feat_conv = x
    stage_feats = []
    for i in range(cfg.neck_layers):
        p = f"imgpts_neck.fusion_blocks.{i}"
        p2p = inverted_residual(x, sd, f"{p}.P_IML", 2)
        aug = inverted_residual(
            torch.cat([x, p2p], dim=1), sd, f"{p}.P_out_proj", 1)
        x = inverted_residual(
            torch.cat([aug, x], dim=1), sd, f"{p}.P_integration", 1)
        stage_feats.append(x)
    extra = convmodule(stage_feats[-1], sd, "imgpts_neck.extra_output",
                       act=False)
    return pts_feat_conv, stage_feats, extra


def create_2d_grid(h, w):
    ys, xs = torch.meshgrid(
        torch.linspace(0, h - 1, h), torch.linspace(0, w - 1, w),
        indexing="ij")
    coord = torch.stack([xs + 0.5, ys + 0.5], dim=-1).view(1, h * w, 2)
    return coord


def gen_sineembed(pos):
    """(B, Q, 2) -> (B, Q, 256), cat(pos_y, pos_x) (ref utils.py:40-53)."""
    scale = 2 * math.pi
    dim_t = torch.arange(128, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / 128)
    outs = []
    for d in (1, 0):  # y first
        e = pos[:, :, d] * scale
        pe = e[:, :, None] / dim_t
        pe = torch.stack((pe[:, :, 0::2].sin(), pe[:, :, 1::2].cos()),
                         dim=3).flatten(2)
        outs.append(pe)
    return torch.cat(outs, dim=2)


def mlp2(x, sd, p):
    """DINO MLP(256, h, h, 2): relu between, linear out."""
    x = F.relu(F.linear(x, sd[f"{p}.layers.0.weight"],
                        sd[f"{p}.layers.0.bias"]))
    return F.linear(x, sd[f"{p}.layers.1.weight"], sd[f"{p}.layers.1.bias"])


def torch_msda(query, values, ref_pts, sd, p, nh, npts):
    """(B, Q, E) x [(B, H, W, E)] -> residual MSDA (mmcv semantics)."""
    from tests.test_convert_torch import _torch_msda

    weights = (sd[f"{p}.sampling_offsets.weight"],
               sd[f"{p}.sampling_offsets.bias"],
               sd[f"{p}.attention_weights.weight"],
               sd[f"{p}.attention_weights.bias"],
               sd[f"{p}.value_proj.weight"], sd[f"{p}.value_proj.bias"],
               sd[f"{p}.output_proj.weight"], sd[f"{p}.output_proj.bias"],
               nh, npts)
    return _torch_msda(query, values, ref_pts, weights)


def layer_norm(x, sd, p):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{p}.weight"],
                        sd[f"{p}.bias"])


def torch_decoder_round(query_feat, vals_nhwc, ref_pts, qpe, sd, dcfg, r):
    """DeformableDetrTransformerDecoder: inner layers of
    self_attn -> norm -> cross_attn(MSDA) -> norm -> ffn -> norm."""
    h = dcfg.hidden
    for l in range(dcfg.inner_layers):
        p = f"pts_bbox_head.decoder.{r}.layers.{l}"
        # self-attn: q=k=query+qpe, v=query (batch_first layout)
        qk = (query_feat + qpe).transpose(0, 1)  # (Q, B, E)
        v = query_feat.transpose(0, 1)
        attn, _ = F.multi_head_attention_forward(
            qk, qk, v, h, dcfg.num_heads,
            sd[f"{p}.attentions.0.attn.in_proj_weight"],
            sd[f"{p}.attentions.0.attn.in_proj_bias"],
            None, None, False, 0.0,
            sd[f"{p}.attentions.0.attn.out_proj.weight"],
            sd[f"{p}.attentions.0.attn.out_proj.bias"],
            training=False, need_weights=False)
        query_feat = query_feat + attn.transpose(0, 1)
        query_feat = layer_norm(query_feat, sd, f"{p}.norms.0")
        query_feat = torch_msda(
            query_feat + qpe, vals_nhwc, ref_pts, sd,
            f"{p}.attentions.1", dcfg.num_heads, 4,
        ) - qpe  # _torch_msda returns query+out; identity excludes qpe
        query_feat = layer_norm(query_feat, sd, f"{p}.norms.1")
        y = F.relu(F.linear(query_feat, sd[f"{p}.ffns.0.layers.0.0.weight"],
                            sd[f"{p}.ffns.0.layers.0.0.bias"]))
        y = F.linear(y, sd[f"{p}.ffns.0.layers.1.weight"],
                     sd[f"{p}.ffns.0.layers.1.bias"])
        query_feat = layer_norm(query_feat + y, sd, f"{p}.norms.2")
    return query_feat


def prediction_ffn(x_bcq, sd, p, heads):
    """FFN prediction head: ConvModule(conv1d 64 + BN1d + relu) + conv1d."""
    out = {}
    for head in heads:
        y = F.conv1d(x_bcq, sd[f"{p}.{head}.0.conv.weight"])
        y = F.relu(bn(y, sd, f"{p}.{head}.0.bn", 1e-5))
        out[head] = F.conv1d(y, sd[f"{p}.{head}.1.weight"],
                             sd[f"{p}.{head}.1.bias"])
    return out


def torch_decode_box(qb_bcq, coder):
    """coder-space (B, code, Q) -> std boxes (B, Q, 7|9)."""
    center = qb_bcq[:, 0:2].clone()
    height = qb_bcq[:, 2:3].clone()
    dim = qb_bcq[:, 3:6].clone()
    rot = qb_bcq[:, 6:8]
    vel = qb_bcq[:, 8:] if qb_bcq.shape[1] > 8 else None
    center[:, 0] = (center[:, 0] * coder.out_size_factor * coder.voxel_size[0]
                    + coder.pc_range[0])
    center[:, 1] = (center[:, 1] * coder.out_size_factor * coder.voxel_size[1]
                    + coder.pc_range[1])
    dim = dim.exp()
    height = height - dim[:, 2:3] * 0.5
    yaw = torch.atan2(rot[:, 0:1], rot[:, 1:2])
    parts = [center, height, dim, yaw]
    if vel is not None and vel.shape[1]:
        parts.append(vel)
    return torch.cat(parts, dim=1).permute(0, 2, 1)


class TorchFocalDecoder:
    """Reference FocalDecoder eval forward (focal_decoder.py:522-992)."""

    def __init__(self, sd, dcfg):
        self.sd = sd
        self.cfg = dcfg

    def heatmap_head(self, x, p):
        y = convmodule(x, self.sd, f"{p}.0")
        return F.conv2d(y, self.sd[f"{p}.1.weight"], self.sd[f"{p}.1.bias"],
                        padding=1)

    def __call__(self, lidar_feat, stage_feats, extra):
        sd, cfg = self.sd, self.cfg
        B, C, H, W = lidar_feat.shape
        HW = H * W
        ncls = cfg.num_classes
        P = cfg.num_proposals
        S = cfg.total_stages
        bev_pos = create_2d_grid(H, W)

        dense_heatmap = self.heatmap_head(lidar_feat,
                                          "pts_bbox_head.heatmap_head")
        multistage_feats = list(stage_feats)
        multistage_feats.insert(0, lidar_feat)  # reuse_first_heatmap

        acc_masks = torch.ones(B, ncls * HW)
        q_labels, q_feats, q_poses, q_scores = [], [], [], []
        for i in range(S):
            if i == 0:  # reuse_first
                heat = dense_heatmap.sigmoid()
            else:
                dh_img = self.heatmap_head(
                    multistage_feats[i],
                    f"pts_bbox_head.heatmap_head_img.{i}")
                heat = dh_img.sigmoid()
            heat = heat * acc_masks.view(B, ncls, H, W)

            # peak NMS (valid max-pool leaves borders 0; kernel1 classes
            # keep everything)
            k = cfg.nms_kernel_size
            pad = k // 2
            local_max = torch.zeros_like(heat)
            local_max[:, :, pad:-pad, pad:-pad] = F.max_pool2d(
                heat, kernel_size=k, stride=1, padding=0)
            for c in cfg.kernel1_classes:
                local_max[:, c] = heat[:, c]
            heat = heat * (heat == local_max)
            heat = heat.view(B, ncls, HW)

            top = torch.topk(heat.view(B, -1), k=P, dim=-1).indices
            top_cls = torch.div(top, HW, rounding_mode="floor")
            top_idx = top % HW
            lf = multistage_feats[i].view(B, C, HW)
            qf = lf.gather(
                index=top_idx[:, None, :].expand(-1, C, -1), dim=-1)
            one_hot = F.one_hot(top_cls, num_classes=ncls).permute(
                0, 2, 1).float()
            qf = qf + F.conv1d(one_hot,
                               sd["pts_bbox_head.class_encoding.weight"],
                               sd["pts_bbox_head.class_encoding.bias"])
            qp = bev_pos.expand(B, -1, -1).gather(
                index=top_idx[:, :, None].expand(-1, -1, 2), dim=1)
            qs = heat.gather(
                index=top_idx[:, None, :].expand(-1, ncls, -1), dim=-1)
            q_labels.append(top_cls)
            q_feats.append(qf)
            q_poses.append(qp)
            q_scores.append(qs)

            # poscls masking + kernel dilation
            sel = torch.zeros(B, ncls * HW)
            sel.scatter_(index=top, dim=1, src=torch.ones_like(
                top, dtype=torch.float32))
            sel = sel.view(B, ncls, H, W)
            selk = F.max_pool2d(sel, kernel_size=k, stride=1, padding=pad)
            for c in cfg.kernel1_classes:
                selk[:, c] = sel[:, c]
            acc_masks = acc_masks * (1.0 - selk).view(B, -1)

        query_labels = torch.cat(q_labels, dim=1)
        query_feat = torch.cat(q_feats, dim=2)
        query_pos = torch.cat(q_poses, dim=1)
        query_heatmap_score = torch.cat(q_scores, dim=2)
        Qn = S * P

        # multiscale pyramid off the extra feat
        ms = [extra]
        ms.append(convmodule(ms[-1], sd, "pts_bbox_head.dconv", stride=2))
        ms.append(convmodule(ms[-1], sd, "pts_bbox_head.dconv2", stride=2))
        bev_pos_all = torch.cat([
            bev_pos,
            create_2d_grid(H // 2, W // 2) * 2,
            create_2d_grid(H // 4, W // 4) * 4,
        ], dim=1)

        coder = self.cfg.coder
        query_box = None
        rounds = []
        for r in range(cfg.num_decoder_layers):
            hp = f"pts_bbox_head.pos_embed_learned.{r}"
            norm_wh = torch.tensor([float(W), float(H)])
            ref_pts = query_pos / norm_wh
            qpe = mlp2(gen_sineembed(ref_pts), sd, hp)
            # bevpos: add embedded positions to every level's values
            vals = []
            start = 0
            for v in ms:
                hw = v.shape[2] * v.shape[3]
                bpe = mlp2(
                    gen_sineembed(bev_pos_all[:, start:start + hw] / norm_wh),
                    sd, hp).expand(B, -1, -1)
                vals.append(
                    (v.flatten(2) + bpe.transpose(1, 2)).view(*v.shape))
                start += hw
            vals_nhwc = [v.permute(0, 2, 3, 1) for v in vals]

            if cfg.roi_feats and query_box is not None:
                R = cfg.roi_feats
                std = torch_decode_box(
                    torch.cat([query_box[:, :3],
                               query_box[:, 3:6] * cfg.roi_expand_ratio,
                               query_box[:, 6:]], dim=1), coder)
                std = std.reshape(B * Qn, -1)
                ii = torch.ones(R, R).nonzero().float()  # (RR, 2)
                dims = std[:, 3:5]
                local = ((ii[None] + 0.5) / R * dims[:, None]
                         - dims[:, None] / 2)  # (BQ, RR, 2)
                yaw = std[:, 6]
                cs, sn = torch.cos(yaw), torch.sin(yaw)
                rot = torch.stack([
                    torch.stack([cs, -sn], -1),
                    torch.stack([sn, cs], -1)], -2)  # (BQ, 2, 2)
                gp = torch.einsum("bri,bij->brj", local, rot.transpose(1, 2))
                gp = gp + std[:, None, :2]
                gp = gp.view(B, Qn, R * R, 2)
                pcr = torch.tensor(cfg.pc_range)
                gp = (gp - pcr[:2]) / (pcr[3:5] - pcr[:2]) * 2 - 1
                gp = gp.clip(-2.0, 2.0)
                rois = [F.grid_sample(v, gp, mode="bilinear",
                                      align_corners=False) for v in ms]
                roi = torch.cat(rois, dim=1)  # (B, 3C, Qn, RR)
                roi = roi.permute(0, 2, 1, 3).reshape(B * Qn, -1)
                y = roi
                for li in range(3):
                    y = F.linear(y, sd[f"pts_bbox_head.roi_mlp.{4 * li}.weight"])
                    y = F.relu(bn(y.unsqueeze(-1), sd,
                                  f"pts_bbox_head.roi_mlp.{4 * li + 1}",
                                  1e-5).squeeze(-1))
                query_feat = query_feat + y.view(B, Qn, -1).transpose(1, 2)

            qf_bqc = torch_decoder_round(
                query_feat.transpose(1, 2), vals_nhwc, ref_pts, qpe, sd,
                cfg, r)
            query_feat = qf_bqc.transpose(1, 2)

            heads = ["center", "height", "dim", "rot"]
            if cfg.with_vel:
                heads.append("vel")
            heads.append("heatmap")
            res = prediction_ffn(query_feat, sd,
                                 f"pts_bbox_head.prediction_heads.{r}",
                                 heads)
            res["center"] = res["center"] + query_pos.transpose(1, 2)
            query_pos = res["center"].clone().transpose(1, 2)
            if cfg.roi_based_reg and query_box is not None:
                res["dim"][:, :2] = res["dim"][:, :2] + query_box[:, 3:5]
                res["rot"] = res["rot"] + query_box[:, 6:8]
            qb = [res["center"], res["height"], res["dim"], res["rot"]]
            if cfg.with_vel:
                qb.append(res["vel"])
            query_box = torch.cat(qb, dim=1)
            rounds.append(res)

        return {
            "rounds": rounds,
            "query_labels": query_labels,
            "query_heatmap_score": query_heatmap_score,
        }

    def get_bboxes(self, out):
        cfg = self.cfg
        res = out["rounds"][-1]
        score = res["heatmap"].sigmoid()
        one_hot = F.one_hot(
            out["query_labels"],
            num_classes=cfg.num_classes).permute(0, 2, 1).float()
        score = score * out["query_heatmap_score"] * one_hot
        boxes = torch_decode_box(
            torch.cat([res["center"], res["height"], res["dim"], res["rot"]]
                      + ([res["vel"]] if cfg.with_vel else []), dim=1),
            cfg.coder)
        final_scores, final_labels = score.max(dim=1)
        return boxes, final_scores, final_labels


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    import dataclasses

    cfg = get_config("Tiny_L")["model"]
    # capacities must hold the full dilated active sets: the dense torch
    # emulation never truncates, so truncation in the sparse engine would
    # read as a (spurious) composition mismatch
    cfg = dataclasses.replace(
        cfg, capacities=(512, 4096, 4096, 4096), out_capacity=4096)
    sd = make_fake_state_dict(cfg, seed=3)
    model = FocalFormer3D(cfg)

    rng = np.random.RandomState(11)
    batch = synthetic.make_batch(
        rng, batch_size=1, n_points=3000, n_boxes=6, max_gts=8,
        num_classes=cfg.decoder.num_classes,
        pc_range=cfg.voxel.point_cloud_range,
    )
    vox = preprocess_points(
        cfg, jnp.asarray(batch["points"]), jnp.asarray(batch["points_mask"])
    )
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, vox, None,
                           False)
    )
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables)
    variables, report = convert_tree(variables, sd)
    assert not report.missed and not report.unmapped, report.summary()

    sd_t = {k: _t(v) for k, v in sd.items()}

    # densify the voxel table for the torch oracle
    feats = np.asarray(vox["features"][0])
    coords = np.asarray(vox["coords"][0])
    valid = np.asarray(vox["voxel_mask"][0])
    D, H, W = cfg.sparse_shape
    Cin = feats.shape[-1]
    dense = np.zeros((D, H, W, Cin), np.float32)
    occ = np.zeros((D, H, W), np.float32)
    zyx = coords[valid]
    dense[zyx[:, 0], zyx[:, 1], zyx[:, 2]] = feats[valid]
    occ[zyx[:, 0], zyx[:, 1], zyx[:, 2]] = 1.0
    dense_t = _t(dense).permute(3, 0, 1, 2)[None]
    occ_t = _t(occ)[None, None]

    return dict(cfg=cfg, sd=sd_t, model=model, variables=variables, vox=vox,
                dense=dense_t, occ=occ_t)


def _close(a, b, tol, msg):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (msg, a.shape, b.shape)
    scale = max(np.abs(b).max(), 1e-3)
    np.testing.assert_allclose(a / scale, b / scale, atol=tol, err_msg=msg)


class TestComposedForward:
    def test_sparse_encoder_bev(self, setup):
        """Stage A: SparseEncoder -> BEV (c-major z-collapse)."""
        s = setup
        cfg = s["cfg"]
        from focalformer3d_tpu.models.sparse_encoder import SparseEncoder

        enc = SparseEncoder(
            sparse_shape=cfg.sparse_shape,
            output_channels=cfg.sparse_out_channels,
            encoder_channels=cfg.encoder_channels,
            down_paddings=cfg.down_paddings,
            capacities=cfg.capacities,
            out_capacity=cfg.out_capacity,
            engine="voxel",
        )
        ev = {"params": s["variables"]["params"]["pts_middle_encoder"],
              "batch_stats":
                  s["variables"]["batch_stats"]["pts_middle_encoder"]}
        got = enc.apply(ev, s["vox"]["features"], s["vox"]["coords"],
                        s["vox"]["voxel_mask"], False)[0]  # (H, W, C*Dz)
        ref = TorchSparseEncoder(s["sd"], cfg)(s["dense"], s["occ"])
        ref = ref[0].permute(1, 2, 0).numpy()
        _close(got, ref, 2e-4, "sparse encoder BEV")

    @pytest.mark.slow
    def test_full_model_vs_oracle(self, setup):
        """Stages B-E: SECOND/FPN -> FocalEncoder -> FocalDecoder ->
        get_bboxes, full-composition."""
        s = setup
        cfg = s["cfg"]

        # torch side, stage by stage
        bev_ref = TorchSparseEncoder(s["sd"], cfg)(s["dense"], s["occ"])
        fpn_ref = torch_second_fpn(bev_ref, s["sd"], cfg)
        pfc_ref, stages_ref, extra_ref = torch_focal_encoder(
            fpn_ref, s["sd"], cfg)
        dec = TorchFocalDecoder(s["sd"], cfg.decoder)
        out_ref = dec(pfc_ref, stages_ref, extra_ref)
        boxes_ref, scores_ref, labels_ref = dec.get_bboxes(out_ref)

        # jax full model
        out = s["model"].apply(s["variables"], s["vox"], None, False)
        dec_j = fd.get_bboxes(cfg.decoder, out, 200)

        _close(out["query_labels"],
               out_ref["query_labels"].numpy(), 0, "query labels")
        _close(out["query_heatmap_score"],
               out_ref["query_heatmap_score"].permute(0, 2, 1).numpy(),
               1e-3, "query heatmap score")
        for r in range(cfg.decoder.num_decoder_layers):
            res = out_ref["rounds"][r]
            for k in ("center", "height", "dim", "rot", "vel", "heatmap"):
                if k not in res:
                    continue
                _close(np.asarray(out[k])[:, r],
                       res[k].permute(0, 2, 1).numpy(), 5e-3,
                       f"round {r} head {k}")

        # decoded boxes: compare before the top-200 mask (same ordering)
        _close(dec_j["bboxes"], boxes_ref.numpy(), 5e-3, "decoded boxes")
        _close(dec_j["scores"], scores_ref.numpy(), 5e-3, "decoded scores")
        _close(dec_j["labels"], labels_ref.numpy(), 0, "decoded labels")
