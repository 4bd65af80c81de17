"""Torch-checkpoint -> flax parameter-tree conversion (complete mapping).

Counterpart of the reference's checkpoint loading paths
(/root/reference/tools/train.py:268-293 load_from / load_img_from) for the
released mmdet3d checkpoints (/root/reference/README.md:39-44).  Every
parameter-bearing branch of the reference FocalFormer3D family is covered:

  branch                      torch module                     this repo
  ------------------------------------------------------------------------
  pts_middle_encoder          mmdet3d SparseEncoder            models/sparse_encoder.py
  pts_backbone / pts_neck     SECOND / SECONDFPN               models/second.py
  imgpts_neck                 FocalEncoder (+LSS, locatt, mb2) models/focal_encoder.py
  pts_bbox_head               FocalDecoder (heatmap heads,
                              DeformableDetrTransformerDecoder,
                              FFN prediction heads, roi MLP)   models/focal_decoder.py
  img_backbone / img_neck     mmdet ResNet-50 / FPN            models/resnet.py

Layout transforms:
  torch Conv2d weight (O, I, kH, kW)    -> flax HWIO (kH, kW, I, O)
  torch depthwise (O, 1, kH, kW)        -> flax (kH, kW, 1, O)
  torch ConvTranspose2d (I, O, kH, kW)  -> flax (kH, kW, O, I)? no: see t2f_deconv
  torch Linear (O, I) / Conv1d (O, I, 1)-> flax kernel (I, O)
  spconv SubM/SparseConv3d (kz,ky,kx,I,O) -> repo (K, I, O), dz-major taps
      (ops/sparse_conv.py kernel_offsets enumerates dz,dy,dx in the same
       row-major order, so a plain reshape is exact)
  torch BatchNorm {weight,bias,running_mean,running_var}
       -> flax params {scale,bias} + batch_stats {mean,var}
  nn.MultiheadAttention in_proj_weight (3E, E) -> split q/k/v Dense kernels

Buffers with no learned content (num_batches_tracked, bev_pos, frustum,
query_pos) are ignored by design; `IGNORED` documents them.
"""
from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

Target = Tuple[str, Tuple[str, ...], Optional[Callable]]

# torch buffers that carry no learned state (recomputed by this repo)
IGNORED = (
    r".*num_batches_tracked$",
    r"pts_bbox_head\.bev_pos$",
    r"imgpts_neck\.cam_lss\.frustum$",
    r"pts_bbox_head\.query_pos$",
)


def is_ignored(key: str) -> bool:
    return any(re.fullmatch(p, key) for p in IGNORED)


# ---------------------------------------------------------------------------
# layout transforms
# ---------------------------------------------------------------------------

def t2f_conv(w):  # (O, I[/g], kH, kW) -> (kH, kW, I[/g], O)
    return np.transpose(w, (2, 3, 1, 0))


def t2f_deconv(w):
    """torch ConvTranspose2d (I, O, kH, kW) -> flax ConvTranspose HWIO,
    spatially flipped (flax implements transposed conv as a fractionally
    strided convolution)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def t2f_linear(w):  # (O, I) -> (I, O)
    return np.transpose(w)


def t2f_conv1d(w):  # (O, I, 1) -> (I, O); the repo uses Dense for k=1 Conv1d
    return np.transpose(w[..., 0])


def t2f_spconv(w):  # (kz, ky, kx, I, O) -> (K, I, O), dz-major tap order
    return np.reshape(w, (-1, w.shape[-2], w.shape[-1]))


# ---------------------------------------------------------------------------
# mapping construction
# ---------------------------------------------------------------------------

def _bn(prefix: Tuple[str, ...], leaf: str) -> Optional[Target]:
    """Map one torch BatchNorm leaf onto a flax BatchNorm at `prefix`."""
    if leaf == "weight":
        return ("params", prefix + ("scale",), None)
    if leaf == "bias":
        return ("params", prefix + ("bias",), None)
    if leaf == "running_mean":
        return ("batch_stats", prefix + ("mean",), None)
    if leaf == "running_var":
        return ("batch_stats", prefix + ("var",), None)
    return None


def _convbn(m, tkey: str, tprefix: str, fprefix: Tuple[str, ...]) -> bool:
    """mmcv ConvModule / reference ConvBNReLU ('.conv' + '.bn') -> our
    ConvBN (Conv_0 + BatchNorm_0)."""
    g = re.fullmatch(
        rf"{re.escape(tprefix)}\.conv\.(weight|bias)", tkey
    )
    if g:
        leaf = g.group(1)
        m[tkey] = [(
            "params",
            fprefix + ("Conv_0", "kernel" if leaf == "weight" else "bias"),
            t2f_conv if leaf == "weight" else None,
        )]
        return True
    g = re.fullmatch(
        rf"{re.escape(tprefix)}\.bn\.(weight|bias|running_mean|running_var)",
        tkey,
    )
    if g:
        t = _bn(fprefix + ("BatchNorm_0",), g.group(1))
        if t:
            m[tkey] = [t]
        return True
    return False


def _inverted_residual(m, tkey: str, tprefix: str,
                       fprefix: Tuple[str, ...], ndim: int) -> bool:
    """torchvision MobileNetV2 InvertedResidual -> models.layers
    InvertedResidual (auto-named Conv_i / BatchNorm_i in creation order).

    expand_ratio != 1: conv.0.0/conv.0.1 (expand), conv.1.0/conv.1.1
    (depthwise), conv.2/conv.3 (project) -> Conv_0/BN_0, Conv_1/BN_1,
    Conv_2/BN_2.
    expand_ratio == 1: conv.0.0/conv.0.1 (depthwise), conv.1/conv.2
    (project) -> Conv_0/BN_0, Conv_1/BN_1.
    The two cases are distinguished purely by the torch indices present.
    """
    g = re.fullmatch(
        rf"{re.escape(tprefix)}\.conv\.(\d)(?:\.(\d))?\."
        r"(weight|bias|running_mean|running_var)", tkey
    )
    if not g:
        return False
    a = int(g.group(1))
    b = g.group(2)
    leaf = g.group(3)
    if b is not None:  # ConvBNReLU sub-Sequential: conv.a.0=conv, conv.a.1=bn
        idx = a  # expand block a==0, depthwise a==1 (or a==0 when expand==1)
        if int(b) == 0 and leaf == "weight":
            m[tkey] = [("params", fprefix + (f"Conv_{idx}", "kernel"),
                        t2f_conv)]
        else:
            t = _bn(fprefix + (f"BatchNorm_{idx}",), leaf)
            if t:
                m[tkey] = [t]
    else:  # project conv / bn at top level: conv.{n} / conv.{n+1}
        # torch conv.2/conv.3 -> flax idx 2 (expand path);
        # torch conv.1/conv.2 -> flax idx 1 (no-expand path).
        # BN 'weight' and conv 'weight' share key syntax -> resolve by rank.
        if leaf == "weight" and ndim == 4:
            m[tkey] = [("params", fprefix + (f"Conv_{a}", "kernel"),
                        t2f_conv)]
        else:
            t = _bn(fprefix + (f"BatchNorm_{a - 1}",), leaf)
            if t:
                m[tkey] = [t]
    return True


def build_mapping(shapes: Dict[str, Tuple[int, ...]]) -> Dict[
        str, List[Target]]:
    """{torch_key: [(collection, flax_path, transform), ...]} given
    {torch_key: tensor shape}.

    Every target whose path+shape matches is applied; a key whose targets all
    miss is reported by `convert_tree`.  Multi-target entries implement
    splits (MHA in_proj -> q/k/v) and structural ambiguity (SECONDFPN level-0
    conv vs deconv)."""
    m: Dict[str, List[Target]] = {}
    for tk in shapes:
        if is_ignored(tk):
            continue

        # =========== SECOND backbone: blocks.{i}.{j} [Conv,BN,ReLU]* ======
        g = re.fullmatch(
            r"pts_backbone\.blocks\.(\d)\.(\d+)\.(weight|bias|running_mean|"
            r"running_var)", tk)
        if g:
            i, j, leaf = int(g.group(1)), int(g.group(2)), g.group(3)
            conv_idx, rem = divmod(j, 3)
            name = f"block{i}_conv{conv_idx}"
            if rem == 0 and leaf == "weight":
                m[tk] = [("params",
                          ("pts_backbone", name, "Conv_0", "kernel"),
                          t2f_conv)]
            elif rem == 1:
                t = _bn(("pts_backbone", name, "BatchNorm_0"), leaf)
                if t:
                    m[tk] = [t]
            continue

        # =========== SECONDFPN: deblocks.{i}.{0=conv/deconv,1=bn} =========
        g = re.fullmatch(
            r"pts_neck\.deblocks\.(\d)\.(\d)\.(weight|bias|running_mean|"
            r"running_var)", tk)
        if g:
            i, j, leaf = int(g.group(1)), int(g.group(2)), g.group(3)
            if j == 0 and leaf == "weight":
                m[tk] = [
                    ("params", ("pts_neck", f"deblock{i}_conv", "kernel"),
                     t2f_conv),
                    ("params", ("pts_neck", f"deblock{i}_deconv", "kernel"),
                     t2f_deconv),
                ]
            elif j == 1:
                t = _bn(("pts_neck", f"deblock{i}_bn"), leaf)
                if t:
                    m[tk] = [t]
            continue

        # =========== HardVFE voxel encoder (Waymo) =========================
        g = re.fullmatch(
            r"pts_voxel_encoder\.vfe_layers\.(\d)\.(linear\.weight|"
            r"norm\.(?:weight|bias|running_mean|running_var))", tk)
        if g:
            i, rest_v = int(g.group(1)), g.group(2)
            if rest_v == "linear.weight":
                m[tk] = [("params", ("vfe", f"vfe_fc{i}", "kernel"),
                          t2f_linear)]
            else:
                t = _bn(("vfe", f"vfe_bn{i}"), rest_v.split(".")[1])
                if t:
                    m[tk] = [t]
            continue
        # =========== SparseEncoder middle encoder ==========================
        g = re.fullmatch(
            r"pts_middle_encoder\.(conv_input|conv_out)\.(\d)\.(weight|bias|"
            r"running_mean|running_var)", tk)
        if g:
            name, j, leaf = g.group(1), int(g.group(2)), g.group(3)
            if j == 0 and leaf == "weight":
                m[tk] = [("params", ("pts_middle_encoder", name, "w"),
                          t2f_spconv)]
            elif j == 1:
                t = _bn(("pts_middle_encoder", name, "MaskedBatchNorm_0"),
                        leaf)
                if t:
                    m[tk] = [t]
            continue
        # SparseBasicBlock: encoder_layer{s}.{j}.conv{1,2} / .bn{1,2}
        g = re.fullmatch(
            r"pts_middle_encoder\.encoder_layers\.encoder_layer(\d)\.(\d)\."
            r"(conv|bn)(\d)\.(weight|bias|running_mean|running_var)", tk)
        if g:
            s, j = int(g.group(1)) - 1, int(g.group(2))
            kind, n, leaf = g.group(3), int(g.group(4)) - 1, g.group(5)
            base = ("pts_middle_encoder", f"stage{s}_block{j}", f"conv{n}")
            if kind == "conv" and leaf == "weight":
                m[tk] = [("params", base + ("w",), t2f_spconv)]
            elif kind == "bn":
                t = _bn(base + ("MaskedBatchNorm_0",), leaf)
                if t:
                    m[tk] = [t]
            continue
        # stage-tail strided SparseConvModule: encoder_layer{s}.{j}.{0|1}
        g = re.fullmatch(
            r"pts_middle_encoder\.encoder_layers\.encoder_layer(\d)\.(\d)\."
            r"(\d)\.(weight|bias|running_mean|running_var)", tk)
        if g:
            s = int(g.group(1)) - 1
            j, leaf = int(g.group(3)), g.group(4)
            if j == 0 and leaf == "weight":
                m[tk] = [("params", ("pts_middle_encoder", f"down{s}", "w"),
                          t2f_spconv)]
            elif j == 1:
                t = _bn(("pts_middle_encoder", f"down{s}",
                         "MaskedBatchNorm_0"), leaf)
                if t:
                    m[tk] = [t]
            continue

        # =========== ResNet image backbone ================================
        g = re.fullmatch(r"img_backbone\.conv1\.weight", tk)
        if g:
            m[tk] = [("params", ("img_backbone", "conv1", "kernel"),
                      t2f_conv)]
            continue
        g = re.fullmatch(
            r"img_backbone\.bn1\.(weight|bias|running_mean|running_var)", tk)
        if g:
            t = _bn(("img_backbone", "bn1", "BatchNorm_0"), g.group(1))
            if t:
                m[tk] = [t]
            continue
        g = re.fullmatch(
            r"img_backbone\.layer(\d)\.(\d+)\.conv(\d)\.weight", tk)
        if g:
            s, i, n = g.group(1), g.group(2), g.group(3)
            m[tk] = [("params",
                      ("img_backbone", f"layer{s}_{i}", f"conv{n}", "kernel"),
                      t2f_conv)]
            continue
        g = re.fullmatch(
            r"img_backbone\.layer(\d)\.(\d+)\.bn(\d)\.(weight|bias|"
            r"running_mean|running_var)", tk)
        if g:
            s, i, n, leaf = g.group(1), g.group(2), g.group(3), g.group(4)
            t = _bn(("img_backbone", f"layer{s}_{i}", f"bn{n}",
                     "BatchNorm_0"), leaf)
            if t:
                m[tk] = [t]
            continue
        g = re.fullmatch(
            r"img_backbone\.layer(\d)\.(\d+)\.downsample\.(\d)\.(weight|bias|"
            r"running_mean|running_var)", tk)
        if g:
            s, i, j, leaf = g.group(1), g.group(2), int(g.group(3)), g.group(4)
            base = ("img_backbone", f"layer{s}_{i}")
            if j == 0 and leaf == "weight":
                m[tk] = [("params", base + ("ds_conv", "kernel"), t2f_conv)]
            else:
                t = _bn(base + ("ds_bn", "BatchNorm_0"), leaf)
                if t:
                    m[tk] = [t]
            continue

        # =========== FPN image neck =======================================
        g = re.fullmatch(
            r"img_neck\.(lateral_convs|fpn_convs)\.(\d)\.conv\.(weight|bias)",
            tk)
        if g:
            kind, i, leaf = g.group(1), g.group(2), g.group(3)
            name = f"lateral{i}" if kind == "lateral_convs" else \
                f"fpn_conv{i}"
            m[tk] = [("params", ("img_neck", name,
                                 "kernel" if leaf == "weight" else "bias"),
                      t2f_conv if leaf == "weight" else None)]
            continue

        # =========== FocalEncoder fusion neck =============================
        g = re.fullmatch(
            r"imgpts_neck\.(shared_conv_pts|shared_conv_img)\.(weight|bias)",
            tk)
        if g:
            name, leaf = g.group(1), g.group(2)
            m[tk] = [("params", ("imgpts_neck", name,
                                 "kernel" if leaf == "weight" else "bias"),
                      t2f_conv if leaf == "weight" else None)]
            continue
        if _convbn(m, tk, "imgpts_neck.extra_output",
                   ("imgpts_neck", "extra_output")):
            continue
        # --- LSS camera lift-splat ---
        g = re.fullmatch(
            r"imgpts_neck\.cam_lss\.camencode\.depthnet\.(weight|bias)", tk)
        if g:
            leaf = g.group(1)
            m[tk] = [("params",
                      ("imgpts_neck", "cam_lss", "camencode", "depthnet",
                       "kernel" if leaf == "weight" else "bias"),
                      t2f_conv if leaf == "weight" else None)]
            continue
        g = re.fullmatch(
            r"imgpts_neck\.cam_lss\.bevencode\.(\d+)\.(weight|bias|"
            r"running_mean|running_var)", tk)
        if g:
            j, leaf = int(g.group(1)), g.group(2)
            conv_idx, rem = divmod(j, 3)
            base = ("imgpts_neck", "cam_lss", "bevencode")
            if rem == 0 and leaf == "weight":
                m[tk] = [("params", base + (f"conv{conv_idx}", "kernel"),
                          t2f_conv)]
            elif rem == 1:
                t = _bn(base + (f"bn{conv_idx}",), leaf)
                if t:
                    m[tk] = [t]
            continue
        # --- fusion blocks ---
        g = re.match(r"imgpts_neck\.fusion_blocks\.(\d)\.(.+)", tk)
        if g:
            i, rest = g.group(1), g.group(2)
            fb = ("imgpts_neck", f"fusion{i}")
            tb = f"imgpts_neck.fusion_blocks.{i}"
            # mb2 InvertedResidual (P_IML expand=2; out_proj/integration =1)
            handled = False
            for mod in ("P_IML", "P_out_proj", "P_integration"):
                if rest.startswith(f"{mod}.conv."):
                    handled = _inverted_residual(
                        m, tk, f"{tb}.{mod}", fb + (mod,), len(shapes[tk]))
                    break
            if handled:
                continue
            # bevfusion LocalContextAttentionBlock projections
            g2 = re.fullmatch(
                r"P_IML\.(query|key)_project\.(\d)\.(conv|bn)\.(weight|bias|"
                r"running_mean|running_var)", rest)
            if g2:
                qk, j, kind, leaf = (g2.group(1), g2.group(2), g2.group(3),
                                     g2.group(4))
                name = ("q_proj" if qk == "query" else "k_proj") + j
                base = fb + ("P_IML", name)
                if kind == "conv" and leaf == "weight":
                    m[tk] = [("params", base + ("Conv_0", "kernel"),
                              t2f_conv)]
                elif kind == "bn":
                    t = _bn(base + ("BatchNorm_0",), leaf)
                    if t:
                        m[tk] = [t]
                continue
            g2 = re.fullmatch(
                r"P_IML\.value_project\.(conv|bn)\.(weight|bias|running_mean|"
                r"running_var)", rest)
            if g2:
                kind, leaf = g2.group(1), g2.group(2)
                base = fb + ("P_IML", "v_proj")
                if kind == "conv" and leaf == "weight":
                    m[tk] = [("params", base + ("Conv_0", "kernel"),
                              t2f_conv)]
                elif kind == "bn":
                    t = _bn(base + ("BatchNorm_0",), leaf)
                    if t:
                        m[tk] = [t]
                continue
            # bevfusion ConvBNReLU out_proj / integration
            matched = False
            for mod in ("P_out_proj", "P_integration"):
                if _convbn(m, tk, f"{tb}.{mod}", fb + (mod,)):
                    matched = True
                    break
            if matched:
                continue
            # iterimg: Sequential(resnet.BasicBlock)
            g2 = re.fullmatch(
                r"iterimg_conv\.0\.(conv|bn)(\d)\.(weight|bias|running_mean|"
                r"running_var)", rest)
            if g2:
                kind, n, leaf = g2.group(1), int(g2.group(2)) - 1, g2.group(3)
                base = fb + ("iterimg", f"ConvBN_{n}")
                if kind == "conv" and leaf == "weight":
                    m[tk] = [("params", base + ("Conv_0", "kernel"),
                              t2f_conv)]
                else:
                    t = _bn(base + ("BatchNorm_0",), leaf)
                    if t:
                        m[tk] = [t]
                continue
            # I2P block (Proj variants): kdim=vdim=img_channels on a
            # single-head nn.MultiheadAttention, so torch stores separate
            # {q,k,v}_proj_weight plus one fused in_proj_bias instead of
            # in_proj_weight (ref encoder_utils.py:191-193); flax side is
            # four Dense layers (models/i2p.py)
            g2 = re.fullmatch(
                r"I2P_block\.learnedAlign\.(q|k|v)_proj_weight", rest)
            if g2:
                m[tk] = [("params",
                          fb + ("I2P_block", f"{g2.group(1)}_proj",
                                "kernel"), t2f_linear)]
                continue
            if rest == "I2P_block.learnedAlign.in_proj_bias":
                m[tk] = [
                    ("params", fb + ("I2P_block", f"{n}_proj", "bias"),
                     (lambda b, a=a: b[a * (b.shape[0] // 3):
                                       (a + 1) * (b.shape[0] // 3)]))
                    for a, n in enumerate(("q", "k", "v"))
                ]
                continue
            g2 = re.fullmatch(
                r"I2P_block\.learnedAlign\.out_proj\.(weight|bias)", rest)
            if g2:
                leaf = g2.group(1)
                m[tk] = [("params",
                          fb + ("I2P_block", "out_proj",
                                "kernel" if leaf == "weight" else "bias"),
                          t2f_linear if leaf == "weight" else None)]
                continue
            continue

        # =========== FocalDecoder head ====================================
        if tk.startswith("pts_bbox_head."):
            rest = tk[len("pts_bbox_head."):]
            hb = ("pts_bbox_head",)
            # heatmap heads: Sequential[ConvModule, Conv2d]
            g = re.fullmatch(
                r"(heatmap_head|heatmap_head_img\.(\d))\.(\d)\.(?:(conv|bn)"
                r"\.)?(weight|bias|running_mean|running_var)", rest)
            if g:
                base_t, img_i = g.group(1), g.group(2)
                j, kind, leaf = int(g.group(3)), g.group(4), g.group(5)
                name = ("heatmap_head" if img_i is None
                        else f"heatmap_head_img{img_i}")
                if j == 0 and kind == "conv" and leaf == "weight":
                    m[tk] = [("params",
                              hb + (name, "ConvBN_0", "Conv_0", "kernel"),
                              t2f_conv)]
                elif j == 0 and kind == "bn":
                    t = _bn(hb + (name, "ConvBN_0", "BatchNorm_0"), leaf)
                    if t:
                        m[tk] = [t]
                elif j == 1 and kind is None:
                    m[tk] = [("params",
                              hb + (name, "Conv_0",
                                    "kernel" if leaf == "weight" else "bias"),
                              t2f_conv if leaf == "weight" else None)]
                continue
            # class_encoding: Conv1d(num_classes, hidden, 1)
            g = re.fullmatch(r"class_encoding\.(weight|bias)", rest)
            if g:
                leaf = g.group(1)
                m[tk] = [("params", hb + ("class_encoding",
                                          "kernel" if leaf == "weight"
                                          else "bias"),
                          t2f_conv1d if leaf == "weight" else None)]
                continue
            # multiscale downsampling convs
            if _convbn(m, tk, "pts_bbox_head.dconv", hb + ("dconv",)):
                continue
            if _convbn(m, tk, "pts_bbox_head.dconv2", hb + ("dconv2",)):
                continue
            # deformable decoder rounds
            g = re.fullmatch(
                r"decoder\.(\d)\.layers\.(\d)\.(.+)", rest)
            if g:
                d, l, sub = g.group(1), g.group(2), g.group(3)
                lb = hb + (f"decoder{d}", f"layer{l}")
                if sub == "attentions.0.attn.in_proj_weight":
                    m[tk] = [
                        ("params", lb + ("self_attn", n, "kernel"),
                         (lambda w, a=a: np.transpose(
                             w[a * (w.shape[1]):(a + 1) * w.shape[1]])))
                        for a, n in enumerate(("q", "k", "v"))
                    ]
                elif sub == "attentions.0.attn.in_proj_bias":
                    m[tk] = [
                        ("params", lb + ("self_attn", n, "bias"),
                         (lambda b, a=a: b[a * (b.shape[0] // 3):
                                           (a + 1) * (b.shape[0] // 3)]))
                        for a, n in enumerate(("q", "k", "v"))
                    ]
                elif sub in ("attentions.0.attn.out_proj.weight",
                             "attentions.0.attn.out_proj.bias"):
                    leaf = sub.rsplit(".", 1)[1]
                    m[tk] = [("params", lb + ("self_attn", "out",
                                              "kernel" if leaf == "weight"
                                              else "bias"),
                              t2f_linear if leaf == "weight" else None)]
                else:
                    g2 = re.fullmatch(
                        r"attentions\.1\.(sampling_offsets|attention_weights|"
                        r"value_proj|output_proj)\.(weight|bias)", sub)
                    if g2:
                        name, leaf = g2.group(1), g2.group(2)
                        m[tk] = [("params", lb + ("cross_attn", name,
                                                  "kernel" if leaf == "weight"
                                                  else "bias"),
                                  t2f_linear if leaf == "weight" else None)]
                        continue
                    g2 = re.fullmatch(r"norms\.(\d)\.(weight|bias)", sub)
                    if g2:
                        n, leaf = int(g2.group(1)) + 1, g2.group(2)
                        m[tk] = [("params", lb + (f"norm{n}",
                                                  "scale" if leaf == "weight"
                                                  else "bias"), None)]
                        continue
                    g2 = re.fullmatch(
                        r"ffns\.0\.layers\.(0\.0|1)\.(weight|bias)", sub)
                    if g2:
                        name = "ffn1" if g2.group(1) == "0.0" else "ffn2"
                        leaf = g2.group(2)
                        m[tk] = [("params", lb + (name,
                                                  "kernel" if leaf == "weight"
                                                  else "bias"),
                                  t2f_linear if leaf == "weight" else None)]
                        continue
                continue
            # per-round query-pos embeds: MLP(.layers.{0,1})
            g = re.fullmatch(
                r"pos_embed_learned\.(\d)\.layers\.(\d)\.(weight|bias)", rest)
            if g:
                i, j, leaf = g.group(1), g.group(2), g.group(3)
                m[tk] = [("params", hb + (f"pos_embed{i}", f"Dense_{j}",
                                          "kernel" if leaf == "weight"
                                          else "bias"),
                          t2f_linear if leaf == "weight" else None)]
                continue
            # prediction FFN heads: {head}.0 = ConvModule(Conv1d+BN1d),
            # {head}.1 = Conv1d out
            g = re.fullmatch(
                r"prediction_heads\.(\d)\.(\w+)\.(\d)\.(?:(conv|bn)\.)?"
                r"(weight|bias|running_mean|running_var)", rest)
            if g:
                i, head, j = g.group(1), g.group(2), int(g.group(3))
                kind, leaf = g.group(4), g.group(5)
                pb = hb + (f"pred{i}",)
                if j == 0 and kind == "conv" and leaf == "weight":
                    m[tk] = [("params", pb + (f"{head}_fc0", "kernel"),
                              t2f_conv1d)]
                elif j == 0 and kind == "bn":
                    t = _bn(pb + (f"{head}_bn0",), leaf)
                    if t:
                        m[tk] = [t]
                elif j == 1 and kind is None:
                    m[tk] = [("params", pb + (f"{head}_out",
                                              "kernel" if leaf == "weight"
                                              else "bias"),
                              t2f_conv1d if leaf == "weight" else None)]
                continue
            # RoI MLP: Sequential[Linear, BN1d, ReLU, Dropout] x 3
            g = re.fullmatch(
                r"roi_mlp\.(\d+)\.(weight|bias|running_mean|running_var)",
                rest)
            if g:
                j, leaf = int(g.group(1)), g.group(2)
                layer, rem = divmod(j, 4)
                if rem == 0 and leaf == "weight":
                    m[tk] = [("params", hb + (f"roi_mlp_{layer}", "kernel"),
                              t2f_linear)]
                elif rem == 1:
                    t = _bn(hb + (f"roi_bn_{layer}",), leaf)
                    if t:
                        m[tk] = [t]
                continue
            continue
    return m


# ---------------------------------------------------------------------------
# tree application
# ---------------------------------------------------------------------------

def flatten_variables(variables) -> Dict[Tuple[str, ...], np.ndarray]:
    import jax

    flat = {}
    for coll in variables:
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables[coll]
        )[0]:
            key = tuple(str(getattr(p, "key", p)) for p in path)
            flat[(coll,) + key] = leaf
    return flat


def unflatten_variables(variables, flat):
    import jax

    def rebuild(coll):
        tree = variables[coll]
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        vals = []
        for path, _ in leaves:
            key = (coll,) + tuple(str(getattr(p, "key", p)) for p in path)
            vals.append(flat[key])
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree), vals
        )

    return {c: rebuild(c) for c in variables}


class ConversionReport:
    def __init__(self):
        self.applied: List[str] = []
        self.missed: List[Tuple[str, Tuple, Tuple, Tuple]] = []
        self.unmapped: List[str] = []
        self.unloaded: List[Tuple[str, ...]] = []
        # torch keys whose whole flax branch is absent from this model
        # variant (the reference builds every configured module even when
        # forward never uses it — e.g. the camera-only DeformFormer3D_C_R50
        # checkpoint still carries pts_middle_encoder/pts_backbone/pts_neck
        # weights; our flax tree simply has no such module)
        self.skipped_absent: List[str] = []

    @property
    def full(self) -> bool:
        return not self.missed and not self.unmapped

    def summary(self) -> str:
        lines = [
            f"applied {len(self.applied)} torch tensors; "
            f"{len(self.missed)} target misses; "
            f"{len(self.unmapped)} torch keys unmapped; "
            f"{len(self.unloaded)} flax leaves left at init; "
            f"{len(self.skipped_absent)} skipped (module absent)"
        ]
        for tk, path, ws, fs in self.missed[:20]:
            lines.append(f"  MISS {tk}: torch{ws} vs {'/'.join(path)}{fs}")
        for k in self.unmapped[:40]:
            lines.append(f"  UNMAPPED {k}")
        for p in self.unloaded[:40]:
            lines.append(f"  UNLOADED {'/'.join(p)}")
        return "\n".join(lines)


def convert_tree(variables, state_dict: Dict[str, np.ndarray]):
    """Apply a torch state_dict onto a flax variables tree.

    Returns (new_variables, ConversionReport)."""
    flat = {k: np.asarray(v) for k, v in flatten_variables(variables).items()}
    mapping = build_mapping(
        {k: tuple(np.asarray(v).shape) for k, v in state_dict.items()}
    )
    report = ConversionReport()
    loaded = set()
    roots = {(k[0], k[1]) for k in flat if len(k) > 1}

    for tk, targets in mapping.items():
        w = np.asarray(state_dict[tk])
        hit = False
        for coll, path, tf in targets:
            v = tf(w) if tf is not None else w
            full = (coll,) + path
            if full in flat and flat[full].shape == v.shape:
                flat[full] = np.ascontiguousarray(v).astype(
                    flat[full].dtype
                )
                loaded.add(full)
                hit = True
        if hit:
            report.applied.append(tk)
        else:
            coll, path, tf = targets[0]
            v = tf(w) if tf is not None else w
            full = (coll,) + path
            if path and (coll, path[0]) not in roots:
                report.skipped_absent.append(tk)
            else:
                report.missed.append(
                    (tk, full, tuple(v.shape),
                     tuple(flat[full].shape) if full in flat else ()))

    report.unmapped = [
        k for k in state_dict if k not in mapping and not is_ignored(k)
    ]
    report.unloaded = [k for k in flat if k not in loaded]
    return unflatten_variables(variables, flat), report
