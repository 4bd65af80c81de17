"""Expected reference-checkpoint key/shape inventory per config.

Enumerates the exact torch ``state_dict`` keys (and tensor shapes) a released
mmdet3d FocalFormer3D checkpoint contains for a given model config, derived
from the reference module definitions:

  /root/reference/projects/mmdet3d_plugin/models/dense_heads/focal_decoder.py
  /root/reference/projects/mmdet3d_plugin/models/necks/{focal_encoder,lss}.py
  /root/reference/projects/mmdet3d_plugin/models/utils/{decoder_utils,encoder_utils}.py
  mmdet3d SparseEncoder / SECOND / SECONDFPN, mmdet ResNet/FPN,
  torchvision MobileNetV2 InvertedResidual / resnet BasicBlock,
  mmcv BaseTransformerLayer (DeformableDetrTransformerDecoder).

Used by the conversion tests to prove `utils.convert.build_mapping` covers
every key a real checkpoint would carry, and by
`tools/make_fake_checkpoint.py` to synthesize reference-shaped .pth files
(no released weights ship in this environment)."""
from __future__ import annotations

from typing import Dict, Tuple

Shape = Tuple[int, ...]


def _bn(d: Dict[str, Shape], prefix: str, c: int) -> None:
    d[f"{prefix}.weight"] = (c,)
    d[f"{prefix}.bias"] = (c,)
    d[f"{prefix}.running_mean"] = (c,)
    d[f"{prefix}.running_var"] = (c,)
    d[f"{prefix}.num_batches_tracked"] = ()


def _convmodule(d, prefix, cin, cout, k) -> None:
    """mmcv ConvModule / reference ConvBNReLU: .conv (no bias) + .bn."""
    d[f"{prefix}.conv.weight"] = (cout, cin, k, k)
    _bn(d, f"{prefix}.bn", cout)


def _inverted_residual(d, prefix, cin, cout, expand) -> None:
    hidden = cin * expand
    if expand != 1:
        d[f"{prefix}.conv.0.0.weight"] = (hidden, cin, 1, 1)
        _bn(d, f"{prefix}.conv.0.1", hidden)
        d[f"{prefix}.conv.1.0.weight"] = (hidden, 1, 3, 3)
        _bn(d, f"{prefix}.conv.1.1", hidden)
        d[f"{prefix}.conv.2.weight"] = (cout, hidden, 1, 1)
        _bn(d, f"{prefix}.conv.3", cout)
    else:
        d[f"{prefix}.conv.0.0.weight"] = (hidden, 1, 3, 3)
        _bn(d, f"{prefix}.conv.0.1", hidden)
        d[f"{prefix}.conv.1.weight"] = (cout, hidden, 1, 1)
        _bn(d, f"{prefix}.conv.2", cout)


def _heatmap_head(d, prefix, hidden, num_classes) -> None:
    _convmodule(d, f"{prefix}.0", hidden, hidden, 3)
    d[f"{prefix}.1.weight"] = (num_classes, hidden, 3, 3)
    d[f"{prefix}.1.bias"] = (num_classes,)


def reference_state_shapes(cfg) -> Dict[str, Shape]:
    """cfg: DetectorConfig. Returns {torch_key: shape}."""
    d: Dict[str, Shape] = {}
    dec = cfg.decoder
    h = dec.hidden
    ncls = dec.num_classes

    # ------------- pts_voxel_encoder (HardVFE, Waymo) ---------------------
    enc = cfg.encoder_channels
    cin = cfg.voxel.num_features if hasattr(cfg.voxel, "num_features") else 5
    if cfg.vfe_type == "HardVFE":
        # mmdet3d VFELayer: Linear(no bias) + BN1d (+ReLU, max at the end)
        # (ref FocalFormer3D_Waymo_L.py:141-151, extras all disabled)
        c = cin
        for i, ch in enumerate(cfg.vfe_channels):
            d[f"pts_voxel_encoder.vfe_layers.{i}.linear.weight"] = (ch, c)
            _bn(d, f"pts_voxel_encoder.vfe_layers.{i}.norm", ch)
            c = ch
        cin = cfg.vfe_channels[-1]

    # ------------- pts_middle_encoder (SparseEncoder, basicblock) --------
    base = enc[0][0]
    d["pts_middle_encoder.conv_input.0.weight"] = (3, 3, 3, cin, base)
    _bn(d, "pts_middle_encoder.conv_input.1", base)
    c = base
    for s, blocks in enumerate(enc):
        for j, out in enumerate(blocks):
            p = f"pts_middle_encoder.encoder_layers.encoder_layer{s + 1}.{j}"
            if j == len(blocks) - 1 and s != len(enc) - 1:
                # strided SparseConvModule downsample
                d[f"{p}.0.weight"] = (3, 3, 3, c, out)
                _bn(d, f"{p}.1", out)
            else:  # SparseBasicBlock (in == out)
                d[f"{p}.conv1.weight"] = (3, 3, 3, out, out)
                _bn(d, f"{p}.bn1", out)
                d[f"{p}.conv2.weight"] = (3, 3, 3, out, out)
                _bn(d, f"{p}.bn2", out)
            c = out
    d["pts_middle_encoder.conv_out.0.weight"] = (
        3, 1, 1, c, cfg.sparse_out_channels)
    _bn(d, "pts_middle_encoder.conv_out.1", cfg.sparse_out_channels)

    # ------------- SECOND backbone ----------------------------------------
    # z planes surviving the encoder's strided chain + conv_out collapse
    # (nuScenes 41 -> 21 -> 11 -> 5 -> 2)
    z = cfg.sparse_shape[0]
    for s in range(len(enc) - 1):
        z = (z + 2 * cfg.down_paddings[s][0] - 3) // 2 + 1
    z = (z - 3) // 2 + 1
    sec_in = cfg.sparse_out_channels * z
    for i, out in enumerate(cfg.second_channels):
        block_in = sec_in if i == 0 else cfg.second_channels[i - 1]
        n_convs = cfg.second_layers[i] + 1
        for k in range(n_convs):
            j = 3 * k
            ci = block_in if k == 0 else out
            d[f"pts_backbone.blocks.{i}.{j}.weight"] = (out, ci, 3, 3)
            _bn(d, f"pts_backbone.blocks.{i}.{j + 1}", out)

    # ------------- SECONDFPN ----------------------------------------------
    for i, out in enumerate(cfg.fpn_channels):
        cin_i = cfg.second_channels[i]
        if i == 0:  # stride 1 -> 1x1 conv (use_conv_for_no_stride)
            d[f"pts_neck.deblocks.{i}.0.weight"] = (out, cin_i, 1, 1)
        else:  # 2x ConvTranspose2d: torch layout (I, O, kH, kW)
            d[f"pts_neck.deblocks.{i}.0.weight"] = (cin_i, out, 2, 2)
        _bn(d, f"pts_neck.deblocks.{i}.1", out)

    # ------------- image branch (LC / camera-only) ------------------------
    if cfg.input_img:
        # mmdet ResNet-50
        d["img_backbone.conv1.weight"] = (64, 3, 7, 7)
        _bn(d, "img_backbone.bn1", 64)
        stage_blocks = {50: (3, 4, 6, 3)}[cfg.img_backbone_depth]
        rc = 64
        for s, nb in enumerate(stage_blocks):
            w = 64 * (2 ** s)
            for i in range(nb):
                p = f"img_backbone.layer{s + 1}.{i}"
                ci = rc if i == 0 else 4 * w
                d[f"{p}.conv1.weight"] = (w, ci, 1, 1)
                _bn(d, f"{p}.bn1", w)
                d[f"{p}.conv2.weight"] = (w, w, 3, 3)
                _bn(d, f"{p}.bn2", w)
                d[f"{p}.conv3.weight"] = (4 * w, w, 1, 1)
                _bn(d, f"{p}.bn3", 4 * w)
                if i == 0:
                    d[f"{p}.downsample.0.weight"] = (4 * w, ci, 1, 1)
                    _bn(d, f"{p}.downsample.1", 4 * w)
            rc = 4 * w
        # mmdet FPN (lateral + fpn convs carry bias)
        fpn_ins = (256, 512, 1024, 2048)
        for i, ci in enumerate(fpn_ins):
            d[f"img_neck.lateral_convs.{i}.conv.weight"] = (256, ci, 1, 1)
            d[f"img_neck.lateral_convs.{i}.conv.bias"] = (256,)
            d[f"img_neck.fpn_convs.{i}.conv.weight"] = (256, 256, 3, 3)
            d[f"img_neck.fpn_convs.{i}.conv.bias"] = (256,)

    # ------------- FocalEncoder fusion neck -------------------------------
    pts_in = sum(cfg.fpn_channels)
    if cfg.input_pts:
        d["imgpts_neck.shared_conv_pts.weight"] = (h, pts_in, 3, 3)
        d["imgpts_neck.shared_conv_pts.bias"] = (h,)
    if cfg.input_img and cfg.cam_proj == "lss":
        lss = cfg.lss
        d["imgpts_neck.cam_lss.frustum"] = (
            lss.depth_bins, *lss.feat_hw, 3)
        d["imgpts_neck.cam_lss.camencode.depthnet.weight"] = (
            lss.depth_bins + lss.cam_channels, lss.input_channels, 1, 1)
        d["imgpts_neck.cam_lss.camencode.depthnet.bias"] = (
            lss.depth_bins + lss.cam_channels,)
        cz = lss.cam_channels * lss.nx[2]
        chans = [(cz, cz), (cz, 512), (512, 512), (512, lss.out_channels)]
        for k, (ci, co) in enumerate(chans):
            d[f"imgpts_neck.cam_lss.bevencode.{3 * k}.weight"] = (
                co, ci, 3, 3)
            _bn(d, f"imgpts_neck.cam_lss.bevencode.{3 * k + 1}", co)
    if cfg.input_img and cfg.cam_proj == "i2p":
        # Proj variant: 3x3 conv projects FPN level-0 (256ch) to hidden
        # (ref necks/focal_encoder.py:137-145, build_conv_layer bias=auto)
        d["imgpts_neck.shared_conv_img.weight"] = (h, 256, 3, 3)
        d["imgpts_neck.shared_conv_img.bias"] = (h,)
    for i in range(cfg.neck_layers):
        p = f"imgpts_neck.fusion_blocks.{i}"
        if (cfg.input_img and cfg.cam_proj == "i2p"
                and (not cfg.iter_bev_cam or i == 0)):
            # I2P learnedAlign: 1-head MHA, kdim=vdim=img_channels==h, so
            # separate q/k/v proj weights + fused bias
            # (ref encoder_utils.py:191-193, focal_encoder.py:28-32)
            la = f"{p}.I2P_block.learnedAlign"
            d[f"{la}.q_proj_weight"] = (h, h)
            d[f"{la}.k_proj_weight"] = (h, h)
            d[f"{la}.v_proj_weight"] = (h, h)
            d[f"{la}.in_proj_bias"] = (3 * h,)
            d[f"{la}.out_proj.weight"] = (h, h)
            d[f"{la}.out_proj.bias"] = (h,)
        if cfg.iterbev == "bevfusionmb2":
            _inverted_residual(d, f"{p}.P_IML", h, h, 2)
            _inverted_residual(d, f"{p}.P_out_proj", 2 * h, h, 1)
            _inverted_residual(d, f"{p}.P_integration", 2 * h, h, 1)
        elif cfg.iterbev == "bevfusion":
            for j in range(2):
                _convmodule(d, f"{p}.P_IML.query_project.{j}", h, h, 1)
                _convmodule(d, f"{p}.P_IML.key_project.{j}", h, h, 1)
            _convmodule(d, f"{p}.P_IML.value_project", h, h, 1)
            _convmodule(d, f"{p}.P_out_proj", 2 * h, h, 1)
            _convmodule(d, f"{p}.P_integration", 2 * h, h, 1)
        if cfg.input_img:  # iterimg_conv = Sequential(resnet.BasicBlock)
            d[f"{p}.iterimg_conv.0.conv1.weight"] = (h, h, 3, 3)
            _bn(d, f"{p}.iterimg_conv.0.bn1", h)
            d[f"{p}.iterimg_conv.0.conv2.weight"] = (h, h, 3, 3)
            _bn(d, f"{p}.iterimg_conv.0.bn2", h)
    if cfg.extra_feat:
        _convmodule(d, "imgpts_neck.extra_output", h, h, 3)

    # ------------- FocalDecoder head --------------------------------------
    hb = "pts_bbox_head"
    _heatmap_head(d, f"{hb}.heatmap_head", h, ncls)
    n_stages = dec.multistage_heatmap + (1 if dec.reuse_first_heatmap else 0)
    start = 1 if dec.reuse_first_heatmap else 0
    for i in range(start, n_stages):
        _heatmap_head(d, f"{hb}.heatmap_head_img.{i}", h, ncls)
    d[f"{hb}.class_encoding.weight"] = (h, ncls, 1)
    d[f"{hb}.class_encoding.bias"] = (h,)
    if dec.multiscale:
        _convmodule(d, f"{hb}.dconv", h, h, 3)
        _convmodule(d, f"{hb}.dconv2", h, h, 3)
    nH, L, P = dec.num_heads, 3 if dec.multiscale else 1, 4
    for i in range(dec.num_decoder_layers):
        for l in range(dec.inner_layers):
            p = f"{hb}.decoder.{i}.layers.{l}"
            d[f"{p}.attentions.0.attn.in_proj_weight"] = (3 * h, h)
            d[f"{p}.attentions.0.attn.in_proj_bias"] = (3 * h,)
            d[f"{p}.attentions.0.attn.out_proj.weight"] = (h, h)
            d[f"{p}.attentions.0.attn.out_proj.bias"] = (h,)
            d[f"{p}.attentions.1.sampling_offsets.weight"] = (
                nH * L * P * 2, h)
            d[f"{p}.attentions.1.sampling_offsets.bias"] = (nH * L * P * 2,)
            d[f"{p}.attentions.1.attention_weights.weight"] = (nH * L * P, h)
            d[f"{p}.attentions.1.attention_weights.bias"] = (nH * L * P,)
            d[f"{p}.attentions.1.value_proj.weight"] = (h, h)
            d[f"{p}.attentions.1.value_proj.bias"] = (h,)
            d[f"{p}.attentions.1.output_proj.weight"] = (h, h)
            d[f"{p}.attentions.1.output_proj.bias"] = (h,)
            d[f"{p}.ffns.0.layers.0.0.weight"] = (1024, h)
            d[f"{p}.ffns.0.layers.0.0.bias"] = (1024,)
            d[f"{p}.ffns.0.layers.1.weight"] = (h, 1024)
            d[f"{p}.ffns.0.layers.1.bias"] = (h,)
            for n in range(3):
                d[f"{p}.norms.{n}.weight"] = (h,)
                d[f"{p}.norms.{n}.bias"] = (h,)
        d[f"{hb}.pos_embed_learned.{i}.layers.0.weight"] = (h, 256)
        d[f"{hb}.pos_embed_learned.{i}.layers.0.bias"] = (h,)
        d[f"{hb}.pos_embed_learned.{i}.layers.1.weight"] = (h, h)
        d[f"{hb}.pos_embed_learned.{i}.layers.1.bias"] = (h,)
        heads = {"center": 2, "height": 1, "dim": 3, "rot": 2}
        if dec.code_size == 10:
            heads["vel"] = 2
        heads["heatmap"] = ncls
        for head, out in heads.items():
            p = f"{hb}.prediction_heads.{i}.{head}"
            d[f"{p}.0.conv.weight"] = (64, h, 1)
            _bn(d, f"{p}.0.bn", 64)
            d[f"{p}.1.weight"] = (out, 64, 1)
            d[f"{p}.1.bias"] = (out,)
    if dec.roi_feats:
        pre = dec.roi_feats ** 2 * h * (3 if dec.multiscale else 1)
        for layer in range(3):
            out = dec.hidden_roi if layer < 2 else h
            d[f"{hb}.roi_mlp.{4 * layer}.weight"] = (out, pre)
            _bn(d, f"{hb}.roi_mlp.{4 * layer + 1}", out)
            pre = out
    d[f"{hb}.bev_pos"] = (1, 32400, 2)
    return d


def make_fake_state_dict(cfg, seed: int = 0) -> Dict[str, "np.ndarray"]:
    """Random-valued numpy state_dict with reference keys/shapes."""
    import numpy as np

    rng = np.random.RandomState(seed)
    out = {}
    for k, shape in reference_state_shapes(cfg).items():
        if k.endswith("num_batches_tracked"):
            out[k] = np.asarray(100, np.int64)
        elif k.endswith("running_var"):
            out[k] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            out[k] = rng.normal(0, 0.1, shape).astype(np.float32)
    return out
