"""FocalDecoder head: Hard Instance Probing + box-level deformable decoder.

TPU-native re-design of the reference head
(/root/reference/projects/mmdet3d_plugin/models/dense_heads/focal_decoder.py):

* multi-stage BEV heatmap generation with max-pool peak NMS and per-class
  kernel overrides (small classes keep kernel 1);
* top-k query initialization with class embeddings, and accumulative
  false-negative masking between stages ('poscls' mode);
* optional noised-GT denoising query groups (training) with attention
  isolation masks;
* a 3-level BEV pyramid, RoI grid-point pooling, and N rounds of a
  deformable-DETR decoder with FFN prediction heads.

Everything is fixed shape: GTs are padded to ``max_gts``; per-stage
proposals, pyramid sizes, and query counts are static. Dynamic-shape
constructs of the reference (boolean filtering, per-sample loops) become
masks + top_k + gathers, so the whole head jits.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import box_coder as bc
from ..core import boxes as box_utils
from .deformable_decoder import DeformableDecoder
from .layers import ConvBN, MLP, PredictionFFN, sine_embed_2d
from ..ops.bilinear import grid_sample_norm


@dataclasses.dataclass(frozen=True)
class FocalDecoderConfig:
    num_classes: int = 10
    hidden: int = 128
    hidden_roi: int = 512
    num_proposals: int = 300
    num_decoder_layers: int = 2  # decoder ROUNDS (outer)
    inner_layers: int = 3  # deformable layers per round
    num_heads: int = 8
    nms_kernel_size: int = 3
    mask_heatmap_mode: str = "poscls"  # 'poscls' | 'pos' | 'boxcls'
    heatmap_box: bool = False  # dense per-class box heads (boxcls mode)
    multistage_heatmap: int = 1
    reuse_first_heatmap: bool = True
    extra_feat: bool = True
    multiscale: bool = True
    bevpos: bool = True
    roi_feats: int = 7
    roi_dropout: float = 0.1
    roi_based_reg: bool = True
    roi_expand_ratio: float = 1.2
    classaware_reg: bool = False
    add_gt_groups: int = 3
    add_gt_pos_thresh: float = 5.0
    add_gt_pos_boxnoise_thresh: float = 0.75
    gt_center_limit: float = 5.0
    max_gts: int = 200  # static denoising-group pad
    kernel1_classes: Tuple[int, ...] = (8, 9)  # nuScenes ped/cone
    code_size: int = 10
    pc_range: Tuple[float, ...] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    voxel_size: Tuple[float, ...] = (0.075, 0.075, 0.2)
    out_size_factor: int = 8
    post_center_range: Tuple[float, ...] = (
        -61.2, -61.2, -10.0, 61.2, 61.2, 10.0
    )
    score_threshold: float = 0.0
    # compute dtype for the head's convs / attention / FFNs ("float32" |
    # "bfloat16"); params and prediction outputs stay float32
    dtype: str = "float32"

    @property
    def jdtype(self):
        return None if self.dtype == "float32" else jnp.dtype(self.dtype)

    @property
    def total_stages(self) -> int:
        return self.multistage_heatmap + int(self.reuse_first_heatmap)

    @property
    def with_vel(self) -> bool:
        return self.code_size == 10

    @property
    def coder(self) -> bc.BBoxCoderConfig:
        return bc.BBoxCoderConfig(
            pc_range=self.pc_range[:2],
            voxel_size=self.voxel_size[:2],
            out_size_factor=self.out_size_factor,
            post_center_range=self.post_center_range,
            score_threshold=self.score_threshold,
            code_size=self.code_size,
        )


def _bev_pos(H: int, W: int, scale: float = 1.0) -> jax.Array:
    """(H*W, 2) grid-center coordinates (x, y); p = y*W + x."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    return (
        jnp.stack([xs + 0.5, ys + 0.5], axis=-1).reshape(H * W, 2) * scale
    )


def _peak_suppress(heat: jax.Array, k: int, kernel1: Sequence[int]):
    """heat (B, H, W, C): zero out non-local-max pixels (TransFusion peak
    NMS). Border pixels are suppressed for k>1 classes (exact reference
    semantics: the inner VALID max-pool leaves borders at 0)."""
    pad = k // 2
    inner = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1), "VALID"
    )
    local_max = jnp.full_like(heat, 0.0)
    local_max = local_max.at[:, pad:-pad, pad:-pad, :].set(inner)
    if kernel1:
        idx = jnp.asarray(kernel1)
        local_max = local_max.at[..., idx].set(heat[..., idx])
    return heat * (heat == local_max)


def _dilate_mask(mask: jax.Array, k: int, kernel1: Sequence[int]):
    """mask (B, H, W, C) in {0,1}: max-pool dilation with SAME padding and
    per-class kernel-1 overrides (reference mask pooling)."""
    pad = k // 2
    dil = jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    if kernel1:
        idx = jnp.asarray(kernel1)
        dil = dil.at[..., idx].set(mask[..., idx])
    return dil


def _gather_query_boxes(cfg, dense_boxes, bev_pos, top_i, ncls, HW):
    """Per-query dense box regressions at the selected (class, cell)
    indices, with the reference's clipping (focal_decoder.py:708-722).
    dense_boxes: (B, H, W, box_dim*ncls); returns (B, P, box_dim)."""
    B = dense_boxes.shape[0]
    bd = dense_boxes.shape[-1] // ncls
    # (B, HW, ncls, bd) -> flat (B, ncls*HW, bd) class-major like top_i
    df = dense_boxes.reshape(B, HW, ncls, bd)
    df = jnp.transpose(df, (0, 2, 1, 3)).reshape(B, ncls * HW, bd)
    qb = jnp.take_along_axis(
        df, top_i[..., None], axis=1
    )  # (B, P, bd)
    qb = jax.lax.stop_gradient(qb)  # reference detaches for masking
    cell = bev_pos[top_i % HW]  # (B, P, 2) grid coords
    xy = qb[..., 0:2] + jnp.floor(cell)
    z = jnp.clip(qb[..., 2:3], -5.0, 3.0)
    dims = jnp.clip(qb[..., 3:6], jnp.log(0.5), jnp.log(15.0))
    sincos = jnp.clip(qb[..., 6:8], -1.0, 1.0)
    rest = jnp.clip(qb[..., 8:], -15.0, 15.0)
    return jnp.concatenate([xy, z, dims, sincos, rest], axis=-1)


def _boxcls_mask(cfg, qb, top_cls, bev_pos, top_i, shape, dtype):
    """'boxcls' selected mask: poscls cells + BEV cells inside the
    selected queries' (shrunk) predicted boxes, painted at the query's
    class channel (reference focal_decoder.py:742-776)."""
    from ..ops.points_in_boxes import points_in_boxes

    B, H, W, ncls = shape
    HW = H * W
    # decode to world boxes [x, y, z(bottom), dx, dy, dz, yaw]
    center = bc.decode_center(cfg.coder, qb[..., 0:2])
    pcr = cfg.pc_range
    cx = jnp.clip(center[..., 0], pcr[0], pcr[3])
    cy = jnp.clip(center[..., 1], pcr[1], pcr[4])
    dims = jnp.exp(qb[..., 3:6])
    margin = 1.0
    dxy = jnp.clip(dims[..., 0:2] - margin, 0.7, 10.0)
    yaw = jnp.arctan2(qb[..., 6], qb[..., 7])
    boxes = jnp.stack(
        [cx, cy, jnp.full_like(cx, -100.0), dxy[..., 0], dxy[..., 1],
         jnp.full_like(cx, 1000.0), yaw], axis=-1,
    )  # (B, P, 7)
    cells = bc.decode_center(cfg.coder, bev_pos)  # (HW, 2) world xy
    cells3 = jnp.concatenate(
        [cells, jnp.zeros((HW, 1), cells.dtype)], axis=-1
    )

    def one(bx, cls_of_query, ti):
        idx = points_in_boxes(cells3, bx)  # (HW,) query idx or -1
        cls_cell = jnp.where(
            idx >= 0, cls_of_query[jnp.clip(idx, 0)], ncls
        )
        selb = jax.nn.one_hot(cls_cell, ncls + 1, dtype=dtype)[:, :ncls]
        selp = jnp.zeros((ncls * HW,), dtype).at[ti].set(1.0)
        selp = selp.reshape(ncls, HW).T  # (HW, ncls)
        return jnp.maximum(selb, selp)

    sel = jax.vmap(one)(boxes, top_cls, top_i)  # (B, HW, ncls)
    return sel.reshape(B, H, W, ncls)


class _HeatmapHead(nn.Module):
    num_classes: int
    hidden: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference ConvModule bias='auto' + BN -> conv carries no bias
        x = ConvBN(self.hidden, 3, dtype=self.dtype)(x, train)
        y = nn.Conv(self.num_classes, (3, 3), use_bias=True,
                    dtype=self.dtype)(x)
        return y.astype(jnp.float32)  # logits feed loss/sigmoid/top-k


class _HeatmapBoxHead(nn.Module):
    """Dense per-class box regression for the 'heatmap_box' /'boxcls'
    path (reference focal_decoder.py:247-251, 708-722). The reference
    never enables it in a shipped config; its dedicated training loss
    lives in the dead get_heatmap_bboxes path, so these heads are
    config-gated and detached when used for masking (as the reference
    detaches them)."""

    num_classes: int
    hidden: int
    box_dim: int = 10
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.hidden, 3, dtype=self.dtype)(x, train)
        return nn.Conv(
            self.box_dim * self.num_classes, (3, 3), use_bias=True,
            dtype=self.dtype,
        )(x).astype(jnp.float32)


class FocalDecoder(nn.Module):
    cfg: FocalDecoderConfig

    def _grid_points(self, boxes_std: jax.Array, expand: float) -> jax.Array:
        """RoI grid points: (..., R*R, 2) world xy inside each box
        (focal_decoder.py:890-922 + get_dense_grid_points)."""
        R = self.cfg.roi_feats
        ii = jax.lax.broadcasted_iota(jnp.float32, (R, R), 0)
        jj = jax.lax.broadcasted_iota(jnp.float32, (R, R), 1)
        base = jnp.stack([ii, jj], -1).reshape(R * R, 2)  # (RR, 2)
        dims = boxes_std[..., 3:5] * expand  # (..., 2)
        local = (base + 0.5) / R * dims[..., None, :] - dims[..., None, :] / 2
        yaw = boxes_std[..., 6]
        pts = box_utils.rotate_points_z(local, yaw)
        return pts + boxes_std[..., None, :2]

    @nn.compact
    def __call__(
        self,
        lidar_feat: jax.Array,  # (B, H, W, C) pts_feat_conv
        stage_feats: List[jax.Array],  # per-stage BEV maps (+extra at end)
        train: bool = False,
        gt_boxes: Optional[jax.Array] = None,  # (B, G, code-ish world boxes)
        gt_labels: Optional[jax.Array] = None,  # (B, G)
        gt_valid: Optional[jax.Array] = None,  # (B, G)
    ) -> Dict[str, jax.Array]:
        cfg = self.cfg
        B, H, W, C = lidar_feat.shape
        ncls = cfg.num_classes
        S = cfg.total_stages
        P = cfg.num_proposals
        HW = H * W

        stage_feats = list(stage_feats)
        extra = stage_feats.pop(-1) if cfg.extra_feat else None
        if cfg.reuse_first_heatmap:
            stage_feats = [lidar_feat] + stage_feats
        assert len(stage_feats) == S, (len(stage_feats), S)

        bev_pos = _bev_pos(H, W)  # (HW, 2)

        jdt = cfg.jdtype
        heatmap_head = _HeatmapHead(ncls, cfg.hidden, jdt,
                                    name="heatmap_head")
        dense_heatmap = heatmap_head(lidar_feat, train)  # (B,H,W,ncls)

        class_enc = nn.Dense(cfg.hidden, dtype=jdt, name="class_encoding")

        acc_mask = jnp.ones((B, H, W, ncls), jnp.float32)
        q_feats, q_pos, q_score, q_labels = [], [], [], []
        heatmap_train, multistage_masks = [], []
        last_heat = None
        for i in range(S):
            if i == 0 and cfg.reuse_first_heatmap:
                dh = dense_heatmap
            else:
                dh = _HeatmapHead(
                    ncls, cfg.hidden, jdt, name=f"heatmap_head_img{i}"
                )(stage_feats[i], train)
                if i == 0:
                    heatmap_train.append(dense_heatmap)
                    multistage_masks.append(acc_mask)
            heat = jax.nn.sigmoid(jax.lax.stop_gradient(dh))
            heatmap_train.append(dh)
            multistage_masks.append(acc_mask)
            heat = heat * acc_mask

            peaks = _peak_suppress(
                heat, cfg.nms_kernel_size, cfg.kernel1_classes
            )
            # the reference reassigns heatmap to the SUPPRESSED map before
            # gathering query_heatmap_score and the gt-group scores
            # (focal_decoder.py:860-862,702): non-peak cells read 0
            last_heat = peaks
            # flatten as (B, ncls * HW): idx -> (cls, p)
            flat = jnp.transpose(peaks, (0, 3, 1, 2)).reshape(B, ncls * HW)
            top_v, top_i = jax.lax.top_k(flat, P)
            top_cls = (top_i // HW).astype(jnp.int32)
            top_p = (top_i % HW).astype(jnp.int32)

            feat_flat = stage_feats[i].reshape(B, HW, C)
            qf = jnp.take_along_axis(feat_flat, top_p[..., None], axis=1)
            one_hot = jax.nn.one_hot(top_cls, ncls, dtype=qf.dtype)
            qf = qf + class_enc(one_hot)
            qp = bev_pos[top_p]  # (B, P, 2)
            heat_flat = peaks.reshape(B, HW, ncls)
            qs = jnp.take_along_axis(
                heat_flat, top_p[..., None], axis=1
            )  # (B, P, ncls)

            q_feats.append(qf)
            q_pos.append(qp)
            q_score.append(qs)
            q_labels.append(top_cls)

            # accumulative masking (reference focal_decoder.py:724-782):
            # 'poscls' suppresses the selected (class, position) cells;
            # 'pos' suppresses the positions across ALL classes; 'boxcls'
            # additionally paints the interiors of the selected queries'
            # predicted boxes (per class) using the dense heatmap_box
            # regressions.
            if cfg.mask_heatmap_mode == "boxcls":
                if not cfg.heatmap_box:  # pragma: no cover - config error
                    raise ValueError("boxcls masking needs heatmap_box")
                db = _HeatmapBoxHead(
                    ncls, cfg.hidden, dtype=jdt, name=f"heatmap_box_head{i}"
                )(stage_feats[i], train)
                qb = _gather_query_boxes(cfg, db, bev_pos, top_i, ncls, HW)
                sel = _boxcls_mask(
                    cfg, qb, top_cls, bev_pos, top_i, (B, H, W, ncls),
                    lidar_feat.dtype,
                )
            elif cfg.mask_heatmap_mode == "pos":
                selp = jnp.zeros((B, HW), lidar_feat.dtype)
                selp = jax.vmap(lambda s, idx: s.at[idx].set(1.0))(
                    selp, top_p
                )
                sel = jnp.broadcast_to(
                    selp.reshape(B, H, W, 1), (B, H, W, ncls)
                )
            else:  # 'poscls'
                sel = jnp.zeros((B, ncls * HW), lidar_feat.dtype)
                sel = jax.vmap(
                    lambda s, idx: s.at[idx].set(1.0)
                )(sel, top_i)
                sel = sel.reshape(B, ncls, H, W).transpose(0, 2, 3, 1)
            acc_mask = acc_mask * (
                1.0 - _dilate_mask(sel, cfg.nms_kernel_size,
                                   cfg.kernel1_classes)
            )

        query_feat = jnp.concatenate(q_feats, axis=1)  # (B, S*P, C)
        query_pos = jnp.concatenate(q_pos, axis=1)
        query_score = jnp.concatenate(q_score, axis=1)
        query_labels = jnp.concatenate(q_labels, axis=1)
        num_prop = S * P

        # ---------------- denoising GT query groups (training) -------------
        gt_group_info = None
        if train and cfg.add_gt_groups > 0 and gt_boxes is not None:
            G = gt_boxes.shape[1]
            NG = cfg.add_gt_groups
            rng = self.make_rng("gt")
            noise = jax.random.uniform(
                rng, (B, NG * G, 2), minval=-1.0, maxval=1.0
            )
            gb = jnp.tile(gt_boxes, (1, NG, 1))  # (B, NG*G, code)
            gl = jnp.tile(gt_labels, (1, NG))
            gvalid = jnp.tile(gt_valid, (1, NG))

            yaw = gb[..., 6]
            cy, sy = jnp.cos(yaw), jnp.sin(yaw)
            wvec = jnp.stack([cy * gb[..., 3], sy * gb[..., 3]], -1)
            hvec = jnp.stack([-sy * gb[..., 4], cy * gb[..., 4]], -1)
            center_noise = (
                wvec / 2 * noise[..., 0:1] + hvec / 2 * noise[..., 1:2]
            )
            centers = gb[..., :2] + center_noise
            positive = (
                jnp.linalg.norm(center_noise, axis=-1) < cfg.add_gt_pos_thresh
            ) & (
                jnp.linalg.norm(noise, axis=-1)
                < cfg.add_gt_pos_boxnoise_thresh
            )
            noisy_labels = jnp.where(
                positive & gvalid, gl, ncls
            )  # background class = ncls

            pcr = jnp.asarray(cfg.pc_range)
            cx = jnp.clip(centers[..., 0], pcr[0] + 1e-6, pcr[3] - 1e-5)
            cyy = jnp.clip(centers[..., 1], pcr[1] + 1e-6, pcr[4] - 1e-5)
            gx = jnp.clip(
                ((cx - pcr[0]) / (pcr[3] - pcr[0]) * W).astype(jnp.int32),
                0, W - 1,
            )
            gy = jnp.clip(
                ((cyy - pcr[1]) / (pcr[4] - pcr[1]) * H).astype(jnp.int32),
                0, H - 1,
            )
            p = gy * W + gx  # (B, NG*G)

            feat_flat = stage_feats[-1].reshape(B, HW, C)
            gqf = jnp.take_along_axis(feat_flat, p[..., None], axis=1)
            heat_flat = last_heat.reshape(B, HW, ncls)
            gqs = jnp.take_along_axis(heat_flat, p[..., None], axis=1)
            one_hot = jax.nn.one_hot(noisy_labels, ncls + 1)[..., :ncls]
            gqf = gqf + class_enc(one_hot.astype(gqf.dtype))
            gqp = bev_pos[p]

            vmaskf = gvalid[..., None].astype(gqf.dtype)
            query_feat = jnp.concatenate([query_feat, gqf * vmaskf], axis=1)
            query_pos = jnp.concatenate([query_pos, gqp * vmaskf], axis=1)
            query_score = jnp.concatenate([query_score, gqs * vmaskf], axis=1)
            query_labels = jnp.concatenate(
                [query_labels, noisy_labels], axis=1
            )
            gt_group_info = {
                "valid": gvalid,  # (B, NG*G)
                "labels": noisy_labels,
            }

        Qn = query_feat.shape[1]

        # ---------------- multiscale pyramid -------------------------------
        pyramid_src = extra if cfg.extra_feat else stage_feats[-1]
        levels = [pyramid_src]
        if cfg.multiscale:
            levels.append(
                ConvBN(cfg.hidden, 3, strides=2, dtype=jdt,
                       name="dconv")(levels[-1], train)
            )
            levels.append(
                ConvBN(cfg.hidden, 3, strides=2, dtype=jdt,
                       name="dconv2")(levels[-1], train)
            )
        level_pos = [_bev_pos(H, W)]
        if cfg.multiscale:
            level_pos.append(_bev_pos(H // 2, W // 2, 2.0))
            level_pos.append(_bev_pos(H // 4, W // 4, 4.0))

        # attention mask for gt groups
        attn_mask = None
        if gt_group_info is not None:
            blocked = jnp.ones((B, Qn, Qn), bool)
            blocked = blocked.at[:, :, :num_prop].set(False)
            gv = gt_group_info["valid"]
            blocked = blocked.at[:, num_prop:, num_prop:].set(
                ~(gv[:, :, None] & gv[:, None, :])
            )
            attn_mask = blocked

        norm_wh = jnp.asarray([W, H], jnp.float32)

        rounds_out: List[Dict[str, jax.Array]] = []
        query_box = None
        for r in range(cfg.num_decoder_layers):
            ref = query_pos / norm_wh  # (B, Qn, 2) in [0,1]
            sine = sine_embed_2d(ref)
            pos_embed = MLP(cfg.hidden, cfg.hidden, 2, dtype=jdt,
                            name=f"pos_embed{r}")
            qpe = pos_embed(sine)

            if cfg.bevpos:
                # shared pos MLP embeds both query and BEV value positions
                # (reference pos_embed_learned[i], focal_decoder.py:871-886)
                vals = []
                for v, lp in zip(levels, level_pos):
                    bpe = pos_embed(sine_embed_2d(lp / norm_wh))
                    vals.append(
                        v + bpe.reshape(1, v.shape[1], v.shape[2], cfg.hidden)
                    )
            else:
                vals = levels

            if cfg.roi_feats and query_box is not None:
                qb = query_box  # (B, Qn, code) in coder space, detached
                # roi_expand_ratio multiplies the CODER-SPACE (log) dims
                # before decode, i.e. linear dims are raised to the 1.2
                # power — not scaled by 1.2 (reference
                # focal_decoder.py:892: decode_box(rot, dim * ratio, ..))
                std = bc.decode_box(
                    cfg.coder, qb[..., :2], qb[..., 2:3],
                    qb[..., 3:6] * cfg.roi_expand_ratio, qb[..., 6:8],
                    qb[..., 8:10] if cfg.with_vel else None,
                )
                gp = self._grid_points(std, 1.0)  # world xy
                pcr = jnp.asarray(cfg.pc_range)
                gn = (gp - pcr[:2]) / (pcr[3:5] - pcr[:2]) * 2.0 - 1.0
                gn = jnp.clip(gn, -2.0, 2.0)
                rois = []
                for v in levels:
                    rois.append(
                        jax.vmap(grid_sample_norm)(v, gn)
                    )  # (B, Qn, RR, C)
                roi = jnp.concatenate(rois, axis=-1)  # (B, Qn, RR, 3C)
                # channel-major flatten (feature index = c*RR + rr) to
                # match the reference's permute(0,2,1,3).reshape before
                # roi_mlp (focal_decoder.py:920) — the converted Linear
                # weights consume this ordering
                roi = jnp.transpose(roi, (0, 1, 3, 2)).reshape(B, Qn, -1)
                y = roi
                # roi_mlp is shared across rounds (reference self.roi_mlp)
                for li in range(3):
                    ch = cfg.hidden_roi if li < 2 else cfg.hidden
                    y = nn.Dense(ch, use_bias=False, dtype=jdt,
                                 name=f"roi_mlp_{li}")(y)
                    y = nn.BatchNorm(
                        use_running_average=not train, dtype=jdt,
                        name=f"roi_bn_{li}",
                    )(y)
                    y = nn.relu(y)
                    y = nn.Dropout(cfg.roi_dropout,
                                   deterministic=not train)(y)
                query_feat = (query_feat + y).astype(y.dtype)

            query_feat = DeformableDecoder(
                num_layers=cfg.inner_layers,
                embed_dim=cfg.hidden,
                num_heads=cfg.num_heads,
                num_levels=len(levels),
                num_points=4,
                dtype=jdt,
                name=f"decoder{r}",
            )(query_feat, vals, ref, qpe, attn_mask, train)

            heads = {
                "center": (2, 2), "height": (1, 2), "dim": (3, 2),
                "rot": (2, 2),
            }
            if cfg.with_vel:
                heads["vel"] = (2, 2)
            if cfg.classaware_reg:
                heads = {k: (v[0] * ncls, v[1]) for k, v in heads.items()}
            heads["heatmap"] = (ncls, 2)
            res = PredictionFFN(heads, dtype=jdt,
                                name=f"pred{r}")(query_feat, train)
            if cfg.classaware_reg:
                lab = jnp.clip(query_labels, 0, ncls - 1)
                for k in ("center", "height", "dim", "rot", "vel"):
                    if k in res:
                        d = res[k].shape[-1] // ncls
                        rr = res[k].reshape(B, Qn, ncls, d)
                        res[k] = jnp.take_along_axis(
                            rr, lab[..., None, None].repeat(d, -1), axis=2
                        )[:, :, 0]
            res["center"] = res["center"] + query_pos
            query_pos = jax.lax.stop_gradient(res["center"])
            if cfg.roi_based_reg and query_box is not None:
                res["dim"] = res["dim"].at[..., :2].add(
                    jax.lax.stop_gradient(query_box[..., 3:5])
                )
                res["rot"] = res["rot"] + jax.lax.stop_gradient(
                    query_box[..., 6:8]
                )
            qb_parts = [res["center"], res["height"], res["dim"], res["rot"]]
            if cfg.with_vel:
                qb_parts.append(res["vel"])
            query_box = jax.lax.stop_gradient(
                jnp.concatenate(qb_parts, axis=-1)
            )
            rounds_out.append(res)

        out = {
            k: jnp.stack([r[k] for r in rounds_out], axis=1)
            for k in rounds_out[0]
        }  # each (B, R, Qn, d)
        out["query_labels"] = query_labels  # (B, Qn)
        out["query_heatmap_score"] = query_score  # (B, Qn, ncls)
        out["dense_heatmap"] = jnp.stack(heatmap_train, axis=1)
        out["multistage_masks"] = jnp.stack(multistage_masks, axis=1)
        if gt_group_info is not None:
            out["gt_valid_mask"] = gt_group_info["valid"]
            out["gt_query_labels"] = gt_group_info["labels"]
        return out

    def get_bboxes(self, out: Dict[str, jax.Array], max_out: int = 200):
        return get_bboxes(self.cfg, out, max_out)


def get_bboxes(cfg: FocalDecoderConfig, out: Dict[str, jax.Array],
               max_out: int = 200):
    """Decode final-round predictions into fixed-size box lists.

    Returns dict bboxes (B, Q, code7|9), scores (B, Q), labels (B, Q),
    mask (B, Q) with at most ``max_out`` True entries per sample.
    Mirrors reference get_bboxes (focal_decoder.py:1313-1413) with masks
    instead of boolean filtering; the nuScenes default runs no NMS
    (nms_type=None) and caps at 200 boxes by score.
    """
    num_prop = cfg.total_stages * cfg.num_proposals
    sl = lambda x: x[:, -1, :num_prop]  # last round, real queries
    heat = jax.nn.sigmoid(sl(out["heatmap"]))
    one_hot = jax.nn.one_hot(
        out["query_labels"][:, :num_prop], cfg.num_classes
    )
    score = heat * out["query_heatmap_score"][:, :num_prop] * one_hot
    dec = bc.decode(
        cfg.coder,
        score,
        sl(out["center"]),
        sl(out["height"]),
        sl(out["dim"]),
        sl(out["rot"]),
        sl(out["vel"]) if cfg.with_vel else None,
        apply_filter=True,
    )
    # cap at max_out by score (fixed shapes: mask only)
    from ..core.nms import top_k_mask

    keep = jax.vmap(lambda s, v: top_k_mask(s, v, max_out))(
        dec["scores"], dec["mask"]
    )
    dec["mask"] = keep
    return dec
