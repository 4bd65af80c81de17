"""CenterPoint-style Gaussian heatmap targets, fully vectorized for TPU.

Replaces the per-GT python loop + ``draw_heatmap_gaussian`` of the reference
(/root/reference/projects/mmdet3d_plugin/models/dense_heads/focal_decoder.py:1142-1157)
with a single dense max-reduction over padded GT slots — no host loops, static
shapes, one fused XLA kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_radius(det_size, min_overlap: float = 0.5):
    """CornerNet radius rule; det_size = (length, width) in grid units.

    Mirrors mmdet3d ``gaussian_radius`` (the reference calls it at
    focal_decoder.py:1150). Accepts arrays, returns elementwise radius.
    """
    height, width = det_size
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_heatmap(
    centers_xy: jax.Array,  # (G, 2) float, feature-grid coords
    radii: jax.Array,  # (G,) float (already max'ed with min_radius, floored)
    labels: jax.Array,  # (G,) int32 class ids
    valid: jax.Array,  # (G,) bool
    num_classes: int,
    height: int,
    width: int,
) -> jax.Array:
    """Render per-class Gaussian peaks, max-combined across GTs.

    Returns (num_classes, height, width) float32. The Gaussian for each GT is
    restricted to the square Chebyshev window of side ``2r+1`` around the
    integer center (exact semantics of mmdet3d ``draw_heatmap_gaussian``:
    sigma = (2r+1)/6, square crop, element-wise max).
    Pixel (row=y, col=x): x indexes width, y indexes height.
    """
    cx = jnp.floor(centers_xy[:, 0]).astype(jnp.int32)  # int center, like .to(int32)
    cy = jnp.floor(centers_xy[:, 1]).astype(jnp.int32)
    r = radii.astype(jnp.int32)
    sigma = (2.0 * radii + 1.0) / 6.0

    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)

    def per_gt(cxi, cyi, ri, sig, lab, val):
        dx = xs - cxi
        dy = ys - cyi
        g = jnp.exp(-(dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2)
                    / (2.0 * sig ** 2))
        window = (jnp.abs(dx) <= ri) & (jnp.abs(dy) <= ri)
        g = jnp.where(window & val, g, 0.0)
        # one-hot over classes without materializing (C,H,W) per gt: return
        # (H, W) plus the label; combined below via segment-max style select.
        return g, lab

    gs, labs = jax.vmap(per_gt)(cx, cy, r, sigma, labels, valid)
    # (G, H, W) -> per-class max. num_classes is small (3-10).
    class_ids = jnp.arange(num_classes)[:, None]  # (C, 1)
    sel = (labs[None, :] == class_ids)  # (C, G)
    per_class = jnp.where(sel[:, :, None, None], gs[None], 0.0)  # (C,G,H,W)
    return jnp.max(per_class, axis=1)


def heatmap_targets(
    gt_boxes: jax.Array,  # (G, >=7) world boxes (bottom-center z)
    gt_labels: jax.Array,  # (G,) int32
    gt_valid: jax.Array,  # (G,) bool
    num_classes: int,
    pc_range,  # (6,)
    voxel_size,  # (>=2,)
    out_size_factor: int,
    feature_size,  # (H, W) == (y_len, x_len)
    gaussian_overlap: float = 0.1,
    min_radius: int = 2,
) -> jax.Array:
    """Dense heatmap GT: (num_classes, H, W)."""
    H, W = feature_size
    sx = voxel_size[0] * out_size_factor
    sy = voxel_size[1] * out_size_factor
    dims_x = gt_boxes[:, 3] / sx
    dims_y = gt_boxes[:, 4] / sy
    radius = gaussian_radius((dims_y, dims_x), min_overlap=gaussian_overlap)
    radius = jnp.maximum(jnp.floor(radius), float(min_radius))
    ok = gt_valid & (dims_x > 0) & (dims_y > 0)
    coor_x = (gt_boxes[:, 0] - pc_range[0]) / sx
    coor_y = (gt_boxes[:, 1] - pc_range[1]) / sy
    centers = jnp.stack([coor_x, coor_y], axis=-1)
    return draw_heatmap(centers, radius, gt_labels, ok, num_classes, H, W)
