"""Mask target generation on device: crop gt instance masks to RoI grids.

Reference equivalent: ``MaskTargetOperator`` (``*/operator_py/mask_target.py``;
SURVEY.md §2.2) — a host-numpy custom op cropping/resizing full-resolution gt
masks to 28x28 per-class targets every iteration. The TPU redesign never
materializes full-resolution masks: at load time each instance is rasterized
once into its own bounding box at MxM (``data/coco.py``), and the per-roi
target is a bilinear crop of that small canonical mask — a few hundred FLOPs
per roi, inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def crop_box_mask(box_mask: Array, gt_box: Array, roi: Array, out_size: int) -> Array:
    """Sample the roi's (out_size, out_size) mask target from a box-normalized
    instance mask.

    box_mask: (M, M) float in [0,1], covering exactly ``gt_box``;
    roi: (4,) xyxy in image coords. Pixels of the roi outside the gt box get 0.
    """
    m = box_mask.shape[0]
    gx1, gy1, gx2, gy2 = gt_box[0], gt_box[1], gt_box[2], gt_box[3]
    gw = jnp.maximum(gx2 - gx1, 1e-3)
    gh = jnp.maximum(gy2 - gy1, 1e-3)

    # roi pixel centers in image coords
    ii = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    ys = roi[1] + ii * (roi[3] - roi[1])   # (S,)
    xs = roi[0] + ii * (roi[2] - roi[0])

    # map into box_mask pixel coords
    my = (ys - gy1) / gh * m - 0.5         # (S,)
    mx = (xs - gx1) / gw * m - 0.5

    def axis_weights(c):
        inside = (c > -1.0) & (c < m)
        cc = jnp.clip(c, 0.0, m - 1.0)
        lo = jnp.floor(cc)
        hi = jnp.minimum(lo + 1, m - 1.0)
        w_hi = cc - lo
        return (lo.astype(jnp.int32), hi.astype(jnp.int32),
                jnp.where(inside, 1.0 - w_hi, 0.0), jnp.where(inside, w_hi, 0.0))

    y0, y1i, wy0, wy1 = axis_weights(my)
    x0, x1i, wx0, wx1 = axis_weights(mx)

    v = (box_mask[y0][:, x0] * (wy0[:, None] * wx0[None, :])
         + box_mask[y0][:, x1i] * (wy0[:, None] * wx1[None, :])
         + box_mask[y1i][:, x0] * (wy1[:, None] * wx0[None, :])
         + box_mask[y1i][:, x1i] * (wy1[:, None] * wx1[None, :]))
    return v


def mask_targets_for_rois(
    box_masks: Array,    # (G, M, M) uint8/float gt instance masks
    gt_boxes: Array,     # (G, 4)
    rois: Array,         # (R, 4) sampled rois
    matched_gt: Array,   # (R,) int32 gt index per roi
    out_size: int = 28,
    binarize: float = 0.5,
) -> Array:
    """(R, out_size, out_size) float binary targets."""
    masks = box_masks.astype(jnp.float32)
    sel_masks = masks[matched_gt]       # (R, M, M)
    sel_boxes = gt_boxes[matched_gt]    # (R, 4)
    fn = lambda bm, gb, r: crop_box_mask(bm, gb, r, out_size)
    out = jax.vmap(fn)(sel_masks, sel_boxes, rois)
    return (out >= binarize).astype(jnp.float32)
