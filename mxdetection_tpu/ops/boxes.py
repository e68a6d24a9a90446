"""Box geometry ops: IoU, encode/decode, clipping — vectorized JAX.

Rebuilds the reference's box toolbox (mxdetection family:
``*/bbox/bbox_transform.py`` — ``bbox_overlaps``, ``bbox_transform``,
``bbox_pred``, ``clip_boxes``; Cython ``bbox.pyx`` for the IoU matrix) as
fixed-shape, jit-traceable functions. All boxes are ``(..., 4)`` float arrays
in ``(x1, y1, x2, y2)`` corner layout. Invalid/padding boxes are conventionally
all-zero rows; IoU against them is 0 so they never match.

TPU notes: everything here is pure VPU element-wise math plus one broadcasted
N x K expansion for the IoU matrix. XLA fuses these chains; a Pallas tiled IoU
kernel (``ops/pallas/iou.py``) is used by callers when N*K is large enough for
HBM tiling to matter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Matches the reference family's +1 pixel convention toggle. The MXNet-era
# detection codebases measured box width as (x2 - x1 + 1); modern COCO uses
# (x2 - x1). We default to the modern convention but keep the flag so fixture
# parity against legacy semantics is testable.
LEGACY_OFFSET = 0.0


def box_area(boxes: Array, offset: float = LEGACY_OFFSET) -> Array:
    """Area of (..., 4) xyxy boxes. Degenerate boxes clamp to 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0] + offset, 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1] + offset, 0.0)
    return w * h


def pairwise_iou(boxes1: Array, boxes2: Array, offset: float = LEGACY_OFFSET) -> Array:
    """Pairwise IoU matrix between (N, 4) and (K, 4) boxes -> (N, K).

    Equivalent of the reference's Cython ``bbox_overlaps``. Zero-area
    (padding) boxes produce IoU exactly 0 rather than NaN.
    """
    area1 = box_area(boxes1, offset)  # (N,)
    area2 = box_area(boxes2, offset)  # (K,)

    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # (N, K, 2)
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # (N, K, 2)
    wh = jnp.maximum(rb - lt + offset, 0.0)
    inter = wh[..., 0] * wh[..., 1]  # (N, K)

    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_iof(boxes1: Array, boxes2: Array, offset: float = LEGACY_OFFSET) -> Array:
    """Intersection-over-foreground: inter / area(boxes1). (N, K)."""
    area1 = box_area(boxes1, offset)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(rb - lt + offset, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return jnp.where(area1[:, None] > 0, inter / jnp.maximum(area1[:, None], 1e-12), 0.0)


def encode_boxes(
    rois: Array,
    gt: Array,
    means: tuple = (0.0, 0.0, 0.0, 0.0),
    stds: tuple = (1.0, 1.0, 1.0, 1.0),
    offset: float = LEGACY_OFFSET,
) -> Array:
    """xyxy (rois, matched gt) -> normalized (dx, dy, dw, dh) deltas.

    Reference equivalent: ``bbox_transform`` (R-CNN delta encoding).
    Shapes broadcast over leading dims; last dim is 4.
    """
    ex_w = rois[..., 2] - rois[..., 0] + offset
    ex_h = rois[..., 3] - rois[..., 1] + offset
    ex_cx = rois[..., 0] + 0.5 * ex_w
    ex_cy = rois[..., 1] + 0.5 * ex_h

    gt_w = gt[..., 2] - gt[..., 0] + offset
    gt_h = gt[..., 3] - gt[..., 1] + offset
    gt_cx = gt[..., 0] + 0.5 * gt_w
    gt_cy = gt[..., 1] + 0.5 * gt_h

    ex_w = jnp.maximum(ex_w, 1e-6)
    ex_h = jnp.maximum(ex_h, 1e-6)
    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(jnp.maximum(gt_w, 1e-6) / ex_w)
    dh = jnp.log(jnp.maximum(gt_h, 1e-6) / ex_h)

    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means_a = jnp.asarray(means, deltas.dtype)
    stds_a = jnp.asarray(stds, deltas.dtype)
    return (deltas - means_a) / stds_a


def decode_boxes(
    rois: Array,
    deltas: Array,
    means: tuple = (0.0, 0.0, 0.0, 0.0),
    stds: tuple = (1.0, 1.0, 1.0, 1.0),
    wh_clip: float = 4.135166556742356,  # log(1000/16): reference-family clamp
    offset: float = LEGACY_OFFSET,
) -> Array:
    """Apply (dx, dy, dw, dh) deltas to xyxy rois -> predicted xyxy boxes.

    Reference equivalent: ``bbox_pred``. ``deltas`` may have a trailing dim
    that is a multiple of 4 (class-specific regression); rois broadcast.
    """
    orig_shape = deltas.shape
    deltas = deltas.reshape(orig_shape[:-1] + (-1, 4))
    means_a = jnp.asarray(means, deltas.dtype)
    stds_a = jnp.asarray(stds, deltas.dtype)
    deltas = deltas * stds_a + means_a

    w = rois[..., 2] - rois[..., 0] + offset
    h = rois[..., 3] - rois[..., 1] + offset
    cx = rois[..., 0] + 0.5 * w
    cy = rois[..., 1] + 0.5 * h

    dx, dy, dw, dh = (deltas[..., i] for i in range(4))
    dw = jnp.clip(dw, max=wh_clip)
    dh = jnp.clip(dh, max=wh_clip)

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w + 0.5 * offset,
            pred_cy - 0.5 * pred_h + 0.5 * offset,
            pred_cx + 0.5 * pred_w - 0.5 * offset,
            pred_cy + 0.5 * pred_h - 0.5 * offset,
        ],
        axis=-1,
    )
    return out.reshape(orig_shape)


def clip_boxes(boxes: Array, im_hw: Array, offset: float = LEGACY_OFFSET) -> Array:
    """Clip xyxy boxes to [0, W-offset] x [0, H-offset].

    Reference equivalent: ``clip_boxes``. ``im_hw`` is (..., 2) (height, width)
    broadcastable against the boxes' leading dims.
    """
    h = im_hw[..., 0:1]
    w = im_hw[..., 1:2]
    x1 = jnp.clip(boxes[..., 0], 0.0, w[..., 0] - offset)
    y1 = jnp.clip(boxes[..., 1], 0.0, h[..., 0] - offset)
    x2 = jnp.clip(boxes[..., 2], 0.0, w[..., 0] - offset)
    y2 = jnp.clip(boxes[..., 3], 0.0, h[..., 0] - offset)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def flip_boxes(boxes: Array, im_w: Array, offset: float = LEGACY_OFFSET) -> Array:
    """Horizontal flip of xyxy boxes within image width ``im_w``."""
    x1 = im_w - offset - boxes[..., 2]
    x2 = im_w - offset - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def valid_box_mask(boxes: Array, min_size: float = 0.0) -> Array:
    """True for boxes with positive extent above ``min_size`` on both axes."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > min_size) & (h > min_size)
