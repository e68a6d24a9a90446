"""RoIAlign / RoIPool with fused FPN level assignment — fixed shapes, on-device.

Reference equivalents: MXNet's native CUDA ``ROIAlign``/``ROIPooling`` kernels
plus the python FPN glue ``*/operator_py/fpn_roi_pooling.py`` (level assign
k = floor(k0 + log2(sqrt(wh)/224)), per-level crop, re-merge). The CUDA design
launches one thread per output element doing 4-point bilinear reads; the TPU
re-design below instead flattens all pyramid levels into ONE (sum_l H_l*W_l, C)
buffer so a single XLA gather serves every roi regardless of its level — no
per-level branching, no re-merge scatter, fully static shapes.

Semantics match torchvision/Detectron2 ``aligned=False`` RoIAlign by default
(the family standard): sample ``sampling_ratio**2`` bilinear points per output
bin and average. ``mode='max'`` gives the RoIPool-style max over sample points.

A Pallas kernel variant (``ops/pallas/roi_align.py``) implements the same
contract with explicit VMEM tiling for the hot path; this module is the
reference implementation and the autodiff-friendly default (XLA derives the
scatter-add backward automatically).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def fpn_level_assign(
    rois: Array,
    *,
    min_level: int,
    max_level: int,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
) -> Array:
    """FPN paper eq. (1): k = floor(k0 + log2(sqrt(w*h)/224)), clamped.

    rois: (R, 4) xyxy in image coordinates -> (R,) int32 level ids.
    """
    w = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-6)
    h = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-6)
    k = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(w * h) / canonical_scale))
    return jnp.clip(k, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(
    features: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    *,
    output_size: int = 7,
    sampling_ratio: int = 2,
    min_level: int = 2,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    mode: str = "avg",
    roi_valid: Array | None = None,
    levels: Array | None = None,
) -> Array:
    """RoIAlign over an FPN pyramid. Returns (R, output_size, output_size, C).

    features: list of (H_l, W_l, C) maps, finest first; strides: image stride
    per level; rois: (R, 4) xyxy in image coords (padded rows allowed).
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    dtype = features[0].dtype

    # Flatten every level into one (sum HW, C) buffer; record per-level
    # offsets/extents so flat_index = offset[l] + y * W_l + x.
    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
    sizes = [(f.shape[0], f.shape[1]) for f in features]
    offsets = [0]
    for (h, w) in sizes[:-1]:
        offsets.append(offsets[-1] + h * w)
    h_arr = jnp.asarray([s[0] for s in sizes], jnp.int32)
    w_arr = jnp.asarray([s[1] for s in sizes], jnp.int32)
    off_arr = jnp.asarray(offsets, jnp.int32)
    stride_arr = jnp.asarray(strides, jnp.float32)

    if levels is None:
        if num_levels == 1:
            levels = jnp.zeros((rois.shape[0],), jnp.int32)
        else:
            levels = (
                fpn_level_assign(
                    rois,
                    min_level=min_level,
                    max_level=min_level + num_levels - 1,
                    canonical_scale=canonical_scale,
                    canonical_level=canonical_level,
                )
                - min_level
            )
    lvl_h = h_arr[levels]          # (R,)
    lvl_w = w_arr[levels]
    lvl_off = off_arr[levels]
    lvl_stride = stride_arr[levels]

    scale = 1.0 / lvl_stride  # spatial_scale per roi
    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    roi_w = jnp.maximum(rois[:, 2] * scale - x1, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * scale - y1, 1.0)

    p = output_size
    s = sampling_ratio
    bin_w = roi_w / p
    bin_h = roi_h / p

    # Sample-point coordinates: (R, p*s) per axis.
    # point j within bin i: y1 + (i + (j + .5)/s) * bin
    ij = jnp.arange(p, dtype=jnp.float32)[:, None]  # (p, 1)
    jj = (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s  # (1, s)
    frac = (ij + jj).reshape(-1)  # (p*s,) position in bin units
    ys = y1[:, None] + frac[None, :] * bin_h[:, None]  # (R, p*s)
    xs = x1[:, None] + frac[None, :] * bin_w[:, None]

    # Like _bilinear_weights_1d but with per-roi (dynamic) level extents.
    def weights(coord, size):
        size_f = size.astype(jnp.float32)[:, None]
        inside = (coord >= -1.0) & (coord <= size_f)
        cc = jnp.clip(coord, 0.0, size_f - 1.0)
        lo = jnp.floor(cc)
        hi = jnp.minimum(lo + 1.0, size_f - 1.0)
        hi_w = cc - lo
        lo_w = 1.0 - hi_w
        zero = jnp.zeros_like(lo_w)
        return (
            lo.astype(jnp.int32),
            hi.astype(jnp.int32),
            jnp.where(inside, lo_w, zero),
            jnp.where(inside, hi_w, zero),
        )

    y_lo, y_hi, wy_lo, wy_hi = weights(ys, lvl_h)  # (R, p*s)
    x_lo, x_hi, wx_lo, wx_hi = weights(xs, lvl_w)

    base = lvl_off[:, None]
    wrow = lvl_w[:, None]

    def gather(yi, xi):  # (R, p*s) x (R, p*s) -> (R, p*s, p*s, C)
        idx = base[:, :, None] + yi[:, :, None] * wrow[:, :, None] + xi[:, None, :]
        return flat[idx]  # XLA gather

    wy = jnp.stack([wy_lo, wy_hi], 0)  # (2, R, p*s)
    wx = jnp.stack([wx_lo, wx_hi], 0)

    v00 = gather(y_lo, x_lo)
    v01 = gather(y_lo, x_hi)
    v10 = gather(y_hi, x_lo)
    v11 = gather(y_hi, x_hi)
    # per-sample-point value: (R, p*s, p*s, C). Keep the big buffer in the
    # feature dtype: promoting bf16 gathers by f32 weights doubled the
    # dominant HBM traffic of the training path (weights are computed in f32
    # then cast; f32 features stay exact).
    wdt = dtype if dtype == jnp.bfloat16 else jnp.float32
    wy_lo_b = wy[0][:, :, None, None].astype(wdt)
    wy_hi_b = wy[1][:, :, None, None].astype(wdt)
    wx_lo_b = wx[0][:, None, :, None].astype(wdt)
    wx_hi_b = wx[1][:, None, :, None].astype(wdt)
    val = (
        v00 * (wy_lo_b * wx_lo_b)
        + v01 * (wy_lo_b * wx_hi_b)
        + v10 * (wy_hi_b * wx_lo_b)
        + v11 * (wy_hi_b * wx_hi_b)
    )
    r = rois.shape[0]
    val = val.reshape(r, p, s, p, s, c)
    if mode == "avg":
        out = jnp.mean(val.astype(jnp.float32), axis=(2, 4))
    elif mode == "max":
        out = jnp.max(val, axis=(2, 4))
    else:
        raise ValueError(f"unknown mode {mode!r}")

    if roi_valid is not None:
        out = jnp.where(roi_valid[:, None, None, None], out, 0.0)
    return out.astype(dtype)


def roi_align(
    feature: Array,
    rois: Array,
    stride: int,
    *,
    output_size: int = 7,
    sampling_ratio: int = 2,
    mode: str = "avg",
    roi_valid: Array | None = None,
) -> Array:
    """Single-level RoIAlign: feature (H, W, C), rois (R, 4) image coords."""
    return multilevel_roi_align(
        [feature], rois, [stride],
        output_size=output_size, sampling_ratio=sampling_ratio,
        mode=mode, roi_valid=roi_valid,
    )


def roi_pool(feature: Array, rois: Array, stride: int, *, output_size: int = 7,
             roi_valid: Array | None = None) -> Array:
    """RoIPool compatibility op (max over sample points). Reference: MXNet
    ``ROIPooling`` CUDA kernel; kept for config parity, RoIAlign is preferred."""
    return multilevel_roi_align(
        [feature], rois, [stride],
        output_size=output_size, sampling_ratio=2, mode="max", roi_valid=roi_valid,
    )
