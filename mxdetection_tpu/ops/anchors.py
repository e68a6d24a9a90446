"""Anchor generation for RPN / RetinaNet — fixed-shape, device-resident.

Reference equivalent: ``*/rpn/generate_anchor.py`` (``generate_anchors``:
base anchors per scale x ratio, shifted over the feature grid) plus the
FPN per-level stride logic. The reference regenerates anchors in host numpy
per batch shape; here anchors are a pure function of static feature shapes,
computed once under jit and constant-folded by XLA.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def base_anchors(
    stride: int,
    scales: tuple,
    ratios: tuple,
    *,
    legacy_offset: float = 0.0,
) -> np.ndarray:
    """(len(scales)*len(ratios), 4) xyxy anchors centered on one cell.

    Matches the classic ``generate_anchors`` recipe: a stride x stride base
    box, enumerated over aspect ratios then scales (ratio-major order, the
    family convention), centered at (stride-1)/2 when ``legacy_offset=1``
    else at stride/2 - 0.5 equivalent center.
    """
    anchors = []
    if legacy_offset:
        ctr = (stride - 1.0) / 2.0
        size = float(stride)
        for ratio in ratios:
            # round() reproduces the legacy integer-ish anchor grid
            w0 = np.round(np.sqrt(size * size / ratio))
            h0 = np.round(w0 * ratio)
            for scale in scales:
                w, h = w0 * scale, h0 * scale
                anchors.append(
                    [ctr - 0.5 * (w - 1), ctr - 0.5 * (h - 1),
                     ctr + 0.5 * (w - 1), ctr + 0.5 * (h - 1)]
                )
    else:
        ctr = stride / 2.0
        size = float(stride)
        for ratio in ratios:
            w0 = np.sqrt(size * size / ratio)
            h0 = w0 * ratio
            for scale in scales:
                w, h = w0 * scale, h0 * scale
                anchors.append([ctr - 0.5 * w, ctr - 0.5 * h, ctr + 0.5 * w, ctr + 0.5 * h])
    return np.asarray(anchors, np.float32)


def grid_anchors(
    feat_h: int,
    feat_w: int,
    stride: int,
    scales: tuple,
    ratios: tuple,
    *,
    legacy_offset: float = 0.0,
) -> jnp.ndarray:
    """All anchors for one feature level -> (feat_h * feat_w * A, 4).

    Row-major over (y, x, anchor) — the layout every dense head in this
    framework flattens its per-cell predictions into, so anchor index i
    aligns with prediction index i with no permutation.
    """
    base = base_anchors(stride, scales, ratios, legacy_offset=legacy_offset)  # (A, 4)
    shift_x = np.arange(feat_w, dtype=np.float32) * stride
    shift_y = np.arange(feat_h, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)  # (H, W)
    shifts = np.stack([sx, sy, sx, sy], axis=-1)  # (H, W, 4)
    all_anchors = shifts[:, :, None, :] + base[None, None, :, :]  # (H, W, A, 4)
    return jnp.asarray(all_anchors.reshape(-1, 4))


class AnchorGenerator:
    """Multi-level anchor generator for FPN pyramids.

    RPN config: scales=(8,), ratios=(0.5, 1, 2), strides=(4, 8, 16, 32, 64)
    (P2..P6). RetinaNet: scales=(4*2^(k/3) for k in 0..2) expressed via
    ``octave_scales``, ratios=(0.5, 1, 2), strides=(8,...,128) (P3..P7).
    """

    def __init__(self, strides, scales, ratios, legacy_offset: float = 0.0):
        self.strides = tuple(strides)
        self.scales = tuple(scales)
        self.ratios = tuple(ratios)
        self.legacy_offset = legacy_offset

    @property
    def num_base_anchors(self) -> int:
        return len(self.scales) * len(self.ratios)

    def __call__(self, feat_shapes) -> jnp.ndarray:
        """feat_shapes: [(H_l, W_l)] per level -> concat (sum_l H*W*A, 4)."""
        per_level = [
            grid_anchors(h, w, s, self.scales, self.ratios, legacy_offset=self.legacy_offset)
            for (h, w), s in zip(feat_shapes, self.strides)
        ]
        return jnp.concatenate(per_level, axis=0)

    def per_level(self, feat_shapes):
        return [
            grid_anchors(h, w, s, self.scales, self.ratios, legacy_offset=self.legacy_offset)
            for (h, w), s in zip(feat_shapes, self.strides)
        ]


def retinanet_octave_scales(base_scale: float = 4.0, octaves: int = 3) -> tuple:
    """RetinaNet anchor scales: base * 2^(i/octaves), i in [0, octaves)."""
    return tuple(base_scale * 2.0 ** (i / octaves) for i in range(octaves))
