"""Independent external goldens for the bilinear-sampling kernels via torch.

The hand-written numpy goldens elsewhere in tests/ share authorship with the
code under test; ``torch.nn.functional.grid_sample`` (CPU) is the first
independent implementation of bilinear interpolation available in this
environment (no torchvision, no network — SURVEY.md §4.2 numerical-fidelity
intent, round-3 verdict item 6).

Method: the tests construct the sample-point coordinates from the PUBLISHED
definitions (RoIAlign aligned=False; deformable-conv v1 base grid + offsets;
box-normalized mask crop) and delegate the bilinear evaluation itself to
grid_sample with align_corners=True:

- zeros padding  == DCN's per-corner zero contribution outside the map
- border padding == RoIAlign/mask-crop's clamp-to-edge within the
  [-1, size] (resp. (-1, size)) band, with an explicit outside mask for the
  hard-zero region beyond it

All comparisons run in float32 end to end.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from mxdetection_tpu.ops.dcn import deform_sample_patches
from mxdetection_tpu.ops.mask_target import crop_box_mask
from mxdetection_tpu.ops.roi_align import roi_align


def _grid_sample_points(feat_hwc, ys, xs, padding):
    """Evaluate bilinear interpolation at (ys, xs) pixel coords via torch.

    feat_hwc: (H, W, C) numpy; ys/xs: any same shape; returns (*, C).
    align_corners=True: normalized = 2*coord/(size-1) - 1.
    """
    h, w, c = feat_hwc.shape
    pts = ys.size
    gy = 2.0 * ys.reshape(-1) / (h - 1) - 1.0
    gx = 2.0 * xs.reshape(-1) / (w - 1) - 1.0
    grid = torch.from_numpy(
        np.stack([gx, gy], -1).reshape(1, pts, 1, 2).astype(np.float64))
    inp = torch.from_numpy(
        feat_hwc.astype(np.float64).transpose(2, 0, 1)[None])
    out = torch.nn.functional.grid_sample(
        inp, grid, mode="bilinear", padding_mode=padding, align_corners=True)
    return out[0, :, :, 0].numpy().T.reshape(*ys.shape, c).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("p,s", [(7, 2), (14, 2), (7, 4)])
def test_roi_align_vs_torch(seed, p, s):
    """Single-level RoIAlign (aligned=False) vs a grid_sample composition,
    including rois poking past the image edge (border-clamp band)."""
    rng = np.random.RandomState(seed)
    h, w, c, stride = 24, 32, 8, 4
    feat = rng.randn(h, w, c).astype(np.float32)
    # image-coord rois; last two deliberately overhang the feature extent
    rois = np.array([
        [10.0, 8.0, 90.0, 70.0],
        [0.0, 0.0, 127.9, 95.9],
        [33.3, 21.7, 41.2, 95.0],
        [-6.0, -10.0, 40.0, 30.0],       # past the top-left edge
        [100.0, 70.0, 140.0, 110.0],     # past the bottom-right edge
    ], np.float32)
    rois += rng.rand(*rois.shape).astype(np.float32)

    got = np.asarray(roi_align(
        jnp.asarray(feat), jnp.asarray(rois), stride,
        output_size=p, sampling_ratio=s))

    # published aligned=False sampling grid
    scale = 1.0 / stride
    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    rw = np.maximum(rois[:, 2] * scale - x1, 1.0)
    rh = np.maximum(rois[:, 3] * scale - y1, 1.0)
    frac = (np.arange(p)[:, None] + (np.arange(s)[None, :] + 0.5) / s).reshape(-1)
    ys = y1[:, None] + frac[None, :] * (rh / p)[:, None]     # (R, p*s)
    xs = x1[:, None] + frac[None, :] * (rw / p)[:, None]
    yy = np.broadcast_to(ys[:, :, None], (len(rois), p * s, p * s))
    xx = np.broadcast_to(xs[:, None, :], (len(rois), p * s, p * s))
    vals = _grid_sample_points(feat, yy, xx, "border")
    # hard zero beyond the [-1, size] clamp band (either axis kills the point)
    outside = ((yy < -1) | (yy > h) | (xx < -1) | (xx > w))
    vals = np.where(outside[..., None], 0.0, vals)
    want = vals.reshape(len(rois), p, s, p, s, c).mean(axis=(2, 4))

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_dcn_sample_patches_vs_torch(stride, dilation):
    """Deformable im2col vs grid_sample(zeros): exact same contract —
    out-of-bounds corners contribute zero."""
    rng = np.random.RandomState(42)
    h, w, c, k = 17, 19, 6, 3
    ho = -(-h // stride)
    wo = -(-w // stride)
    x = rng.randn(h, w, c).astype(np.float32)
    # large offsets on purpose: several samples land fully outside the map
    offsets = (rng.randn(ho, wo, 2 * k * k) * 3.0).astype(np.float32)

    got = np.asarray(deform_sample_patches(
        jnp.asarray(x), jnp.asarray(offsets),
        kernel=k, stride=stride, dilation=dilation))

    # published DCNv1 sampling locations: regular grid + learned offsets
    pad = dilation * (k - 1) // 2
    out_y = np.arange(ho) * stride
    out_x = np.arange(wo) * stride
    tap = np.arange(k) * dilation - pad
    off = offsets.reshape(ho, wo, k, k, 2)
    sy = (out_y[:, None, None, None] + tap[None, None, :, None]) + off[..., 0]
    sx = (out_x[None, :, None, None] + tap[None, None, None, :]) + off[..., 1]
    vals = _grid_sample_points(x, sy, sx, "zeros")      # (Ho, Wo, k, k, C)
    want = vals.reshape(ho, wo, k * k * c)

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mask_crop_vs_torch():
    """Box-normalized mask crop vs grid_sample(border) + strict outside mask."""
    rng = np.random.RandomState(7)
    m, out_size = 28, 28
    box_mask = rng.rand(m, m).astype(np.float32)
    gt_box = np.array([40.0, 30.0, 120.0, 90.0], np.float32)
    # rois: nested inside, exactly the box, hanging off every side
    rois = np.array([
        [55.0, 40.0, 100.0, 80.0],
        [40.0, 30.0, 120.0, 90.0],
        [20.0, 10.0, 80.0, 60.0],
        [90.0, 70.0, 150.0, 120.0],
    ], np.float32)

    for roi in rois:
        got = np.asarray(crop_box_mask(
            jnp.asarray(box_mask), jnp.asarray(gt_box), jnp.asarray(roi),
            out_size))

        gw = max(gt_box[2] - gt_box[0], 1e-3)
        gh = max(gt_box[3] - gt_box[1], 1e-3)
        ii = (np.arange(out_size) + 0.5) / out_size
        ys = roi[1] + ii * (roi[3] - roi[1])
        xs = roi[0] + ii * (roi[2] - roi[0])
        my = (ys - gt_box[1]) / gh * m - 0.5
        mx = (xs - gt_box[0]) / gw * m - 0.5
        yy = np.broadcast_to(my[:, None], (out_size, out_size))
        xx = np.broadcast_to(mx[None, :], (out_size, out_size))
        vals = _grid_sample_points(box_mask[..., None], yy, xx, "border")[..., 0]
        outside = (yy <= -1) | (yy >= m) | (xx <= -1) | (xx >= m)
        want = np.where(outside, 0.0, vals)

        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
