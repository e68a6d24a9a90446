"""Pallas RoIAlign (separable matmul formulation) vs the XLA reference."""

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops.roi_align import multilevel_roi_align, roi_align
from mxdetection_tpu.ops.pallas.roi_align import multilevel_roi_align_pallas


def test_single_level_matches_reference():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(64, 96, 128).astype(np.float32))
    # kernel contract: roi extent / stride must fit the 48-cell window
    # (guaranteed by FPN level assignment in the detector path)
    rois = jnp.asarray([
        [10.0, 12, 100, 90],
        [0, 0, 350, 300],        # ~44x38 cells at stride 8 — near the window max
        [33.5, 17.2, 88.1, 64.9],
        [200, 100, 380, 250],
    ])
    ref = roi_align(feat, rois, stride=8, output_size=7, sampling_ratio=2)
    got = multilevel_roi_align_pallas([feat], rois, (8,), output_size=7,
                                      sampling_ratio=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_multilevel_matches_reference():
    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.randn(2 ** (7 - i), 2 ** (7 - i), 128).astype(np.float32))
             for i in range(4)]  # strides 4..32 on a 512px image
    strides = (4, 8, 16, 32)
    rois = jnp.asarray([
        [8.0, 8, 60, 60],        # small -> P2
        [10, 10, 200, 180],      # ~canonical -> P4
        [0, 0, 500, 440],        # big -> P5
        [100, 50, 140, 420],     # tall skinny
    ])
    ref = multilevel_roi_align(feats, rois, strides, output_size=7,
                               sampling_ratio=2, min_level=2)
    got = multilevel_roi_align_pallas(feats, rois, strides, output_size=7,
                                      sampling_ratio=2, min_level=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_invalid_rois_zeroed():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(64, 64, 128).astype(np.float32))
    rois = jnp.asarray([[4.0, 4, 40, 40], [8.0, 8, 30, 30]])
    valid = jnp.asarray([True, False])
    got = multilevel_roi_align_pallas([feat], rois, (8,), roi_valid=valid,
                                      interpret=True)
    assert float(jnp.abs(got[1]).sum()) == 0.0
    assert float(jnp.abs(got[0]).sum()) > 0.0


def test_mask_head_output_size_14():
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(64, 64, 128).astype(np.float32))
    rois = jnp.asarray([[4.0, 4, 160, 180]])
    ref = roi_align(feat, rois, stride=8, output_size=14, sampling_ratio=2)
    got = multilevel_roi_align_pallas([feat], rois, (8,), output_size=14,
                                      sampling_ratio=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_batched_vmap():
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(2, 64, 64, 128).astype(np.float32))
    rois = jnp.asarray(rng.rand(2, 8, 4) * 100)
    rois = jnp.concatenate([rois[..., :2], rois[..., :2] + 50 + rois[..., 2:]], -1)
    fn = lambda f, r: multilevel_roi_align_pallas([f], r, (8,), interpret=True)
    got = jax.vmap(fn)(feats, rois)
    ref = jax.vmap(lambda f, r: roi_align(f, r, stride=8))(feats, rois)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_extreme_aspect_ratio_rois():
    """Wide/tall rois overflow one window axis -> multi-pass coverage."""
    rng = np.random.RandomState(5)
    feats = [jnp.asarray(rng.randn(2 ** (7 - i), 2 ** (7 - i), 128).astype(np.float32))
             for i in range(4)]
    strides = (4, 8, 16, 32)
    rois = jnp.asarray([
        [0.0, 100, 500, 130],     # 125x7.5 cells at P2-P3 -> wide overflow
        [200.0, 0, 230, 500],     # tall overflow
        [0.0, 0, 510, 40],        # very wide, thin
    ])
    ref = multilevel_roi_align(feats, rois, strides, output_size=7,
                               sampling_ratio=2, min_level=2)
    got = multilevel_roi_align_pallas(feats, rois, strides, output_size=7,
                                      sampling_ratio=2, min_level=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_budget_overflow_drains_exactly():
    """More wide rois than the coverage-pass budget: the while-loop drain
    must add every pass's contribution exactly once (no silent truncation,
    no double count)."""
    rng = np.random.RandomState(5)
    feat = jnp.asarray(rng.randn(64, 96, 128).astype(np.float32))
    n = 96  # budget for 96 rois is max(64, ...) = 64 < n actives below
    # all rois wide enough (>48 cells at stride 8) to need pass (0,1)
    x1 = rng.uniform(0, 80, n)
    y1 = rng.uniform(0, 300, n)
    w = rng.uniform(400, 680, n)
    h = rng.uniform(40, 100, n)
    rois = jnp.asarray(
        np.stack([x1, y1, np.minimum(x1 + w, 760), np.minimum(y1 + h, 500)], 1),
        jnp.float32)
    ref = roi_align(feat, rois, stride=8, output_size=7, sampling_ratio=2)
    got = multilevel_roi_align_pallas([feat], rois, (8,), output_size=7,
                                      sampling_ratio=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
