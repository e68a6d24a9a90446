"""Pallas RoIAlign backward vs autodiff of the XLA reference (interpret mode).

Interpret-mode execution of the unrolled accumulate kernel is minutes-slow,
so the heavier cases are gated behind MXDET_RUN_SLOW=1.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

SLOW = os.environ.get("MXDET_RUN_SLOW") == "1"

from mxdetection_tpu.ops.roi_align import multilevel_roi_align
from mxdetection_tpu.ops.pallas.roi_align import (
    multilevel_roi_align_bwd_pallas,
    multilevel_roi_align_bwd_pallas_batched,
)


def xla_grad(feats, rois, strides, g, valid=None):
    def fwd(fs):
        return multilevel_roi_align(fs, rois, strides, output_size=7,
                                    sampling_ratio=2, min_level=2,
                                    roi_valid=valid)
    _, vjp = jax.vjp(fwd, feats)
    return vjp(g)[0]


def test_bwd_matches_xla_vjp_single_level():
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(64, 96, 128).astype(np.float32))]
    rois = jnp.asarray([[10.0, 12, 100, 90], [33.5, 17.2, 188.1, 164.9]])
    g = jnp.asarray(rng.randn(2, 7, 7, 128).astype(np.float32))
    ref = xla_grad(feats, rois, (8,), g)
    got = multilevel_roi_align_bwd_pallas(
        [(64, 96)], g, rois, (8,), interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(not SLOW, reason="minutes-slow in interpret mode")
def test_bwd_matches_xla_vjp_multilevel():
    rng = np.random.RandomState(1)
    shapes = [(2 ** (7 - i), 2 ** (7 - i)) for i in range(4)]
    feats = [jnp.asarray(rng.randn(h, w, 128).astype(np.float32))
             for h, w in shapes]
    strides = (4, 8, 16, 32)
    rois = jnp.asarray([
        [8.0, 8, 60, 60], [10, 10, 200, 180], [0, 0, 500, 440],
        [0.0, 100, 500, 130],   # extreme aspect -> multi-pass
    ])
    g = jnp.asarray(rng.randn(4, 7, 7, 128).astype(np.float32))
    ref = xla_grad(feats, rois, strides, g)
    got = multilevel_roi_align_bwd_pallas(shapes, g, rois, strides, interpret=True)
    for l in range(4):
        np.testing.assert_allclose(np.asarray(got[l]), np.asarray(ref[l]),
                                   rtol=1e-3, atol=1e-3, err_msg=f"level {l}")


@pytest.mark.skipif(not SLOW, reason="minutes-slow in interpret mode")
def test_bwd_invalid_rois_contribute_zero():
    rng = np.random.RandomState(2)
    feats = [(64, 64)]
    rois = jnp.asarray([[4.0, 4, 40, 40], [8.0, 8, 30, 30]])
    valid = jnp.asarray([True, False])
    g = jnp.asarray(rng.randn(2, 7, 7, 128).astype(np.float32))
    got = multilevel_roi_align_bwd_pallas(feats, g, rois, (8,), roi_valid=valid,
                                          interpret=True)
    fx = [jnp.asarray(rng.randn(64, 64, 128).astype(np.float32))]
    ref = xla_grad(fx, rois, (8,), g, valid=valid)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-3, atol=1e-3)


def test_bwd_out_dtype_convert_kernel():
    """out_dtype=bf16 routes the final cast through the Pallas convert kernel
    (the XLA bf16-propagation firewall — see _convert_pallas); the result must
    be the f32 grads rounded to bf16, not a lower-precision accumulation."""
    rng = np.random.RandomState(4)
    shapes = ((32, 32),)
    rois = jnp.asarray([[[8.0, 8, 80, 70], [4.0, 4, 30, 30]]])
    g = jnp.asarray(rng.randn(1, 2, 7, 7, 128).astype(np.float32))
    ref = multilevel_roi_align_bwd_pallas_batched(
        shapes, g, rois, (8,), interpret=True)
    got = multilevel_roi_align_bwd_pallas_batched(
        shapes, g, rois, (8,), interpret=True, out_dtype=jnp.dtype(jnp.bfloat16))
    assert got[0].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got[0], np.float32),
        np.asarray(ref[0].astype(jnp.bfloat16), np.float32))


def test_bwd_multilevel_and_valid_fast():
    """Small-shape multilevel + invalid-roi coverage that runs ungated (the
    heavy variants above stay behind MXDET_RUN_SLOW)."""
    rng = np.random.RandomState(3)
    shapes = [(32, 32), (16, 16)]
    feats = [jnp.asarray(rng.randn(h, w, 128).astype(np.float32))
             for h, w in shapes]
    strides = (8, 16)
    rois = jnp.asarray([[8.0, 8, 80, 70], [20, 30, 230, 210], [4.0, 4, 30, 30]])
    valid = jnp.asarray([True, True, False])
    g = jnp.asarray(rng.randn(3, 7, 7, 128).astype(np.float32))
    ref = xla_grad(feats, rois, strides, g, valid=valid)
    got = multilevel_roi_align_bwd_pallas(shapes, g, rois, strides,
                                          roi_valid=valid, interpret=True)
    for l in range(2):
        np.testing.assert_allclose(np.asarray(got[l]), np.asarray(ref[l]),
                                   rtol=1e-3, atol=1e-3, err_msg=f"level {l}")
