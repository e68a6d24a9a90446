"""Pallas DCN kernel vs the shift-select golden (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops import dcn
from mxdetection_tpu.ops.pallas.dcn import deform_conv2d_pallas


def golden(x, off, w, radius=3):
    p = dcn.deform_sample_patches_shift(np.asarray(x), np.asarray(off),
                                        radius=radius)
    return jnp.dot(jnp.asarray(p), jnp.asarray(w).reshape(-1, w.shape[-1]))


def test_pallas_dcn_matches_shift_golden():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(12, 20, 128).astype(np.float32))
    off = jnp.asarray((rng.rand(12, 20, 18).astype(np.float32) - 0.5) * 4)
    w = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    ref = golden(x, off, w)
    got = deform_conv2d_pallas(x, off, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_pallas_dcn_zero_offsets_is_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, 16, 128).astype(np.float32))
    off = jnp.zeros((16, 16, 18))
    w = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    ref = jax.lax.conv_general_dilated(
        x[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    got = deform_conv2d_pallas(x, off, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_pallas_dcn_nonmultiple_height():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(13, 11, 128).astype(np.float32))
    off = jnp.asarray((rng.rand(13, 11, 18).astype(np.float32) - 0.5) * 3)
    w = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    ref = golden(x, off, w)
    got = deform_conv2d_pallas(x, off, w, interpret=True)
    assert got.shape == (13, 11, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def golden_s2(x, off, w, radius=3):
    p = dcn.deform_sample_patches_shift(np.asarray(x), np.asarray(off),
                                        stride=2, radius=radius)
    return jnp.dot(jnp.asarray(p), jnp.asarray(w).reshape(-1, w.shape[-1]))


def test_pallas_dcn_stride2_matches_shift_golden():
    from mxdetection_tpu.ops.pallas.dcn import deform_conv2d_s2_pallas_batched

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(22, 18, 128).astype(np.float32))
    ho, wo = 11, 9
    off = jnp.asarray((rng.rand(ho, wo, 18).astype(np.float32) - 0.5) * 4)
    w = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    ref = golden_s2(x, off, w)
    got = deform_conv2d_s2_pallas_batched(
        x[None], off[None], w, interpret=True)[0]
    assert got.shape == (ho, wo, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_pallas_dcn_stride2_zero_offsets_is_strided_conv():
    from mxdetection_tpu.ops.pallas.dcn import deform_conv2d_s2_pallas_batched

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(16, 16, 128).astype(np.float32))
    off = jnp.zeros((8, 8, 18))
    w = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    ref = jax.lax.conv_general_dilated(
        x[None], w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    got = deform_conv2d_s2_pallas_batched(
        x[None], off[None], w, interpret=True)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
