"""Deformable conv: gather reference vs shift-select reformulation."""

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops import dcn


def test_zero_offsets_equal_plain_conv():
    """With zero offsets, deform conv == standard conv (both impls)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(12, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1)
    off = jnp.zeros((12, 16, 18))

    ref = jax.lax.conv_general_dilated(
        x[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    g = dcn.deform_conv2d(x, off, w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-4, atol=1e-4)

    sp = dcn.deform_sample_patches_shift(x, off)
    out_s = jnp.dot(sp, w.reshape(-1, 4))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_shift_matches_gather_within_radius():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(14, 18, 8).astype(np.float32))
    off = jnp.asarray((rng.rand(14, 18, 18).astype(np.float32) - 0.5) * 6)  # |off| <= 3
    pg = dcn.deform_sample_patches(x, off)
    ps = dcn.deform_sample_patches_shift(x, off, radius=4)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pg), rtol=1e-4, atol=1e-4)


def test_shift_matches_gather_with_stride():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(16, 16, 8).astype(np.float32))
    off = jnp.asarray((rng.rand(8, 8, 18).astype(np.float32) - 0.5) * 4)
    pg = dcn.deform_sample_patches(x, off, stride=2)
    ps = dcn.deform_sample_patches_shift(x, off, stride=2, radius=4)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pg), rtol=1e-4, atol=1e-4)


def test_shift_clamps_large_offsets():
    """Offsets beyond the radius are clamped (documented deviation)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(12, 12, 4).astype(np.float32))
    off = jnp.full((12, 12, 18), 10.0)
    clamped = jnp.full((12, 12, 18), 4.0)
    ps = dcn.deform_sample_patches_shift(x, off, radius=4)
    pg = dcn.deform_sample_patches(x, clamped)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pg), rtol=1e-4, atol=1e-4)


def test_grad_flows_through_offsets():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(10, 10, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 2).astype(np.float32) * 0.1)
    off0 = jnp.asarray(rng.rand(10, 10, 18).astype(np.float32) - 0.5)

    def loss(off):
        p = dcn.deform_sample_patches_shift(x, off)
        return jnp.sum(jnp.dot(p, w.reshape(-1, 2)) ** 2)

    g = jax.grad(loss)(off0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

def test_batched_train_path_remat_exact():
    """The batched training path remats the im2col patches (memory fix for
    deep DCN stacks); jax.checkpoint must leave values AND grads bit-exact
    vs the plain per-image formulation."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 9, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 2).astype(np.float32) * 0.1)
    off = jnp.asarray((rng.rand(2, 8, 9, 18) - 0.5).astype(np.float32))

    def loss_batched(x_, off_, w_):
        return jnp.sum(dcn.deform_conv2d_batched(x_, off_, w_) ** 2)

    def loss_plain(x_, off_, w_):
        out = jax.vmap(lambda xi, oi: dcn.deform_conv2d(xi, oi, w_))(x_, off_)
        return jnp.sum(out ** 2)

    vb, gb = jax.value_and_grad(loss_batched, argnums=(0, 1, 2))(x, off, w)
    vp, gp = jax.value_and_grad(loss_plain, argnums=(0, 1, 2))(x, off, w)
    np.testing.assert_allclose(float(vb), float(vp), rtol=1e-6)
    for a, b in zip(gb, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
