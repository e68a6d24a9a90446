"""Pallas DCN training backward vs jax.grad of the clamped gather golden.

The golden is ``ops.dcn.deform_conv2d`` (the differentiable gather
formulation, itself torch-cross-checked in test_torch_goldens.py) composed
with ``jnp.clip(offsets, -R, R)`` — exactly the semantics the Pallas
custom_vjp path implements (clamped offsets, clip gradient). Gradients are
checked for features, offsets, AND weights (VERDICT r3 next-round item #1).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops import dcn
from mxdetection_tpu.ops.pallas.dcn import (
    deform_conv2d_bwd_pallas_batched, deform_conv2d_s2_bwd_pallas_batched,
    deform_conv2d_s2_pallas_batched, make_trainable_deform_conv,
    make_trainable_deform_conv_s2)

RADIUS = 3


def golden_grads(x, off, w, g):
    def loss(x, off, w):
        off = jnp.clip(off, -RADIUS, RADIUS)
        out = jax.vmap(lambda xi, oi: dcn.deform_conv2d(xi, oi, w))(x, off)
        return jnp.sum(out * g)

    return jax.grad(loss, argnums=(0, 1, 2))(x, off, w)


def pallas_grads(x, off, w, g):
    return deform_conv2d_bwd_pallas_batched(x, off, w, g, radius=RADIUS,
                                            interpret=True)


def _rand_case(rng, b, h, w_, c, cout, off_scale=4.0):
    x = jnp.asarray(rng.randn(b, h, w_, c).astype(np.float32))
    # continuous offsets, some beyond the clamp radius (tests the clip mask)
    off = jnp.asarray(
        (rng.rand(b, h, w_, 18).astype(np.float32) - 0.5) * 2 * off_scale)
    w = jnp.asarray(rng.randn(3, 3, c, cout).astype(np.float32) * 0.05)
    g = jnp.asarray(rng.randn(b, h, w_, cout).astype(np.float32))
    return x, off, w, g


def _check(got, ref, rtol=2e-3, atol=2e-3):
    for gg, rr, name in zip(got, ref, ("dx", "doffsets", "dweight")):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rr),
                                   rtol=rtol, atol=atol, err_msg=name)


def test_bwd_matches_gather_grad():
    rng = np.random.RandomState(0)
    case = _rand_case(rng, 1, 12, 10, 128, 128)
    _check(pallas_grads(*case), golden_grads(*case))


def test_bwd_matches_gather_grad_batched_nonmultiple():
    rng = np.random.RandomState(1)
    case = _rand_case(rng, 2, 13, 11, 128, 128)
    _check(pallas_grads(*case), golden_grads(*case))


def test_bwd_rectangular_channels():
    rng = np.random.RandomState(2)
    case = _rand_case(rng, 1, 9, 14, 128, 256)
    _check(pallas_grads(*case), golden_grads(*case))


def test_bwd_zero_offsets_matches_conv_grad():
    """At zero offsets (the DCN init state) dx/dw must equal the plain-conv
    gradients — an EXTERNAL golden that shares nothing with the gather path."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 12, 10, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    g = jnp.asarray(rng.randn(1, 12, 10, 128).astype(np.float32))
    off = jnp.zeros((1, 12, 10, 18), jnp.float32)

    def conv_loss(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(out * g)

    dx_ref, dw_ref = jax.grad(conv_loss, argnums=(0, 1))(x, w)
    dx, doff, dw = pallas_grads(x, off, w, g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=2e-3, atol=2e-3)


def test_custom_vjp_end_to_end():
    """jax.grad through the custom_vjp entry point (fwd = Pallas kernel too)."""
    rng = np.random.RandomState(4)
    x, off, w, g = _rand_case(rng, 1, 11, 9, 128, 128, off_scale=2.0)
    f = make_trainable_deform_conv(radius=RADIUS, interpret=True)

    def loss(x, off, w):
        return jnp.sum(f(x, off, w) * g)

    got = jax.grad(loss, argnums=(0, 1, 2))(x, off, w)
    _check(got, golden_grads(x, off, w, g))


def _rel_err(got, ref):
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    return np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-12)


def test_bwd_bf16_inputs_gradient_precision():
    """Production runs the kernel on bf16 activations: dpatch is produced in
    x.dtype and the doffsets product dp*dsy is computed in bf16 before the
    f32-accumulating sum (a documented memory tradeoff, ADVICE r4). Bound the
    resulting gradient error against the f32 golden: bf16 rounding is ~2^-8
    relative per element and the sums accumulate in f32, so norm-relative
    error stays in the low percent range — far below SGD noise."""
    rng = np.random.RandomState(20)
    x, off, w, g = _rand_case(rng, 1, 12, 10, 128, 128)
    ref = golden_grads(x, off, w, g)
    got = deform_conv2d_bwd_pallas_batched(
        x.astype(jnp.bfloat16), off, w.astype(jnp.bfloat16),
        g.astype(jnp.bfloat16), radius=RADIUS, interpret=True)
    for gg, rr, name, tol in zip(got, ref, ("dx", "doffsets", "dweight"),
                                 (0.03, 0.06, 0.03)):
        err = _rel_err(gg, rr)
        assert err < tol, f"{name}: bf16 rel err {err:.4f} >= {tol}"


# ---------------------------------------------------------------------------
# stride 2 (the first block of each DCN stage — the last gather+remat
# fallback closed in round 4)


def golden_grads_s2(x, off, w, g):
    def loss(x, off, w):
        off = jnp.clip(off, -RADIUS, RADIUS)
        out = jax.vmap(
            lambda xi, oi: dcn.deform_conv2d(xi, oi, w, stride=2))(x, off)
        return jnp.sum(out * g)

    return jax.grad(loss, argnums=(0, 1, 2))(x, off, w)


def _rand_case_s2(rng, b, h, w_, c, cout, off_scale=4.0):
    ho, wo = -(-h // 2), -(-w_ // 2)
    x = jnp.asarray(rng.randn(b, h, w_, c).astype(np.float32))
    off = jnp.asarray(
        (rng.rand(b, ho, wo, 18).astype(np.float32) - 0.5) * 2 * off_scale)
    w = jnp.asarray(rng.randn(3, 3, c, cout).astype(np.float32) * 0.05)
    g = jnp.asarray(rng.randn(b, ho, wo, cout).astype(np.float32))
    return x, off, w, g


def pallas_grads_s2(x, off, w, g):
    return deform_conv2d_s2_bwd_pallas_batched(x, off, w, g, radius=RADIUS,
                                               interpret=True)


def test_s2_bwd_matches_gather_grad():
    rng = np.random.RandomState(10)
    case = _rand_case_s2(rng, 1, 12, 10, 128, 128)
    _check(pallas_grads_s2(*case), golden_grads_s2(*case))


def test_s2_bwd_odd_shapes_batched():
    rng = np.random.RandomState(11)
    case = _rand_case_s2(rng, 2, 13, 11, 128, 128)
    _check(pallas_grads_s2(*case), golden_grads_s2(*case))


def test_s2_bwd_rectangular_channels():
    rng = np.random.RandomState(12)
    case = _rand_case_s2(rng, 1, 9, 14, 128, 256)
    _check(pallas_grads_s2(*case), golden_grads_s2(*case))


def test_s2_custom_vjp_end_to_end():
    """jax.grad through the s2 custom_vjp entry point (fwd = Pallas too)."""
    rng = np.random.RandomState(13)
    x, off, w, g = _rand_case_s2(rng, 1, 11, 9, 128, 128, off_scale=2.0)
    f = make_trainable_deform_conv_s2(radius=RADIUS, interpret=True)

    def loss(x, off, w):
        return jnp.sum(f(x, off, w) * g)

    got = jax.grad(loss, argnums=(0, 1, 2))(x, off, w)
    _check(got, golden_grads_s2(x, off, w, g))


def test_s2_custom_vjp_forward_matches_inference_kernel():
    rng = np.random.RandomState(14)
    x, off, w, _ = _rand_case_s2(rng, 1, 10, 12, 128, 128)
    f = make_trainable_deform_conv_s2(radius=RADIUS, interpret=True)
    ref = deform_conv2d_s2_pallas_batched(x, off, w, radius=RADIUS,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(f(x, off, w)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_forward_matches_inference_kernel():
    rng = np.random.RandomState(5)
    x, off, w, _ = _rand_case(rng, 1, 10, 12, 128, 128)
    f = make_trainable_deform_conv(radius=RADIUS, interpret=True)
    ref = functools.partial(
        __import__("mxdetection_tpu.ops.pallas.dcn", fromlist=["x"]
                   ).deform_conv2d_pallas_batched, interpret=True)
    np.testing.assert_allclose(np.asarray(f(x, off, w)),
                               np.asarray(ref(x, off, w, radius=RADIUS)),
                               rtol=1e-5, atol=1e-5)
