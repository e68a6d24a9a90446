"""PSRoIPool / deformable PSRoIPool vs a direct numpy golden.

Golden reimplements the op's documented contract (aligned s x s bilinear
sample points per bin, per-bin channel group, DCN-paper trans_std offset
scaling) with plain python loops — no shared code with the op.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxdetection_tpu.ops.psroi import psroi_pool


def _golden(feat, rois, stride, p, s, offsets=None, trans_std=0.1):
    h, w, c_full = feat.shape
    c = c_full // (p * p)
    out = np.zeros((len(rois), p, p, c), np.float32)
    feat = feat.astype(np.float32)

    def bilinear(g, y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c, np.float32)
        y = min(max(y, 0.0), h - 1.0)
        x = min(max(x, 0.0), w - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        wy1, wx1 = y - y0, x - x0
        sl = feat[:, :, g * c:(g + 1) * c]
        return ((1 - wy1) * (1 - wx1) * sl[y0, x0] + (1 - wy1) * wx1 * sl[y0, x1]
                + wy1 * (1 - wx1) * sl[y1, x0] + wy1 * wx1 * sl[y1, x1])

    for r, roi in enumerate(rois):
        rx1, ry1 = roi[0] / stride, roi[1] / stride
        rw = max(roi[2] / stride - rx1, 1.0)
        rh = max(roi[3] / stride - ry1, 1.0)
        bw, bh = rw / p, rh / p
        for i in range(p):
            for j in range(p):
                dy = dx = 0.0
                if offsets is not None:
                    dy = trans_std * offsets[r, i, j, 0] * rh
                    dx = trans_std * offsets[r, i, j, 1] * rw
                acc = np.zeros(c, np.float32)
                for u in range(s):
                    for v in range(s):
                        y = ry1 + (i + (u + 0.5) / s) * bh + dy
                        x = rx1 + (j + (v + 0.5) / s) * bw + dx
                        acc += bilinear(i * p + j, y, x)
                out[r, i, j] = acc / (s * s)
    return out


@pytest.mark.parametrize("impl", ["gather", "dense"])
@pytest.mark.parametrize("deform", [False, True])
def test_psroi_matches_golden(deform, impl):
    rng = np.random.RandomState(0)
    p, c, stride = 3, 4, 8
    feat = rng.randn(16, 20, p * p * c).astype(np.float32)
    rois = np.array([
        [10.0, 12.0, 90.0, 70.0],
        [0.0, 0.0, 159.0, 127.0],
        [40.0, 40.0, 48.0, 48.0],     # tiny roi (clamped to 1 feature px)
        [-20.0, -10.0, 30.0, 25.0],   # partially outside
    ], np.float32)
    offsets = (rng.randn(len(rois), p, p, 2).astype(np.float32)
               if deform else None)

    got = psroi_pool(
        jnp.asarray(feat), jnp.asarray(rois), stride, output_size=p,
        sampling_ratio=2,
        offsets=None if offsets is None else jnp.asarray(offsets), impl=impl)
    want = _golden(feat, rois, stride, p, 2, offsets)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_psroi_dense_matches_gather_values_and_grads():
    """The dense (separable-profile matmul) formulation is the same sum as
    the gather formulation, reassociated — values AND grads (features and
    offsets) must agree to float tolerance, valid-masked rows included."""
    rng = np.random.RandomState(7)
    p, c, stride = 3, 4, 8
    feat = jnp.asarray(rng.randn(16, 20, p * p * c), jnp.float32)
    rois = jnp.asarray([
        [10.0, 12.0, 90.0, 70.0],
        [0.0, 0.0, 159.0, 127.0],
        [40.0, 40.0, 48.0, 48.0],
        [-20.0, -10.0, 30.0, 25.0],
    ])
    valid = jnp.asarray([True, True, False, True])
    offs = jnp.asarray(rng.randn(4, p, p, 2), jnp.float32)

    def run(impl):
        def loss(f, o):
            out = psroi_pool(f, rois, stride, output_size=p, offsets=o,
                             roi_valid=valid, impl=impl)
            return jnp.sum(out ** 2), out
        (l, out), (gf, go) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(feat, offs)
        return out, gf, go

    out_g, gf_g, go_g = run("gather")
    out_d, gf_d, go_d = run("dense")
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_g),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_d), np.asarray(gf_g),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(go_d), np.asarray(go_g),
                               rtol=1e-4, atol=1e-5)


def test_psroi_channel_groups_are_position_sensitive():
    # Group g constant = g  =>  output bin (i, j) must be exactly i*p + j.
    p, c = 7, 2
    h, w = 32, 32
    feat = np.zeros((h, w, p * p * c), np.float32)
    for g in range(p * p):
        feat[:, :, g * c:(g + 1) * c] = g
    rois = np.array([[16.0, 16.0, 200.0, 180.0]], np.float32)
    out = np.asarray(psroi_pool(jnp.asarray(feat), jnp.asarray(rois), 8,
                                output_size=p))
    want = (np.arange(p)[:, None] * p + np.arange(p)[None, :]).astype(np.float32)
    np.testing.assert_allclose(out[0, :, :, 0], want, atol=1e-5)


def test_psroi_roi_valid_and_grad():
    rng = np.random.RandomState(1)
    p, c = 3, 2
    feat = jnp.asarray(rng.randn(12, 12, p * p * c), jnp.float32)
    rois = jnp.asarray([[4.0, 4.0, 60.0, 60.0], [0.0, 0.0, 8.0, 8.0]])
    valid = jnp.asarray([True, False])
    offs = jnp.asarray(rng.randn(2, p, p, 2), jnp.float32)

    out = psroi_pool(feat, rois, 8, output_size=p, offsets=offs,
                     roi_valid=valid)
    assert np.all(np.asarray(out[1]) == 0.0)

    # Differentiable wrt feature AND offsets (the deformable branch trains
    # its offset predictor through this op).
    g_f, g_o = jax.grad(
        lambda f, o: jnp.sum(psroi_pool(f, rois, 8, output_size=p, offsets=o)
                             ** 2), argnums=(0, 1))(feat, offs)
    assert np.isfinite(np.asarray(g_f)).all() and np.asarray(g_f).any()
    assert np.isfinite(np.asarray(g_o)).all() and np.asarray(g_o).any()
