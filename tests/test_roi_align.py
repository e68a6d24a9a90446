"""RoIAlign vs golden numpy bilinear implementation (SURVEY.md §4.1)."""

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops import roi_align as R


def np_roi_align(feat, roi, stride, out_size, sampling_ratio):
    """Golden CUDA-RoIAlign semantics (aligned=False), feat (H, W, C)."""
    h, w, c = feat.shape
    scale = 1.0 / stride
    x1, y1 = roi[0] * scale, roi[1] * scale
    rw = max(roi[2] * scale - x1, 1.0)
    rh = max(roi[3] * scale - y1, 1.0)
    bw, bh = rw / out_size, rh / out_size
    out = np.zeros((out_size, out_size, c), np.float64)
    for i in range(out_size):
        for j in range(out_size):
            acc = np.zeros(c)
            for iy in range(sampling_ratio):
                for ix in range(sampling_ratio):
                    y = y1 + (i + (iy + 0.5) / sampling_ratio) * bh
                    x = x1 + (j + (ix + 0.5) / sampling_ratio) * bw
                    if y < -1.0 or y > h or x < -1.0 or x > w:
                        continue
                    y = min(max(y, 0.0), h - 1)
                    x = min(max(x, 0.0), w - 1)
                    y0, x0 = int(np.floor(y)), int(np.floor(x))
                    y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                    ly, lx = y - y0, x - x0
                    acc += (
                        feat[y0, x0] * (1 - ly) * (1 - lx)
                        + feat[y0, x1i] * (1 - ly) * lx
                        + feat[y1i, x0] * ly * (1 - lx)
                        + feat[y1i, x1i] * ly * lx
                    )
            out[i, j] = acc / (sampling_ratio ** 2)
    return out


def test_roi_align_matches_numpy():
    rng = np.random.RandomState(0)
    feat = rng.randn(24, 32, 8).astype(np.float32)
    rois = np.asarray(
        [[10, 12, 100, 90], [0, 0, 255, 191], [33.5, 17.2, 88.1, 64.9]], np.float32
    )
    got = np.asarray(R.roi_align(jnp.asarray(feat), jnp.asarray(rois), stride=8,
                                 output_size=7, sampling_ratio=2))
    for k in range(len(rois)):
        golden = np_roi_align(feat, rois[k], 8, 7, 2)
        np.testing.assert_allclose(got[k], golden, rtol=1e-4, atol=1e-4)


def test_roi_align_constant_map():
    feat = jnp.full((16, 16, 4), 3.5)
    rois = jnp.asarray([[4.0, 4, 60, 60]])
    out = R.roi_align(feat, rois, stride=4, output_size=7)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)


def test_fpn_level_assign():
    rois = jnp.asarray([
        [0.0, 0, 32, 32],      # tiny -> min level
        [0.0, 0, 224, 224],    # canonical -> level 4
        [0.0, 0, 1000, 1000],  # huge -> max level
    ])
    lv = np.asarray(R.fpn_level_assign(rois, min_level=2, max_level=5))
    assert list(lv) == [2, 4, 5]


def test_multilevel_routing_matches_single_level():
    """A canonical-scale roi routed to level k must equal single-level align."""
    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.randn(2 ** (6 - i), 2 ** (6 - i), 4).astype(np.float32))
             for i in range(4)]  # strides 4, 8, 16, 32 on a 256px image
    strides = [4, 8, 16, 32]
    roi = jnp.asarray([[8.0, 8, 8 + 224, 8 + 224]])  # level 4 -> index 2
    multi = R.multilevel_roi_align(feats, roi, strides, output_size=7, min_level=2)
    single = R.roi_align(feats[2], roi, stride=16, output_size=7)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single), rtol=1e-5)


def test_roi_align_grad_flows():
    feat = jnp.ones((16, 16, 2))
    rois = jnp.asarray([[2.0, 2, 30, 30]])

    def loss(f):
        return jnp.sum(R.roi_align(f, rois, stride=2, output_size=7))

    g = jax.grad(loss)(feat)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_roi_align_invalid_rois_zero():
    feat = jnp.ones((8, 8, 2))
    rois = jnp.zeros((3, 4))
    out = R.roi_align(feat, rois, stride=4, output_size=7,
                      roi_valid=jnp.zeros(3, bool))
    assert float(jnp.abs(out).sum()) == 0.0


def test_roi_pool_max_mode():
    # sampling_ratio=2 on a 2x2 grid over an 8x8-cell roi samples integer
    # coords {1, 3, 5, 7}; put the peak on one so max-mode sees it exactly
    feat = jnp.zeros((8, 8, 1)).at[3, 3, 0].set(9.0)
    rois = jnp.asarray([[0.0, 0, 32, 32]])
    out = R.roi_pool(feat, rois, stride=4, output_size=2)
    assert float(out.max()) > 0
