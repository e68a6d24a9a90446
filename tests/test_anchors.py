import numpy as np

from mxdetection_tpu.ops import anchors as A


def test_base_anchor_count_and_area():
    base = A.base_anchors(16, scales=(8,), ratios=(0.5, 1.0, 2.0))
    assert base.shape == (3, 4)
    # scale 8 on stride 16 -> area ~ (16*8)^2 for every ratio
    w = base[:, 2] - base[:, 0]
    h = base[:, 3] - base[:, 1]
    np.testing.assert_allclose(w * h, (16 * 8) ** 2, rtol=1e-5)
    # ratio = h/w
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-5)


def test_grid_anchor_layout():
    g = np.asarray(A.grid_anchors(2, 3, 8, scales=(1.0,), ratios=(1.0,)))
    assert g.shape == (6, 4)
    # row-major: second anchor is shifted by stride in x
    np.testing.assert_allclose(g[1] - g[0], [8, 0, 8, 0])
    # anchor at row 1 col 0 is index 3
    np.testing.assert_allclose(g[3] - g[0], [0, 8, 0, 8])


def test_multilevel_generator():
    gen = A.AnchorGenerator(strides=(8, 16), scales=(8,), ratios=(0.5, 1.0, 2.0))
    out = gen([(4, 4), (2, 2)])
    assert out.shape == (4 * 4 * 3 + 2 * 2 * 3, 4)


def test_retinanet_scales():
    s = A.retinanet_octave_scales()
    np.testing.assert_allclose(s, [4.0, 4 * 2 ** (1 / 3), 4 * 2 ** (2 / 3)])
