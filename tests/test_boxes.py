"""Golden-numpy tests for box geometry ops (SURVEY.md §4.1)."""

import numpy as np
import jax.numpy as jnp

from mxdetection_tpu.ops import boxes as B


def np_iou(b1, b2):
    a1 = np.maximum(b1[:, 2] - b1[:, 0], 0) * np.maximum(b1[:, 3] - b1[:, 1], 0)
    a2 = np.maximum(b2[:, 2] - b2[:, 0], 0) * np.maximum(b2[:, 3] - b2[:, 1], 0)
    out = np.zeros((len(b1), len(b2)))
    for i in range(len(b1)):
        for j in range(len(b2)):
            iw = min(b1[i, 2], b2[j, 2]) - max(b1[i, 0], b2[j, 0])
            ih = min(b1[i, 3], b2[j, 3]) - max(b1[i, 1], b2[j, 1])
            inter = max(iw, 0) * max(ih, 0)
            union = a1[i] + a2[j] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def random_boxes(rng, n, size=600):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pairwise_iou_matches_numpy():
    rng = np.random.RandomState(0)
    b1, b2 = random_boxes(rng, 37), random_boxes(rng, 23)
    got = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, np_iou(b1, b2), rtol=1e-5, atol=1e-6)


def test_iou_padding_boxes_are_zero():
    b1 = jnp.asarray([[0.0, 0, 0, 0], [10, 10, 20, 20]])
    b2 = jnp.asarray([[0.0, 0, 0, 0]])
    got = np.asarray(B.pairwise_iou(b1, b2))
    assert (got == 0).all()


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(1)
    rois = jnp.asarray(random_boxes(rng, 50))
    gt = jnp.asarray(random_boxes(rng, 50))
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = B.encode_boxes(rois, gt, stds=stds)
    back = B.decode_boxes(rois, deltas, stds=stds)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-4, atol=1e-2)


def test_decode_class_specific_shape():
    rois = jnp.asarray([[0.0, 0, 10, 10]])
    deltas = jnp.zeros((1, 4 * 81))
    out = B.decode_boxes(rois, deltas)
    assert out.shape == (1, 4 * 81)
    np.testing.assert_allclose(np.asarray(out).reshape(81, 4), np.tile([0, 0, 10, 10], (81, 1)), atol=1e-5)


def test_clip_and_flip():
    b = jnp.asarray([[-5.0, -5, 700, 500]])
    clipped = B.clip_boxes(b, jnp.asarray([480.0, 640.0]))
    np.testing.assert_allclose(np.asarray(clipped), [[0, 0, 640, 480]])
    f = B.flip_boxes(jnp.asarray([[10.0, 20, 30, 40]]), 100.0)
    np.testing.assert_allclose(np.asarray(f), [[70, 20, 90, 40]])
    ff = B.flip_boxes(f, 100.0)
    np.testing.assert_allclose(np.asarray(ff), [[10, 20, 30, 40]])
