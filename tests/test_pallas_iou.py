import numpy as np
import jax.numpy as jnp

from mxdetection_tpu.ops import boxes as B
from mxdetection_tpu.ops.pallas.iou import pairwise_iou_pallas


def random_boxes(rng, n, size=600):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pallas_iou_matches_reference():
    rng = np.random.RandomState(0)
    for n, k in [(100, 37), (256, 128), (300, 5)]:
        b1, b2 = random_boxes(rng, n), random_boxes(rng, k)
        ref = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
        got = np.asarray(pairwise_iou_pallas(jnp.asarray(b1), jnp.asarray(b2),
                                             interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_pallas_iou_zero_padding_boxes():
    b1 = jnp.asarray([[0.0, 0, 0, 0], [10, 10, 20, 20]])
    b2 = jnp.asarray([[10.0, 10, 20, 20]])
    got = np.asarray(pairwise_iou_pallas(b1, b2, interpret=True))
    np.testing.assert_allclose(got, [[0.0], [1.0]], atol=1e-6)
