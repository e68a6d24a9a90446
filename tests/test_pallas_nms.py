"""Pallas NMS kernel vs the lax reference implementation (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops import nms as ref_nms
from mxdetection_tpu.ops.pallas import nms as pnms


def random_dets(rng, n, size=200):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.permutation(n).astype(np.float32) / n
    return boxes, scores


def test_pallas_nms_matches_reference():
    rng = np.random.RandomState(0)
    for n in (128, 200, 384):
        boxes, scores = random_dets(rng, n)
        rb, rs, rv = ref_nms.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64)
        pb, ps, pv = pnms.nms_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64,
                                     interpret=True)
        np.testing.assert_array_equal(np.asarray(rv), np.asarray(pv))
        np.testing.assert_allclose(np.asarray(rb), np.asarray(pb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(rs), np.asarray(ps), atol=1e-6)


def test_pallas_nms_with_invalid_padding():
    rng = np.random.RandomState(1)
    boxes, scores = random_dets(rng, 100)
    valid = np.ones(100, bool)
    valid[60:] = False
    rb, rs, rv = ref_nms.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.6, 32,
                             valid=jnp.asarray(valid))
    pb, ps, pv = pnms.nms_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.6, 32,
                                 valid=jnp.asarray(valid), interpret=True)
    np.testing.assert_array_equal(np.asarray(rv), np.asarray(pv))
    np.testing.assert_allclose(np.asarray(rb), np.asarray(pb), atol=1e-5)


def test_pallas_class_aware_matches_reference():
    rng = np.random.RandomState(2)
    boxes, scores = random_dets(rng, 150)
    labels = rng.randint(0, 5, 150)
    r = ref_nms.class_aware_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                jnp.asarray(labels), 0.5, 40)
    p = pnms.class_aware_nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                    jnp.asarray(labels), 0.5, 40, interpret=True)
    np.testing.assert_array_equal(np.asarray(r[3]), np.asarray(p[3]))
    np.testing.assert_allclose(np.asarray(r[0]), np.asarray(p[0]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(r[2]), np.asarray(p[2]))
