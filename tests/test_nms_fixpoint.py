"""Fixpoint (MXU matvec) NMS vs sequential greedy reference — exactness."""

import numpy as np
import jax.numpy as jnp

from mxdetection_tpu.ops import nms as N


def random_dets(rng, n, size=200, wh_max=80):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(10, wh_max, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.permutation(n).astype(np.float32) / n
    return boxes, scores


def test_fixpoint_matches_sequential_greedy():
    rng = np.random.RandomState(0)
    for trial in range(8):
        # dense overlapping sets force deep suppression chains
        boxes, scores = random_dets(rng, 200, size=120, wh_max=60)
        ref = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        got = np.asarray(N.nms_mask_fixpoint(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        np.testing.assert_array_equal(got, ref, err_msg=f"trial {trial}")


def test_fixpoint_chain_case():
    """A strict suppression chain A>B>C>D... where alternate boxes survive —
    the case plain one-shot masking gets wrong."""
    n = 12
    boxes = np.stack([
        np.arange(n) * 5.0, np.zeros(n), np.arange(n) * 5.0 + 20, np.full(n, 20.0)
    ], axis=1).astype(np.float32)  # each overlaps its neighbors heavily
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    ref = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.3))
    got = np.asarray(N.nms_mask_fixpoint(jnp.asarray(boxes), jnp.asarray(scores), 0.3))
    np.testing.assert_array_equal(got, ref)
    # sanity: chain keeps alternating boxes, so more than 1 but fewer than n
    assert 1 < got.sum() < n


def test_fixpoint_with_validity():
    rng = np.random.RandomState(3)
    boxes, scores = random_dets(rng, 100)
    valid = np.ones(100, bool)
    valid[50:] = False
    ref = np.asarray(N.nms_mask(jnp.asarray(boxes),
                                jnp.asarray(np.where(valid, scores, -np.inf)),
                                0.5, jnp.asarray(valid)))
    got = np.asarray(N.nms_mask_fixpoint(jnp.asarray(boxes),
                                         jnp.asarray(np.where(valid, scores, -np.inf)),
                                         0.5, jnp.asarray(valid)))
    np.testing.assert_array_equal(got, ref)
