"""Box voting vs a straight-line numpy golden (Gidaris & Komodakis 2015).

Golden: for each kept detection, average the coordinates of all same-class
pool candidates with IoU >= vote_thr, weighted by their (original) scores.
The family ships this as the test-time ``bbox_vote`` per-class host loop;
the op is one (K, N) IoU + two contractions with fixed shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mxdetection_tpu.ops import nms as nms_lib


def golden_vote(kept_boxes, kept_labels, pool_boxes, pool_scores, pool_labels,
                thr):
    def iou(a, b):
        lt = np.maximum(a[:2], b[:2])
        rb = np.minimum(a[2:], b[2:])
        wh = np.maximum(rb - lt, 0.0)
        inter = wh[0] * wh[1]
        area = lambda x: max(x[2] - x[0], 0) * max(x[3] - x[1], 0)
        return inter / max(area(a) + area(b) - inter, 1e-12)

    out = kept_boxes.astype(np.float64).copy()
    for k in range(len(kept_boxes)):
        w_sum, acc = 0.0, np.zeros(4)
        for j in range(len(pool_boxes)):
            if pool_labels[j] != kept_labels[k]:
                continue
            if iou(kept_boxes[k], pool_boxes[j]) < thr:
                continue
            w = max(float(pool_scores[j]), 0.0)
            w_sum += w
            acc += w * pool_boxes[j]
        if w_sum > 0:
            out[k] = acc / w_sum
    return out


def _boxes(n, seed):
    r = np.random.RandomState(seed)
    xy = r.rand(n, 2) * 200
    wh = r.rand(n, 2) * 80 + 5
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def test_matches_golden():
    n, thr = 64, 0.5
    pool = _boxes(n, 0)
    r = np.random.RandomState(1)
    scores = r.rand(n).astype(np.float32)
    labels = r.randint(0, 3, n).astype(np.int32)
    # kept = a few pool rows, jittered slightly
    kept_idx = [3, 10, 40]
    kept = pool[kept_idx] + r.randn(3, 4).astype(np.float32)
    kept_labels = labels[kept_idx]
    kept_valid = np.asarray([True, True, True])

    got = jax.jit(lambda kb, kl, kv, b, s, l: nms_lib.box_voting(
        kb, kl, kv, b, s, l, thr))(
        jnp.asarray(kept), jnp.asarray(kept_labels), jnp.asarray(kept_valid),
        jnp.asarray(pool), jnp.asarray(scores), jnp.asarray(labels))
    exp = golden_vote(kept, kept_labels, pool, scores, labels, thr)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-4)


def test_no_match_keeps_original():
    kept = np.asarray([[0.0, 0, 10, 10]], np.float32)
    pool = np.asarray([[100.0, 100, 120, 120]], np.float32)
    got = nms_lib.box_voting(
        jnp.asarray(kept), jnp.asarray([0], jnp.int32), jnp.asarray([True]),
        jnp.asarray(pool), jnp.asarray([0.9], jnp.float32),
        jnp.asarray([0], jnp.int32), 0.5)
    np.testing.assert_array_equal(np.asarray(got), kept)


def test_cross_class_pool_ignored():
    kept = np.asarray([[0.0, 0, 10, 10]], np.float32)
    pool = np.asarray([[0.0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    got = nms_lib.box_voting(
        jnp.asarray(kept), jnp.asarray([0], jnp.int32), jnp.asarray([True]),
        jnp.asarray(pool), jnp.asarray([0.5, 0.5], jnp.float32),
        jnp.asarray([0, 1], jnp.int32), 0.5)
    # only the same-class (identical) candidate votes -> coords unchanged
    np.testing.assert_allclose(np.asarray(got), kept, atol=1e-5)


def test_invalid_pool_rows_excluded():
    kept = np.asarray([[0.0, 0, 10, 10]], np.float32)
    pool = np.asarray([[0.0, 0, 10, 10], [2, 2, 12, 12]], np.float32)
    valid = np.asarray([True, False])
    got = nms_lib.box_voting(
        jnp.asarray(kept), jnp.asarray([0], jnp.int32), jnp.asarray([True]),
        jnp.asarray(pool), jnp.asarray([0.5, 0.9], jnp.float32),
        jnp.asarray([0, 0], jnp.int32), 0.5, pool_valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got), kept, atol=1e-5)


def test_dispatch_with_vote():
    """class_aware_nms_from_cfg applies voting when t.bbox_vote is set and
    leaves scores/labels/valid untouched. The pool embeds same-class
    clusters (jittered copies) so NMS-suppressed neighbors genuinely pull
    the kept coordinates — the cross-candidate case, not just self-votes."""
    r = np.random.RandomState(6)
    base = _boxes(12, 5)
    # 4 jittered same-class copies of each base box
    pool = np.concatenate(
        [base + r.randn(*base.shape).astype(np.float32) * 3.0 for _ in range(4)])
    n = len(pool)
    scores = r.rand(n).astype(np.float32)
    labels = np.tile(np.arange(12) % 4, 4).astype(np.int32)

    class T:
        nms_method = "greedy"
        nms_thr = 0.5
        max_per_image = 16
        score_thr = 0.0
        bbox_vote = True
        vote_thr = 0.6

    class TNoVote(T):
        bbox_vote = False

    b1, s1, l1, v1 = jax.jit(lambda b, s, l: nms_lib.class_aware_nms_from_cfg(
        T, b, s, l))(jnp.asarray(pool), jnp.asarray(scores), jnp.asarray(labels))
    b0, s0, l0, v0 = jax.jit(lambda b, s, l: nms_lib.class_aware_nms_from_cfg(
        TNoVote, b, s, l))(jnp.asarray(pool), jnp.asarray(scores),
                           jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    # voted coords equal the golden vote applied to the unvoted kept set
    exp = golden_vote(np.asarray(b0), np.asarray(l0), pool, scores, labels,
                      T.vote_thr)
    kept = np.asarray(v0)
    np.testing.assert_allclose(np.asarray(b1)[kept], exp[kept], rtol=1e-5,
                               atol=1e-4)
    # the clusters guarantee real cross-candidate pulls, so voting must
    # actually move coordinates (guards against a silently-disabled pass)
    assert np.abs(np.asarray(b1)[kept] - np.asarray(b0)[kept]).max() > 0.1
