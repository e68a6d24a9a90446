"""NMS vs golden numpy greedy implementation (SURVEY.md §4.1)."""

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops import nms as N


def np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            iw = min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0])
            ih = min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1])
            inter = max(iw, 0) * max(ih, 0)
            union = area[i] + area[j] - inter
            if union > 0 and inter / union > thr:
                suppressed[j] = True
    return sorted(keep)


def random_dets(rng, n, size=200):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    # distinct scores avoid tie-order ambiguity between implementations
    scores = rng.permutation(n).astype(np.float32) / n
    return boxes, scores


def test_nms_mask_matches_numpy_greedy():
    rng = np.random.RandomState(42)
    for trial in range(5):
        boxes, scores = random_dets(rng, 100)
        keep = np.flatnonzero(np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5)))
        golden = np_greedy_nms(boxes, scores, 0.5)
        assert list(keep) == golden, f"trial {trial}"


def test_nms_padding_invariance():
    """Appending invalid padded boxes must not change kept set."""
    rng = np.random.RandomState(7)
    boxes, scores = random_dets(rng, 60)
    b, s, v = N.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=30)
    pad_boxes = np.concatenate([boxes, np.zeros((40, 4), np.float32)])
    pad_scores = np.concatenate([scores, np.zeros(40, np.float32)])
    valid = np.concatenate([np.ones(60, bool), np.zeros(40, bool)])
    b2, s2, v2 = N.nms(jnp.asarray(pad_boxes), jnp.asarray(pad_scores), 0.5,
                       max_out=30, valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(b), np.asarray(b2))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))


def test_class_aware_nms_separates_classes():
    # identical boxes, different classes: both survive per-class NMS
    boxes = jnp.asarray([[0.0, 0, 10, 10], [0, 0, 10, 10]])
    scores = jnp.asarray([0.9, 0.8])
    labels = jnp.asarray([1, 2])
    b, s, l, v = N.class_aware_nms(boxes, scores, labels, 0.5, max_out=4)
    assert int(v.sum()) == 2
    # same class: one suppressed
    labels2 = jnp.asarray([1, 1])
    _, _, _, v2 = N.class_aware_nms(boxes, scores, labels2, 0.5, max_out=4)
    assert int(v2.sum()) == 1


def test_nms_jit_and_batch():
    rng = np.random.RandomState(3)
    boxes = np.stack([random_dets(rng, 50)[0] for _ in range(4)])
    scores = np.stack([random_dets(rng, 50)[1] for _ in range(4)])
    fn = jax.jit(lambda b, s: N.batched_nms(b, s, 0.5, 10))
    b, s, v = fn(jnp.asarray(boxes), jnp.asarray(scores))
    assert b.shape == (4, 10, 4) and v.dtype == jnp.bool_
