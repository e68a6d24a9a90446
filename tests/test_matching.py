import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops import matching as M


def test_assign_basic_rules():
    boxes = jnp.asarray([
        [0.0, 0, 10, 10],     # IoU 1.0 with gt0 -> pos
        [0.0, 0, 5, 10],      # IoU 0.5 with gt0 -> between -> ignore
        [50.0, 50, 60, 60],   # IoU 0 -> neg
    ])
    gt = jnp.asarray([[0.0, 0, 10, 10], [0, 0, 0, 0]])
    gt_valid = jnp.asarray([True, False])
    res = M.assign_max_iou(boxes, gt, gt_valid, pos_iou_thr=0.7, neg_iou_thr=0.3,
                           match_low_quality=False)
    assert list(np.asarray(res.labels)) == [1, -1, 0]
    assert int(res.matched_gt[0]) == 0


def test_assign_low_quality_match():
    # gt1's best anchor only reaches IoU .4 -> forced positive anyway
    boxes = jnp.asarray([[0.0, 0, 10, 10], [100.0, 100, 110, 120]])
    gt = jnp.asarray([[0.0, 0, 10, 10], [100.0, 100, 110, 108]])
    gt_valid = jnp.asarray([True, True])
    res = M.assign_max_iou(boxes, gt, gt_valid, pos_iou_thr=0.7, neg_iou_thr=0.3,
                           match_low_quality=True)
    assert list(np.asarray(res.labels)) == [1, 1]
    assert list(np.asarray(res.matched_gt)) == [0, 1]


def test_assign_no_gt_all_negative():
    boxes = jnp.asarray([[0.0, 0, 10, 10], [5.0, 5, 15, 15]])
    gt = jnp.zeros((3, 4))
    res = M.assign_max_iou(boxes, gt, jnp.zeros(3, bool), pos_iou_thr=0.7, neg_iou_thr=0.3)
    assert (np.asarray(res.labels) == 0).all()


def test_subsample_respects_quota():
    key = jax.random.PRNGKey(0)
    labels = jnp.asarray([1] * 300 + [0] * 500 + [-1] * 200)
    mask, new_labels = M.subsample_labels(key, labels, num_samples=256, pos_fraction=0.5)
    kept_pos = int(((new_labels == 1) & mask).sum())
    kept_neg = int(((new_labels == 0) & mask).sum())
    assert kept_pos == 128 and kept_neg == 128
    assert int(mask.sum()) == 256


def test_subsample_few_positives_fills_negatives():
    key = jax.random.PRNGKey(1)
    labels = jnp.asarray([1] * 10 + [0] * 500)
    mask, new_labels = M.subsample_labels(key, labels, num_samples=256, pos_fraction=0.5)
    assert int(((new_labels == 1) & mask).sum()) == 10
    assert int(((new_labels == 0) & mask).sum()) == 246


def test_sample_rois_counts_and_labels():
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    # 2 gts; proposals: 40 near gt0, 40 near gt1, 120 background
    gt = np.asarray([[10, 10, 100, 100], [200, 200, 300, 320]], np.float32)
    props = []
    for g in gt:
        for _ in range(40):
            jit = rng.uniform(-5, 5, 4)
            props.append(g + jit)
    for _ in range(120):
        xy = rng.uniform(350, 500, 2)
        props.append(np.concatenate([xy, xy + rng.uniform(20, 60, 2)]))
    props = np.asarray(props, np.float32)

    out = M.sample_rois(
        key, jnp.asarray(props), jnp.ones(len(props), bool),
        jnp.asarray(gt), jnp.asarray([3, 7]), jnp.ones(2, bool),
        num_samples=64, pos_fraction=0.25,
        pos_iou_thr=0.5, neg_iou_thr_hi=0.5,
    )
    assert out.rois.shape == (64, 4)
    n_pos = int(out.pos_mask.sum())
    assert n_pos == 16  # plenty of fg available -> exactly the quota
    assert int(out.valid_mask.sum()) == 64
    labels = np.asarray(out.labels)
    assert set(labels[np.asarray(out.pos_mask)]) <= {3, 7}
    assert (labels[~np.asarray(out.pos_mask)] == 0).all()
    # positives come first in the fixed layout
    pos_idx = np.flatnonzero(np.asarray(out.pos_mask))
    assert pos_idx.max() == n_pos - 1


def test_sample_rois_jit():
    key = jax.random.PRNGKey(0)
    fn = jax.jit(lambda k, p, g, gl: M.sample_rois(
        k, p, jnp.ones(p.shape[0], bool), g, gl, jnp.ones(g.shape[0], bool),
        num_samples=32, pos_fraction=0.25, pos_iou_thr=0.5, neg_iou_thr_hi=0.5))
    out = fn(key, jnp.ones((100, 4)) * 10, jnp.ones((5, 4)) * 10, jnp.ones(5, jnp.int32))
    assert out.rois.shape == (32, 4)
