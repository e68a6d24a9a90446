"""Soft-NMS vs a straight-line numpy golden of Bodla et al. (2017).

The golden runs the classic algorithm to exhaustion; the TPU op runs exactly
``max_out`` picks — the emitted sequence is non-increasing, so the first
``max_out`` golden detections must match.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mxdetection_tpu.ops import nms as nms_lib


def golden_soft_nms(boxes, scores, method, iou_thr, sigma, score_thr):
    boxes = boxes.astype(np.float64).copy()
    scores = scores.astype(np.float64).copy()
    alive = np.ones(len(scores), bool)
    picks, pick_scores = [], []
    area = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0)
    while alive.any():
        cand = np.where(alive, scores, -np.inf)
        i = int(np.argmax(cand))
        picks.append(i)
        pick_scores.append(scores[i])
        alive[i] = False
        lt = np.maximum(boxes[:, :2], boxes[i, :2])
        rb = np.minimum(boxes[:, 2:], boxes[i, 2:])
        wh = np.maximum(rb - lt, 0.0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.maximum(area + area[i] - inter, 1e-12)
        if method == "linear":
            decay = np.where(iou > iou_thr, 1.0 - iou, 1.0)
        else:
            decay = np.exp(-(iou ** 2) / sigma)
        scores[alive] *= decay[alive]
    keep = [(i, s) for i, s in zip(picks, pick_scores) if s > score_thr]
    return keep


def _boxes(n, seed):
    r = np.random.RandomState(seed)
    xy = r.rand(n, 2) * 200
    wh = r.rand(n, 2) * 80 + 5
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def _run(method, seed, n=60, max_out=20, iou_thr=0.3, sigma=0.5, thr=1e-3):
    boxes = _boxes(n, seed)
    scores = np.random.RandomState(seed + 1).rand(n).astype(np.float32)
    ob, os_, ov = jax.jit(lambda b, s: nms_lib.soft_nms(
        b, s, max_out, method=method, iou_thr=iou_thr, sigma=sigma,
        score_thr=thr))(jnp.asarray(boxes), jnp.asarray(scores))
    gold = golden_soft_nms(boxes, scores, method, iou_thr, sigma, thr)[:max_out]
    nv = int(np.asarray(ov).sum())
    assert nv == len(gold), (nv, len(gold))
    got_boxes = np.asarray(ob)[:nv]
    got_scores = np.asarray(os_)[:nv]
    exp_boxes = boxes[[i for i, _ in gold]]
    exp_scores = np.asarray([s for _, s in gold])
    np.testing.assert_array_equal(got_boxes, exp_boxes)
    np.testing.assert_allclose(got_scores, exp_scores, rtol=2e-5)
    # picked scores must be non-increasing (top-max_out property)
    assert np.all(np.diff(got_scores) <= 1e-7)


def test_linear_matches_golden():
    _run("linear", 0)


def test_gaussian_matches_golden():
    _run("gaussian", 10)


def test_identical_boxes_no_nan():
    # decay == 0 against -inf padding is the NaN hazard the op guards
    boxes = np.tile(np.asarray([[10.0, 10, 50, 50]], np.float32), (8, 1))
    scores = np.asarray([0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2], np.float32)
    valid = np.asarray([True] * 4 + [False] * 4)
    ob, os_, ov = jax.jit(lambda b, s, v: nms_lib.soft_nms(
        b, s, 8, method="linear", iou_thr=0.3, score_thr=1e-3, valid=v))(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    assert not np.any(np.isnan(np.asarray(os_)))
    # identical boxes: linear decay factor is 0, so only the top pick survives
    assert np.asarray(ov).sum() == 1
    assert np.asarray(os_)[0] == np.float32(0.9)


def test_class_aware_no_cross_class_decay():
    # two perfectly-overlapping boxes of different classes: both survive with
    # undecayed scores; same class: the second is decayed
    boxes = np.asarray([[0.0, 0, 10, 10], [0, 0, 10, 10], [0, 0, 10, 10]],
                       np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    labels = np.asarray([0, 1, 0], np.int32)
    ob, os_, ol, ov = jax.jit(lambda b, s, l: nms_lib.class_aware_soft_nms(
        b, s, l, 3, method="gaussian", sigma=0.5, score_thr=1e-3))(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels))
    os_, ol, ov = np.asarray(os_), np.asarray(ol), np.asarray(ov)
    assert ov[:2].all()
    np.testing.assert_allclose(os_[0], 0.9, rtol=1e-6)
    np.testing.assert_allclose(os_[1], 0.8, rtol=1e-6)  # cross-class: no decay
    # same-class duplicate: gaussian decay exp(-1/0.5) ~ 0.135
    np.testing.assert_allclose(os_[2], 0.7 * np.exp(-1 / 0.5), rtol=1e-5)
    assert list(ol[:3]) == [0, 1, 0]


def test_postprocess_integration_soft_gaussian():
    """Flagship detector postprocess with test.nms_method=soft_gaussian:
    valid detections, non-increasing scores, boxes inside the image."""
    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.models.registry import build_detector

    cfg = load_config("configs/faster_rcnn_r50_fpn_1x.py").override(**{
        "data.pad_h": 256, "data.pad_w": 320,
        "data.scale": 240, "data.max_size": 320,
        "backbone.dtype": "float32",
        "bbox_head.num_samples": 32,
        "rpn.pre_nms_top_n_test": 400, "rpn.post_nms_top_n_test": 100,
        "test.pre_nms_per_class": 200, "test.max_per_image": 20,
        "test.nms_method": "soft_gaussian", "test.score_thr": 1e-3,
    })
    bundle = build_detector(cfg)
    r = np.random.RandomState(0)
    img = (r.rand(256, 320, 3) * 60).astype(np.float32)
    img[40:120, 50:170] += 120.0
    img = np.clip(img, 0, 255) / 255.0
    tb = {"images": jnp.asarray(img[None], jnp.float32),
          "im_info": jnp.asarray([[256.0, 320.0, 1.0]]),
          "gt_boxes": jnp.zeros((1, 8, 4)),
          "gt_labels": jnp.zeros((1, 8), jnp.int32),
          "gt_valid": jnp.zeros((1, 8), bool)}
    variables = bundle.init(jax.random.PRNGKey(7), tb)
    out = bundle.apply_eval(variables, {"images": tb["images"],
                                        "im_info": tb["im_info"]})
    dets = bundle.postprocess(out, cfg, (256, 320), tb["im_info"])
    v = np.asarray(dets["valid"][0])
    s = np.asarray(dets["scores"][0])[v]
    b = np.asarray(dets["boxes"][0])[v]
    assert v.sum() > 0
    assert np.all(np.diff(s) <= 1e-7)
    assert np.all(b[:, 0] >= 0) and np.all(b[:, 1] >= 0)
    assert np.all(b[:, 2] <= 320) and np.all(b[:, 3] <= 256)


def test_cfg_dispatch():
    from mxdetection_tpu.config import load_config
    cfg = load_config("configs/faster_rcnn_r50_fpn_1x.py")
    boxes = jnp.asarray(_boxes(32, 3))
    scores = jnp.asarray(np.random.RandomState(4).rand(32), jnp.float32)
    labels = jnp.zeros((32,), jnp.int32)
    # greedy path
    out = nms_lib.class_aware_nms_from_cfg(cfg.test, boxes, scores, labels)
    assert len(out) == 4
    # soft path via a raw namespace stand-in (TestCfg is frozen)
    class T:
        nms_method = "soft_linear"
        nms_thr = 0.3
        soft_sigma = 0.5
        max_per_image = cfg.test.max_per_image
        score_thr = 1e-3
    out2 = nms_lib.class_aware_nms_from_cfg(T, boxes, scores, labels)
    assert len(out2) == 4
