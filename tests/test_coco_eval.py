"""COCO-protocol eval tests: constructed cases with known AP values, plus RLE."""

import numpy as np

from mxdetection_tpu.eval.coco_eval import CocoEvaluator
from mxdetection_tpu.eval import rle


def make_gt(image_id, cat, box, **kw):
    b = list(map(float, box))
    return {"image_id": image_id, "category": cat, "bbox": b,
            "area": (b[2] - b[0]) * (b[3] - b[1]), "iscrowd": False, **kw}


def test_perfect_detections_ap1():
    gts = [make_gt(0, 0, [10, 10, 50, 50]), make_gt(0, 0, [60, 60, 120, 130]),
           make_gt(1, 1, [5, 5, 100, 100])]
    ev = CocoEvaluator(gts, num_classes=2)
    ev.add(0, [[10, 10, 50, 50], [60, 60, 120, 130]], [0.9, 0.8], [0, 0])
    ev.add(1, [[5, 5, 100, 100]], [0.95], [1])
    r = ev.evaluate()
    assert abs(r["AP"] - 1.0) < 1e-6
    assert abs(r["AP50"] - 1.0) < 1e-6
    assert abs(r["AR100"] - 1.0) < 1e-6


def test_no_detections_ap0():
    gts = [make_gt(0, 0, [10, 10, 50, 50])]
    ev = CocoEvaluator(gts, num_classes=1)
    r = ev.evaluate()
    assert r["AP"] == 0.0 or r["AP"] == -1.0  # no dts at all -> zero


def test_half_iou_detection():
    """A det with IoU ~0.55 counts at thr .5/.55 only -> AP ~ 2/10."""
    gts = [make_gt(0, 0, [0, 0, 100, 100])]
    ev = CocoEvaluator(gts, num_classes=1)
    # shifted box: IoU = overlap/(2*area-overlap); pick ~0.57
    ev.add(0, [[0, 27, 100, 127]], [0.9], [0])
    r = ev.evaluate()
    iou = 73 * 100 / (2 * 100 * 100 - 73 * 100)
    n_pass = int(np.sum(np.linspace(0.5, 0.95, 10) <= iou + 1e-9))
    assert abs(r["AP"] - n_pass / 10) < 1e-6


def test_false_positive_lowers_precision():
    gts = [make_gt(0, 0, [10, 10, 50, 50])]
    ev = CocoEvaluator(gts, num_classes=1)
    # one perfect det (score .8) + one high-scored FP (score .9)
    ev.add(0, [[200, 200, 240, 240], [10, 10, 50, 50]], [0.9, 0.8], [0, 0])
    r = ev.evaluate()
    # precision at recall>0 is 1/2 ... after envelope: p=0.5 for all recalls
    assert abs(r["AP"] - 0.5) < 0.02


def test_crowd_gt_not_counted():
    gts = [make_gt(0, 0, [10, 10, 50, 50]),
           make_gt(0, 0, [0, 0, 200, 200], iscrowd=True)]
    gts[1]["iscrowd"] = True
    ev = CocoEvaluator(gts, num_classes=1)
    ev.add(0, [[10, 10, 50, 50]], [0.9], [0])
    r = ev.evaluate()
    assert abs(r["AP"] - 1.0) < 1e-6  # crowd ignored, single gt matched


def test_duplicate_detection_after_full_recall_keeps_ap():
    """COCO envelope semantics: a duplicate ranked below the match does NOT
    lower AP (precision envelope at recall 1.0 is unaffected)."""
    gts = [make_gt(0, 0, [10, 10, 50, 50])]
    ev = CocoEvaluator(gts, num_classes=1)
    ev.add(0, [[10, 10, 50, 50], [11, 11, 51, 51]], [0.9, 0.85], [0, 0])
    r = ev.evaluate()
    assert abs(r["AP50"] - 1.0) < 1e-6


def test_fp_between_matches_lowers_ap():
    """Two gts; FP ranked between their matches -> precision dips at recall 1."""
    gts = [make_gt(0, 0, [10, 10, 50, 50]), make_gt(0, 0, [100, 100, 150, 150])]
    ev = CocoEvaluator(gts, num_classes=1)
    ev.add(0, [[10, 10, 50, 50], [300, 300, 340, 340], [100, 100, 150, 150]],
           [0.9, 0.8, 0.7], [0, 0, 0])
    r = ev.evaluate()
    # pr sequence: tp,fp,tp -> precision at recall 1.0 = 2/3; envelope gives
    # AP50 = (1.0 * [0,.5] + 2/3 * (.5,1.0]) averaged over the recall grid
    assert 0.8 < r["AP50"] < 0.85


def test_area_ranges():
    # small gt (20x20=400 < 1024) only contributes to "small"
    gts = [make_gt(0, 0, [0, 0, 20, 20])]
    ev = CocoEvaluator(gts, num_classes=1)
    ev.add(0, [[0, 0, 20, 20]], [0.9], [0])
    r = ev.evaluate()
    assert abs(r["AP_small"] - 1.0) < 1e-6
    assert r["AP_medium"] == -1.0  # no medium gts anywhere
    assert r["AP_large"] == -1.0


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = rng.rand(37, 53) > 0.6
    enc = rle.encode_rle(mask)
    dec = rle.decode_rle(enc)
    np.testing.assert_array_equal(mask.astype(np.uint8), dec)
    assert rle.rle_area(enc) == int(mask.sum())


def test_rle_compression_roundtrip():
    rng = np.random.RandomState(1)
    mask = rng.rand(64, 64) > 0.5
    enc = rle.encode_rle(mask)
    s = rle.compress_counts(enc["counts"])
    back = rle._uncompress_counts(s)
    assert back == enc["counts"]


def test_rle_iou():
    a = np.zeros((10, 10), bool); a[:5] = True
    b = np.zeros((10, 10), bool); b[2:7] = True
    ea, eb = rle.encode_rle(a), rle.encode_rle(b)
    got = rle.rle_iou(ea, eb)
    assert abs(got - 30 / 70) < 1e-9


def test_repeated_add_accumulates():
    """Two add() calls for the same (image, category) must accumulate, not
    overwrite (TTA-style double adds; VERDICT r1 weak #8)."""
    gts = [make_gt(0, 0, [10, 10, 50, 50]), make_gt(0, 0, [60, 60, 120, 130])]
    ev = CocoEvaluator(gts, num_classes=1)
    ev.add(0, [[10, 10, 50, 50]], [0.9], [0])
    ev.add(0, [[60, 60, 120, 130]], [0.8], [0])
    r = ev.evaluate()
    assert abs(r["AP"] - 1.0) < 1e-6, "second add was dropped/overwritten"
