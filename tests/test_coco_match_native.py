"""Native C++ COCO matcher vs the python reference loop."""

import numpy as np
import pytest

from mxdetection_tpu.eval import coco_eval as ce

pytestmark = pytest.mark.skipif(ce._native_matcher() is None,
                                reason="no C++ toolchain")


def python_match(dt_scores, ious, gt_ignore, gt_iscrowd, thrs):
    """Reference matching, forced python path."""
    saved = ce._NATIVE_MATCH
    ce._NATIVE_MATCH = False
    try:
        return ce._match_image_category(dt_scores, ious, gt_ignore, gt_iscrowd, thrs)
    finally:
        ce._NATIVE_MATCH = saved


def test_native_matches_python_random():
    rng = np.random.RandomState(0)
    for trial in range(20):
        d = rng.randint(0, 12)
        g = rng.randint(0, 8)
        scores = -np.sort(-rng.rand(d))
        ious = rng.rand(d, g)
        gt_ignore = rng.rand(g) < 0.3
        gt_crowd = gt_ignore & (rng.rand(g) < 0.5)
        thrs = np.linspace(0.5, 0.95, 10)
        pm, pi = python_match(scores, ious, gt_ignore, gt_crowd, thrs)
        nm, ni = ce._match_image_category(scores, ious, gt_ignore, gt_crowd, thrs)
        np.testing.assert_array_equal(pm, nm, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(pi, ni, err_msg=f"trial {trial}")


def test_native_crowd_absorbs_multiple():
    # one crowd gt, two dts both above thr: both may match the crowd
    scores = np.asarray([0.9, 0.8])
    ious = np.asarray([[0.8], [0.7]])
    gt_ignore = np.asarray([True])
    gt_crowd = np.asarray([True])
    thrs = np.asarray([0.5])
    nm, ni = ce._match_image_category(scores, ious, gt_ignore, gt_crowd, thrs)
    assert nm.tolist() == [[0, 0]]
    assert ni.all()
