"""Semantics-freeze fixtures (SURVEY.md §4.2).

The mAP-parity contract leaves no room for silent drift in target-assignment
semantics. These tests pin the exact outputs of the assignment/sampling/NMS
chain for fixed seeds; any refactor (e.g. swapping in a Pallas kernel) that
changes results fails here first. Fixtures are stored as .npz next to the
tests and regenerated explicitly with REGEN=1.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops import matching, nms

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
REGEN = os.environ.get("REGEN_FIXTURES") == "1"


def _boxes(rng, n, size=600):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(4, size / 3, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def check_or_regen(name: str, arrays: dict):
    path = os.path.join(FIXTURE_DIR, name + ".npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        np.savez(path, **arrays)
        assert REGEN or not os.path.exists(path + ".lock"), "fixture created"
        return
    ref = np.load(path)
    for k, v in arrays.items():
        np.testing.assert_allclose(
            np.asarray(v), ref[k], atol=1e-5,
            err_msg=f"{name}/{k} drifted from frozen semantics")


def test_anchor_assignment_frozen():
    rng = np.random.RandomState(42)
    boxes = _boxes(rng, 200)
    gt = _boxes(rng, 7)
    res = matching.assign_max_iou(
        jnp.asarray(boxes), jnp.asarray(gt), jnp.ones(7, bool),
        pos_iou_thr=0.7, neg_iou_thr=0.3, match_low_quality=True)
    check_or_regen("anchor_assign", {
        "labels": res.labels, "matched": res.matched_gt, "max_iou": res.max_iou})


def test_subsample_frozen():
    rng = np.random.RandomState(1)
    labels = jnp.asarray(rng.choice([-1, 0, 1], size=500, p=[0.2, 0.6, 0.2]))
    mask, new_labels = matching.subsample_labels(
        jax.random.PRNGKey(7), labels, num_samples=256, pos_fraction=0.5)
    check_or_regen("subsample", {"mask": mask, "labels": new_labels})


def test_sample_rois_frozen():
    rng = np.random.RandomState(3)
    props = _boxes(rng, 300)
    gt = _boxes(rng, 5)
    out = matching.sample_rois(
        jax.random.PRNGKey(11), jnp.asarray(props), jnp.ones(300, bool),
        jnp.asarray(gt), jnp.asarray([1, 2, 3, 4, 5]), jnp.ones(5, bool),
        num_samples=64, pos_fraction=0.25, pos_iou_thr=0.5, neg_iou_thr_hi=0.5)
    check_or_regen("sample_rois", {
        "rois": out.rois, "labels": out.labels, "pos": out.pos_mask,
        "valid": out.valid_mask})


def test_nms_frozen():
    rng = np.random.RandomState(5)
    boxes = _boxes(rng, 256, size=300)
    scores = rng.rand(256).astype(np.float32)
    b, s, v = nms.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64)
    check_or_regen("nms", {"boxes": b, "scores": s, "valid": v})
