"""Train-step frozen fixtures, one per contract config (VERDICT r3 item 9).

The detector fixtures (tests/test_detector_fixtures.py) pin INFERENCE
semantics; these pin TRAINING semantics: fixed seed + fixed batch ->
pinned per-loss values and per-collection gradient global-norms through
``bundle.apply_train`` + ``bundle.loss_fn`` + ``jax.grad``. Any drift in
target assignment, sampling, loss math, or backward flow fails here first
(SURVEY.md §4.2 — drift-pins training in lieu of real reference weights).

The multihost/sync_bn config runs in TRAIN mode here, so unlike its
eval-mode detector fixture (which collapses to the flagship's computation,
VERDICT r2 weak #5) this artifact exercises batch-stat normalization and is
NOT a duplicate of the flagship's.

Regenerate explicitly with REGEN_FIXTURES=1. Float32, small-but-real shapes.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mxdetection_tpu.config import load_config
from mxdetection_tpu.models.registry import build_detector

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
REGEN = os.environ.get("REGEN_FIXTURES") == "1"

HW = (256, 320)

CONFIGS = [
    "faster_rcnn_r50_fpn_1x",
    "retinanet_r50_fpn_1x",
    "mask_rcnn_r50_fpn_1x",
    "cascade_rcnn_r101_dcn_1x",
    "multihost_dp_faster_rcnn_v5p16",
    "rfcn_r50_1x",
]


def shrink(cfg):
    over = {
        "data.pad_h": HW[0], "data.pad_w": HW[1],
        "data.scale": 240, "data.max_size": 320, "data.max_gt": 8,
        "backbone.dtype": "float32",
    }
    if cfg.detector != "retinanet":
        over.update({
            "bbox_head.num_samples": 32,
            "rpn.pre_nms_top_n_train": 400, "rpn.post_nms_top_n_train": 100,
        })
    cfg = cfg.override(**over)
    if cfg.name.startswith("cascade"):
        # CI shrink: R50 depth; keeps the cascade + DCN train paths
        cfg = cfg.override(**{"backbone.depth": 50,
                              "backbone.dcn_stages": (False, False, False, True)})
    if cfg.name.startswith("rfcn"):
        # keep OHEM selective at the shrunk sample count (keep < samples)
        cfg = cfg.override(**{"bbox_head.ohem_keep": 16})
    return cfg


def synthetic_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    img = (rng.rand(2, *HW, 3) * 60).astype(np.float32)
    img[0, 40:120, 50:170] += 120.0
    img[0, 150:230, 180:290] += 90.0
    img[1, 20:100, 30:140] += 100.0
    img = np.clip(img, 0, 255) / 255.0

    gt_boxes = np.zeros((2, 8, 4), np.float32)
    gt_boxes[0, 0] = [50, 40, 170, 120]
    gt_boxes[0, 1] = [180, 150, 290, 230]
    gt_boxes[1, 0] = [30, 20, 140, 100]
    gt_labels = np.zeros((2, 8), np.int32)
    gt_labels[0, :2] = [1, 3]
    gt_labels[1, 0] = 2
    gt_valid = np.zeros((2, 8), bool)
    gt_valid[0, :2] = True
    gt_valid[1, 0] = True

    tb = {
        "images": jnp.asarray(img, jnp.float32),
        "im_info": jnp.asarray([[HW[0], HW[1], 1.0]] * 2),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_labels": jnp.asarray(gt_labels),
        "gt_valid": jnp.asarray(gt_valid),
    }
    if cfg.mask_head is not None:
        # filled canonical box-masks: a centered solid rectangle per gt
        bm = np.zeros((2, 8, 28, 28), np.uint8)
        bm[:, :, 6:22, 4:24] = 1
        tb["box_masks"] = jnp.asarray(bm)
    return tb


def check_or_regen(name, arrays):
    path = os.path.join(FIXTURE_DIR, name + ".npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})
        return
    ref = np.load(path)
    assert set(arrays) == set(ref.files), (sorted(arrays), sorted(ref.files))
    for k, v in arrays.items():
        np.testing.assert_allclose(
            np.asarray(v, np.float64), ref[k].astype(np.float64),
            rtol=2e-4, atol=1e-5,
            err_msg=f"{name}/{k} drifted from frozen training semantics")


@pytest.mark.parametrize("name", CONFIGS)
def test_train_step_frozen(name):
    cfg = shrink(load_config(f"configs/{name}.py"))
    bundle = build_detector(cfg)
    tb = synthetic_batch(cfg)
    variables = bundle.init(jax.random.PRNGKey(7), tb)
    rng = jax.random.PRNGKey(13)

    def loss_wrap(params):
        vs = {"params": params,
              "batch_stats": variables.get("batch_stats", {})}
        outputs, _ = bundle.apply_train(vs, tb, rng)
        loss, metrics = bundle.loss_fn(outputs, tb, rng, cfg)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(
        loss_wrap, has_aux=True)(variables["params"])

    arrays = {"loss": loss, "grad_norm": optax.global_norm(grads)}
    for k, v in metrics.items():
        arrays[f"metric_{k}"] = v
    # per-top-level-module grad norms localize drift (backbone vs neck vs heads)
    for mod, sub in grads.items():
        arrays[f"gnorm_{mod}"] = optax.global_norm(sub)

    assert np.isfinite(float(loss)), arrays
    assert float(arrays["grad_norm"]) > 0.0, arrays
    check_or_regen(f"trainstep_{name}", arrays)
