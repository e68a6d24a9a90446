"""End-to-end detector-level frozen fixtures, one per contract config.

Freezes the ENTIRE semantic chain (transform -> backbone -> heads -> decode ->
NMS -> postprocess) per BASELINE.json contract config: fixed seed, fixed
input, pinned final detections. Any semantic drift anywhere in the stack
fails here first (SURVEY.md §4.2 — the parity backbone in lieu of real
reference weights). Regenerate explicitly with REGEN_FIXTURES=1.

All fixtures run in float32 at a reduced-but-realistic shape so they are
platform-stable and CI-fast.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
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
        "data.scale": 240, "data.max_size": 320,
        "backbone.dtype": "float32",
        "test.max_per_image": 20,
    }
    if cfg.detector != "retinanet":
        over.update({
            "bbox_head.num_samples": 32,
            "rpn.pre_nms_top_n_test": 400, "rpn.post_nms_top_n_test": 100,
            "test.pre_nms_per_class": 200,
        })
    cfg = cfg.override(**over)
    if cfg.name.startswith("cascade"):
        # CI shrink: R50 depth; keeps the cascade + DCN code paths
        cfg = cfg.override(**{"backbone.depth": 50,
                              "backbone.dcn_stages": (False, False, False, True)})
    # NOTE: the multihost/sync_bn config collapses to the flagship computation
    # here — eval-mode BN uses running stats, so its fixture is expected to be
    # identical to detector_faster_rcnn_r50_fpn_1x. Its TRAIN-mode semantics
    # (on-mesh pmean stats) are pinned separately by test_train_fixtures.py.
    return cfg


def synthetic_image(seed=0):
    rng = np.random.RandomState(seed)
    img = (rng.rand(*HW, 3) * 60).astype(np.float32)
    img[40:120, 50:170] += 120.0   # two bright blobs -> nontrivial features
    img[150:230, 180:290] += 90.0
    return np.clip(img, 0, 255)


def check_or_regen(name, arrays):
    path = os.path.join(FIXTURE_DIR, name + ".npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})
        return
    ref = np.load(path)
    for k, v in arrays.items():
        np.testing.assert_allclose(
            np.asarray(v, np.float64), ref[k].astype(np.float64),
            rtol=1e-4, atol=1e-4,
            err_msg=f"{name}/{k} drifted from frozen detector semantics")


@pytest.mark.parametrize("name", CONFIGS)
def test_detector_forward_frozen(name):
    cfg = shrink(load_config(f"configs/{name}.py"))
    bundle = build_detector(cfg)
    pad_hw = (cfg.data.pad_h, cfg.data.pad_w)

    tb = {
        "images": jnp.asarray(synthetic_image()[None] / 255.0, jnp.float32),
        "im_info": jnp.asarray([[HW[0], HW[1], 1.0]]),
        "gt_boxes": jnp.zeros((1, 8, 4)),
        "gt_labels": jnp.zeros((1, 8), jnp.int32),
        "gt_valid": jnp.zeros((1, 8), bool),
    }
    if cfg.mask_head is not None:
        tb["box_masks"] = jnp.zeros((1, 8, 28, 28), jnp.uint8)
    variables = bundle.init(jax.random.PRNGKey(7), tb)

    out = bundle.apply_eval(variables, {"images": tb["images"],
                                        "im_info": tb["im_info"]})
    dets = bundle.postprocess(out, cfg, pad_hw, tb["im_info"])
    v = np.asarray(dets["valid"][0])
    arrays = {
        "boxes": np.asarray(dets["boxes"][0]) * v[:, None],
        "scores": np.asarray(dets["scores"][0]) * v,
        "labels": np.asarray(dets["labels"][0]) * v,
        "valid": v.astype(np.int32),
    }
    check_or_regen(f"detector_{name}", arrays)
