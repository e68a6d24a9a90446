"""Evaluator driver tests: bbox eval loop and TTA merge path (tiny shapes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxdetection_tpu.config import load_config
from mxdetection_tpu.data import CocoDataset, make_synthetic_coco
from mxdetection_tpu.eval import Evaluator
from mxdetection_tpu.models.registry import build_detector


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_eval")
    ann, img_dir = make_synthetic_coco(str(root), num_images=4, num_classes=3, seed=5)
    ds = CocoDataset(ann, img_dir)
    cfg = load_config("configs/retinanet_r50_fpn_1x.py").override(**{
        "data.pad_h": 128, "data.pad_w": 128, "data.scale": 96, "data.max_size": 128,
        "data.max_gt": 8, "retina_head.num_classes": 3,
        "test.pre_nms_per_class": 200, "test.max_per_image": 20,
    })
    bundle = build_detector(cfg)
    variables = bundle.init(jax.random.PRNGKey(0),
                            {"images": jnp.zeros((1, 128, 128, 3))})
    return cfg, bundle, variables, ds


def test_evaluator_runs_bbox(setup):
    cfg, bundle, variables, ds = setup
    ev = Evaluator(cfg, bundle, variables, ds, batch_size=2, raw_hw=(416, 416))
    res = ev.run(verbose=False)
    assert res["num_images"] == 4
    assert "AP" in res and "AR100" in res


def test_evaluator_tta_flip(setup):
    cfg, bundle, variables, ds = setup
    cfg_tta = cfg.override(**{"test.flip_tta": True})
    ev = Evaluator(cfg_tta, bundle, variables, ds, batch_size=2, raw_hw=(416, 416))
    assert len(ev.tta_variants) == 2
    res = ev.run(verbose=False)
    assert res["num_images"] == 4


def test_evaluator_tta_scales(setup):
    cfg, bundle, variables, ds = setup
    cfg_tta = cfg.override(**{"test.scales_tta": (80,)})
    ev = Evaluator(cfg_tta, bundle, variables, ds, batch_size=2, raw_hw=(416, 416))
    assert len(ev.tta_variants) == 2
    res = ev.run(verbose=False)
    assert res["num_images"] == 4


@pytest.fixture(scope="module")
def segm_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_segm")
    from mxdetection_tpu.data import make_synthetic_coco
    ann, img_dir = make_synthetic_coco(str(root), num_images=2, num_classes=3, seed=9)
    ds = CocoDataset(ann, img_dir, with_masks=True)
    cfg = load_config("configs/mask_rcnn_r50_fpn_1x.py").override(**{
        "data.pad_h": 128, "data.pad_w": 128, "data.scale": 96, "data.max_size": 128,
        "data.max_gt": 8, "bbox_head.num_classes": 3, "bbox_head.num_samples": 16,
        "rpn.pre_nms_top_n_test": 128, "rpn.post_nms_top_n_test": 64,
        "rpn.pre_nms_top_n_train": 128, "rpn.post_nms_top_n_train": 64,
        "test.pre_nms_per_class": 128, "test.max_per_image": 10,
    })
    from mxdetection_tpu.models.registry import build_detector
    bundle = build_detector(cfg)
    tb0 = {"images": jnp.zeros((1, 128, 128, 3)),
           "im_info": jnp.asarray([[128.0, 128, 1.0]]),
           "gt_boxes": jnp.zeros((1, 8, 4)),
           "gt_labels": jnp.zeros((1, 8), jnp.int32),
           "gt_valid": jnp.zeros((1, 8), bool),
           "box_masks": jnp.zeros((1, 8, 28, 28), jnp.uint8)}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    return cfg, bundle, variables, ds


def test_evaluator_segm_mask_rcnn(segm_setup):
    """Mask R-CNN eval path: mask forward -> paste -> RLE -> segm metrics."""
    cfg, bundle, variables, ds = segm_setup
    ev = Evaluator(cfg, bundle, variables, ds, batch_size=2, raw_hw=(416, 416),
                   with_masks=True)
    res = ev.run(verbose=False)
    assert "segm" in res and "AP" in res["segm"]


def test_evaluator_segm_tta_mask_merge(segm_setup):
    """TTA + masks: merged boxes get averaged per-variant mask probabilities
    (the family's gpu_mask_voting analog) instead of crashing with no masks."""
    cfg, bundle, variables, ds = segm_setup
    cfg_tta = cfg.override(**{"test.flip_tta": True})
    ev = Evaluator(cfg_tta, bundle, variables, ds, batch_size=2,
                   raw_hw=(416, 416), with_masks=True)
    assert len(ev.tta_variants) == 2
    res = ev.run(verbose=False)
    assert res["num_images"] == 2
    assert "segm" in res and "AP" in res["segm"]
    assert np.isfinite(res["segm"]["AP"])
