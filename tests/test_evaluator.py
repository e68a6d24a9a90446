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
