"""End-to-end smoke: train RetinaNet on tiny synthetic COCO -> eval -> mAP.

SURVEY.md §4.5. Slow on the CPU test mesh, so gated behind MXDET_RUN_SLOW=1
(the fast suite already covers every stage of this path individually; this
test checks they compose into a learning system).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("MXDET_RUN_SLOW") != "1", reason="set MXDET_RUN_SLOW=1")


def test_train_then_eval_nonzero_map(tmp_path):
    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.data import CocoDataset, DetectionLoader, make_synthetic_coco
    from mxdetection_tpu.models.registry import build_detector
    from mxdetection_tpu.parallel import make_mesh
    from mxdetection_tpu.train import Trainer
    from mxdetection_tpu.eval import Evaluator

    ann, img_dir = make_synthetic_coco(str(tmp_path), num_images=16, num_classes=3,
                                       max_objects=2, seed=7)
    ds = CocoDataset(ann, img_dir)

    cfg = load_config("configs/retinanet_r50_fpn_1x.py").override(**{
        "data.pad_h": 128, "data.pad_w": 128, "data.scale": 100, "data.max_size": 128,
        "data.max_gt": 8, "retina_head.num_classes": 3,
        "train.optim.base_lr": 0.02, "train.optim.warmup_steps": 20,
        "train.optim.grad_clip": 10.0,
        "test.score_thr": 0.05, "test.pre_nms_per_class": 400,
    })
    mesh = make_mesh((-1, 1))
    n_dev = mesh.devices.size
    bundle = build_detector(cfg)
    loader = DetectionLoader(ds, batch_size=n_dev, raw_hw=(416, 416),
                             max_gt=8, seed=0)
    tb0 = {"images": jnp.zeros((1, 128, 128, 3))}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=loader.steps_per_epoch())

    it = iter(loader)
    losses = [float(trainer.run_step(next(it))["loss"]) for _ in range(60)]
    assert losses[-1] < losses[0] * 0.5, losses

    final_vars = {"params": jax.device_get(trainer.state.params),
                  "batch_stats": jax.device_get(trainer.state.batch_stats)}
    ev = Evaluator(cfg, bundle, final_vars, ds, batch_size=4, raw_hw=(416, 416))
    results = ev.run(verbose=True)
    assert results["AP50"] > 0.1, results


def test_faster_rcnn_train_then_eval(tmp_path):
    """Two-stage path end-to-end: tiny synthetic COCO train -> eval."""
    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.data import CocoDataset, DetectionLoader, make_synthetic_coco
    from mxdetection_tpu.models.registry import build_detector
    from mxdetection_tpu.parallel import make_mesh
    from mxdetection_tpu.train import Trainer
    from mxdetection_tpu.eval import Evaluator

    ann, img_dir = make_synthetic_coco(str(tmp_path), num_images=16, num_classes=3,
                                       max_objects=2, seed=11)
    ds = CocoDataset(ann, img_dir)

    cfg = load_config("configs/faster_rcnn_r50_fpn_1x.py").override(**{
        "data.pad_h": 128, "data.pad_w": 128, "data.scale": 100, "data.max_size": 128,
        "data.max_gt": 8, "bbox_head.num_classes": 3, "bbox_head.num_samples": 64,
        "rpn.pre_nms_top_n_train": 256, "rpn.post_nms_top_n_train": 128,
        "rpn.pre_nms_top_n_test": 256, "rpn.post_nms_top_n_test": 128,
        "test.pre_nms_per_class": 256,
        "train.optim.base_lr": 0.01, "train.optim.warmup_steps": 20,
        "train.optim.grad_clip": 10.0,
    })
    mesh = make_mesh((-1, 1))
    n_dev = mesh.devices.size
    bundle = build_detector(cfg)
    loader = DetectionLoader(ds, batch_size=n_dev, raw_hw=(416, 416), max_gt=8, seed=0)
    tb0 = {"images": jnp.zeros((1, 128, 128, 3)),
           "im_info": jnp.asarray([[128.0, 128, 1.0]]),
           "gt_boxes": jnp.zeros((1, 8, 4)),
           "gt_labels": jnp.zeros((1, 8), jnp.int32),
           "gt_valid": jnp.zeros((1, 8), bool)}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=loader.steps_per_epoch())

    it = iter(loader)
    losses = [float(trainer.run_step(next(it))["loss"]) for _ in range(60)]
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    final_vars = {"params": jax.device_get(trainer.state.params),
                  "batch_stats": jax.device_get(trainer.state.batch_stats)}
    ev = Evaluator(cfg, bundle, final_vars, ds, batch_size=4, raw_hw=(416, 416))
    results = ev.run(verbose=True)
    assert results["AP50"] > 0.05, results


def test_mask_rcnn_train_then_eval(tmp_path):
    """Mask R-CNN end-to-end: train with mask branch -> eval box AND mask AP
    (VERDICT r1 next #8; SURVEY.md §4.5)."""
    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.data import CocoDataset, DetectionLoader, make_synthetic_coco
    from mxdetection_tpu.models.registry import build_detector
    from mxdetection_tpu.parallel import make_mesh
    from mxdetection_tpu.train import Trainer
    from mxdetection_tpu.eval import Evaluator

    ann, img_dir = make_synthetic_coco(str(tmp_path), num_images=16, num_classes=3,
                                       max_objects=2, seed=13)
    ds = CocoDataset(ann, img_dir, with_masks=True)

    cfg = load_config("configs/mask_rcnn_r50_fpn_1x.py").override(**{
        "data.pad_h": 128, "data.pad_w": 128, "data.scale": 100, "data.max_size": 128,
        "data.max_gt": 8, "bbox_head.num_classes": 3, "bbox_head.num_samples": 64,
        "rpn.pre_nms_top_n_train": 256, "rpn.post_nms_top_n_train": 128,
        "rpn.pre_nms_top_n_test": 256, "rpn.post_nms_top_n_test": 128,
        "test.pre_nms_per_class": 256,
        "train.optim.base_lr": 0.01, "train.optim.warmup_steps": 20,
        "train.optim.grad_clip": 10.0,
    })
    mesh = make_mesh((-1, 1))
    n_dev = mesh.devices.size
    bundle = build_detector(cfg)
    loader = DetectionLoader(ds, batch_size=n_dev, raw_hw=(416, 416), max_gt=8,
                             seed=0, with_masks=True)
    tb0 = {"images": jnp.zeros((1, 128, 128, 3)),
           "im_info": jnp.asarray([[128.0, 128, 1.0]]),
           "gt_boxes": jnp.zeros((1, 8, 4)),
           "gt_labels": jnp.zeros((1, 8), jnp.int32),
           "gt_valid": jnp.zeros((1, 8), bool),
           "box_masks": jnp.zeros((1, 8, 28, 28), jnp.uint8)}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=loader.steps_per_epoch())

    it = iter(loader)
    losses = [float(trainer.run_step(next(it))["loss"]) for _ in range(60)]
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    final_vars = {"params": jax.device_get(trainer.state.params),
                  "batch_stats": jax.device_get(trainer.state.batch_stats)}
    ev = Evaluator(cfg, bundle, final_vars, ds, batch_size=4, raw_hw=(416, 416),
                   with_masks=True)
    results = ev.run(verbose=True)
    assert results["AP50"] > 0.05, results
    assert results["segm"]["AP50"] > 0.0, results["segm"]


def test_cascade_rcnn_train_then_eval(tmp_path):
    """Cascade R-CNN (+DCN last stage) end-to-end: loss decreases, eval runs
    (VERDICT r1 next #8)."""
    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.data import CocoDataset, DetectionLoader, make_synthetic_coco
    from mxdetection_tpu.models.registry import build_detector
    from mxdetection_tpu.parallel import make_mesh
    from mxdetection_tpu.train import Trainer
    from mxdetection_tpu.eval import Evaluator

    ann, img_dir = make_synthetic_coco(str(tmp_path), num_images=16, num_classes=3,
                                       max_objects=2, seed=17)
    ds = CocoDataset(ann, img_dir)

    cfg = load_config("configs/cascade_rcnn_r101_dcn_1x.py").override(**{
        # CPU shrink: R50 depth, DCN only in the last stage
        "backbone.depth": 50,
        "backbone.dcn_stages": (False, False, False, True),
        "data.pad_h": 128, "data.pad_w": 128, "data.scale": 100, "data.max_size": 128,
        "data.max_gt": 8, "bbox_head.num_classes": 3, "bbox_head.num_samples": 64,
        "rpn.pre_nms_top_n_train": 256, "rpn.post_nms_top_n_train": 128,
        "rpn.pre_nms_top_n_test": 256, "rpn.post_nms_top_n_test": 128,
        "test.pre_nms_per_class": 256,
        "train.optim.base_lr": 0.005, "train.optim.warmup_steps": 20,
        "train.optim.grad_clip": 10.0,
    })
    mesh = make_mesh((-1, 1))
    n_dev = mesh.devices.size
    bundle = build_detector(cfg)
    loader = DetectionLoader(ds, batch_size=n_dev, raw_hw=(416, 416), max_gt=8, seed=0)
    tb0 = {"images": jnp.zeros((1, 128, 128, 3)),
           "im_info": jnp.asarray([[128.0, 128, 1.0]]),
           "gt_boxes": jnp.zeros((1, 8, 4)),
           "gt_labels": jnp.zeros((1, 8), jnp.int32),
           "gt_valid": jnp.zeros((1, 8), bool)}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=loader.steps_per_epoch())

    it = iter(loader)
    losses = [float(trainer.run_step(next(it))["loss"]) for _ in range(40)]
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    final_vars = {"params": jax.device_get(trainer.state.params),
                  "batch_stats": jax.device_get(trainer.state.batch_stats)}
    ev = Evaluator(cfg, bundle, final_vars, ds, batch_size=4, raw_hw=(416, 416))
    results = ev.run(verbose=True)
    assert results["AP50"] > 0.05, results


def test_rfcn_train_then_eval(tmp_path):
    """R-FCN (dilated C5 + PSRoIPool + OHEM) end-to-end: loss decreases,
    eval reaches nonzero AP50 (VERDICT r3 weak #3 — drift-pin R-FCN like a
    contract config)."""
    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.data import CocoDataset, DetectionLoader, make_synthetic_coco
    from mxdetection_tpu.models.registry import build_detector
    from mxdetection_tpu.parallel import make_mesh
    from mxdetection_tpu.train import Trainer
    from mxdetection_tpu.eval import Evaluator

    ann, img_dir = make_synthetic_coco(str(tmp_path), num_images=16, num_classes=3,
                                       max_objects=2, seed=19)
    ds = CocoDataset(ann, img_dir)

    cfg = load_config("configs/rfcn_r50_1x.py").override(**{
        "data.pad_h": 128, "data.pad_w": 128, "data.scale": 100, "data.max_size": 128,
        "data.max_gt": 8, "bbox_head.num_classes": 3, "bbox_head.num_samples": 64,
        "bbox_head.ohem_keep": 32,
        "rpn.pre_nms_top_n_train": 256, "rpn.post_nms_top_n_train": 64,
        "rpn.pre_nms_top_n_test": 256, "rpn.post_nms_top_n_test": 64,
        "test.pre_nms_per_class": 256,
        "train.optim.base_lr": 0.005, "train.optim.warmup_steps": 20,
        "train.optim.grad_clip": 10.0,
    })
    mesh = make_mesh((-1, 1))
    n_dev = mesh.devices.size
    bundle = build_detector(cfg)
    loader = DetectionLoader(ds, batch_size=n_dev, raw_hw=(416, 416), max_gt=8, seed=0)
    tb0 = {"images": jnp.zeros((1, 128, 128, 3)),
           "im_info": jnp.asarray([[128.0, 128, 1.0]]),
           "gt_boxes": jnp.zeros((1, 8, 4)),
           "gt_labels": jnp.zeros((1, 8), jnp.int32),
           "gt_valid": jnp.zeros((1, 8), bool)}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=loader.steps_per_epoch())

    it = iter(loader)
    losses = [float(trainer.run_step(next(it))["loss"]) for _ in range(40)]
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    final_vars = {"params": jax.device_get(trainer.state.params),
                  "batch_stats": jax.device_get(trainer.state.batch_stats)}
    ev = Evaluator(cfg, bundle, final_vars, ds, batch_size=4, raw_hw=(416, 416))
    results = ev.run(verbose=True)
    assert results["AP50"] > 0.05, results
