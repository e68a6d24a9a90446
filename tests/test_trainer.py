"""End-to-end DP training tests on the virtual 8-device CPU mesh (SURVEY §4.4/4.5).

Uses a shrunken RetinaNet (R50 on 128px images) so CPU can execute it, but the
full production path: loader -> device transform -> shard_map step -> psum.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxdetection_tpu.config import load_config
from mxdetection_tpu.data import CocoDataset, DetectionLoader, make_synthetic_coco
from mxdetection_tpu.models.registry import build_detector
from mxdetection_tpu.parallel import make_mesh
from mxdetection_tpu.train import Trainer
from mxdetection_tpu.train.schedule import warmup_multistep


def small_cfg():
    cfg = load_config("configs/retinanet_r50_fpn_1x.py")
    return cfg.override(**{
        "data.pad_h": 128, "data.pad_w": 128, "data.scale": 96, "data.max_size": 128,
        "data.max_gt": 8, "data.batch_size_per_device": 1,
        "retina_head.num_classes": 5,
        "train.optim.base_lr": 0.01, "train.optim.warmup_steps": 10,
        "train.optim.grad_clip": 10.0,
    })


def test_warmup_multistep_schedule():
    f = warmup_multistep(1.0, warmup_steps=10, warmup_ratio=0.1,
                         decay_steps=(100, 200), decay_factor=0.1)
    assert abs(float(f(0)) - 0.1) < 1e-6
    assert abs(float(f(10)) - 1.0) < 1e-6
    assert abs(float(f(150)) - 0.1) < 1e-6
    assert abs(float(f(250)) - 0.01) < 1e-6


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_train")
    ann, img_dir = make_synthetic_coco(str(root), num_images=16, num_classes=5, seed=3)
    return CocoDataset(ann, img_dir)


def test_dp_training_loss_decreases(tiny_coco):
    cfg = small_cfg()
    mesh = make_mesh((-1, 1))
    n_dev = mesh.devices.size
    assert n_dev == 8  # conftest forces 8 fake CPU devices

    bundle = build_detector(cfg)
    loader = DetectionLoader(
        tiny_coco, batch_size=cfg.data.batch_size_per_device * n_dev,
        raw_hw=(416, 416), max_gt=cfg.data.max_gt, seed=0)

    dummy_tb = {"images": jnp.zeros((1, cfg.data.pad_h, cfg.data.pad_w, 3))}
    variables = bundle.init(jax.random.PRNGKey(0), dummy_tb)

    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=loader.steps_per_epoch())

    losses = []
    it = iter(loader)
    for _ in range(12):
        m = trainer.run_step(next(it))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # overfit signal: average of last 3 well below first 3
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.9, losses


def test_checkpoint_roundtrip(tiny_coco, tmp_path):
    cfg = small_cfg()
    mesh = make_mesh((-1, 1))
    bundle = build_detector(cfg)
    dummy_tb = {"images": jnp.zeros((1, cfg.data.pad_h, cfg.data.pad_w, 3))}
    variables = bundle.init(jax.random.PRNGKey(0), dummy_tb)
    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=10)

    from mxdetection_tpu.train import CheckpointManager
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    loader = DetectionLoader(tiny_coco, batch_size=8, raw_hw=(416, 416),
                             max_gt=cfg.data.max_gt, seed=0)
    it = iter(loader)
    trainer.run_step(next(it))
    trainer.run_step(next(it))
    ckpt.save(trainer.state)
    assert ckpt.latest_step() == 2

    # fresh trainer restores to identical params
    variables2 = bundle.init(jax.random.PRNGKey(1), dummy_tb)
    trainer2 = Trainer(cfg, bundle.apply_train, variables2, bundle.loss_fn,
                       mesh, steps_per_epoch=10)
    restored = ckpt.restore(trainer2.state)
    p1 = jax.tree.leaves(trainer.state.params)
    p2 = jax.tree.leaves(restored.params)
    assert all(np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(p1, p2))
    assert int(restored.step) == 2
