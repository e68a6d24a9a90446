"""Slim UNGATED train->eval compose smoke (VERDICT r2 weak #6).

The full e2e suite (tests/test_e2e.py) trains to nonzero mAP and stays gated
behind MXDET_RUN_SLOW=1; this test only checks that the full system COMPOSES —
loader -> jitted shard_map train step -> checkpoint-shaped variables -> jitted
eval forward -> COCO metrics — in a couple of minutes on the default suite.
Assertions are existence/finiteness, not quality (quality is the slow suite's
job; per-stage correctness is the fast suite's).
"""

import numpy as np
import jax
import jax.numpy as jnp


def test_train_eval_compose(tmp_path):
    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.data import CocoDataset, DetectionLoader, make_synthetic_coco
    from mxdetection_tpu.models.registry import build_detector
    from mxdetection_tpu.parallel import make_mesh
    from mxdetection_tpu.train import Trainer
    from mxdetection_tpu.eval import Evaluator

    ann, img_dir = make_synthetic_coco(str(tmp_path), num_images=8, num_classes=3,
                                       max_objects=2, seed=11)
    ds = CocoDataset(ann, img_dir)

    cfg = load_config("configs/retinanet_r50_fpn_1x.py").override(**{
        "data.pad_h": 128, "data.pad_w": 128, "data.scale": 100,
        "data.max_size": 128, "data.max_gt": 8, "retina_head.num_classes": 3,
        "train.optim.warmup_steps": 4,
        "test.score_thr": 0.05,
    })
    mesh = make_mesh((-1, 1))
    n_dev = mesh.devices.size
    bundle = build_detector(cfg)
    loader = DetectionLoader(ds, batch_size=n_dev, raw_hw=(256, 256),
                             max_gt=8, seed=0, drop_last=False)
    tb0 = {"images": jnp.zeros((1, 128, 128, 3))}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=loader.steps_per_epoch())

    it = iter(loader)
    losses = [float(trainer.run_step(next(it))["loss"]) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses), losses

    final_vars = {"params": jax.device_get(trainer.state.params),
                  "batch_stats": jax.device_get(trainer.state.batch_stats)}
    ev = Evaluator(cfg, bundle, final_vars, ds, batch_size=4, raw_hw=(256, 256))
    results = ev.run(verbose=False)
    assert results["num_images"] == 8
    assert np.isfinite(results["AP50"]), results
