"""Multi-host DP config (BASELINE configs[4]) on the virtual 8-device mesh.

Exercises the exact production path: SyncBN pmean inside shard_map, gradient
psum over the data axis, batch sharding — the v5p-16 semantics minus the
physical second host (SURVEY.md §4.4).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.config import load_config
from mxdetection_tpu.models.registry import build_detector
from mxdetection_tpu.parallel import make_mesh
from mxdetection_tpu.train import Trainer


def test_syncbn_dp_train_step():
    cfg = load_config("configs/multihost_dp_faster_rcnn_v5p16.py").override(**{
        "data.pad_h": 128, "data.pad_w": 128, "data.scale": 96, "data.max_size": 128,
        "data.max_gt": 4, "bbox_head.num_classes": 3, "bbox_head.num_samples": 16,
        "rpn.pre_nms_top_n_train": 128, "rpn.post_nms_top_n_train": 64,
        "backbone.depth": 50,
    })
    assert cfg.backbone.norm == "sync_bn" and cfg.train.sync_bn

    mesh = make_mesh(cfg.train.mesh_shape)
    n = mesh.devices.size
    bundle = build_detector(cfg)
    tb0 = {"images": jnp.zeros((1, 128, 128, 3)),
           "im_info": jnp.asarray([[128.0, 128, 1.0]]),
           "gt_boxes": jnp.zeros((1, 4, 4)),
           "gt_labels": jnp.zeros((1, 4), jnp.int32),
           "gt_valid": jnp.zeros((1, 4), bool)}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=100)

    rng = np.random.RandomState(0)
    batch = {
        "raw": rng.randint(0, 255, (n, 160, 160, 3)).astype(np.uint8),
        "hw": np.asarray([[160.0, 160.0]] * n, np.float32),
        "flip": np.zeros((n,), bool),
        "gt_boxes": np.tile(np.asarray(
            [[[10.0, 10, 90, 90], [30, 40, 120, 100], [0, 0, 0, 0], [0, 0, 0, 0]]],
            np.float32), (n, 1, 1)),
        "gt_labels": np.tile(np.asarray([[0, 2, 0, 0]], np.int32), (n, 1)),
        "gt_valid": np.tile(np.asarray([[True, True, False, False]]), (n, 1)),
    }
    m1 = trainer.run_step(batch)
    m2 = trainer.run_step(batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # SyncBN running stats must have moved off init and stayed finite
    stats = jax.device_get(trainer.state.batch_stats)
    leaves = jax.tree.leaves(stats)
    assert all(np.isfinite(l).all() for l in leaves)
    # mean stats move away from exact zero once real data flows
    means = [l for p, l in jax.tree_util.tree_flatten_with_path(stats)[0]
             if any(getattr(q, "key", "") == "mean" for q in p)]
    assert any(float(np.abs(m).sum()) > 0 for m in means)
