#!/usr/bin/env python
"""Training-throughput benchmark: full SPMD train step on synthetic batches.

Measures step/sec and images/sec/chip for a given config on the current
device(s) — the second driver metric (BASELINE.json: "train step/sec").

    python tools/bench_train.py [config] [batch_per_device]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else "configs/faster_rcnn_r50_fpn_1x.py"
    bpd = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    overrides = sys.argv[3:]  # dotted k=v pairs, e.g. backbone.remat=True

    import jax
    import jax.numpy as jnp

    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.models.registry import build_detector
    from mxdetection_tpu.parallel import make_mesh
    from mxdetection_tpu.train import Trainer

    cfg = load_config(cfg_path)
    if overrides:
        from train import parse_overrides
        cfg = cfg.override(**parse_overrides(overrides))
    d = cfg.data
    mesh = make_mesh(cfg.train.mesh_shape)
    n_dev = mesh.devices.size
    batch_size = bpd * n_dev

    bundle = build_detector(cfg)
    with_masks = cfg.mask_head is not None
    tb0 = {"images": jnp.zeros((1, d.pad_h, d.pad_w, 3)),
           "im_info": jnp.asarray([[d.pad_h, d.pad_w, 1.0]]),
           "gt_boxes": jnp.zeros((1, d.max_gt, 4)),
           "gt_labels": jnp.zeros((1, d.max_gt), jnp.int32),
           "gt_valid": jnp.zeros((1, d.max_gt), bool)}
    if with_masks:
        tb0["box_masks"] = jnp.zeros((1, d.max_gt, 28, 28), jnp.uint8)
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=1000)

    rng = np.random.RandomState(0)
    g = d.max_gt
    batch = {
        "raw": rng.randint(0, 255, (batch_size, 640, 640, 3)).astype(np.uint8),
        "hw": np.asarray([[480.0, 640.0]] * batch_size, np.float32),
        "flip": np.zeros((batch_size,), bool),
        "gt_boxes": np.tile(np.asarray(
            [[[50.0, 60, 300, 280], [200, 100, 500, 400]] + [[0, 0, 0, 0]] * (g - 2)],
            np.float32), (batch_size, 1, 1)),
        "gt_labels": np.zeros((batch_size, g), np.int32),
        "gt_valid": np.tile(np.asarray([[True, True] + [False] * (g - 2)]),
                            (batch_size, 1)),
    }
    if with_masks:
        bm = np.zeros((batch_size, g, 28, 28), np.uint8)
        bm[:, :2, 4:24, 4:24] = 1
        batch["box_masks"] = bm

    # Device-resident batch: host->device feeding is pipelined/overlapped in
    # real training (and PCIe-local on real hosts); through this
    # environment's remote relay a per-step ~10MB put costs 100s of ms and
    # would swamp the step time, so the metric times the step program only.
    dev_batch = jax.device_put(batch, trainer._batch_sharding)

    # warmup/compile
    state, m = trainer._step_for(False)(trainer.state, dev_batch)
    trainer.state = state
    jax.device_get(m["loss"])

    iters = 10
    t0 = time.perf_counter()
    losses = []
    for _ in range(iters):
        trainer.state, m = trainer._step_for(False)(trainer.state, dev_batch)
        losses.append(m["loss"])
    jax.device_get(losses)
    dt = time.perf_counter() - t0

    steps_per_sec = iters / dt
    print(json.dumps({
        "metric": f"{cfg.name}_train_step_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "images_per_sec_per_chip": round(steps_per_sec * batch_size / n_dev, 2),
        "global_batch": batch_size,
    }))


if __name__ == "__main__":
    main()
