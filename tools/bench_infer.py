#!/usr/bin/env python
"""Inference throughput for ANY zoo config (bench.py generalized).

    python tools/bench_infer.py configs/cascade_rcnn_r101_dcn_1x.py [batch]

Prints one JSON line {config, batch, images_per_sec}. Same methodology as
bench.py: synthetic COCO-sized input, device transform+forward+postprocess,
device_get forces completion (relay block_until_ready is a no-op).
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
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    import jax.numpy as jnp

    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.data.transforms import batch_transform
    from mxdetection_tpu.models.registry import build_detector

    cfg = load_config(cfg_path)
    d = cfg.data
    pad_hw = (d.pad_h, d.pad_w)

    bundle = build_detector(cfg)
    tb0 = {"images": jnp.zeros((1, *pad_hw, 3), jnp.bfloat16),
           "im_info": jnp.asarray([[800.0, 1333.0, 1.0]]),
           "gt_boxes": jnp.zeros((1, d.max_gt, 4)),
           "gt_labels": jnp.zeros((1, d.max_gt), jnp.int32),
           "gt_valid": jnp.zeros((1, d.max_gt), bool)}
    if cfg.mask_head is not None:
        tb0["box_masks"] = jnp.zeros((1, d.max_gt, 28, 28), jnp.uint8)
    variables = bundle.init(jax.random.PRNGKey(0), tb0)

    def forward(variables, raw, hw, flip, gtb):
        tb = batch_transform(raw, hw, flip, gtb, out_hw=pad_hw,
                             scale_size=d.scale, max_size=d.max_size,
                             mean=d.mean, std=d.std,
                             dtype=jnp.dtype(cfg.backbone.dtype))
        out = bundle.apply_eval(variables, tb)
        dets = bundle.postprocess(out, cfg, pad_hw, tb["im_info"])
        res = [dets["boxes"], dets["scores"], dets["labels"], dets["valid"]]
        if cfg.mask_head is not None:
            # device-side mask branch for the final detections (same path the
            # evaluator jits) — without this the "mask" config benches only
            # the box path
            logits = bundle.model_eval.apply(
                variables, out["pyramid"],
                dets["boxes"] * tb["im_info"][:, 2][:, None, None],
                dets["valid"], method=bundle.model_eval.mask_forward)
            cls_idx = jnp.clip(dets["labels"], 0, cfg.bbox_head.num_classes - 1)
            sel = jnp.take_along_axis(
                logits, cls_idx[:, :, None, None, None], axis=-1)[..., 0]
            res.append(jax.nn.sigmoid(sel))
        return tuple(res)

    fwd = jax.jit(forward)
    rng_np = np.random.RandomState(0)
    raw = jnp.asarray(rng_np.randint(0, 255, (batch, 640, 640, 3), np.uint8))
    hw = jnp.asarray([[480.0, 640.0]] * batch)
    flip = jnp.zeros((batch,), bool)
    gtb = jnp.zeros((batch, d.max_gt, 4))

    jax.device_get(fwd(variables, raw, hw, flip, gtb))
    jax.device_get(fwd(variables, raw, hw, flip, gtb))
    iters = 10
    t0 = time.perf_counter()
    outs = [fwd(variables, raw, hw, flip, gtb) for _ in range(iters)]
    jax.device_get(outs)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "config": cfg.name,
        "batch": batch,
        "images_per_sec": round(batch * iters / dt, 2),
    }))


if __name__ == "__main__":
    main()
