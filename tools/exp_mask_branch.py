#!/usr/bin/env python
"""Mask-branch stage profile: where do the ~40 ms/batch (b16) go?

The honest Mask R-CNN bench (box path + device mask branch on the top-100
dets) is 108.7 img/s vs 149.5 box-only — the mask branch costs ~2.5 ms/img.
Components: RoIAlign-14 on B*100 rois, 4x conv256 @14x14, 2x deconv,
1x1 -> C @28x28, per-class logit select. This times each piece jitted
separately on synthetic pyramid/boxes at the bench shapes.

    python tools/exp_mask_branch.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    import jax
    import jax.numpy as jnp

    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.models.registry import build_detector

    cfg = load_config("configs/mask_rcnn_r50_fpn_1x.py")
    d = cfg.data
    bundle = build_detector(cfg)
    tb0 = {"images": jnp.zeros((1, d.pad_h, d.pad_w, 3), jnp.bfloat16),
           "im_info": jnp.asarray([[800.0, 1333.0, 1.0]]),
           "gt_boxes": jnp.zeros((1, d.max_gt, 4)),
           "gt_labels": jnp.zeros((1, d.max_gt), jnp.int32),
           "gt_valid": jnp.zeros((1, d.max_gt), bool),
           "box_masks": jnp.zeros((1, d.max_gt, 28, 28), jnp.uint8)}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)

    r = np.random.RandomState(0)
    # P2..P6 at pad 832x1344, FPN 256ch bf16
    shapes = [(d.pad_h // s, d.pad_w // s) for s in (4, 8, 16, 32, 64)]
    pyramid = [jnp.asarray(r.randn(batch, h, w, 256), jnp.bfloat16)
               for h, w in shapes]
    n = cfg.test.max_per_image
    x1 = r.uniform(0, 1200, (batch, n, 1)); y1 = r.uniform(0, 700, (batch, n, 1))
    boxes = jnp.asarray(np.concatenate(
        [x1, y1, x1 + r.uniform(8, 120, (batch, n, 1)),
         y1 + r.uniform(8, 120, (batch, n, 1))], -1), jnp.float32)
    valid = jnp.ones((batch, n), bool)
    labels = jnp.asarray(r.randint(0, 80, (batch, n)), jnp.int32)

    def timed(name, fn, *args, iters=20):
        f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        jax.device_get(f(*args)); jax.device_get(f(*args))
        t0 = time.perf_counter()
        out = [f(*args) for _ in range(iters)]
        jax.device_get(out)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:<52} {dt:8.2f} ms")
        return dt

    me = bundle.model_eval

    # full branch as the evaluator/bench runs it
    def full(v, pyr, bx, vd, lb):
        logits = me.apply(v, pyr, bx, vd, method=me.mask_forward)
        cls_idx = jnp.clip(lb, 0, cfg.bbox_head.num_classes - 1)
        sel = jnp.take_along_axis(
            logits, cls_idx[:, :, None, None, None], axis=-1)[..., 0]
        return jax.nn.sigmoid(sel)

    timed("mask branch FULL (roialign+head+select)", full,
          variables, pyramid, boxes, valid, labels)

    # RoIAlign-14 alone
    from mxdetection_tpu.models.detectors.rcnn import batched_roi_align
    timed("RoIAlign-14 on top-100 dets", lambda pyr, bx, vd: batched_roi_align(
        pyr, bx, vd, cfg, cfg.mask_head.roi_output_size, inference=True),
        pyramid, boxes, valid)

    # head convs alone on synthetic roi feats
    feats = jnp.asarray(r.randn(batch * n, 14, 14, 256), jnp.bfloat16)
    mh = me.bind(variables).mask_head
    timed("mask head (4xconv256 + deconv + 1x1->80)",
          lambda f: mh(f), feats)

    # logit select + sigmoid alone
    logits = jnp.asarray(r.randn(batch, n, 28, 28, 80), jnp.bfloat16)
    timed("per-class select + sigmoid", lambda lg, lb: jax.nn.sigmoid(
        jnp.take_along_axis(lg, jnp.clip(lb, 0, 79)[:, :, None, None, None],
                            axis=-1)[..., 0]), logits, labels)


if __name__ == "__main__":
    main()
