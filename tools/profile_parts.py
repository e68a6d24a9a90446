#!/usr/bin/env python
"""Stage-by-stage inference timing on the current device (perf work tool).

Times separately-jitted stages of the Faster R-CNN eval path so optimization
effort goes where the milliseconds are. device_get after each loop forces real
completion (block_until_ready is unreliable through the remote relay).
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.config import load_config
from mxdetection_tpu.data.transforms import batch_transform
from mxdetection_tpu.models.registry import build_detector
from mxdetection_tpu.models.detectors.rcnn import (
    batched_roi_align, rpn_level_anchors)
from mxdetection_tpu.ops.proposals import generate_proposals


def reduce_tiny(out):
    """Collapse any output pytree to one scalar so device_get forces full
    computation but transfers ~4 bytes (the tunnel makes big transfers slow,
    which would otherwise contaminate the timing)."""
    leaves = [jnp.sum(l.astype(jnp.float32)) if hasattr(l, "astype") else 0.0
              for l in jax.tree.leaves(out)]
    return sum(leaves)


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(reduce_tiny(out))
    t0 = time.perf_counter()
    scalars = [reduce_tiny(fn(*args)) for _ in range(iters)]
    jax.device_get(scalars)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<28} {dt:8.2f} ms")
    return out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg_path = sys.argv[2] if len(sys.argv) > 2 else "configs/faster_rcnn_r50_fpn_1x.py"
    cfg = load_config(cfg_path)
    d = cfg.data
    pad_hw = (d.pad_h, d.pad_w)
    bundle = build_detector(cfg)

    tb0 = {"images": jnp.zeros((1, *pad_hw, 3), jnp.bfloat16),
           "im_info": jnp.asarray([[800.0, 1333.0, 1.0]]),
           "gt_boxes": jnp.zeros((1, d.max_gt, 4)),
           "gt_labels": jnp.zeros((1, d.max_gt), jnp.int32),
           "gt_valid": jnp.zeros((1, d.max_gt), bool)}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    model = bundle.model_eval

    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 255, (batch, 640, 640, 3), np.uint8))
    hw = jnp.asarray([[480.0, 640.0]] * batch)
    flip = jnp.zeros((batch,), bool)
    gtb = jnp.zeros((batch, d.max_gt, 4))

    @jax.jit
    def f_transform(raw, hw, flip, gtb):
        return batch_transform(raw, hw, flip, gtb, out_hw=pad_hw,
                               scale_size=d.scale, max_size=d.max_size,
                               mean=d.mean, std=d.std, dtype=jnp.bfloat16)

    tb = timed("transform", f_transform, raw, hw, flip, gtb)

    @jax.jit
    def f_backbone(variables, images):
        pyr = model.apply(variables, images, method=model.extract)
        return pyr

    pyramid = timed("backbone+fpn", f_backbone, variables, tb["images"])

    @jax.jit
    def f_rpn(variables, images):
        pyr = model.apply(variables, images, method=model.extract)
        return model.apply(variables, pyr,
                           method=lambda m, p: m.rpn(p))

    rpn_out = timed("backbone+fpn+rpn", f_rpn, variables, tb["images"])

    anchors = rpn_level_anchors(cfg, pad_hw)
    resized_hw = tb["im_info"][:, :2] * tb["im_info"][:, 2:3]

    @jax.jit
    def f_proposals(rpn_cls, rpn_reg, resized_hw):
        return generate_proposals(
            rpn_cls, rpn_reg, anchors, resized_hw,
            pre_nms_top_n=cfg.rpn.pre_nms_top_n_test,
            post_nms_top_n=cfg.rpn.post_nms_top_n_test,
            nms_thr=cfg.rpn.nms_thr, bbox_stds=cfg.rpn.bbox_stds)

    rois, _, roi_valid = timed("proposals(decode+nms)", f_proposals,
                               rpn_out[0], rpn_out[1], resized_hw)

    @jax.jit
    def f_roialign(pyramid, rois, roi_valid):
        return batched_roi_align(pyramid, rois, roi_valid, cfg, 7,
                                 inference=True)

    roi_feats = timed("roi_align(1000 rois)", f_roialign, pyramid, rois, roi_valid)

    @jax.jit
    def f_head(variables, roi_feats):
        b, s = roi_feats.shape[:2]
        flat = roi_feats.reshape(b * s, *roi_feats.shape[2:])
        return model.apply(variables, flat,
                           method=lambda m, x: m.bbox_heads[0](x))

    head_out = timed("bbox head", f_head, variables, roi_feats)

    @jax.jit
    def f_full(variables, tbatch):
        out = bundle.apply_eval(variables, tbatch)
        return bundle.postprocess(out, cfg, pad_hw, tbatch["im_info"])

    tb_eval = {"images": tb["images"], "im_info": tb["im_info"]}
    timed("FULL eval+postprocess", f_full, variables, tb_eval)


if __name__ == "__main__":
    main()
