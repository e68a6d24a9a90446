#!/usr/bin/env python
"""Train-step stage timing: where do the milliseconds go in fwd+bwd?

Separately-jitted stages of the Faster R-CNN train path, each timed with
value_and_grad where the real step differentiates through it.

    python tools/profile_train.py [batch]
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
from mxdetection_tpu.ops import matching


def timed(name, fn, *args, iters=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [jax.tree.leaves(fn(*args))[0] for _ in range(iters)]
    jax.device_get(outs)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<34} {dt:8.2f} ms")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = load_config("configs/faster_rcnn_r50_fpn_1x.py")
    d = cfg.data
    pad_hw = (d.pad_h, d.pad_w)
    bundle = build_detector(cfg)
    model = bundle.model

    g = d.max_gt
    tb0 = {"images": jnp.zeros((1, *pad_hw, 3), jnp.bfloat16),
           "im_info": jnp.asarray([[800.0, 1333.0, 1.0]]),
           "gt_boxes": jnp.zeros((1, g, 4)),
           "gt_labels": jnp.zeros((1, g), jnp.int32),
           "gt_valid": jnp.zeros((1, g), bool)}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    rng = jax.random.PRNGKey(1)

    npr = np.random.RandomState(0)
    tb = {
        "images": jnp.asarray(npr.rand(batch, *pad_hw, 3), jnp.bfloat16),
        "im_info": jnp.tile(jnp.asarray([[800.0, 1333.0, 1.0]]), (batch, 1)),
        "gt_boxes": jnp.tile(
            jnp.concatenate([jnp.asarray([[[50.0, 60, 300, 280],
                                           [200, 100, 500, 400]]]),
                             jnp.zeros((1, g - 2, 4))], axis=1), (batch, 1, 1)),
        "gt_labels": jnp.tile(
            jnp.concatenate([jnp.asarray([[1, 2]], jnp.int32),
                             jnp.zeros((1, g - 2), jnp.int32)], 1), (batch, 1)),
        "gt_valid": jnp.tile(
            jnp.concatenate([jnp.asarray([[True, True]]),
                             jnp.zeros((1, g - 2), bool)], 1), (batch, 1)),
    }

    # 1. full fwd (no grad)
    timed("fwd only (apply_train)",
          jax.jit(lambda v, tb: bundle.apply_train(v, tb, rng)[0]["stages"][0]["cls_logits"]),
          variables, tb)

    # 2. full fwd+bwd+loss (the real step body minus optimizer)
    def full_loss(params, tb):
        out, _ = bundle.apply_train(
            {"params": params, "batch_stats": variables["batch_stats"]}, tb, rng)
        loss, _ = bundle.loss_fn(out, tb, rng, cfg)
        return loss
    # NOTE: the jitted fn must USE the grads — returning only the value lets
    # XLA dead-code-eliminate the entire backward pass (verified: HLO shrinks
    # ~4x), silently turning this into a fwd-only timing. Reduce the grad
    # pytree to one scalar inside jit (same trick as exp_dcn_bwd.py) so the
    # backward runs but no big pytree crosses the relay. The grad sum is
    # added UN-zeroed (the exact value is irrelevant for timing): a `* 0.0`
    # would survive only as long as the simplifier declines to fold float
    # x*0, which is not a guarantee worth betting a timing harness on.
    def grad_scalar(gradfn):
        def f(*a):
            val, gs = gradfn(*a)
            return val + sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                             for g in jax.tree.leaves(gs))
        return jax.jit(f)

    timed("fwd+bwd full loss",
          grad_scalar(jax.value_and_grad(full_loss)),
          variables["params"], tb)

    # 3. backbone+fpn+rpn fwd+bwd in isolation
    def conv_loss(params, images):
        pyr = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          images, method=model.extract)
        cls, reg = model.apply({"params": params,
                                "batch_stats": variables["batch_stats"]},
                               pyr, method=lambda m, p: m.rpn(p))
        return (sum(jnp.sum(c.astype(jnp.float32) ** 2) for c in cls)
                + sum(jnp.sum(r.astype(jnp.float32) ** 2) for r in reg))
    timed("backbone+fpn+rpn fwd+bwd",
          grad_scalar(jax.value_and_grad(conv_loss)),
          variables["params"], tb["images"])

    # 4. rpn target assignment + loss (fwd only; sampling is stop-grad)
    anchors = jnp.concatenate(rpn_level_anchors(cfg, pad_hw), axis=0)

    def rpn_assign(gtb, gtv):
        def one(gb, gv):
            res = matching.assign_max_iou(
                anchors, gb, gv, pos_iou_thr=cfg.rpn.pos_iou_thr,
                neg_iou_thr=cfg.rpn.neg_iou_thr, match_low_quality=True)
            return res.labels
        return jax.vmap(one)(gtb, gtv)
    timed(f"rpn assign ({anchors.shape[0]} anchors)",
          jax.jit(rpn_assign), tb["gt_boxes"], tb["gt_valid"])

    # 5. proposals at train sizes
    pyr_shapes = [(pad_hw[0] // s, pad_hw[1] // s) for s in (4, 8, 16, 32, 64)]
    rpn_cls = [jnp.asarray(npr.randn(batch, h, w, 3), jnp.float32)
               for h, w in pyr_shapes]
    rpn_reg = [jnp.asarray(npr.randn(batch, h, w, 12), jnp.float32)
               for h, w in pyr_shapes]
    level_anchors = rpn_level_anchors(cfg, pad_hw)
    resized = tb["im_info"][:, :2] * tb["im_info"][:, 2:3]
    timed("proposals (train sizes)",
          jax.jit(lambda c, r, hw: generate_proposals(
              c, r, level_anchors, hw,
              pre_nms_top_n=cfg.rpn.pre_nms_top_n_train,
              post_nms_top_n=cfg.rpn.post_nms_top_n_train,
              nms_thr=cfg.rpn.nms_thr, bbox_stds=cfg.rpn.bbox_stds)),
          rpn_cls, rpn_reg, resized)

    # 6. roi_align train path fwd+bwd (XLA default or MXDET_ROIALIGN_TRAIN)
    s = cfg.bbox_head.num_samples
    pyramid = [jnp.asarray(npr.randn(batch, h, w, 256), jnp.bfloat16)
               for h, w in pyr_shapes]
    rois = jnp.asarray(npr.rand(batch, s, 4), jnp.float32)
    rois = jnp.concatenate([rois[..., :2] * 600,
                            rois[..., :2] * 600 + rois[..., 2:] * 300 + 8], -1)
    rvalid = jnp.ones((batch, s), bool)

    def ra_loss(pyr):
        f = batched_roi_align(pyr, rois, rvalid, cfg, 7)
        return jnp.sum(f.astype(jnp.float32) ** 2)
    timed(f"roi_align train fwd+bwd ({s} rois)",
          grad_scalar(jax.value_and_grad(ra_loss)), pyramid)


if __name__ == "__main__":
    main()
