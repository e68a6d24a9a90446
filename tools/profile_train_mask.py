#!/usr/bin/env python
"""Mask R-CNN TRAIN-step stage timing (VERDICT r3 weak #4).

Where do the milliseconds go in the Mask R-CNN fwd+bwd? Separately-jitted
stages, each timed with value_and_grad where the real step differentiates
through it, plus a Faster R-CNN full-step reference at identical settings so
the mask branch's composed cost is the difference of two end-to-end numbers.

    python tools/profile_train_mask.py [batch] [stages]

``stages`` is an optional comma-list (e.g. ``5,6``) to run a subset — handy
because the full-step stages cost minutes of TPU compile each.
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.config import load_config
from mxdetection_tpu.models.registry import build_detector
from mxdetection_tpu.models.detectors.rcnn import batched_roi_align
from mxdetection_tpu.ops.mask_target import mask_targets_for_rois


def timed(name, fn, *args, iters=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [jax.tree.leaves(fn(*args))[0] for _ in range(iters)]
    jax.device_get(outs)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<40} {dt:8.2f} ms")
    return dt


def grad_scalar(gradfn):
    # grads reduced to one scalar INSIDE jit and added un-zeroed, so the
    # backward is a real data dependency (see profile_train.py note)
    def f(*a):
        val, gs = gradfn(*a)
        return val + sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                         for g in jax.tree.leaves(gs))
    return jax.jit(f)


def make_batch(cfg, batch, with_masks):
    d = cfg.data
    g = d.max_gt
    npr = np.random.RandomState(0)
    tb = {
        "images": jnp.asarray(npr.rand(batch, d.pad_h, d.pad_w, 3),
                              jnp.bfloat16),
        "im_info": jnp.tile(jnp.asarray([[800.0, 1333.0, 1.0]]), (batch, 1)),
        "gt_boxes": jnp.tile(
            jnp.concatenate([jnp.asarray([[[50.0, 60, 300, 280],
                                           [200, 100, 500, 400]]]),
                             jnp.zeros((1, g - 2, 4))], axis=1),
            (batch, 1, 1)),
        "gt_labels": jnp.tile(
            jnp.concatenate([jnp.asarray([[1, 2]], jnp.int32),
                             jnp.zeros((1, g - 2), jnp.int32)], 1),
            (batch, 1)),
        "gt_valid": jnp.tile(
            jnp.concatenate([jnp.asarray([[True, True]]),
                             jnp.zeros((1, g - 2), bool)], 1), (batch, 1)),
    }
    if with_masks:
        bm = np.zeros((batch, g, 28, 28), np.uint8)
        bm[:, :2, 4:24, 4:24] = 1
        tb["box_masks"] = jnp.asarray(bm)
    return tb


def full_step_ms(cfg, tb, label, rng):
    bundle = build_detector(cfg)
    tb0 = {k: v[:1] for k, v in tb.items()}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)

    def full_loss(params, tb):
        out, _ = bundle.apply_train(
            {"params": params, "batch_stats": variables["batch_stats"]},
            tb, rng)
        loss, _ = bundle.loss_fn(out, tb, rng, cfg)
        return loss

    return timed(label, grad_scalar(jax.value_and_grad(full_loss)),
                 variables["params"], tb), bundle, variables


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    stages = (set(int(x) for x in sys.argv[2].split(","))
              if len(sys.argv) > 2 else set(range(1, 7)))
    rng = jax.random.PRNGKey(1)

    cfg = load_config("configs/mask_rcnn_r50_fpn_1x.py")
    d = cfg.data
    pad_hw = (d.pad_h, d.pad_w)
    tb = make_batch(cfg, batch, with_masks=True)

    # 1/2: full steps — mask on vs the flagship at identical settings
    if 1 in stages:
        t_mask, _, _ = full_step_ms(cfg, tb, "mask_rcnn fwd+bwd full", rng)
    if 2 in stages:
        cfg_f = load_config("configs/faster_rcnn_r50_fpn_1x.py")
        tb_f = {k: v for k, v in tb.items() if k != "box_masks"}
        t_faster, _, _ = full_step_ms(cfg_f, tb_f, "faster_rcnn fwd+bwd full (ref)", rng)
        if 1 in stages:
            print(f"{'mask-branch composed delta':<40} {t_mask - t_faster:8.2f} ms")

    # isolated mask-branch stages (the fg-quota prefix path of rcnn.py)
    m = cfg.mask_head
    mp = int(round(cfg.bbox_head.num_samples * cfg.bbox_head.pos_fraction))
    npr = np.random.RandomState(1)
    pyr_shapes = [(pad_hw[0] // s, pad_hw[1] // s) for s in (4, 8, 16, 32, 64)]
    pyramid = [jnp.asarray(npr.randn(batch, h, w, 256), jnp.bfloat16)
               for h, w in pyr_shapes]
    rois = jnp.asarray(npr.rand(batch, mp, 4), jnp.float32)
    rois = jnp.concatenate([rois[..., :2] * 600,
                            rois[..., :2] * 600 + rois[..., 2:] * 300 + 8], -1)
    rvalid = jnp.ones((batch, mp), bool)

    # 3: mask RoIAlign-14 fwd+bwd on the fg quota
    def mra_loss(pyr):
        f = batched_roi_align(pyr, rois, rvalid, cfg, m.roi_output_size)
        return jnp.sum(f.astype(jnp.float32) ** 2)
    if 3 in stages:
        timed(f"mask roi_align-{m.roi_output_size} fwd+bwd ({mp} rois)",
              grad_scalar(jax.value_and_grad(mra_loss)), pyramid)

    # 4: box RoIAlign-7 fwd+bwd at the full sample count (for comparison)
    s = cfg.bbox_head.num_samples
    rois_s = jnp.tile(rois[:, :1], (1, s, 1))
    rvalid_s = jnp.ones((batch, s), bool)

    def bra_loss(pyr):
        f = batched_roi_align(pyr, rois_s, rvalid_s, cfg, 7)
        return jnp.sum(f.astype(jnp.float32) ** 2)
    if 4 in stages:
        timed(f"box roi_align-7 fwd+bwd ({s} rois)",
              grad_scalar(jax.value_and_grad(bra_loss)), pyramid)

    # 5: mask head fwd+bwd (4 convs + deconv + logits on mp*b rois)
    from mxdetection_tpu.models.heads.bbox_head import MaskHead

    feats = jnp.asarray(
        npr.randn(batch * mp, m.roi_output_size, m.roi_output_size, 256),
        jnp.bfloat16)
    mask_head = MaskHead(num_classes=cfg.bbox_head.num_classes,
                         num_convs=m.num_convs, channels=m.channels,
                         dtype=jnp.dtype(cfg.backbone.dtype))
    mh_params = mask_head.init(jax.random.PRNGKey(2), feats)

    def mh_loss(p, f):
        out = mask_head.apply(p, f)
        return jnp.sum(out.astype(jnp.float32) ** 2)
    if 5 in stages:
        timed(f"mask head fwd+bwd ({batch * mp} rois)",
              grad_scalar(jax.value_and_grad(mh_loss)), mh_params, feats)

    # 6: mask target crops (stop-grad in the real step: fwd only)
    bm = tb["box_masks"]
    mg = jnp.zeros((batch, mp), jnp.int32)
    if 6 not in stages:
        return
    timed(f"mask targets ({mp} rois, fwd)",
          jax.jit(lambda bm, gb, r, mg: jax.vmap(
              lambda a, b2, c2, d2: mask_targets_for_rois(
                  a, b2, c2, d2, out_size=m.mask_size))(bm, gb, r, mg)),
          bm, tb["gt_boxes"], rois, mg)


if __name__ == "__main__":
    main()
