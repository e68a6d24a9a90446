#!/usr/bin/env python
"""R-FCN TRAIN-step stage timing (round-5 follow-up to profile_train_mask).

Decomposes the R-FCN train fwd+bwd (2.48 steps/s at batch 8 in the round-3
zoo table) into its structural stages so the number is either improved or
explained: dilated-C5 backbone (stride-16 conv5 does 4x the FLOPs of the
strided variant — the R-FCN paper's trade), position-sensitive map convs,
PSRoIPool fwd+bwd, and the single-level RPN+proposal path.

    python tools/profile_train_rfcn.py [batch] [stages]

``stages`` is an optional comma-list (e.g. ``2,3,4,5``) to skip the
minutes-to-compile full-step stage on reruns.
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
from mxdetection_tpu.models.backbones.resnet import ResNet
from mxdetection_tpu.ops.psroi import psroi_pool


def timed(name, fn, *args, iters=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [jax.tree.leaves(fn(*args))[0] for _ in range(iters)]
    jax.device_get(outs)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<44} {dt:8.2f} ms")
    return dt


def grad_scalar(gradfn):
    # grads reduced to one scalar INSIDE jit, added un-zeroed (real data dep)
    def f(*a):
        val, gs = gradfn(*a)
        return val + sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                         for g in jax.tree.leaves(gs))
    return jax.jit(f)


def make_batch(cfg, batch):
    d = cfg.data
    g = d.max_gt
    npr = np.random.RandomState(0)
    return {
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


def backbone_ms(label, batch, pad_hw, *, dilated, remat):
    bb = ResNet(depth=50, norm_kind="frozen_bn", frozen_stages=1,
                dilated_c5=dilated, train=True, dtype=jnp.bfloat16,
                remat=remat)
    x = jnp.asarray(np.random.RandomState(2).rand(batch, *pad_hw, 3),
                    jnp.bfloat16)
    params = bb.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        outs = bb.apply(p, x)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    return timed(label, grad_scalar(jax.value_and_grad(loss)), params, x)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    stages = (set(int(x) for x in sys.argv[2].split(","))
              if len(sys.argv) > 2 else set(range(1, 6)))
    rng = jax.random.PRNGKey(1)

    cfg = load_config("configs/rfcn_r50_1x.py")
    d = cfg.data
    pad_hw = (d.pad_h, d.pad_w)
    tb = make_batch(cfg, batch)

    # 1: full step
    if 1 in stages:
        bundle = build_detector(cfg)
        tb0 = {k: v[:1] for k, v in tb.items()}
        variables = bundle.init(jax.random.PRNGKey(0), tb0)

        def full_loss(params, tb):
            out, _ = bundle.apply_train(
                {"params": params, "batch_stats": variables["batch_stats"]},
                tb, rng)
            loss, _ = bundle.loss_fn(out, tb, rng, cfg)
            return loss

        timed("rfcn fwd+bwd full", grad_scalar(jax.value_and_grad(full_loss)),
              variables["params"], tb)

    # 2/3: backbone fwd+bwd, dilated vs strided C5
    remat = cfg.backbone.remat
    if 2 in stages:
        t_dil = backbone_ms(f"backbone R50 dilated-C5 fwd+bwd (remat={remat})",
                            batch, pad_hw, dilated=True, remat=remat)
    if 3 in stages:
        t_str = backbone_ms("backbone R50 strided-C5 fwd+bwd (ref)",
                            batch, pad_hw, dilated=False, remat=remat)
        if 2 in stages:
            print(f"{'dilated-C5 delta':<44} {t_dil - t_str:8.2f} ms")

    # 4: PS-map 1x1 convs fwd+bwd on synthetic C5 (the head's conv cost)
    k = cfg.rfcn_head.ps_grid
    nc1 = cfg.bbox_head.num_classes + 1
    h5, w5 = pad_hw[0] // 16, pad_hw[1] // 16
    c5 = jnp.asarray(np.random.RandomState(3).randn(batch, h5, w5, 2048),
                     jnp.bfloat16)
    from flax import linen as nn

    class PSMaps(nn.Module):
        @nn.compact
        def __call__(self, x):
            f = nn.relu(nn.Conv(cfg.rfcn_head.reduce_channels, (1, 1),
                                dtype=jnp.bfloat16)(x))
            cm = nn.Conv(k * k * nc1, (1, 1), dtype=jnp.bfloat16)(f)
            rm = nn.Conv(k * k * 4, (1, 1), dtype=jnp.bfloat16)(f)
            om = nn.Conv(k * k * 2, (1, 1), dtype=jnp.bfloat16)(f)
            return cm, rm, om

    ps = PSMaps()
    ps_params = ps.init(jax.random.PRNGKey(4), c5)

    def ps_loss(p, x):
        return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                   for o in ps.apply(p, x))

    if 4 in stages:
        timed(f"ps-map convs fwd+bwd (k={k}, C+1={nc1})",
              grad_scalar(jax.value_and_grad(ps_loss)), ps_params, c5)

    # 5: PSRoIPool fwd+bwd on the sampled roi count (3 pools: off, cls, reg)
    s = cfg.bbox_head.num_samples
    npr = np.random.RandomState(5)
    cls_map = jnp.asarray(npr.randn(batch, h5, w5, k * k * nc1), jnp.bfloat16)
    reg_map = jnp.asarray(npr.randn(batch, h5, w5, k * k * 4), jnp.bfloat16)
    off_map = jnp.asarray(npr.randn(batch, h5, w5, k * k * 2), jnp.bfloat16)
    rois = jnp.asarray(npr.rand(batch, s, 4), jnp.float32)
    rois = jnp.concatenate([rois[..., :2] * 600,
                            rois[..., :2] * 600 + rois[..., 2:] * 300 + 8], -1)
    rvalid = jnp.ones((batch, s), bool)

    def pool_loss(maps):
        cm, rm, om = maps

        def one(cm, rm, om, ro, v):
            offs = psroi_pool(om, ro, 16, output_size=k,
                              roi_valid=v).astype(jnp.float32)
            cb = psroi_pool(cm, ro, 16, output_size=k, offsets=offs,
                            trans_std=cfg.rfcn_head.trans_std, roi_valid=v)
            rb = psroi_pool(rm, ro, 16, output_size=k, offsets=offs,
                            trans_std=cfg.rfcn_head.trans_std, roi_valid=v)
            return (jnp.sum(cb.astype(jnp.float32) ** 2)
                    + jnp.sum(rb.astype(jnp.float32) ** 2))

        return jnp.sum(jax.vmap(one)(cm, rm, om, rois, rvalid))

    if 5 in stages:
        timed(f"psroi_pool x3 fwd+bwd ({s} rois, deform)",
              grad_scalar(jax.value_and_grad(pool_loss)),
              (cls_map, reg_map, off_map))


if __name__ == "__main__":
    main()
