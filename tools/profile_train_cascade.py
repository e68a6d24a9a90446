#!/usr/bin/env python
"""Cascade R101-DCN TRAIN-step stage timing (round 5).

Attributes the 969 ms/step (1.032 steps/s, batch 8) cascade train step:
backbone R101 with DCN stages 3-5 fwd+bwd vs the plain-conv R101 at the same
settings (the DCN kernel premium), and the full detector fwd+bwd (cascade
heads + 3x RoIAlign + proposals on top of the backbone).

    python tools/profile_train_cascade.py [batch] [stages]
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


def timed(name, fn, *args, iters=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [jax.tree.leaves(fn(*args))[0] for _ in range(iters)]
    jax.device_get(outs)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<48} {dt:8.2f} ms")
    return dt


def grad_scalar(gradfn):
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


def backbone_ms(label, batch, pad_hw, *, dcn, remat):
    bb = ResNet(depth=101, norm_kind="frozen_bn", frozen_stages=1,
                dcn_stages=(False, True, True, True) if dcn else
                (False, False, False, False),
                train=True, dtype=jnp.bfloat16, remat=remat)
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
              if len(sys.argv) > 2 else set(range(1, 4)))
    rng = jax.random.PRNGKey(1)

    cfg = load_config("configs/cascade_rcnn_r101_dcn_1x.py")
    d = cfg.data
    pad_hw = (d.pad_h, d.pad_w)
    tb = make_batch(cfg, batch)
    remat = cfg.backbone.remat

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

        timed("cascade-dcn fwd+bwd full",
              grad_scalar(jax.value_and_grad(full_loss)),
              variables["params"], tb)

    if 2 in stages:
        backbone_ms(f"backbone R101-DCN(3,4,5) fwd+bwd (remat={remat})",
                    batch, pad_hw, dcn=True, remat=remat)
    if 3 in stages:
        backbone_ms("backbone R101 plain fwd+bwd (ref)",
                    batch, pad_hw, dcn=False, remat=remat)


if __name__ == "__main__":
    main()
