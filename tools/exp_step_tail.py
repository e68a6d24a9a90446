#!/usr/bin/env python
"""Locate the trainer-step tail: full step vs isolated fwd+bwd+optimizer.

BASELINE.md round-3 footer: at batch 8 the separately-jitted
fwd+bwd+optimizer runs ~162 ms while the full trainer step runs ~194 ms.
Hypothesized tail: metrics pmean + second global-norm + shard_map plumbing.
This times controlled variants of the REAL step program to attribute it:

  A  full trainer step (shard_map + transform + metrics), as bench_train
  B  same body, plain jit (no shard_map, pmeans dropped on 1 device)
  C  A minus metrics (loss-only return: no grad_norm, no metric pmeans)
  D  A with the uint8->canvas transform hoisted out (fed transformed batch)
  E  A with grad_norm reused from the clip (single global-norm pass)

    python tools/exp_step_tail.py [batch_per_device]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(name, fn, state, batch, iters=10):
    # donation-safe: fn returns (state, aux); rethread state
    s, m = fn(state, batch)
    import jax
    jax.device_get(jax.tree.leaves(m)[0] if jax.tree.leaves(m) else s.step)
    t0 = time.perf_counter()
    last = []
    for _ in range(iters):
        s, m = fn(s, batch)
        last.append(jax.tree.leaves(m)[0] if jax.tree.leaves(m) else s.step)
    jax.device_get(last)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<58} {dt:8.2f} ms")
    return s


def main():
    bpd = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.data.transforms import batch_transform
    from mxdetection_tpu.models.registry import build_detector
    from mxdetection_tpu.parallel import make_mesh
    from mxdetection_tpu.parallel.mesh import DATA_AXIS
    from mxdetection_tpu.train import Trainer
    from mxdetection_tpu.train.trainer import TrainState, sanitize_gt

    cfg = load_config("configs/faster_rcnn_r50_fpn_1x.py")
    d = cfg.data
    mesh = make_mesh(cfg.train.mesh_shape)
    n_dev = mesh.devices.size
    batch_size = bpd * n_dev

    bundle = build_detector(cfg)
    tb0 = {"images": jnp.zeros((1, d.pad_h, d.pad_w, 3)),
           "im_info": jnp.asarray([[d.pad_h, d.pad_w, 1.0]]),
           "gt_boxes": jnp.zeros((1, d.max_gt, 4)),
           "gt_labels": jnp.zeros((1, d.max_gt), jnp.int32),
           "gt_valid": jnp.zeros((1, d.max_gt), bool)}
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=1000)

    rng_np = np.random.RandomState(0)
    g = d.max_gt
    batch = {
        "raw": rng_np.randint(0, 255, (batch_size, 640, 640, 3)).astype(np.uint8),
        "hw": np.asarray([[480.0, 640.0]] * batch_size, np.float32),
        "flip": np.zeros((batch_size,), bool),
        "gt_boxes": np.tile(np.asarray(
            [[[50.0, 60, 300, 280], [200, 100, 500, 400]] + [[0, 0, 0, 0]] * (g - 2)],
            np.float32), (batch_size, 1, 1)),
        "gt_labels": np.zeros((batch_size, g), np.int32),
        "gt_valid": np.tile(np.asarray([[True, True] + [False] * (g - 2)]),
                            (batch_size, 1)),
    }
    dev_batch = jax.device_put(batch, trainer._batch_sharding)

    # snapshot BEFORE variant A donates the live state
    host_state_early = jax.tree.map(lambda x: np.asarray(jax.device_get(x)),
                                    trainer.state)

    # ---- A: the real step ----
    if "A" in os.environ.get("VARIANTS", "A"):
        timed("A full trainer step (shard_map)", trainer._step_for(False),
              trainer.state, dev_batch)

    # shared pieces for variants
    out_hw = (d.pad_h, d.pad_w)
    tx = trainer.tx

    def device_tb(batch):
        tb = batch_transform(
            batch["raw"], batch["hw"], batch["flip"], batch["gt_boxes"],
            out_hw=out_hw, scale_size=d.scale, max_size=d.max_size,
            mean=d.mean, std=d.std, dtype=jnp.dtype(cfg.backbone.dtype))
        tb["gt_labels"] = batch["gt_labels"]
        tb["gt_valid"] = batch["gt_valid"]
        return sanitize_gt(tb)

    def make_body(with_metrics=True, pre_transformed=False, reuse_norm=False,
                  use_pmean=False):
        def step_fn(state, batch):
            rng = jax.random.fold_in(state.rng, state.step)

            def loss_wrap(params):
                tb = batch if pre_transformed else device_tb(batch)
                vs = {"params": params, "batch_stats": state.batch_stats}
                outputs, mutated = bundle.apply_train(vs, tb, rng)
                loss, metrics = bundle.loss_fn(outputs, tb, rng, cfg)
                return loss, (metrics, mutated.get("batch_stats", state.batch_stats))

            (loss, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_wrap, has_aux=True)(state.params)
            if use_pmean:
                grads = jax.lax.pmean(grads, DATA_AXIS)
            if with_metrics:
                if use_pmean:
                    metrics = jax.lax.pmean(metrics, DATA_AXIS)
                    metrics["loss"] = jax.lax.pmean(loss, DATA_AXIS)
                else:
                    metrics["loss"] = loss
                if not reuse_norm:
                    metrics["grad_norm"] = optax.global_norm(grads)
            else:
                # loss only: no grad_norm pass, no per-metric pmeans (a real
                # scalar is still returned so the timing harness has a
                # non-donated array to fetch)
                metrics = {"loss": loss}
            if reuse_norm:
                # one global-norm pass: clip manually, feed a clip-less chain
                gnorm = optax.global_norm(grads)
                clip = cfg.train.optim.grad_clip
                scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
                grads2 = jax.tree.map(lambda t: t * scale.astype(t.dtype), grads)
                updates, opt_state = tx_noclip.update(
                    grads2, state.opt_state, state.params)
                if with_metrics:
                    metrics["grad_norm"] = gnorm
            else:
                updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(state.step + 1, params, new_stats, opt_state,
                              state.rng), metrics
        return step_fn

    o = cfg.train.optim
    from mxdetection_tpu.train.schedule import warmup_multistep
    lr_fn = warmup_multistep(
        o.base_lr, warmup_steps=o.warmup_steps, warmup_ratio=o.warmup_ratio,
        decay_steps=tuple(e * 1000 for e in o.lr_decay_epochs),
        decay_factor=o.lr_decay_factor)
    tx_noclip = optax.chain(
        optax.add_decayed_weights(o.weight_decay),
        optax.sgd(learning_rate=lr_fn, momentum=o.momentum))

    rep = NamedSharding(mesh, P())
    host_state = host_state_early

    def fresh_state(tx_for=None):
        s = host_state
        if tx_for is not None:
            dev_params = jax.device_put(s.params, rep)
            return TrainState(
                jax.device_put(s.step, rep), dev_params,
                jax.device_put(s.batch_stats, rep),
                jax.jit(tx_for.init)(dev_params),
                jax.device_put(s.rng, rep))
        return jax.device_put(s, rep)

    jit = lambda f: jax.jit(f, donate_argnums=(0,))
    variants = os.environ.get("VARIANTS", "BCDEF")

    if "B" in variants:
        timed("B plain jit, no shard_map/pmean", jit(make_body()),
              fresh_state(), dev_batch)
    if "C" in variants:
        timed("C plain jit, metrics dropped", jit(make_body(with_metrics=False)),
              fresh_state(), dev_batch)
    if "D" in variants:
        # D: hoist the transform
        tb_pre = jax.jit(device_tb)(dev_batch)
        jax.device_get(tb_pre["im_info"])
        timed("D plain jit, transform hoisted out",
              jit(make_body(pre_transformed=True)), fresh_state(), tb_pre)
    if "E" in variants:
        timed("E plain jit, single global-norm pass",
              jit(make_body(reuse_norm=True)), fresh_state(tx_noclip), dev_batch)
    if "F" in variants:
        def tf_only(state, batch):
            tb = device_tb(batch)
            return state, {"x": tb["images"][0, 0, 0, 0]}
        timed("F transform alone", jax.jit(tf_only), fresh_state(), dev_batch)


if __name__ == "__main__":
    main()
