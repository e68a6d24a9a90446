"""Training loop: one jitted SPMD train step + host-side epoch driver.

Reference equivalent (SURVEY.md §3.1): ``train_net`` building a
``MutableModule`` and running ``module.fit`` with per-array KVStore push/pull,
host-numpy custom ops inside the graph, and host metric updates every batch.
The TPU redesign collapses the whole iteration — device image transform,
forward, on-device target assignment, loss, backward, gradient ``psum``,
SGD update — into ONE jitted ``shard_map`` program over the ("data", "model")
mesh. The host only feeds raw uint8 batches and reads back scalar metrics.
"""

from __future__ import annotations

import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..data.transforms import batch_transform
from ..parallel.mesh import DATA_AXIS
from .schedule import warmup_multistep

Array = jax.Array


class TrainState(NamedTuple):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Array


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """SGD(momentum) + weight decay + global-norm clip, warmup-multistep LR.

    Reference: SGD m=0.9 wd=1e-4 with grad clipping (SURVEY.md §2.2 "Solver").
    """
    o = cfg.train.optim
    lr_fn = warmup_multistep(
        o.base_lr,
        warmup_steps=o.warmup_steps,
        warmup_ratio=o.warmup_ratio,
        decay_steps=tuple(e * steps_per_epoch for e in o.lr_decay_epochs),
        decay_factor=o.lr_decay_factor,
    )
    parts = []
    if o.grad_clip and o.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(o.grad_clip))
    if o.weight_decay:
        parts.append(optax.add_decayed_weights(o.weight_decay))
    parts.append(optax.sgd(learning_rate=lr_fn, momentum=o.momentum))
    return optax.chain(*parts), lr_fn


def sanitize_gt(tb: dict, min_size: float = 1.0) -> dict:
    """Invalidate gt boxes that collapsed below min_size after resize."""
    b = tb["gt_boxes"]
    ok = ((b[..., 2] - b[..., 0]) >= min_size) & ((b[..., 3] - b[..., 1]) >= min_size)
    tb = dict(tb)
    tb["gt_valid"] = tb["gt_valid"] & ok
    return tb


def make_train_step(
    cfg: Config,
    model,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    out_hw: tuple[int, int] | None = None,
):
    """Builds the jitted SPMD train step.

    ``loss_fn(outputs, device_batch, rng, cfg) -> (loss, metrics)`` is the
    detector-specific piece (retinanet_loss, faster_rcnn loss, ...).
    Batch is sharded along the leading (batch) dim of every array; state is
    replicated; gradients are pmean-ed over the data axis.

    ``out_hw`` overrides the pad canvas (the portrait-bucket step uses the
    transposed canvas; one extra compile, zero content truncation).
    """
    d = cfg.data
    out_hw = out_hw or (d.pad_h, d.pad_w)

    def device_batch(batch: dict) -> dict:
        tb = batch_transform(
            batch["raw"], batch["hw"], batch["flip"], batch["gt_boxes"],
            out_hw=out_hw, scale_size=d.scale, max_size=d.max_size,
            mean=d.mean, std=d.std, dtype=jnp.dtype(cfg.backbone.dtype),
            scale_sizes=batch.get("scale_size"),
        )
        tb["gt_labels"] = batch["gt_labels"]
        tb["gt_valid"] = batch["gt_valid"]
        if "box_masks" in batch:
            tb["box_masks"] = batch["box_masks"]
        return sanitize_gt(tb)

    def step_fn(state: TrainState, batch: dict):
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_wrap(params):
            tb = device_batch(batch)
            variables = {"params": params, "batch_stats": state.batch_stats}
            outputs, mutated = model.apply(variables, tb, rng)
            loss, metrics = loss_fn(outputs, tb, rng, cfg)
            return loss, (metrics, mutated.get("batch_stats", state.batch_stats))

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_wrap, has_aux=True)(state.params)

        grads = jax.lax.pmean(grads, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        metrics["loss"] = jax.lax.pmean(loss, DATA_AXIS)
        metrics["grad_norm"] = optax.global_norm(grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            rng=state.rng,
        )
        return new_state, metrics

    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


class Trainer:
    """Epoch driver: loader -> jitted step -> metrics/checkpoints.

    ``model_apply(variables, device_batch, rng) -> (outputs, mutated_vars)``
    adapts any flax detector; see ``models/registry.py``.
    """

    def __init__(self, cfg: Config, model_apply, init_variables: dict,
                 loss_fn, mesh: Mesh, steps_per_epoch: int, logger=None):
        self.cfg = cfg
        self.mesh = mesh
        self.logger = logger

        class _M:
            apply = staticmethod(model_apply)

        self.tx, self.lr_fn = make_optimizer(cfg, steps_per_epoch)
        self._model = _M
        self._loss_fn = loss_fn
        # one step program per pad canvas; portrait batches use the transposed
        # canvas (orientation bucketing — two compiles, no content truncation)
        self._step_fns: dict = {}
        self.step_fn = self._step_for(portrait=False)

        params = init_variables["params"]
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=init_variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
            rng=jax.random.PRNGKey(cfg.train.seed),
        )
        # replicate state over the mesh
        rep = NamedSharding(mesh, P())
        if jax.process_count() > 1:
            self.state = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    rep, np.asarray(x)), self.state)
        else:
            self.state = jax.device_put(self.state, rep)
        self._batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def _step_for(self, portrait: bool):
        d = self.cfg.data
        if d.pad_h == d.pad_w:
            portrait = False  # square canvas: one program serves both
        if portrait not in self._step_fns:
            out_hw = (d.pad_w, d.pad_h) if portrait else (d.pad_h, d.pad_w)
            self._step_fns[portrait] = make_train_step(
                self.cfg, self._model, self._loss_fn, self.tx, self.mesh,
                out_hw=out_hw)
        return self._step_fns[portrait]

    def run_step(self, batch: dict) -> dict:
        batch = dict(batch)
        portrait = bool(batch.pop("portrait", False))
        if jax.process_count() > 1:
            # each process holds its shard of the global batch; assemble the
            # global array from process-local rows (SURVEY.md §3.5: the SPMD
            # replacement for per-rank roidb shards feeding dist_sync)
            batch = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    self._batch_sharding, np.asarray(x)), batch)
        else:
            batch = jax.device_put(batch, self._batch_sharding)
        self.state, metrics = self._step_for(portrait)(self.state, batch)
        return metrics

    def fit_epochs(self, loader, num_epochs: int, log_every: int = 20,
                   on_metrics=None, metrics_file: str | None = None) -> list:
        """Simple fit loop; returns the history of logged metric dicts.

        ``metrics_file``: optional JSONL path — every logged metric dict is
        appended as one JSON line (the structured-observability artifact;
        SURVEY.md §5.5 — TensorBoard-equivalent without a TF dependency).
        """
        import json

        history = []
        global_bs = loader.batch_size * jax.process_count()
        t0 = time.time()
        n_since = 0
        for epoch in range(num_epochs):
            for batch in loader.epoch(epoch):
                metrics = self.run_step(batch)
                n_since += 1
                step = int(self.state.step)
                if step % log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    dt = time.time() - t0
                    m.update(step=step, epoch=epoch,
                             lr=float(self.lr_fn(step)),
                             imgs_per_sec=global_bs * n_since / max(dt, 1e-9))
                    t0, n_since = time.time(), 0
                    history.append(m)
                    if self.logger:
                        self.logger.info(
                            "step %d ep %d loss %.4f lr %.5f %.1f img/s", step, epoch,
                            m["loss"], m["lr"], m["imgs_per_sec"])
                    if metrics_file:
                        with open(metrics_file, "a") as fh:
                            fh.write(json.dumps(m) + "\n")
                    if on_metrics:
                        on_metrics(m)
        return history
