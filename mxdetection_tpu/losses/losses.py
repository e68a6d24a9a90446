"""Detection losses — vectorized JAX, fused by XLA (no kernels needed).

Reference equivalents (mxdetection family): ``mx.sym.smooth_l1`` + MakeLoss
(SmoothL1 with inside/outside weights), ``mx.sym.contrib.SigmoidFocalLoss``
(CUDA op), per-RoI mask sigmoid BCE, and the OHEM box-annotator custom op
(``*/operator_py/box_annotator_ohem.py``). All are elementwise/reduction
chains — exactly what XLA fuses into surrounding matmuls — so the TPU-native
design keeps them as plain JAX. Every function is fixed-shape and takes
explicit validity weights instead of dynamic gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def smooth_l1_loss(pred: Array, target: Array, beta: float = 1.0) -> Array:
    """Elementwise Huber / smooth-L1. Reference: ``mx.sym.smooth_l1`` with
    scalar sigma (beta = 1/sigma^2)."""
    diff = jnp.abs(pred - target)
    if beta <= 0.0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def sigmoid_focal_loss(
    logits: Array,
    targets: Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> Array:
    """Elementwise sigmoid focal loss (RetinaNet). ``targets`` in {0, 1}.

    Reference: ``mx.sym.contrib.SigmoidFocalLoss`` CUDA kernel; numerically
    stable log-sigmoid formulation here, left to XLA fusion.
    """
    p = jax.nn.sigmoid(logits)
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1.0 - targets) * jax.nn.log_sigmoid(-logits))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return alpha_t * ((1.0 - p_t) ** gamma) * ce


def softmax_ce_loss(logits: Array, labels: Array, valid: Array) -> Array:
    """Mean softmax cross-entropy over valid rows.

    logits (N, C), labels (N,) int (any value where invalid), valid (N,) bool.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def mask_bce_loss(mask_logits: Array, mask_targets: Array, valid: Array) -> Array:
    """Per-RoI mask BCE averaged over valid rois' pixels (Mask R-CNN).

    mask_logits (R, S, S) — the slice for each roi's gt class; targets in
    {0,1}; valid (R,) marks foreground rois.
    """
    ce = -(mask_targets * jax.nn.log_sigmoid(mask_logits)
           + (1.0 - mask_targets) * jax.nn.log_sigmoid(-mask_logits))
    per_roi = jnp.mean(ce, axis=(-1, -2))
    per_roi = jnp.where(valid, per_roi, 0.0)
    return jnp.sum(per_roi) / jnp.maximum(jnp.sum(valid), 1)


def ohem_select(per_roi_loss: Array, valid: Array, keep: int) -> Array:
    """Online hard example mining: mask keeping the ``keep`` highest-loss
    valid rois. Reference: ``BoxAnnotatorOHEM`` custom op — forward computes
    loss, backward only flows through the hardest N. Fixed-shape: returns a
    bool mask; callers weight their loss by it.
    """
    masked = jnp.where(valid, per_roi_loss, -jnp.inf)
    rank = jnp.argsort(jnp.argsort(-masked))
    return valid & (rank < keep)
