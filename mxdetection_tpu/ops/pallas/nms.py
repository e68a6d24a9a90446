"""Pallas TPU kernel: exact greedy NMS over a score-sorted box set.

Reference equivalent: ``nms_kernel.cu`` / ``gpu_nms.pyx`` (SURVEY.md §2.3).
The CUDA design computes a 64-bit suppression bitmask matrix in shared-memory
tiles, then a sequential host-side sweep. The TPU design keeps the whole
problem in VMEM and runs the sweep on-chip: N sequential steps, each one
8x128-lane VPU op over all N candidates — no N^2 HBM traffic, no per-step
XLA dispatch (the advantage over the lax.fori_loop formulation in
``ops/nms.py``: one kernel launch instead of N small ones).

Layout: boxes arrive score-sorted desc, padded to a multiple of 128, as four
(1, N) rows (x1, y1, x2, y2) plus a (1, N) validity row. Output is the (1, N)
keep mask. Coordinates are expected pre-offset for class-aware NMS (the
class * offset trick), so this single kernel serves plain and class-aware NMS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _nms_kernel(coords_ref, valid_ref, keep_ref, *, iou_thr: float, n: int,
                max_keep: int):
    x1 = coords_ref[0:1, :]
    y1 = coords_ref[1:2, :]
    x2 = coords_ref[2:3, :]
    y2 = coords_ref[3:4, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (1, N)

    col = jax.lax.broadcasted_iota(jnp.int32, x1.shape, 1)  # (1, N)

    keep_ref[:, :] = valid_ref[:, :]

    # Mosaic cannot load a single lane at a dynamic index, so "box i" scalars
    # are extracted with masked reductions (one-hot select + max) — pure
    # lane-parallel VPU work, ~6 extra O(N) passes per step.
    def pick(row, onehot):
        return jnp.max(jnp.where(onehot, row, -jnp.inf), axis=1, keepdims=True)

    def body(state):
        i, kept = state
        onehot = col == i  # (1, N)
        bx1 = pick(x1, onehot)
        by1 = pick(y1, onehot)
        bx2 = pick(x2, onehot)
        by2 = pick(y2, onehot)
        barea = pick(area, onehot)
        alive = jnp.max(jnp.where(onehot, keep_ref[:, :], 0))  # scalar 0/1
        alive_i = alive > 0

        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = area + barea - inter
        iou = inter / jnp.maximum(union, 1e-12)

        suppress = (iou > iou_thr) & (col > i) & alive_i
        keep_ref[:, :] = jnp.where(suppress, 0, keep_ref[:, :])
        return i + 1, kept + alive

    def cond(state):
        # Early exit: boxes are score-sorted, so once max_keep boxes are
        # confirmed kept, every later survivor ranks below them and can never
        # enter the final top-max_keep selection.
        i, kept = state
        return (i < n) & (kept < max_keep)

    # Contract: callers must select at most max_keep survivors by score
    # (top_k with k == max_keep). On early exit the unprocessed tail may
    # carry unverified keep=1 entries, but all of them score below the
    # max_keep confirmed survivors, so a top-max_keep selection is exact.
    jax.lax.while_loop(cond, body, (0, 0))


@functools.partial(jax.jit, static_argnames=("iou_thr", "max_keep", "interpret"))
def nms_mask_sorted_pallas(boxes: Array, valid: Array, iou_thr: float,
                           max_keep: int | None = None,
                           interpret: bool = False) -> Array:
    """boxes (N, 4) SCORE-SORTED desc, valid (N,) bool -> keep (N,) bool.

    N must be a multiple of 128 (pad with valid=False rows). When ``max_keep``
    is set, the sweep stops once that many survivors are confirmed; callers
    must then take at most max_keep survivors by score (see kernel contract).
    """
    n = boxes.shape[0]
    assert n % 128 == 0, "pad candidate set to a lane multiple"
    coords = boxes.T.astype(jnp.float32)          # (4, N)
    valid_i = valid.astype(jnp.int32).reshape(1, n)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thr=float(iou_thr), n=n,
                          max_keep=int(max_keep) if max_keep else n),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords, valid_i)
    return keep[0].astype(bool)


def _pad_to(x: Array, n: int, value=0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=value)


def nms_pallas(boxes: Array, scores: Array, iou_thr: float, max_out: int,
               valid: Array | None = None, score_thr: float = -jnp.inf,
               interpret: bool = False) -> tuple[Array, Array, Array]:
    """Drop-in replacement for ``ops.nms.nms`` backed by the Pallas kernel."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    valid = valid & (scores > score_thr)
    masked = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-masked)
    n_pad = -(-n // 128) * 128

    boxes_s = _pad_to(boxes[order], n_pad)
    valid_s = _pad_to(valid[order], n_pad)
    keep_s = nms_mask_sorted_pallas(boxes_s, valid_s, iou_thr,
                                    max_keep=max_out, interpret=interpret)

    kept_scores = jnp.where(keep_s[:n], masked[order], -jnp.inf)
    k = min(max_out, n)
    top_scores, idx_sorted = jax.lax.top_k(kept_scores, k)
    if max_out > n:
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((max_out - n,), -jnp.inf, top_scores.dtype)])
        idx_sorted = jnp.concatenate([idx_sorted, jnp.zeros((max_out - n,), idx_sorted.dtype)])
    out_valid = top_scores > -jnp.inf
    out_boxes = jnp.where(out_valid[:, None], boxes[order][idx_sorted], 0.0)
    return out_boxes, jnp.where(out_valid, top_scores, 0.0), out_valid


def class_aware_nms_pallas(boxes: Array, scores: Array, labels: Array,
                           iou_thr: float, max_out: int,
                           valid: Array | None = None,
                           score_thr: float = -jnp.inf,
                           class_offset: float | None = None,
                           interpret: bool = False):
    """Class-aware variant (coordinate offset trick), Pallas-backed."""
    if class_offset is None:
        # max(boxes)+1 keeps shifted coords within float32 ulp safety
        class_offset = jnp.max(boxes) + 1.0
    shifted = boxes + labels.astype(boxes.dtype)[:, None] * class_offset
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    valid = valid & (scores > score_thr)
    masked = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-masked)
    n_pad = -(-n // 128) * 128

    keep_s = nms_mask_sorted_pallas(
        _pad_to(shifted[order], n_pad), _pad_to(valid[order], n_pad),
        iou_thr, max_keep=max_out, interpret=interpret)

    kept_scores = jnp.where(keep_s[:n], masked[order], -jnp.inf)
    k = min(max_out, n)
    top_scores, idx_sorted = jax.lax.top_k(kept_scores, k)
    if max_out > n:
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((max_out - n,), -jnp.inf, top_scores.dtype)])
        idx_sorted = jnp.concatenate([idx_sorted, jnp.zeros((max_out - n,), idx_sorted.dtype)])
    out_valid = top_scores > -jnp.inf
    ordered_boxes = boxes[order]
    ordered_labels = labels[order]
    out_boxes = jnp.where(out_valid[:, None], ordered_boxes[idx_sorted], 0.0)
    out_labels = jnp.where(out_valid, ordered_labels[idx_sorted], -1)
    return out_boxes, jnp.where(out_valid, top_scores, 0.0), out_labels, out_valid
