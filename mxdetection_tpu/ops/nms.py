"""Greedy NMS with fixed shapes — the TPU re-expression of gpu_nms.

Reference equivalent: ``*/nms/nms.py`` + ``gpu_nms.pyx`` / ``nms_kernel.cu``
(greedy IoU suppression) and the test-time per-class wrapper. Greedy NMS is
inherently sequential in the number of *kept* boxes; the TPU formulation runs
N fixed vector steps (each O(N) on the VPU) over a score-sorted, padded box
set — exact greedy semantics, static shapes, no host round-trip.

Class-aware NMS uses the classic coordinate-offset trick: shift each class's
boxes into a disjoint region so one single-class NMS pass does per-class
suppression.

A Pallas tiled variant lives in ``ops/pallas/nms.py`` for large N; this module
is the reference implementation and the dispatcher.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

Array = jax.Array


def nms_mask(boxes: Array, scores: Array, iou_thr: float, valid: Array | None = None) -> Array:
    """Exact greedy NMS. Returns bool keep mask aligned with inputs.

    boxes: (N, 4) xyxy, scores: (N,). Padding rows should carry score=-inf or
    valid=False. N is static; loop runs N steps of vectorized suppression.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)  # descending
    boxes_s = boxes[order]
    iou = pairwise_iou(boxes_s, boxes_s)  # (N, N)

    if valid is None:
        valid_s = jnp.ones((n,), bool)
    else:
        valid_s = valid[order]

    def body(i, keep):
        # If box i survives so far (and is valid), suppress later overlaps.
        alive_i = keep[i] & valid_s[i]
        later = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) > i
        suppress = alive_i & later & (iou[i] > iou_thr)
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, valid_s)
    # scatter back to the original ordering
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def _topk_padded(scores: Array, k: int) -> tuple[Array, Array]:
    """top_k that tolerates k > len(scores) by padding with -inf."""
    n = scores.shape[0]
    if k > n:
        scores = jnp.concatenate([scores, jnp.full((k - n,), -jnp.inf, scores.dtype)])
    return jax.lax.top_k(scores, k)


def nms_mask_fixpoint(boxes: Array, scores: Array, iou_thr: float,
                      valid: Array | None = None) -> Array:
    """Exact greedy NMS as a Jacobi fixpoint of MXU matvecs.

    Greedy keep satisfies the unique recurrence
        keep[j] = valid[j] and no kept i with score[i]>score[j] overlaps j.
    Jacobi-iterating ``keep <- valid & (M @ keep == 0)`` (M[j,i] = 1 iff
    suppressor candidate i<j overlaps j) from keep=valid converges to that
    unique fixpoint in O(suppression-chain-depth) iterations — typically <10 —
    instead of N sequential steps. Each iteration is ONE (N,N)x(N,1) matmul on
    the MXU, which is why this formulation wins on TPU (the design SURVEY.md
    §7.3.2 calls the "iterative-suppression formulation").
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    if valid is None:
        valid_s = jnp.ones((n,), bool)
    else:
        valid_s = valid[order]

    iou = pairwise_iou(boxes_s, boxes_s)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)  # j (suppressee)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)  # i (suppressor)
    m = ((iou > iou_thr) & (col < row) & valid_s[None, :]).astype(jnp.float32)

    def body(state):
        keep, _, it = state
        overlap = m @ keep  # (N, 1) MXU matvec
        new_keep = jnp.where(valid_s[:, None], (overlap == 0).astype(jnp.float32), 0.0)
        changed = jnp.any(new_keep != keep)
        return new_keep, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    keep0 = valid_s.astype(jnp.float32)[:, None]
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, jnp.asarray(True), 0))
    keep_sorted = keep[:, 0] > 0
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def _impl() -> str:
    """NMS implementation: 'fixpoint' (default on TPU), 'pallas', or 'lax'."""
    import os

    impl = os.environ.get("MXDET_NMS_IMPL", "auto")
    if impl != "auto":
        return impl
    return "fixpoint" if jax.default_backend() == "tpu" else "lax"


def nms(
    boxes: Array,
    scores: Array,
    iou_thr: float,
    max_out: int,
    valid: Array | None = None,
    score_thr: float = -jnp.inf,
) -> tuple[Array, Array, Array]:
    """NMS returning fixed-size top-``max_out`` (boxes, scores, valid_mask)."""
    impl = _impl()
    if impl == "pallas":
        from .pallas.nms import nms_pallas

        return nms_pallas(boxes, scores, iou_thr, max_out, valid, score_thr)
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    valid = valid & (scores > score_thr)
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    if impl == "fixpoint":
        keep = nms_mask_fixpoint(boxes, masked_scores, iou_thr, valid)
    else:
        keep = nms_mask(boxes, masked_scores, iou_thr, valid)
    out_scores = jnp.where(keep, masked_scores, -jnp.inf)
    top_scores, idx = _topk_padded(out_scores, max_out)
    idx = jnp.minimum(idx, boxes.shape[0] - 1)
    out_valid = top_scores > -jnp.inf
    out_boxes = jnp.where(out_valid[:, None], boxes[idx], 0.0)
    return out_boxes, jnp.where(out_valid, top_scores, 0.0), out_valid


def class_aware_nms(
    boxes: Array,
    scores: Array,
    labels: Array,
    iou_thr: float,
    max_out: int,
    valid: Array | None = None,
    score_thr: float = -jnp.inf,
    class_offset: float | None = None,
) -> tuple[Array, Array, Array, Array]:
    """Per-class NMS via the coordinate-offset trick.

    boxes (N, 4), scores (N,), labels (N,) int. Returns fixed-size
    (boxes, scores, labels, valid) of length max_out, score-sorted.
    Reference equivalent: the test-time per-class ``py_nms_wrapper`` loop in
    ``*/core/tester.py`` — but one fused pass instead of C python loops.

    ``class_offset`` defaults to max(boxes)+1 (the torchvision batched_nms
    rule) so shifted coordinates stay small enough that float32 ulp never
    perturbs IoU — a fixed 1e5 would quantize coords by ~0.5px at label 79.
    The max is taken over VALID rows only and NaN-scrubbed, so padding rows
    carrying sentinel/NaN coordinates cannot poison every shifted box.
    """
    impl = _impl()
    if class_offset is None:
        safe = boxes if valid is None else jnp.where(valid[:, None], boxes, 0.0)
        class_offset = jnp.nan_to_num(
            jnp.max(safe), nan=0.0, posinf=0.0, neginf=0.0) + 1.0
    if impl == "pallas":
        from .pallas.nms import class_aware_nms_pallas

        return class_aware_nms_pallas(
            boxes, scores, labels, iou_thr, max_out, valid, score_thr, class_offset)
    offsets = labels.astype(boxes.dtype)[:, None] * class_offset
    shifted = boxes + offsets
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    valid = valid & (scores > score_thr)
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    if impl == "fixpoint":
        keep = nms_mask_fixpoint(shifted, masked_scores, iou_thr, valid)
    else:
        keep = nms_mask(shifted, masked_scores, iou_thr, valid)
    out_scores = jnp.where(keep, masked_scores, -jnp.inf)
    top_scores, idx = _topk_padded(out_scores, max_out)
    idx = jnp.minimum(idx, boxes.shape[0] - 1)
    out_valid = top_scores > -jnp.inf
    out_boxes = jnp.where(out_valid[:, None], boxes[idx], 0.0)
    out_labels = jnp.where(out_valid, labels[idx], -1)
    return out_boxes, jnp.where(out_valid, top_scores, 0.0), out_labels, out_valid


def batched_nms(boxes: Array, scores: Array, iou_thr: float, max_out: int, valid=None):
    """vmap-friendly single-class NMS over a leading batch dim."""
    fn = lambda b, s, v: nms(b, s, iou_thr, max_out, v)
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    return jax.vmap(fn)(boxes, scores, valid)


def _soft_nms_scan(iou_boxes: Array, scores: Array, max_out: int,
                   method: str, iou_thr: float, sigma: float,
                   valid: Array | None) -> tuple[Array, Array]:
    """Core soft-NMS pick loop -> (picked indices, picked scores).

    ``max_out`` sequential picks; each takes the current score argmax,
    emits it, and decays every remaining score by f(IoU with the pick) —
    one O(N) VPU step per pick, fixed shapes. Because decay only lowers
    scores, the emitted sequence is non-increasing, so ``max_out`` picks
    yield exactly the global top-``max_out`` of the fully-run algorithm.
    """
    n = iou_boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    s0 = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    bxs = iou_boxes.astype(jnp.float32)
    area = jnp.maximum(bxs[:, 2] - bxs[:, 0], 0) * jnp.maximum(bxs[:, 3] - bxs[:, 1], 0)
    if method not in ("linear", "gaussian"):
        raise ValueError(f"unknown soft-NMS method {method!r}")

    def body(s, _):
        i = jnp.argmax(s)
        si = s[i]
        bi = bxs[i]
        lt = jnp.maximum(bxs[:, :2], bi[:2])
        rb = jnp.minimum(bxs[:, 2:], bi[2:])
        wh = jnp.maximum(rb - lt, 0.0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / jnp.maximum(area + area[i] - inter, 1e-12)
        if method == "linear":
            decay = jnp.where(iou > iou_thr, 1.0 - iou, 1.0)
        else:
            decay = jnp.exp(-(iou * iou) / sigma)
        # guard: -inf (padding / already picked) must stay -inf even when
        # decay == 0 (identical boxes), where -inf * 0 would produce NaN
        s = jnp.where(jnp.isfinite(s), s * decay, -jnp.inf)
        return s.at[i].set(-jnp.inf), (i, si)

    _, (idx, svals) = jax.lax.scan(body, s0, None, length=max_out)
    return idx, svals


def soft_nms(
    boxes: Array,
    scores: Array,
    max_out: int,
    *,
    method: str = "linear",          # "linear" | "gaussian"
    iou_thr: float = 0.3,            # linear decay threshold (Nt)
    sigma: float = 0.5,              # gaussian decay width
    score_thr: float = 1e-3,
    valid: Array | None = None,
) -> tuple[Array, Array, Array]:
    """Soft-NMS (Bodla et al. 2017): decay overlapping scores, don't kill.

    Family repos ship this as a host-side test-time option next to hard NMS
    (the improved-NMS variant of ``py_nms_wrapper``; SURVEY.md §2.2 "NMS").
    Boxes decayed below ``score_thr`` are dropped; picked-box coordinates
    are never modified (matches the reference). Fixed-size outputs.
    """
    idx, svals = _soft_nms_scan(boxes, scores, max_out, method, iou_thr,
                                sigma, valid)
    out_valid = svals > score_thr
    out_boxes = jnp.where(out_valid[:, None], boxes[idx], 0.0)
    return out_boxes, jnp.where(out_valid, svals, 0.0), out_valid


def box_voting(
    kept_boxes: Array,
    kept_labels: Array,
    kept_valid: Array,
    pool_boxes: Array,
    pool_scores: Array,
    pool_labels: Array,
    vote_thr: float,
    pool_valid: Array | None = None,
) -> Array:
    """Box voting (Gidaris & Komodakis 2015): refine each post-NMS box as the
    score-weighted average of same-class pre-NMS candidates overlapping it.

    Family repos ship this as the test-time ``bbox_vote`` option next to
    soft-NMS in the per-class host loop of ``*/core/tester.py``; here it is
    one (K, N) IoU + two matmul-shaped contractions — fixed shapes, no loop.
    Scores are left unchanged (reference semantics). Returns refined boxes.
    """
    if pool_valid is None:
        pool_valid = jnp.ones(pool_scores.shape, bool)
    iou = pairwise_iou(kept_boxes, pool_boxes)                      # (K, N)
    same = kept_labels[:, None] == pool_labels[None, :]
    m = (iou >= vote_thr) & same & pool_valid[None, :] & kept_valid[:, None]
    w = jnp.where(m, jnp.maximum(pool_scores, 0.0)[None, :], 0.0)   # (K, N)
    num = w @ pool_boxes.astype(w.dtype)                            # (K, 4)
    den = jnp.sum(w, axis=1, keepdims=True)
    # a kept box always matches itself (IoU 1) unless its own score is 0;
    # fall back to the original coords when no weight survives
    voted = jnp.where(den > 0, num / jnp.maximum(den, 1e-12), kept_boxes)
    return jnp.where(kept_valid[:, None], voted, kept_boxes)


def class_aware_nms_from_cfg(t, boxes: Array, scores: Array, labels: Array,
                             valid: Array | None = None):
    """Test-time class-aware NMS dispatch by ``TestCfg.nms_method``:
    "greedy" (default hard NMS), "soft_linear", or "soft_gaussian";
    optional post-pass box voting (``TestCfg.bbox_vote``) over the
    pre-NMS candidate pool handed to this call."""
    if t.nms_method == "greedy":
        out = class_aware_nms(boxes, scores, labels, t.nms_thr,
                              t.max_per_image, valid=valid,
                              score_thr=t.score_thr)
    elif t.nms_method.startswith("soft_"):
        out = class_aware_soft_nms(
            boxes, scores, labels, t.max_per_image,
            method=t.nms_method[len("soft_"):], iou_thr=t.nms_thr,
            sigma=t.soft_sigma, score_thr=t.score_thr, valid=valid)
    else:
        raise ValueError(f"unknown test.nms_method {t.nms_method!r}")
    if getattr(t, "bbox_vote", False):
        ob, os_, ol, ov = out
        ob = box_voting(ob, ol, ov, boxes, scores, labels, t.vote_thr,
                        pool_valid=valid)
        out = (ob, os_, ol, ov)
    return out


def class_aware_soft_nms(
    boxes: Array,
    scores: Array,
    labels: Array,
    max_out: int,
    *,
    method: str = "linear",
    iou_thr: float = 0.3,
    sigma: float = 0.5,
    score_thr: float = 1e-3,
    valid: Array | None = None,
    class_offset: float | None = None,
) -> tuple[Array, Array, Array, Array]:
    """Per-class soft-NMS via the same coordinate-offset trick as
    ``class_aware_nms``: cross-class IoU is 0, so cross-class decay is 1
    (no interaction), while within-class decay matches ``soft_nms``."""
    if class_offset is None:
        safe = boxes if valid is None else jnp.where(valid[:, None], boxes, 0.0)
        class_offset = jnp.nan_to_num(
            jnp.max(safe), nan=0.0, posinf=0.0, neginf=0.0) + 1.0
    shifted = boxes + labels.astype(boxes.dtype)[:, None] * class_offset
    idx, svals = _soft_nms_scan(shifted, scores, max_out, method, iou_thr,
                                sigma, valid)
    out_valid = svals > score_thr
    out_boxes = jnp.where(out_valid[:, None], boxes[idx], 0.0)
    out_labels = jnp.where(out_valid, labels[idx], -1)
    return out_boxes, jnp.where(out_valid, svals, 0.0), out_labels, out_valid
