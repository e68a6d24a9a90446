"""IoU-based target assignment + fixed-shape random subsampling, on-device.

Rebuilds the reference's host-numpy target ops (mxdetection family:
``*/rpn/rpn.py:assign_anchor`` and ``*/operator_py/proposal_target.py`` /
``*/rcnn/rcnn.py:sample_rois``) as jit-traceable fixed-shape functions. The
reference round-trips proposals to host numpy every iteration (a documented
family bottleneck, SURVEY.md §3.1 ①); here assignment and sampling stay on
device with static shapes and validity masks.

Key fixed-shape idiom: "randomly subsample k of the m eligible items" becomes
"rank items by (eligible, random_priority) and mask rank < k" — rank is a
static-shape argsort, k a traced scalar. This reproduces uniform random
subsampling semantics exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

Array = jax.Array


class AssignResult(NamedTuple):
    """Per-box assignment (all fixed shape (N,))."""

    matched_gt: Array   # int32 index into gt rows (valid only where label != -2)
    labels: Array       # int32: -2 = ignore/pad, -1 = ignore, 0 = negative, 1 = positive
    max_iou: Array      # float32 max IoU with any valid gt


def assign_max_iou(
    boxes: Array,
    gt_boxes: Array,
    gt_valid: Array,
    *,
    pos_iou_thr: float,
    neg_iou_thr: float,
    min_pos_iou: float = 0.0,
    match_low_quality: bool = True,
    box_valid: Array | None = None,
    chunk: int = 16384,
) -> AssignResult:
    """Max-IoU assigner (RPN / R-CNN / RetinaNet matching rule).

    boxes: (N, 4), gt_boxes: (G, 4) padded, gt_valid: (G,) bool.
    Rules (reference ``assign_anchor`` semantics):
      * positive if max_iou >= pos_iou_thr
      * negative if max_iou < neg_iou_thr
      * in between: ignore (-1)
      * low-quality match: for each gt, the anchor(s) achieving that gt's max
        IoU (>= min_pos_iou) are forced positive even below pos_iou_thr.
    Padding boxes / padding gt never participate.

    TPU shape note: for RPN-scale inputs (N=279k anchors x G=100 padded gt)
    the dense (N, G) IoU matrix has four consumers, so XLA materializes it —
    ~900 MB/batch8 written and read back thrice (measured 147 ms standalone,
    the largest single train-step cost). Above ``chunk`` anchors the assigner
    runs as a sequential ``lax.map`` over anchor chunks instead: pass A
    reduces per-row max/argmax and the per-gt running best; pass B recomputes
    each chunk's IoU (arithmetic is ~20 FLOP/pair — recompute is free next to
    one HBM round-trip) for the low-quality force. Bit-identical results;
    only the schedule changes.
    """
    n = boxes.shape[0]
    if n <= 2 * chunk:
        iou = pairwise_iou(boxes, gt_boxes)  # (N, G)
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        max_iou = jnp.max(iou, axis=1)
        matched = jnp.argmax(iou, axis=1).astype(jnp.int32)
        gt_best = jnp.max(iou, axis=0)  # (G,)
    else:
        g = -(-n // chunk)
        # zero-area padding rows: IoU exactly 0 with everything, never above
        # any real row's best (all IoUs >= 0), sliced off below
        bp = jnp.pad(boxes, ((0, g * chunk - n), (0, 0))).reshape(g, chunk, 4)

        def pass_a(bc):
            iou = pairwise_iou(bc, gt_boxes)
            iou = jnp.where(gt_valid[None, :], iou, -1.0)
            return (jnp.max(iou, axis=1), jnp.argmax(iou, axis=1).astype(jnp.int32),
                    jnp.max(iou, axis=0))

        mx, am, gb = jax.lax.map(pass_a, bp)
        max_iou = mx.reshape(-1)[:n]
        matched = am.reshape(-1)[:n]
        gt_best = jnp.max(gb, axis=0)

    labels = jnp.full(boxes.shape[:1], -1, jnp.int32)
    labels = jnp.where(max_iou < neg_iou_thr, 0, labels)
    labels = jnp.where(max_iou >= pos_iou_thr, 1, labels)

    if match_low_quality:
        # For each valid gt: its best IoU over boxes; any box tying that best
        # (and above min_pos_iou) becomes positive, matched to that gt.
        # (match to the gt for which this box is the argmax; last such gt
        # wins, matching the reference's sequential overwrite order)
        def low_quality(bc):
            iou = pairwise_iou(bc, gt_boxes)
            iou = jnp.where(gt_valid[None, :], iou, -1.0)
            is_best = ((iou >= gt_best[None, :] - 1e-7) & (iou > min_pos_iou)
                       & gt_valid[None, :])
            gt_ids = jax.lax.broadcasted_iota(jnp.int32, iou.shape, 1)
            return (jnp.any(is_best, axis=1),
                    jnp.max(jnp.where(is_best, gt_ids, -1), axis=1))

        if n <= 2 * chunk:
            force_pos, forced_gt = low_quality(boxes)
        else:
            fp, fg = jax.lax.map(low_quality, bp)
            force_pos = fp.reshape(-1)[:n]
            forced_gt = fg.reshape(-1)[:n]
        labels = jnp.where(force_pos, 1, labels)
        matched = jnp.where(force_pos, forced_gt.astype(jnp.int32), matched)

    no_gt = ~jnp.any(gt_valid)
    labels = jnp.where(no_gt, jnp.where(labels == -2, labels, 0), labels)

    if box_valid is not None:
        labels = jnp.where(box_valid, labels, -2)
    max_iou = jnp.maximum(max_iou, 0.0)
    return AssignResult(matched, labels, max_iou)


def random_rank(key: Array, n: int) -> Array:
    """Random permutation priorities in [0, 1): tie-breaker for subsampling."""
    return jax.random.uniform(key, (n,))


def subsample_labels(
    key: Array,
    labels: Array,
    num_samples: int,
    pos_fraction: float,
) -> tuple[Array, Array]:
    """Randomly keep <=num_samples boxes at <=pos_fraction positives.

    Reference semantics (``assign_anchor`` / ``sample_rois`` subsampling):
    if positives exceed the quota, randomly disable the excess (-> ignore);
    fill the remainder with random negatives. Returns (sample_mask, labels)
    where sample_mask marks boxes that participate in the loss and labels has
    disabled entries demoted to -1.
    """
    k1, k2 = jax.random.split(key)
    n = labels.shape[0]
    is_pos = labels == 1
    is_neg = labels == 0

    max_pos = int(num_samples * pos_fraction)
    num_pos = jnp.minimum(jnp.sum(is_pos), max_pos)
    # rank positives randomly; keep rank < num_pos
    pos_priority = jnp.where(is_pos, random_rank(k1, n), 2.0)
    pos_rank = jnp.argsort(jnp.argsort(pos_priority))  # rank of each elem
    keep_pos = is_pos & (pos_rank < num_pos)

    num_neg = jnp.minimum(jnp.sum(is_neg), num_samples - num_pos)
    neg_priority = jnp.where(is_neg, random_rank(k2, n), 2.0)
    neg_rank = jnp.argsort(jnp.argsort(neg_priority))
    keep_neg = is_neg & (neg_rank < num_neg)

    sample_mask = keep_pos | keep_neg
    new_labels = jnp.where(is_pos & ~keep_pos, -1, labels)
    new_labels = jnp.where(is_neg & ~keep_neg, -1, new_labels)
    return sample_mask, new_labels


class SampledRois(NamedTuple):
    """Fixed-size (S,) sampled RoI set for the second stage."""

    rois: Array          # (S, 4) sampled boxes (pos first, then neg, then pad)
    labels: Array        # (S,) int32 class labels; 0 = background, -1 = pad
    matched_gt: Array    # (S,) gt row index for positives
    pos_mask: Array      # (S,) bool
    valid_mask: Array    # (S,) bool — participates in cls loss
"""Note: rois are gathered with a fixed-size top-k, so S is static."""


def sample_rois(
    key: Array,
    proposals: Array,
    proposal_valid: Array,
    gt_boxes: Array,
    gt_labels: Array,
    gt_valid: Array,
    *,
    num_samples: int,
    pos_fraction: float,
    pos_iou_thr: float,
    neg_iou_thr_hi: float,
    neg_iou_thr_lo: float = 0.0,
    add_gt_as_proposals: bool = True,
) -> SampledRois:
    """Fixed-shape re-expression of the reference's ``proposal_target`` op.

    proposals: (P, 4) padded RPN output; gt_boxes: (G, 4); gt_labels: (G,)
    int32 **1-based** category ids (0 reserved for background); gt_valid: (G,).

    Returns exactly ``num_samples`` rois: randomly chosen foregrounds
    (IoU >= pos_iou_thr, capped at pos_fraction * num_samples) then random
    backgrounds (neg_iou_thr_lo <= IoU < neg_iou_thr_hi), padded with dummy
    rois marked invalid. Matches ``sample_rois`` semantics with static shapes.
    """
    if add_gt_as_proposals:
        proposals = jnp.concatenate([gt_boxes, proposals], axis=0)
        proposal_valid = jnp.concatenate([gt_valid, proposal_valid], axis=0)

    iou = pairwise_iou(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    matched = jnp.argmax(iou, axis=1).astype(jnp.int32)

    is_fg = proposal_valid & (max_iou >= pos_iou_thr)
    is_bg = proposal_valid & (max_iou < neg_iou_thr_hi) & (max_iou >= neg_iou_thr_lo)

    k1, k2 = jax.random.split(key)
    n = proposals.shape[0]
    max_pos = int(round(num_samples * pos_fraction))

    num_fg = jnp.minimum(jnp.sum(is_fg), max_pos)
    num_bg = jnp.minimum(jnp.sum(is_bg), num_samples - num_fg)

    # Selection scores: chosen fg get the highest band, chosen bg the middle,
    # everything else the bottom. One top-k gather then yields [fg..., bg...,
    # pad...] in a single fixed-shape op.
    fg_pri = jnp.where(is_fg, random_rank(k1, n), -1.0)
    fg_rank = jnp.argsort(jnp.argsort(-fg_pri))
    chosen_fg = is_fg & (fg_rank < num_fg)

    bg_pri = jnp.where(is_bg, random_rank(k2, n), -1.0)
    bg_rank = jnp.argsort(jnp.argsort(-bg_pri))
    chosen_bg = is_bg & (bg_rank < num_bg)

    score = jnp.where(chosen_fg, 2.0, jnp.where(chosen_bg, 1.0, 0.0))
    # stable ordering within bands via small random tiebreak already folded in
    _, idx = jax.lax.top_k(score + fg_pri * 1e-4, num_samples)

    rois = proposals[idx]
    sel_fg = chosen_fg[idx]
    sel_bg = chosen_bg[idx]
    sel_matched = matched[idx]

    cls_labels = jnp.where(sel_fg, gt_labels[sel_matched], 0)
    cls_labels = jnp.where(sel_fg | sel_bg, cls_labels, -1)

    return SampledRois(
        rois=rois,
        labels=cls_labels.astype(jnp.int32),
        matched_gt=sel_matched,
        pos_mask=sel_fg,
        valid_mask=sel_fg | sel_bg,
    )
