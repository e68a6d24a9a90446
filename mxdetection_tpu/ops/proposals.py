"""Proposal generation: RPN outputs -> fixed-size roi set, fully on-device.

Reference equivalent: the Proposal custom op / native ``MultiProposal``
(``*/operator_py/proposal.py`` + CUDA ``proposal.cu``; SURVEY.md §2.2):
decode top-pre-NMS anchors, clip, filter small, greedy NMS, keep top-post.
The family runs this per FPN level then merges by score — reproduced here
with static shapes: per-level top-k -> decode -> NMS(level) -> merged top-k.

Everything is differentiation-free (proposals are treated as constants by the
second stage, reference semantics) — callers wrap in ``stop_gradient``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from . import boxes as box_lib
from . import nms as nms_lib

Array = jax.Array


def generate_proposals_single(
    cls_logits: Sequence[Array],   # per level (H, W, A)
    bbox_deltas: Sequence[Array],  # per level (H, W, A*4)
    anchors: Sequence[Array],      # per level (H*W*A, 4)
    image_hw: Array,               # (2,) valid (h, w) after resize
    *,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thr: float,
    min_box_size: float = 0.0,
    bbox_stds: tuple = (1.0, 1.0, 1.0, 1.0),
) -> tuple[Array, Array, Array]:
    """One image -> (rois (post_nms_top_n, 4), scores, valid)."""
    lv_boxes, lv_scores, lv_valid = [], [], []
    for cl, bd, an in zip(cls_logits, bbox_deltas, anchors):
        scores = cl.reshape(-1).astype(jnp.float32)
        deltas = bd.reshape(-1, 4).astype(jnp.float32)
        k = min(pre_nms_top_n, scores.shape[0])
        # lax.top_k is a fast partial sort on XLA:TPU at these shapes
        # (7.8 ms for (32, 209k) k=1000); the radix-bisection alternative
        # (ops/topk.py) measured SLOWER here — its cumsum+scatter
        # compaction costs ~40 ms (tools/exp_topk2.py, BASELINE.md)
        top_scores, idx = jax.lax.top_k(scores, k)
        b = box_lib.decode_boxes(an[idx], deltas[idx], stds=bbox_stds)
        b = box_lib.clip_boxes(b, image_hw)
        ok = box_lib.valid_box_mask(b, min_box_size)
        # per-level NMS (family convention), keep at most post_nms_top_n
        keep_n = min(post_nms_top_n, k)
        nb, ns, nv = nms_lib.nms(b, top_scores, nms_thr, keep_n, valid=ok)
        lv_boxes.append(nb)
        lv_scores.append(ns)
        lv_valid.append(nv)

    all_boxes = jnp.concatenate(lv_boxes, 0)
    all_scores = jnp.where(jnp.concatenate(lv_valid, 0),
                           jnp.concatenate(lv_scores, 0), -jnp.inf)
    k = min(post_nms_top_n, all_scores.shape[0])
    top_scores, idx = jax.lax.top_k(all_scores, k)
    valid = top_scores > -jnp.inf
    rois = jnp.where(valid[:, None], all_boxes[idx], 0.0)
    return rois, jnp.where(valid, top_scores, 0.0), valid


def generate_proposals(
    cls_logits: Sequence[Array],   # per level (N, H, W, A)
    bbox_deltas: Sequence[Array],  # per level (N, H, W, A*4)
    anchors: Sequence[Array],
    image_hw: Array,               # (N, 2)
    **kw,
) -> tuple[Array, Array, Array]:
    """Batched proposals via vmap. Gradients are stopped (reference treats
    proposals as data, not a differentiable path)."""
    cls_logits = [jax.lax.stop_gradient(c) for c in cls_logits]
    bbox_deltas = [jax.lax.stop_gradient(b) for b in bbox_deltas]
    fn = lambda c, b, hw: generate_proposals_single(c, b, anchors, hw, **kw)
    return jax.vmap(fn)(cls_logits, bbox_deltas, image_hw)
