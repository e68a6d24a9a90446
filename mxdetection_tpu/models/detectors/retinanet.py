"""RetinaNet detector: network, loss, and postprocess — all fixed-shape.

Reference call stack (SURVEY.md §3.3): resnet -> FPN P3-P7 -> shared subnets
-> dense anchor matching (pos>=0.5, neg<0.4) -> SigmoidFocalLoss +
SmoothL1(beta=0.11) normalized by num_pos; test: decode + class-aware NMS.
The reference matched anchors in the host data loader; here matching is an
on-device vmapped step inside the jitted train step (no host sync).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import Config
from ...losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops import anchors as anchor_lib
from ...ops import boxes as box_lib
from ...ops import matching, nms
from ..backbones.resnet import ResNet
from ..heads.retina import RetinaHead
from ..necks.fpn import FPN

Array = jax.Array


class RetinaNet(nn.Module):
    cfg: Config
    train: bool = True

    @nn.compact
    def __call__(self, images: Array) -> dict:
        c = self.cfg
        feats = ResNet(
            depth=c.backbone.depth,
            norm_kind=c.backbone.norm,
            frozen_stages=c.backbone.frozen_stages,
            dcn_stages=c.backbone.dcn_stages,
            train=self.train,
            dtype=jnp.dtype(c.backbone.dtype),
            remat=c.backbone.remat,
            name="backbone",
        )(images)
        pyramid = FPN(
            out_channels=c.fpn.out_channels,
            min_level=c.fpn.min_level,
            max_level=c.fpn.max_level,
            extra_convs=c.fpn.extra_convs,
            dtype=jnp.dtype(c.backbone.dtype),
            name="fpn",
        )(feats)
        h = c.retina_head
        cls_logits, bbox_deltas = RetinaHead(
            num_classes=h.num_classes,
            num_anchors=len(h.ratios) * h.scales_per_octave,
            stacked_convs=h.stacked_convs,
            channels=h.channels,
            prior_prob=h.prior_prob,
            dtype=jnp.dtype(c.backbone.dtype),
            name="head",
        )(pyramid)
        return {"cls": cls_logits, "reg": bbox_deltas}


def make_anchors(cfg: Config, image_hw: tuple[int, int]) -> Array:
    """All anchors for the padded image shape, concat over levels. (A_tot, 4)."""
    h = cfg.retina_head
    strides = [2 ** lv for lv in range(cfg.fpn.min_level, cfg.fpn.max_level + 1)]
    gen = anchor_lib.AnchorGenerator(
        strides=strides,
        scales=tuple(h.octave_base_scale * 2 ** (i / h.scales_per_octave)
                     for i in range(h.scales_per_octave)),
        ratios=h.ratios,
    )
    feat_shapes = [(-(-image_hw[0] // s), -(-image_hw[1] // s)) for s in strides]
    return gen(feat_shapes)


def _flatten_levels(per_level: list, last_dim: int) -> Array:
    """[(N,H,W,A*D)] -> (N, sum HWA, D), matching anchor row-major order."""
    n = per_level[0].shape[0]
    flat = [p.reshape(n, -1, last_dim) for p in per_level]
    return jnp.concatenate(flat, axis=1)


def retinanet_loss(outputs: dict, anchors: Array, gt_boxes: Array, gt_labels: Array,
                   gt_valid: Array, rng: Array, cfg: Config) -> tuple[Array, dict]:
    """Dense focal + smooth-L1 loss, vmapped over the batch.

    gt_boxes (N, G, 4); gt_labels (N, G) int32 in [0, C); gt_valid (N, G).
    """
    h = cfg.retina_head
    num_classes = h.num_classes
    cls = _flatten_levels(outputs["cls"], num_classes).astype(jnp.float32)
    reg = _flatten_levels(outputs["reg"], 4).astype(jnp.float32)

    def one_image(cls_i, reg_i, gtb, gtl, gtv):
        res = matching.assign_max_iou(
            anchors, gtb, gtv,
            pos_iou_thr=h.pos_iou_thr, neg_iou_thr=h.neg_iou_thr,
            match_low_quality=True,
        )
        pos = res.labels == 1
        neg = res.labels == 0
        num_pos = jnp.maximum(jnp.sum(pos), 1).astype(jnp.float32)

        # one-hot targets; ignored anchors contribute nothing
        tgt_cls = jnp.where(pos, gtl[res.matched_gt], -1)
        onehot = jax.nn.one_hot(tgt_cls, num_classes, dtype=jnp.float32)
        fl = sigmoid_focal_loss(cls_i, onehot, alpha=h.focal_alpha, gamma=h.focal_gamma)
        fl = jnp.where((pos | neg)[:, None], fl, 0.0)
        cls_loss = jnp.sum(fl) / num_pos

        tgt_reg = box_lib.encode_boxes(anchors, gtb[res.matched_gt], stds=h.bbox_stds)
        l1 = smooth_l1_loss(reg_i, tgt_reg, beta=h.smooth_l1_beta)
        l1 = jnp.where(pos[:, None], l1, 0.0)
        reg_loss = jnp.sum(l1) / num_pos
        return cls_loss, reg_loss, num_pos

    cls_loss, reg_loss, num_pos = jax.vmap(one_image)(cls, reg, gt_boxes, gt_labels, gt_valid)
    metrics = {
        "loss_cls": jnp.mean(cls_loss),
        "loss_reg": jnp.mean(reg_loss),
        "num_pos": jnp.mean(num_pos),
    }
    total = metrics["loss_cls"] + metrics["loss_reg"]
    return total, metrics


def topk_pairs(logits: Array, k: int, num_classes: int):
    """Top-k over (anchor, class) pairs, TPU-shaped. Exact modulo ties.

    XLA:TPU lowers ``lax.top_k`` to a full sort — over P3's 12.6M pairs
    that costs ~1.3 s/batch32 (measured), 91% of RetinaNet inference.
    Two-stage redesign (69x faster, 18.8 ms): (1) per-anchor max over
    classes (one VPU reduce) -> exact top-k ANCHORS by best class;
    (2) exact top-k over the winners' full (k, C) class rows.

    This selects EXACTLY the top-k pairs whenever scores are distinct:
    if pair (a, c) is in the exact top-k but anchor a is not in the
    stage-1 top-ka (ka = min(k, A)), then ka anchors each have a max
    pair strictly above logits[a, c] — i.e. >= k pairs beat it, a
    contradiction. Ties at the ka-th anchor boundary can swap
    equal-scored pairs (index-order differences only). Proven by the
    property test tests/test_retinanet_topk.py against
    ``topk_pairs_exact``, including adversarial saturation (many
    anchors each holding several top-k-grade classes).
    Works on bf16 logits (sigmoid is monotonic; applied to winners only).
    """
    ka = min(k, logits.shape[0])
    _, a1 = jax.lax.top_k(jnp.max(logits, axis=-1), ka)
    rows = logits[a1].astype(jnp.float32)          # (ka, C)
    s2, f2 = jax.lax.top_k(rows.reshape(-1), min(k, ka * num_classes))
    return s2, a1[f2 // num_classes], f2 % num_classes


def topk_pairs_exact(logits: Array, k: int, num_classes: int):
    """Exact (anchor, class) top-k: full sort over A*C pairs.

    The parity-eval reference path (``cfg.test.exact_topk``): per-pair
    score sorting at the full-sort lax.top_k cost the two-stage path
    exists to avoid.
    """
    flat = logits.reshape(-1).astype(jnp.float32)
    s, f = jax.lax.top_k(flat, min(k, flat.shape[0]))
    return s, f // num_classes, f % num_classes


def retinanet_postprocess(outputs: dict, cfg: Config, image_hw: tuple[int, int],
                          im_info: Array) -> dict:
    """Decode + class-aware NMS, fully on device; one host transfer at the end.

    im_info: (N, 3) rows (orig_h, orig_w, scale). Returns dict of fixed-size
    (N, max_per_image) detections in ORIGINAL image coordinates.
    """
    h = cfg.retina_head
    t = cfg.test
    num_classes = h.num_classes
    anchors = make_anchors(cfg, image_hw)

    # per-level candidate cap keeps top_k cheap; standard retinanet recipe
    strides = [2 ** lv for lv in range(cfg.fpn.min_level, cfg.fpn.max_level + 1)]
    level_sizes = [(-(-image_hw[0] // s)) * (-(-image_hw[1] // s)) for s in strides]
    a_per_cell = len(h.ratios) * h.scales_per_octave

    cls = outputs["cls"]
    reg = outputs["reg"]

    select_pairs = topk_pairs_exact if t.exact_topk else topk_pairs

    def one_image(cls_i, reg_i, info):
        cand_boxes, cand_scores, cand_labels = [], [], []
        offset = 0
        for lv, hw in enumerate(level_sizes):
            na = hw * a_per_cell
            logits = cls_i[lv].reshape(na, num_classes)
            deltas = reg_i[lv].reshape(na, 4)
            lv_anchors = jax.lax.dynamic_slice_in_dim(anchors, offset, na, axis=0)
            offset += na

            k = min(t.pre_nms_per_class, na * num_classes)
            top_logits, a_idx, c_idx = select_pairs(logits, k, num_classes)
            b = box_lib.decode_boxes(
                lv_anchors[a_idx], deltas[a_idx].astype(jnp.float32),
                stds=h.bbox_stds)
            cand_boxes.append(b)
            cand_scores.append(jax.nn.sigmoid(top_logits))
            cand_labels.append(c_idx)

        boxes = jnp.concatenate(cand_boxes, 0)
        scores = jnp.concatenate(cand_scores, 0)
        labels = jnp.concatenate(cand_labels, 0)

        # clip to the valid (unpadded) region, then to original image
        boxes = box_lib.clip_boxes(boxes, info[:2] * info[2])
        # merged pre-NMS cap
        k = min(t.pre_nms_per_class, scores.shape[0])
        scores, idx = jax.lax.top_k(scores, k)
        boxes, labels = boxes[idx], labels[idx]

        ob, os_, ol, ov = nms.class_aware_nms_from_cfg(t, boxes, scores, labels)
        ob = ob / info[2]  # back to original coordinates
        ob = box_lib.clip_boxes(ob, info[:2])
        return ob, os_, ol, ov

    b, s, l, v = jax.vmap(one_image)(cls, reg, im_info)
    return {"boxes": b, "scores": s, "labels": l, "valid": v}
