"""Unified R-CNN detector: Faster / Mask / Cascade R-CNN — fixed shapes.

Reference call stack (SURVEY.md §3.1): resnet C2-C5 -> FPN P2-P6 -> RPN ->
Proposal op (CUDA) -> proposal_target (HOST-numpy custom op, the family's
per-iteration device->host sync ①) -> fpn_roi_pooling (CUDA RoIAlign) ->
2fc bbox head (+ mask branch) -> losses. The TPU rebuild keeps the exact
semantic pipeline but runs every step on device with static shapes: proposal
sampling is ``ops.matching.sample_rois`` (fixed-size, rank-based random
subsampling), mask targets are affine crops of canonical per-instance masks,
and the cascade is a compile-time unrolled 3-stage loop.

Label convention: (C+1)-way softmax, background = 0, foreground = 1..C
(family convention; dataset labels are 0-based and shifted here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import Config
from ...losses import mask_bce_loss, ohem_select, smooth_l1_loss
from ...ops import anchors as anchor_lib
from ...ops import boxes as box_lib
from ...ops import matching, nms as nms_lib
from ...ops.mask_target import mask_targets_for_rois
from ...ops.proposals import generate_proposals
from ...ops.roi_align import multilevel_roi_align
from ..backbones.resnet import ResNet
from ..heads.bbox_head import BBoxHead, MaskHead
from ..heads.rpn import RPNHead
from ..necks.fpn import FPN

Array = jax.Array


# ---------------------------------------------------------------------------
# anchor/proposal helpers


def rpn_anchor_cfg(cfg: Config):
    a = cfg.rpn.anchor
    return anchor_lib.AnchorGenerator(strides=a.strides, scales=a.scales, ratios=a.ratios)


def rpn_level_anchors(cfg: Config, pad_hw: tuple[int, int]) -> list:
    gen = rpn_anchor_cfg(cfg)
    shapes = [(-(-pad_hw[0] // s), -(-pad_hw[1] // s)) for s in cfg.rpn.anchor.strides]
    return gen.per_level(shapes)


def _roi_strides(cfg: Config) -> list:
    return [2 ** lv for lv in range(cfg.roi.min_level, cfg.roi.max_level + 1)]


def _use_pallas_roi_align() -> bool:
    """Pallas RoIAlign on TPU for the forward-only (inference) path.

    Override with MXDET_ROIALIGN_IMPL=pallas|xla. The Pallas kernel is
    forward-only; training keeps the autodiff XLA formulation.
    """
    import os

    impl = os.environ.get("MXDET_ROIALIGN_IMPL", "auto")
    if impl != "auto":
        return impl == "pallas"
    return jax.default_backend() == "tpu"


def batched_roi_align(pyramid: list, rois: Array, valid: Array, cfg: Config,
                      out_size: int, inference: bool = False) -> Array:
    """pyramid: P[min..max] each (B, H, W, C); rois (B, S, 4) -> (B, S, P, P, C)."""
    r = cfg.roi
    feats = pyramid[: r.max_level - r.min_level + 1]
    if _use_pallas_roi_align() and feats[0].shape[-1] % 128 == 0:
        if inference:
            from ...ops.pallas.roi_align import multilevel_roi_align_pallas

            # vmap composition (grid lifted to (B, R)) measured FASTER than
            # the flat natively-batched grid for inference (57.7 vs 80.4 ms,
            # 32x1000 rois on v5e): one launch, no chunk concat. The batched
            # entry point exists for training, where the backward's aliased
            # HBM accumulators cannot go through vmap.
            fn = lambda f, ro, v: multilevel_roi_align_pallas(
                f, ro, tuple(_roi_strides(cfg)), output_size=out_size,
                sampling_ratio=r.sampling_ratio, min_level=r.min_level,
                canonical_scale=r.canonical_scale,
                canonical_level=r.canonical_level, roi_valid=v)
            return jax.vmap(fn)(feats, rois, valid)
        # training DEFAULT: Pallas fwd+bwd via custom_vjp, natively
        # image-batched kernels (no lax.map; the factorized matmul-shaped
        # backward compiles in seconds where the old unrolled-loop kernel
        # was pathological at batch>=4). Measured batch 8 @832x1344, 512
        # rois, v5e: RoIAlign fwd+bwd 13.4 vs 62.2 ms XLA; FULL train
        # fwd+bwd 99.8 vs 168.4 ms (1.69x). Opt out: MXDET_ROIALIGN_TRAIN=xla.
        import os

        if os.environ.get("MXDET_ROIALIGN_TRAIN", "pallas") == "pallas":
            from ...ops.pallas.roi_align import make_trainable_roi_align

            fn = make_trainable_roi_align(
                tuple(_roi_strides(cfg)), output_size=out_size,
                sampling_ratio=r.sampling_ratio, min_level=r.min_level,
                canonical_scale=r.canonical_scale,
                canonical_level=r.canonical_level)
            return fn(feats, rois, valid)
    fn = lambda f, ro, v: multilevel_roi_align(
        f, ro, _roi_strides(cfg), output_size=out_size,
        sampling_ratio=r.sampling_ratio, min_level=r.min_level,
        canonical_scale=r.canonical_scale, canonical_level=r.canonical_level,
        roi_valid=v)
    return jax.vmap(fn)(feats, rois, valid)


def relabel_rois(rois, roi_valid, gt_boxes, gt_labels1, gt_valid, iou_thr):
    """Cascade stage re-assignment: label rois by IoU at the stage threshold
    (no subsampling — cascade semantics, SURVEY.md §2.2 'Cascade target')."""
    iou = box_lib.pairwise_iou(rois, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    matched = jnp.argmax(iou, axis=1).astype(jnp.int32)
    pos = roi_valid & (max_iou >= iou_thr)
    labels = jnp.where(pos, gt_labels1[matched], 0)
    labels = jnp.where(roi_valid, labels, -1)
    return labels.astype(jnp.int32), matched, pos


def decode_stage_boxes(rois, deltas, stds, image_hw):
    """Class-agnostic decode + clip for cascade refinement."""
    b = box_lib.decode_boxes(rois, deltas, stds=stds)
    return box_lib.clip_boxes(b, image_hw)


# ---------------------------------------------------------------------------
# module


class RCNN(nn.Module):
    cfg: Config
    train: bool = True

    def setup(self):
        c = self.cfg
        self.backbone = ResNet(
            depth=c.backbone.depth, norm_kind=c.backbone.norm,
            frozen_stages=c.backbone.frozen_stages, dcn_stages=c.backbone.dcn_stages,
            train=self.train, dtype=jnp.dtype(c.backbone.dtype),
            remat=c.backbone.remat, name="backbone")
        self.fpn = FPN(
            out_channels=c.fpn.out_channels, min_level=c.fpn.min_level,
            max_level=c.fpn.max_level, extra_convs=c.fpn.extra_convs,
            dtype=jnp.dtype(c.backbone.dtype), name="fpn")
        self.rpn = RPNHead(
            num_anchors=rpn_anchor_cfg(c).num_base_anchors,
            channels=c.fpn.out_channels, dtype=jnp.dtype(c.backbone.dtype), name="rpn")

        n_stages = c.cascade.num_stages if c.cascade else 1
        agnostic = bool(c.cascade) or c.bbox_head.class_agnostic
        self.bbox_heads = [
            BBoxHead(num_classes=c.bbox_head.num_classes,
                     fc_channels=c.bbox_head.fc_channels,
                     class_agnostic=agnostic,
                     dtype=jnp.dtype(c.backbone.dtype), name=f"bbox_head{i}")
            for i in range(n_stages)
        ]
        if c.mask_head is not None:
            self.mask_head = MaskHead(
                num_classes=c.bbox_head.num_classes,
                num_convs=c.mask_head.num_convs, channels=c.mask_head.channels,
                dtype=jnp.dtype(c.backbone.dtype), name="mask_head")

    def extract(self, images: Array) -> list:
        return self.fpn(self.backbone(images))

    def _stage_stds(self, i: int):
        c = self.cfg
        return c.cascade.stage_bbox_stds[i] if c.cascade else c.bbox_head.bbox_stds

    def __call__(self, tb: dict, rng: Array | None) -> dict:
        return self.forward_train(tb, rng) if self.train else self.forward_test(tb)

    # -- training ----------------------------------------------------------
    def forward_train(self, tb: dict, rng: Array) -> dict:
        c = self.cfg
        images = tb["images"]
        b = images.shape[0]
        with jax.named_scope("backbone_fpn"):
            pyramid = self.extract(images)
        with jax.named_scope("rpn_head"):
            rpn_cls, rpn_reg = self.rpn(pyramid)

        pad_hw = (images.shape[1], images.shape[2])
        anchors = rpn_level_anchors(c, pad_hw)
        resized_hw = tb["im_info"][:, :2] * tb["im_info"][:, 2:3]

        with jax.named_scope("proposals"):
            rois, roi_scores, roi_valid = generate_proposals(
                rpn_cls, rpn_reg, anchors, resized_hw,
                pre_nms_top_n=c.rpn.pre_nms_top_n_train,
                post_nms_top_n=c.rpn.post_nms_top_n_train,
                nms_thr=c.rpn.nms_thr, min_box_size=c.rpn.min_box_size,
                bbox_stds=c.rpn.bbox_stds)

        gt_labels1 = jnp.where(tb["gt_valid"], tb["gt_labels"] + 1, 0)

        h = c.bbox_head
        keys = jax.random.split(rng, b)
        with jax.named_scope("proposal_target"):
            sampled = jax.vmap(lambda k, p, pv, gb, gl, gv: matching.sample_rois(
                k, p, pv, gb, gl, gv,
                num_samples=h.num_samples, pos_fraction=h.pos_fraction,
                pos_iou_thr=h.pos_iou_thr, neg_iou_thr_hi=h.neg_iou_thr_hi,
                neg_iou_thr_lo=h.neg_iou_thr_lo,
            ))(keys, rois, roi_valid, tb["gt_boxes"], gt_labels1, tb["gt_valid"])

        n_stages = c.cascade.num_stages if c.cascade else 1
        stage_rois = sampled.rois
        stage_labels = sampled.labels
        stage_matched = sampled.matched_gt
        stage_pos = sampled.pos_mask
        stage_valid = sampled.valid_mask

        stages_out = []
        for i in range(n_stages):
            roi_feats = batched_roi_align(pyramid, stage_rois, stage_valid, c,
                                          c.roi.output_size)
            s = roi_feats.shape[1]
            cls_logits, deltas = self.bbox_heads[i](
                roi_feats.reshape(b * s, *roi_feats.shape[2:]))
            cls_logits = cls_logits.reshape(b, s, -1)
            deltas = deltas.reshape(b, s, -1)

            # regression targets against matched gt, in stage stds
            tgt = jax.vmap(lambda r, gb, m: box_lib.encode_boxes(
                r, gb[m], stds=self._stage_stds(i)))(
                stage_rois, tb["gt_boxes"], stage_matched)

            stages_out.append({
                "cls_logits": cls_logits, "deltas": deltas,
                "labels": stage_labels, "reg_targets": tgt,
                "pos": stage_pos, "valid": stage_valid, "rois": stage_rois,
            })

            if i + 1 < n_stages:
                refined = jax.vmap(lambda r, d, hw: decode_stage_boxes(
                    r, d, self._stage_stds(i), hw))(
                    stage_rois, jax.lax.stop_gradient(deltas), resized_hw)
                stage_rois = refined
                stage_labels, stage_matched, stage_pos = jax.vmap(
                    lambda r, rv, gb, gl, gv: relabel_rois(
                        r, rv, gb, gl, gv, c.cascade.stage_iou_thrs[i + 1])
                )(stage_rois, stage_valid, tb["gt_boxes"], gt_labels1, tb["gt_valid"])

        out = {
            "rpn_cls": rpn_cls, "rpn_reg": rpn_reg, "stages": stages_out,
            "pad_hw": pad_hw,
        }

        if c.mask_head is not None:
            m = c.mask_head
            s1 = stages_out[0]
            # The mask loss only sees foreground rois, and sample_rois gathers
            # the fg band first, so every positive lives in the static
            # fg-quota prefix. Running the branch on that prefix reproduces
            # the reference's fg-only mask branch (MaskTargetOperator on fg
            # rois) at 1/4 the RoIAlign+head cost of the full sampled set.
            mp = int(round(c.bbox_head.num_samples * c.bbox_head.pos_fraction))
            mask_rois = s1["rois"][:, :mp]
            mask_pos = s1["pos"][:, :mp]
            mask_feats = batched_roi_align(pyramid, mask_rois, mask_pos, c,
                                           m.roi_output_size)
            s = mask_feats.shape[1]
            mask_logits = self.mask_head(
                mask_feats.reshape(b * s, *mask_feats.shape[2:]))
            out["mask_logits"] = mask_logits.reshape(b, s, m.mask_size, m.mask_size, -1)
            out["mask_targets"] = jax.vmap(
                lambda bm, gb, r, mg: mask_targets_for_rois(
                    bm, gb, r, mg, out_size=m.mask_size)
            )(tb["box_masks"], tb["gt_boxes"], mask_rois,
              sampled.matched_gt[:, :mp])
        return out

    # -- inference ---------------------------------------------------------
    def forward_test(self, tb: dict) -> dict:
        c = self.cfg
        images = tb["images"]
        b = images.shape[0]
        pyramid = self.extract(images)
        rpn_cls, rpn_reg = self.rpn(pyramid)

        pad_hw = (images.shape[1], images.shape[2])
        anchors = rpn_level_anchors(c, pad_hw)
        resized_hw = tb["im_info"][:, :2] * tb["im_info"][:, 2:3]

        rois, roi_scores, roi_valid = generate_proposals(
            rpn_cls, rpn_reg, anchors, resized_hw,
            pre_nms_top_n=c.rpn.pre_nms_top_n_test,
            post_nms_top_n=c.rpn.post_nms_top_n_test,
            nms_thr=c.rpn.nms_thr, min_box_size=c.rpn.min_box_size,
            bbox_stds=c.rpn.bbox_stds)

        n_stages = c.cascade.num_stages if c.cascade else 1
        stage_rois = rois
        probs_sum = None
        deltas = None
        for i in range(n_stages):
            roi_feats = batched_roi_align(pyramid, stage_rois, roi_valid, c,
                                          c.roi.output_size, inference=True)
            s = roi_feats.shape[1]
            cls_logits, deltas = self.bbox_heads[i](
                roi_feats.reshape(b * s, *roi_feats.shape[2:]))
            cls_logits = cls_logits.reshape(b, s, -1)
            deltas = deltas.reshape(b, s, -1)
            p = jax.nn.softmax(cls_logits, axis=-1)
            probs_sum = p if probs_sum is None else probs_sum + p
            if i + 1 < n_stages:
                stage_rois = jax.vmap(lambda r, d, hw: decode_stage_boxes(
                    r, d, self._stage_stds(i), hw))(stage_rois, deltas, resized_hw)

        return {
            "pyramid": pyramid,
            "rois": stage_rois, "roi_valid": roi_valid,
            "probs": probs_sum / n_stages,
            "deltas": deltas,                       # final stage deltas
            "final_stds": self._stage_stds(n_stages - 1),
            "class_agnostic": bool(c.cascade) or c.bbox_head.class_agnostic,
        }

    def mask_forward(self, pyramid: list, det_boxes: Array, det_valid: Array) -> Array:
        """Run the mask branch on final detections (Mask R-CNN inference).
        det_boxes (B, D, 4) -> (B, D, 2P, 2P, C) logits."""
        c = self.cfg
        m = c.mask_head
        b, d = det_boxes.shape[:2]
        feats = batched_roi_align(pyramid, det_boxes, det_valid, c,
                                  m.roi_output_size, inference=True)
        logits = self.mask_head(feats.reshape(b * d, *feats.shape[2:]))
        return logits.reshape(b, d, m.mask_size, m.mask_size, -1)


# ---------------------------------------------------------------------------
# loss


def rcnn_loss(outputs: dict, tb: dict, rng: Array, cfg: Config) -> tuple[Array, dict]:
    c = cfg
    pad_hw = outputs["pad_hw"]
    anchors = jnp.concatenate(rpn_level_anchors(c, pad_hw), axis=0)

    rpn_cls = jnp.concatenate(
        [o.reshape(o.shape[0], -1) for o in outputs["rpn_cls"]], axis=1
    ).astype(jnp.float32)
    rpn_reg = jnp.concatenate(
        [o.reshape(o.shape[0], -1, 4) for o in outputs["rpn_reg"]], axis=1
    ).astype(jnp.float32)

    resized_hw = tb["im_info"][:, :2] * tb["im_info"][:, 2:3]

    def rpn_one(key, cls_i, reg_i, gtb, gtv, hw):
        # exclude anchors outside the valid resized region (allowed_border=0)
        inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
                  & (anchors[:, 2] <= hw[1]) & (anchors[:, 3] <= hw[0]))
        res = matching.assign_max_iou(
            anchors, gtb, gtv, pos_iou_thr=c.rpn.pos_iou_thr,
            neg_iou_thr=c.rpn.neg_iou_thr, match_low_quality=True,
            box_valid=inside)
        sample_mask, labels = matching.subsample_labels(
            key, res.labels, c.rpn.batch_size, c.rpn.pos_fraction)
        pos = sample_mask & (labels == 1)
        n_samp = jnp.maximum(jnp.sum(sample_mask), 1).astype(jnp.float32)

        tgt = jnp.where(pos, 1.0, 0.0)
        bce = -(tgt * jax.nn.log_sigmoid(cls_i) + (1 - tgt) * jax.nn.log_sigmoid(-cls_i))
        cls_loss = jnp.sum(jnp.where(sample_mask, bce, 0.0)) / n_samp

        reg_tgt = box_lib.encode_boxes(anchors, gtb[res.matched_gt], stds=c.rpn.bbox_stds)
        l1 = smooth_l1_loss(reg_i, reg_tgt, beta=1.0 / 9.0)
        reg_loss = jnp.sum(jnp.where(pos[:, None], l1, 0.0)) / n_samp
        return cls_loss, reg_loss

    keys = jax.random.split(jax.random.fold_in(rng, 1), rpn_cls.shape[0])
    rpn_cls_loss, rpn_reg_loss = jax.vmap(rpn_one)(
        keys, rpn_cls, rpn_reg, tb["gt_boxes"], tb["gt_valid"], resized_hw)

    metrics = {
        "loss_rpn_cls": jnp.mean(rpn_cls_loss),
        "loss_rpn_reg": jnp.mean(rpn_reg_loss),
    }
    total = (metrics["loss_rpn_cls"] + metrics["loss_rpn_reg"]) * c.rpn.loss_weight

    n_stages = len(outputs["stages"])
    num_classes = c.bbox_head.num_classes
    for i, st in enumerate(outputs["stages"]):
        w = c.cascade.stage_loss_weights[i] if c.cascade else 1.0

        def stage_one(cls_i, deltas_i, labels_i, tgt_i, pos_i, valid_i):
            # per-roi losses (kept unreduced so OHEM can rank them)
            logp = jax.nn.log_softmax(cls_i, axis=-1)
            safe = jnp.clip(labels_i, 0, num_classes)
            nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
            nll = jnp.where(valid_i, nll, 0.0)

            if deltas_i.shape[-1] == 4:
                d = deltas_i
            else:
                dr = deltas_i.reshape(deltas_i.shape[0], num_classes + 1, 4)
                idx = jnp.clip(labels_i, 0, num_classes)[:, None, None]
                d = jnp.take_along_axis(dr, idx, axis=1)[:, 0]
            l1 = jnp.sum(smooth_l1_loss(d, tgt_i, beta=c.bbox_head.smooth_l1_beta),
                         axis=-1)
            l1 = jnp.where(pos_i, l1, 0.0)

            if c.bbox_head.ohem:
                # reference OHEM semantics: rank rois by total loss, keep the
                # hardest ohem_keep for the backward pass
                keep = ohem_select(nll + l1, valid_i, c.bbox_head.ohem_keep)
                keep = jax.lax.stop_gradient(keep)
                norm = jnp.maximum(jnp.sum(keep), 1).astype(jnp.float32)
                cls_loss = jnp.sum(jnp.where(keep, nll, 0.0)) / norm
                reg_loss = jnp.sum(jnp.where(keep & pos_i, l1, 0.0)) / norm
            else:
                norm = jnp.maximum(jnp.sum(valid_i), 1).astype(jnp.float32)
                cls_loss = jnp.sum(nll) / norm
                reg_loss = jnp.sum(l1) / norm
            n_valid = jnp.maximum(jnp.sum(valid_i), 1).astype(jnp.float32)
            acc = jnp.sum(jnp.where(
                valid_i, (jnp.argmax(cls_i, -1) == labels_i), 0)) / n_valid
            return cls_loss, reg_loss, acc

        cls_l, reg_l, acc = jax.vmap(stage_one)(
            st["cls_logits"], st["deltas"], st["labels"], st["reg_targets"],
            st["pos"], st["valid"])
        metrics[f"loss_rcnn_cls{i}"] = jnp.mean(cls_l)
        metrics[f"loss_rcnn_reg{i}"] = jnp.mean(reg_l) * c.bbox_head.loss_bbox_weight
        metrics[f"rcnn_acc{i}"] = jnp.mean(acc)
        total = total + w * (metrics[f"loss_rcnn_cls{i}"] + metrics[f"loss_rcnn_reg{i}"])

    if "mask_logits" in outputs:
        s1 = outputs["stages"][0]
        # the branch ran on the fg-quota prefix only (see forward_train)
        mp = outputs["mask_logits"].shape[1]

        def mask_one(logits_i, tgt_i, labels_i, pos_i):
            # per-roi class slice: logits (S, M, M, C) -> (S, M, M)
            cls_idx = jnp.clip(labels_i - 1, 0, num_classes - 1)
            sel = jnp.take_along_axis(
                logits_i, cls_idx[:, None, None, None], axis=-1)[..., 0]
            return mask_bce_loss(sel, tgt_i, pos_i)

        ml = jax.vmap(mask_one)(
            outputs["mask_logits"], outputs["mask_targets"],
            s1["labels"][:, :mp], s1["pos"][:, :mp])
        metrics["loss_mask"] = jnp.mean(ml) * c.mask_head.loss_weight
        total = total + metrics["loss_mask"]

    metrics["num_pos_rois"] = jnp.mean(jnp.sum(outputs["stages"][0]["pos"], axis=1)
                                       .astype(jnp.float32))
    return total, metrics


# ---------------------------------------------------------------------------
# postprocess


def rcnn_postprocess(outputs: dict, cfg: Config, image_hw: tuple[int, int],
                     im_info: Array) -> dict:
    """Decode + per-class NMS on device. Returns fixed (N, max_per_image) dets
    in original image coordinates (labels 0-based)."""
    t = cfg.test
    num_classes = cfg.bbox_head.num_classes
    stds = outputs["final_stds"]
    agnostic = outputs["class_agnostic"]

    def one(rois, valid, probs, deltas, info):
        resized_hw = info[:2] * info[2]
        if agnostic:
            boxes = box_lib.decode_boxes(rois, deltas, stds=stds)      # (R, 4)
            boxes = box_lib.clip_boxes(boxes, resized_hw)
            boxes_pc = jnp.broadcast_to(boxes[:, None, :], (rois.shape[0], num_classes, 4))
        else:
            d = deltas.reshape(rois.shape[0], num_classes + 1, 4)
            boxes_pc = jax.vmap(lambda r, dd: box_lib.decode_boxes(
                jnp.broadcast_to(r, (num_classes + 1, 4)), dd, stds=stds))(rois, d)
            boxes_pc = box_lib.clip_boxes(boxes_pc, resized_hw)[:, 1:, :]  # drop bg

        scores_pc = probs[:, 1:]                                        # (R, C)
        r = rois.shape[0]
        flat_boxes = boxes_pc.reshape(r * num_classes, 4)
        flat_scores = jnp.where(valid[:, None], scores_pc, 0.0).reshape(-1)
        flat_labels = jnp.broadcast_to(
            jnp.arange(num_classes)[None, :], (r, num_classes)).reshape(-1)

        k = min(t.pre_nms_per_class, flat_scores.shape[0])
        top_scores, idx = jax.lax.top_k(flat_scores, k)
        ob, os_, ol, ov = nms_lib.class_aware_nms_from_cfg(
            t, flat_boxes[idx], top_scores, flat_labels[idx])
        ob = box_lib.clip_boxes(ob / info[2], info[:2])
        return ob, os_, ol, ov

    b, s, l, v = jax.vmap(one)(
        outputs["rois"], outputs["roi_valid"], outputs["probs"],
        outputs["deltas"], im_info)
    return {"boxes": b, "scores": s, "labels": l, "valid": v}
