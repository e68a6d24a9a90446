"""R-FCN detector — position-sensitive score maps + PSRoIPool, fixed shapes.

Reference call stack (family: py-R-FCN / Deformable-ConvNets ``rfcn``
symbols, the repo family SURVEY.md §2.2's DCN row points at): resnet C4 ->
RPN -> proposals; dilated C5 (stride 16) -> 1x1 "conv_new" reduce -> two 1x1
convs emitting k^2*(C+1) cls and k^2*4 reg position-sensitive maps ->
PSRoIPool (CUDA ``PSROIPooling`` / ``DeformablePSROIPooling``) -> per-bin
vote (global average) -> softmax / class-agnostic deltas. There is no per-roi
fc head — all per-roi compute is the pooled vote, which is R-FCN's point.

TPU rebuild: the same pipeline with every step on device and static shapes.
RPN/proposal/sampling/loss/postprocess are shared with the R-CNN family
(``rcnn_loss`` / ``rcnn_postprocess`` consume the same output schema). The
PSRoIPool is ``ops.psroi.psroi_pool`` — one flat XLA gather with the bin
channel-group folded into the index. The deformable variant follows the
Deformable-ConvNets recipe: a zero-init 1x1 conv emits k^2*2 offset maps, a
plain (no-trans) PSRoIPool reads per-bin raw offsets, and the cls/reg pools
apply them scaled by ``trans_std * (roi_h, roi_w)``.

Training uses OHEM by default in the family (R-FCN paper §3); enable via
``bbox_head.ohem`` — the shared ``rcnn_loss`` implements it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import Config
from ...ops import boxes as box_lib
from ...ops import matching
from ...ops.proposals import generate_proposals
from ...ops.psroi import psroi_pool
from ..backbones.resnet import ResNet
from ..heads.rpn import RPNHead
from ..layers import conv
from .rcnn import rpn_anchor_cfg, rpn_level_anchors

Array = jax.Array


class RFCN(nn.Module):
    cfg: Config
    train: bool = True

    def setup(self):
        c = self.cfg
        r = c.rfcn_head
        self.backbone = ResNet(
            depth=c.backbone.depth, norm_kind=c.backbone.norm,
            frozen_stages=c.backbone.frozen_stages,
            dcn_stages=c.backbone.dcn_stages, dilated_c5=c.backbone.dilated_c5,
            train=self.train, dtype=jnp.dtype(c.backbone.dtype),
            remat=c.backbone.remat, name="backbone")
        self.rpn = RPNHead(
            num_anchors=rpn_anchor_cfg(c).num_base_anchors,
            channels=512, dtype=jnp.dtype(c.backbone.dtype), name="rpn")

        k = r.ps_grid
        nc1 = c.bbox_head.num_classes + 1
        dt = jnp.dtype(c.backbone.dtype)
        normal = nn.initializers.normal(0.01)
        self.reduce_conv = conv(r.reduce_channels, 1, 1, use_bias=True,
                                dtype=dt, kernel_init=normal, name="conv_new")
        self.cls_conv = conv(k * k * nc1, 1, 1, use_bias=True, dtype=dt,
                             kernel_init=normal, name="rfcn_cls")
        self.reg_conv = conv(k * k * 4, 1, 1, use_bias=True, dtype=dt,
                             kernel_init=normal, name="rfcn_bbox")
        if r.deform_pool:
            # zero-init so pooling starts at the plain grid (DCN recipe)
            self.offset_conv = conv(k * k * 2, 1, 1, use_bias=True, dtype=dt,
                                    kernel_init=nn.initializers.zeros,
                                    name="rfcn_offset")

    # C4 feeds the RPN; dilated C5 feeds the position-sensitive maps — both
    # at stride 16 (the family's two-branch layout).
    def _stride(self) -> int:
        return 16

    def _ps_maps(self, c5: Array):
        feat = nn.relu(self.reduce_conv(c5))
        cls_map = self.cls_conv(feat)
        reg_map = self.reg_conv(feat)
        off_map = (self.offset_conv(feat)
                   if self.cfg.rfcn_head.deform_pool else None)
        return cls_map, reg_map, off_map

    def _pool_scores(self, cls_map, reg_map, off_map, rois, roi_valid):
        """Per-image PS pooling + bin vote. rois (S, 4) resized-image coords
        -> ((S, C+1) logits, (S, 4) deltas)."""
        r = self.cfg.rfcn_head
        k = r.ps_grid
        stride = self._stride()
        offs = None
        if off_map is not None:
            offs = psroi_pool(off_map, rois, stride, output_size=k,
                              roi_valid=roi_valid).astype(jnp.float32)
        cls_bins = psroi_pool(cls_map, rois, stride, output_size=k,
                              offsets=offs, trans_std=r.trans_std,
                              roi_valid=roi_valid)
        reg_bins = psroi_pool(reg_map, rois, stride, output_size=k,
                              offsets=offs, trans_std=r.trans_std,
                              roi_valid=roi_valid)
        logits = jnp.mean(cls_bins.astype(jnp.float32), axis=(1, 2))
        deltas = jnp.mean(reg_bins.astype(jnp.float32), axis=(1, 2))
        return logits, deltas

    def __call__(self, tb: dict, rng: Array | None) -> dict:
        return self.forward_train(tb, rng) if self.train else self.forward_test(tb)

    def _rpn_and_proposals(self, tb: dict, pre_n: int, post_n: int):
        c = self.cfg
        images = tb["images"]
        c2, c3, c4, c5 = self.backbone(images)
        rpn_cls, rpn_reg = self.rpn([c4])
        pad_hw = (images.shape[1], images.shape[2])
        anchors = rpn_level_anchors(c, pad_hw)
        resized_hw = tb["im_info"][:, :2] * tb["im_info"][:, 2:3]
        rois, roi_scores, roi_valid = generate_proposals(
            rpn_cls, rpn_reg, anchors, resized_hw,
            pre_nms_top_n=pre_n, post_nms_top_n=post_n,
            nms_thr=c.rpn.nms_thr, min_box_size=c.rpn.min_box_size,
            bbox_stds=c.rpn.bbox_stds)
        return c5, rpn_cls, rpn_reg, rois, roi_valid, pad_hw, resized_hw

    # -- training ------------------------------------------------------------
    def forward_train(self, tb: dict, rng: Array) -> dict:
        c = self.cfg
        c5, rpn_cls, rpn_reg, rois, roi_valid, pad_hw, _ = \
            self._rpn_and_proposals(
                tb, c.rpn.pre_nms_top_n_train, c.rpn.post_nms_top_n_train)
        b = rois.shape[0]

        gt_labels1 = jnp.where(tb["gt_valid"], tb["gt_labels"] + 1, 0)
        h = c.bbox_head
        keys = jax.random.split(rng, b)
        sampled = jax.vmap(lambda key, p, pv, gb, gl, gv: matching.sample_rois(
            key, p, pv, gb, gl, gv,
            num_samples=h.num_samples, pos_fraction=h.pos_fraction,
            pos_iou_thr=h.pos_iou_thr, neg_iou_thr_hi=h.neg_iou_thr_hi,
            neg_iou_thr_lo=h.neg_iou_thr_lo,
        ))(keys, rois, roi_valid, tb["gt_boxes"], gt_labels1, tb["gt_valid"])

        cls_map, reg_map, off_map = self._ps_maps(c5)
        pool = lambda cm, rm, om, ro, v: self._pool_scores(cm, rm, om, ro, v)
        if off_map is None:
            cls_logits, deltas = jax.vmap(
                lambda cm, rm, ro, v: pool(cm, rm, None, ro, v))(
                cls_map, reg_map, sampled.rois, sampled.valid_mask)
        else:
            cls_logits, deltas = jax.vmap(pool)(
                cls_map, reg_map, off_map, sampled.rois, sampled.valid_mask)

        tgt = jax.vmap(lambda r, gb, m: box_lib.encode_boxes(
            r, gb[m], stds=h.bbox_stds))(
            sampled.rois, tb["gt_boxes"], sampled.matched_gt)

        return {
            "rpn_cls": rpn_cls, "rpn_reg": rpn_reg, "pad_hw": pad_hw,
            "stages": [{
                "cls_logits": cls_logits, "deltas": deltas,
                "labels": sampled.labels, "reg_targets": tgt,
                "pos": sampled.pos_mask, "valid": sampled.valid_mask,
                "rois": sampled.rois,
            }],
        }

    # -- inference -------------------------------------------------------------
    def forward_test(self, tb: dict) -> dict:
        c = self.cfg
        c5, _, _, rois, roi_valid, _, _ = self._rpn_and_proposals(
            tb, c.rpn.pre_nms_top_n_test, c.rpn.post_nms_top_n_test)

        cls_map, reg_map, off_map = self._ps_maps(c5)
        if off_map is None:
            cls_logits, deltas = jax.vmap(
                lambda cm, rm, ro, v: self._pool_scores(cm, rm, None, ro, v))(
                cls_map, reg_map, rois, roi_valid)
        else:
            cls_logits, deltas = jax.vmap(self._pool_scores)(
                cls_map, reg_map, off_map, rois, roi_valid)

        return {
            "rois": rois, "roi_valid": roi_valid,
            "probs": jax.nn.softmax(cls_logits, axis=-1),
            "deltas": deltas,
            "final_stds": c.bbox_head.bbox_stds,
            "class_agnostic": True,       # k^2*4 reg maps are class-agnostic
        }
