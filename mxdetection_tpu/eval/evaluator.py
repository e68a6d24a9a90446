"""Inference/eval driver: batched jitted forward+postprocess -> COCO metrics.

Reference equivalent: ``Predictor`` + ``pred_eval`` (``*/core/tester.py``;
SURVEY.md §3.2). The reference crossed device->host once per image for numpy
decode/NMS; here decode+NMS run inside the same jit as the network and only
the final fixed-size top-100 per image is transferred — the contract's main
inference-throughput lever.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..data.coco import CocoDataset
from ..data.loader import DetectionLoader
from ..data.transforms import batch_transform
from .coco_eval import CocoEvaluator, format_table


def build_gt_list(ds: CocoDataset, with_masks: bool = False) -> list:
    from .rle import encode_rle
    from ..data.coco import rasterize_full_mask

    gts = []
    for rec in ds.records:
        for i in range(len(rec.boxes)):
            b = rec.boxes[i]
            gt = {
                "image_id": rec.image_id,
                "category": int(rec.labels[i]),
                "bbox": [float(x) for x in b],
                "area": float(rec.areas[i]) if rec.areas is not None
                else float((b[2] - b[0]) * (b[3] - b[1])),
                "iscrowd": bool(rec.is_crowd[i]),
            }
            if with_masks:
                gt["mask"] = encode_rle(
                    rasterize_full_mask(rec.polygons[i], rec.height, rec.width))
            gts.append(gt)
    return gts


def paste_mask(mask28: np.ndarray, box: np.ndarray, im_h: int, im_w: int,
               thr: float = 0.5) -> np.ndarray:
    """Paste a box-normalized predicted mask into image canvas (host, eval-only)."""
    from PIL import Image
    x1, y1, x2, y2 = box
    w = max(int(round(x2 - x1)), 1)
    h = max(int(round(y2 - y1)), 1)
    m = np.asarray(Image.fromarray((mask28 * 255).astype(np.uint8)).resize(
        (w, h), Image.BILINEAR), np.float32) / 255.0
    out = np.zeros((im_h, im_w), bool)
    x0, y0 = int(round(x1)), int(round(y1))
    xs, ys = max(0, -x0), max(0, -y0)
    xe = min(w, im_w - x0)
    ye = min(h, im_h - y0)
    if xe > xs and ye > ys:
        out[y0 + ys:y0 + ye, x0 + xs:x0 + xe] = m[ys:ye, xs:xe] >= thr
    return out


class Evaluator:
    """Runs a detector bundle over a dataset and computes COCO metrics
    (or VOC mAP when ``protocol="voc"`` — the family's PascalVOC path)."""

    def __init__(self, cfg: Config, bundle, variables, dataset: CocoDataset,
                 batch_size: int = 8, raw_hw=(640, 640), with_masks: bool = False,
                 protocol: str = "coco"):
        self.protocol = protocol
        self.cfg = cfg
        self.bundle = bundle
        self.variables = variables
        self.ds = dataset
        self.with_masks = with_masks
        self.loader = DetectionLoader(
            dataset, batch_size=batch_size, raw_hw=raw_hw, max_gt=cfg.data.max_gt,
            shuffle=False, flip=False, drop_last=False, orient_buckets=True,
            num_shards=jax.process_count(), shard_index=jax.process_index())

        d = cfg.data

        # TTA variants: (scale_size, flip). Reference: multi-scale + hflip
        # test with box merging (SURVEY.md §2.2 "Multi-scale / flip test").
        self.tta_variants = [(d.scale, False)]
        for s in cfg.test.scales_tta:
            if s != d.scale:
                self.tta_variants.append((int(s), False))
        if cfg.test.flip_tta:
            self.tta_variants += [(s, True) for (s, _) in list(self.tta_variants)]

        self._want_masks = with_masks and cfg.mask_head is not None

        def forward(variables, batch, scale_size=d.scale, flip=False,
                    out_hw=(d.pad_h, d.pad_w), want_masks=self._want_masks,
                    keep_pyramid=False):
            flips = jnp.full_like(batch["flip"], flip) if flip else batch["flip"]
            tb = batch_transform(
                batch["raw"], batch["hw"], flips, batch["gt_boxes"],
                out_hw=out_hw, scale_size=scale_size, max_size=d.max_size,
                mean=d.mean, std=d.std, dtype=jnp.dtype(cfg.backbone.dtype))
            out = bundle.apply_eval(variables, tb)
            dets = bundle.postprocess(out, cfg, out_hw, tb["im_info"])
            if want_masks:
                logits = bundle.model_eval.apply(
                    variables, out["pyramid"],
                    dets["boxes"] * tb["im_info"][:, 2][:, None, None],
                    dets["valid"], method=bundle.model_eval.mask_forward)
                cls_idx = jnp.clip(dets["labels"], 0, cfg.bbox_head.num_classes - 1)
                sel = jnp.take_along_axis(
                    logits, cls_idx[:, :, None, None, None], axis=-1)[..., 0]
                dets["masks"] = jax.nn.sigmoid(sel)
            if keep_pyramid:
                dets["pyramid"] = out["pyramid"]
                dets["scale"] = tb["im_info"][:, 2]
            return dets

        self.forward = jax.jit(
            forward, static_argnames=("scale_size", "flip", "out_hw",
                                      "want_masks", "keep_pyramid"))

        def merge_tta(det_list, im_w):
            """Merge per-variant detections: unflip, concat, final NMS."""
            from ..ops import boxes as box_lib
            from ..ops import nms as nms_lib
            t = cfg.test

            def one(boxes, scores, labels, valid, w):
                # full test-time dispatch (greedy/soft-NMS + optional box
                # voting) so TTA merging honors the same cfg as single-pass
                b2, s2, l2, v2 = nms_lib.class_aware_nms_from_cfg(
                    t, boxes, scores, labels, valid=valid)
                return {"boxes": b2, "scores": s2, "labels": l2, "valid": v2}

            parts = {"boxes": [], "scores": [], "labels": [], "valid": []}
            for (_, flip), dets in zip(self.tta_variants, det_list):
                b = dets["boxes"]
                if flip:
                    b = jax.vmap(lambda bb, w: box_lib.flip_boxes(bb, w))(b, im_w)
                parts["boxes"].append(b)
                parts["scores"].append(dets["scores"])
                parts["labels"].append(dets["labels"])
                parts["valid"].append(dets["valid"])
            merged = {k: jnp.concatenate(v, axis=1) for k, v in parts.items()}
            return jax.vmap(one)(merged["boxes"], merged["scores"],
                                 merged["labels"], merged["valid"], im_w)

        self.merge_tta = jax.jit(merge_tta)

        def tta_masks(variables, pyramids, scales, boxes, valid, labels, im_w):
            """Mask merging for multi-scale/flip TTA.

            The reference family merges TTA masks via ``gpu_mask_voting``
            (score-weighted aggregation of candidate masks, host loop over
            classes; SURVEY.md §2.2 "Multi-scale / flip test" — box/mask
            merging). TPU-first re-design: instead of warping suppressed
            candidates' 28x28 masks between box frames, re-run the mask head
            on the FINAL merged boxes against every variant's retained
            pyramid (boxes mapped into each variant's resized/flipped frame,
            predicted masks unflipped) and average the per-variant
            probabilities — the same multi-view mask evidence with fixed
            shapes, no host loop, and exact box/mask alignment.
            """
            from ..ops import boxes as box_lib
            probs = None
            for (_, flip), pyr, scale in zip(self.tta_variants, pyramids, scales):
                bx = boxes
                if flip:
                    bx = jax.vmap(box_lib.flip_boxes)(bx, im_w)
                bx = bx * scale[:, None, None]
                logits = bundle.model_eval.apply(
                    variables, pyr, bx, valid,
                    method=bundle.model_eval.mask_forward)
                cls_idx = jnp.clip(labels, 0, cfg.bbox_head.num_classes - 1)
                sel = jnp.take_along_axis(
                    logits, cls_idx[:, :, None, None, None], axis=-1)[..., 0]
                p = jax.nn.sigmoid(sel)
                if flip:
                    p = jnp.flip(p, axis=-1)  # masks are (y, x) in box frame
                probs = p if probs is None else probs + p
            return probs / float(len(self.tta_variants))

        self.tta_masks = jax.jit(tta_masks)

    def run(self, max_images: int | None = None, verbose: bool = True) -> dict:
        from .rle import encode_rle
        from ..parallel.dist import all_gather_objects

        evaluator = segm_eval = None
        if self.protocol == "coco":
            evaluator = CocoEvaluator(build_gt_list(self.ds),
                                      self.ds.num_classes, "bbox")
            if self.with_masks:
                segm_eval = CocoEvaluator(
                    build_gt_list(self.ds, with_masks=True),
                    self.ds.num_classes, "segm")
        size_by_id = {r.image_id: (r.height, r.width) for r in self.ds.records}

        n_done = 0
        seen: set = set()
        records: list = []  # per-image host records, merged across processes
        d = self.cfg.data
        # Steady-state throughput: the first batch pays jit compilation
        # (20-40s), so the timer restarts after it; the printed img/s then
        # matches tools/bench_infer.py's warmed-up methodology.
        t0 = time.time()
        n_at_t0 = 0
        n_batches = 0
        for batch in self.loader.epoch(0):
            portrait = bool(batch.pop("portrait", False))
            out_hw = (d.pad_w, d.pad_h) if portrait else (d.pad_h, d.pad_w)
            if len(self.tta_variants) > 1:
                # per-variant mask heads are skipped: masks are recomputed on
                # the merged boxes afterwards (tta_masks) from the retained
                # pyramids, so each variant only pays backbone + box path
                per_variant = [self.forward(self.variables, batch,
                                            scale_size=s, flip=f, out_hw=out_hw,
                                            want_masks=False,
                                            keep_pyramid=self._want_masks)
                               for (s, f) in self.tta_variants]
                im_w = jnp.asarray(batch["hw"][:, 1])
                box_keys = ("boxes", "scores", "labels", "valid")
                merged = self.merge_tta(
                    [{k: dv[k] for k in box_keys} for dv in per_variant], im_w)
                if self._want_masks:
                    merged["masks"] = self.tta_masks(
                        self.variables,
                        [dv["pyramid"] for dv in per_variant],
                        [dv["scale"] for dv in per_variant],
                        merged["boxes"], merged["valid"], merged["labels"],
                        im_w)
                dets = jax.device_get(merged)
            else:
                dets = jax.device_get(
                    self.forward(self.variables, batch, out_hw=out_hw))
            for i in range(len(batch["image_ids"])):
                if max_images is not None and n_done >= max_images:
                    break
                img_id = int(batch["image_ids"][i])
                if img_id in seen:  # wrap-around fill of partial batches
                    continue
                seen.add(img_id)
                v = dets["valid"][i]
                rec = {"image_id": img_id, "boxes": dets["boxes"][i][v],
                       "scores": dets["scores"][i][v],
                       "labels": dets["labels"][i][v], "rles": None}
                if segm_eval is not None:
                    im_h, im_w = size_by_id[img_id]
                    rec["rles"] = [encode_rle(paste_mask(m, b, im_h, im_w))
                                   for m, b in zip(dets["masks"][i][v],
                                                   dets["boxes"][i][v])]
                records.append(rec)
                n_done += 1
            n_batches += 1
            if n_batches == 1:  # discard compile time from the throughput
                t0 = time.time()
                n_at_t0 = n_done
            if max_images is not None and n_done >= max_images:
                break
        dt = time.time() - t0
        n_timed = n_done - n_at_t0  # 0 if the whole eval fit in one batch

        # Distributed eval merge: every process contributes its shard's
        # detections; wrap-fill can duplicate an image across processes, so
        # dedup by image_id (first occurrence wins — dets are identical).
        merged_seen: set = set()
        n_global = 0
        merged_records: list = []
        for rec in (r for part in all_gather_objects(records) for r in part):
            if rec["image_id"] in merged_seen:
                continue
            merged_seen.add(rec["image_id"])
            n_global += 1
            if self.protocol == "voc":
                merged_records.append(rec)
                continue
            evaluator.add(rec["image_id"], rec["boxes"], rec["scores"],
                          rec["labels"])
            if segm_eval is not None:
                segm_eval.add(rec["image_id"], rec["boxes"], rec["scores"],
                              rec["labels"], masks=rec["rles"])
        if self.protocol == "voc":
            from ..data.voc import evaluate_voc

            results = evaluate_voc(
                merged_records, self.ds,
                use_07_metric=self.cfg.data.voc_metric_07)
            # common keys so callers/tools can report uniformly
            results["AP50"] = results["mAP"]
        else:
            results = evaluator.evaluate()
        results["images_per_sec"] = n_timed / max(dt, 1e-9)
        results["num_images"] = n_global
        if segm_eval is not None:
            results["segm"] = segm_eval.evaluate()
        if verbose:
            if self.protocol == "voc":
                print(f"VOC mAP@0.5 = {results['mAP']:.4f} "
                      f"({'11-point' if self.cfg.data.voc_metric_07 else 'area'})")
            else:
                print(format_table(results))
            if segm_eval is not None:
                print("segm:")
                print(format_table(results["segm"], "segm"))
            print(f"inference: {n_done} imgs total, {n_timed} post-warmup in "
                  f"{dt:.1f}s ({results['images_per_sec']:.2f} img/s "
                  f"steady-state)")
        return results
