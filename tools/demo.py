#!/usr/bin/env python
"""Single-image demo: run a detector on an image, draw boxes/masks.

Reference equivalent: ``demo.py`` + ``show_boxes`` (SURVEY.md §2.2
"Demo / visualization").

    python tools/demo.py --config configs/faster_rcnn_r50_fpn_1x.py \
        --image path/to.jpg --out det.png [--checkpoint output/.../ckpt]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from train import parse_overrides  # noqa: E402

PALETTE = [(230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
           (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
           (210, 245, 60), (250, 190, 190), (0, 128, 128), (230, 190, 255)]


def draw_detections(image: np.ndarray, boxes, scores, labels, names=None,
                    masks=None, score_thr=0.3) -> np.ndarray:
    from PIL import Image, ImageDraw
    img = Image.fromarray(image).convert("RGB")
    draw = ImageDraw.Draw(img, "RGBA")
    for i in range(len(boxes)):
        if scores[i] < score_thr:
            continue
        color = PALETTE[int(labels[i]) % len(PALETTE)]
        x1, y1, x2, y2 = [float(v) for v in boxes[i]]
        if masks is not None:
            m = masks[i]
            overlay = np.zeros((*m.shape, 4), np.uint8)
            overlay[m] = (*color, 100)
            img.paste(Image.fromarray(overlay, "RGBA"), (0, 0),
                      Image.fromarray(overlay, "RGBA"))
            draw = ImageDraw.Draw(img, "RGBA")
        draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
        name = names[int(labels[i])] if names else str(int(labels[i]))
        draw.text((x1 + 2, max(y1 - 12, 0)), f"{name} {scores[i]:.2f}", fill=color)
    return np.asarray(img)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--override", nargs="*", default=[])
    ap.add_argument("--image", required=True)
    ap.add_argument("--out", default="demo_out.png")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--score-thr", type=float, default=0.3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from PIL import Image

    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.data.transforms import batch_transform
    from mxdetection_tpu.eval.evaluator import paste_mask
    from mxdetection_tpu.models.registry import build_detector

    cfg = load_config(args.config, parse_overrides(args.override))
    d = cfg.data
    bundle = build_detector(cfg)

    img = np.asarray(Image.open(args.image).convert("RGB"), np.uint8)
    h, w = img.shape[:2]
    raw_h = -(-h // 64) * 64
    raw_w = -(-w // 64) * 64
    raw = np.zeros((1, raw_h, raw_w, 3), np.uint8)
    raw[0, :h, :w] = img

    tb0 = {"images": jnp.zeros((1, d.pad_h, d.pad_w, 3)),
           "im_info": jnp.asarray([[d.pad_h, d.pad_w, 1.0]]),
           "gt_boxes": jnp.zeros((1, d.max_gt, 4)),
           "gt_labels": jnp.zeros((1, d.max_gt), jnp.int32),
           "gt_valid": jnp.zeros((1, d.max_gt), bool)}
    if cfg.mask_head is not None:
        tb0["box_masks"] = jnp.zeros((1, d.max_gt, 28, 28), jnp.uint8)
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    if args.checkpoint:
        from mxdetection_tpu.parallel import make_mesh
        from mxdetection_tpu.train import CheckpointManager, Trainer
        trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                          make_mesh((-1, 1)), steps_per_epoch=1000)
        state = CheckpointManager(args.checkpoint).restore(trainer.state)
        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}

    tb = batch_transform(
        jnp.asarray(raw), jnp.asarray([[h, w]], jnp.float32),
        jnp.zeros((1,), bool), jnp.zeros((1, 1, 4)),
        out_hw=(d.pad_h, d.pad_w), scale_size=d.scale, max_size=d.max_size,
        mean=d.mean, std=d.std, dtype=jnp.dtype(cfg.backbone.dtype))
    out = bundle.apply_eval(variables, tb)
    dets = jax.device_get(bundle.postprocess(out, cfg, (d.pad_h, d.pad_w), tb["im_info"]))

    v = dets["valid"][0]
    boxes, scores, labels = dets["boxes"][0][v], dets["scores"][0][v], dets["labels"][0][v]
    masks = None
    if cfg.mask_head is not None:
        logits = bundle.model_eval.apply(
            variables, out["pyramid"],
            jnp.asarray(dets["boxes"] * float(tb["im_info"][0, 2])),
            jnp.asarray(dets["valid"]), method=bundle.model_eval.mask_forward)
        cls_idx = np.clip(labels, 0, cfg.bbox_head.num_classes - 1)
        probs = jax.device_get(jax.nn.sigmoid(logits))[0][v]
        sel = probs[np.arange(len(labels)), :, :, cls_idx]
        masks = [paste_mask(m, b, h, w) for m, b in zip(sel, boxes)]

    vis = draw_detections(img, boxes, scores, labels, masks=masks,
                          score_thr=args.score_thr)
    Image.fromarray(vis).save(args.out)
    print(f"wrote {args.out} with {int((scores >= args.score_thr).sum())} detections")


if __name__ == "__main__":
    main()
