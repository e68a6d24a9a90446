#!/usr/bin/env python
"""Evaluation CLI: checkpoint -> COCO metric table.

Reference equivalent: repo-root ``test.py`` -> ``test_net`` (SURVEY.md §3.2).

    python tools/eval.py --config configs/faster_rcnn_r50_fpn_1x.py \
        --checkpoint output/faster_rcnn_r50_fpn_1x/ckpt [--synthetic N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from train import parse_overrides  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--override", nargs="*", default=[])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.data import (CocoDataset, VocDataset,
                                      make_synthetic_coco, make_synthetic_voc)
    from mxdetection_tpu.eval import Evaluator
    from mxdetection_tpu.models.registry import build_detector

    cfg = load_config(args.config, parse_overrides(args.override))
    with_masks = cfg.mask_head is not None
    n_cls = (cfg.bbox_head.num_classes if cfg.detector != "retinanet"
             else cfg.retina_head.num_classes)

    if cfg.data.dataset == "voc":
        if args.synthetic:
            root = make_synthetic_voc(
                "/tmp/mxdet_synth_eval_voc", num_images=args.synthetic,
                num_classes=min(n_cls, 20), split=cfg.data.val_split,
                year=cfg.data.voc_year)
        else:
            root = cfg.data.root
        ds = VocDataset(root, split=cfg.data.val_split, year=cfg.data.voc_year)
    elif args.synthetic:
        root = "/tmp/mxdet_synth_eval"
        ann, img_dir = make_synthetic_coco(
            root, num_images=args.synthetic, split="val", num_classes=n_cls)
        ds = CocoDataset(ann, img_dir, with_masks=with_masks)
    else:
        ds = CocoDataset(
            os.path.join(cfg.data.root, "annotations",
                         f"instances_{cfg.data.val_split}.json"),
            os.path.join(cfg.data.root, cfg.data.val_split),
            with_masks=with_masks)

    bundle = build_detector(cfg)
    tb0 = {"images": jnp.zeros((1, cfg.data.pad_h, cfg.data.pad_w, 3)),
           "im_info": jnp.asarray([[cfg.data.pad_h, cfg.data.pad_w, 1.0]]),
           "gt_boxes": jnp.zeros((1, cfg.data.max_gt, 4)),
           "gt_labels": jnp.zeros((1, cfg.data.max_gt), jnp.int32),
           "gt_valid": jnp.zeros((1, cfg.data.max_gt), bool)}
    if with_masks:
        tb0["box_masks"] = jnp.zeros((1, cfg.data.max_gt, 28, 28), jnp.uint8)
    variables = bundle.init(jax.random.PRNGKey(0), tb0)

    if args.checkpoint:
        from mxdetection_tpu.train import CheckpointManager, Trainer
        from mxdetection_tpu.parallel import make_mesh
        mesh = make_mesh((-1, 1))
        trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                          mesh, steps_per_epoch=1000)
        ckpt = CheckpointManager(args.checkpoint)
        state = ckpt.restore(trainer.state)
        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}

    ev = Evaluator(cfg, bundle, variables, ds, batch_size=args.batch_size,
                   with_masks=with_masks,
                   protocol="voc" if cfg.data.dataset == "voc" else "coco")
    ev.run(verbose=True)


if __name__ == "__main__":
    main()
