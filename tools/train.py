#!/usr/bin/env python
"""Training CLI.

Reference equivalent: repo-root ``train.py`` (argparse: cfg, gpus, resume;
SURVEY.md §2.2 "CLI tools", §3.1). Usage:

    python tools/train.py --config configs/faster_rcnn_r50_fpn_1x.py \
        [--override train.optim.base_lr=0.01 data.root=/data/coco] \
        [--resume] [--synthetic N]

``--synthetic N`` trains on a generated tiny-COCO of N images (smoke runs in
environments without the real dataset).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        try:
            v = eval(v, {}, {})  # literals: numbers, tuples, bools
        except Exception:
            pass
        out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--override", nargs="*", default=[])
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train on N synthetic images instead of cfg.data.root")
    ap.add_argument("--platform", default=None, help="force jax platform (cpu)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.data import (CocoDataset, DetectionLoader, VocDataset,
                                      make_synthetic_coco, make_synthetic_voc)
    from mxdetection_tpu.models.registry import build_detector
    from mxdetection_tpu.parallel import make_mesh
    from mxdetection_tpu.train import CheckpointManager, Trainer
    from mxdetection_tpu.utils.logger import create_logger

    cfg = load_config(args.config, parse_overrides(args.override))
    workdir = os.path.join(cfg.train.checkpoint_dir, cfg.name)
    logger = create_logger(workdir)
    logger.info("config: %s devices: %s", cfg.name, jax.devices())

    with_masks = cfg.mask_head is not None
    n_cls = (cfg.bbox_head.num_classes if cfg.detector != "retinanet"
             else cfg.retina_head.num_classes)
    if cfg.data.dataset == "voc":
        # VOCdevkit annotation layout (family PascalVOC path)
        if args.synthetic:
            root = make_synthetic_voc(
                os.path.join(workdir, "synthetic_voc"),
                num_images=args.synthetic, num_classes=min(n_cls, 20),
                split=cfg.data.train_split, year=cfg.data.voc_year)
        else:
            root = cfg.data.root
        ds = VocDataset(root, split=cfg.data.train_split,
                        year=cfg.data.voc_year)
    elif args.synthetic:
        ann, img_dir = make_synthetic_coco(
            os.path.join(workdir, "synthetic"), num_images=args.synthetic,
            num_classes=n_cls)
        ds = CocoDataset(ann, img_dir, with_masks=with_masks)
    else:
        ds = CocoDataset(
            os.path.join(cfg.data.root, "annotations",
                         f"instances_{cfg.data.train_split}.json"),
            os.path.join(cfg.data.root, cfg.data.train_split),
            with_masks=with_masks)

    mesh = make_mesh(cfg.train.mesh_shape)
    n_data = mesh.shape["data"]
    loader = DetectionLoader(
        ds, batch_size=cfg.data.batch_size_per_device * n_data // jax.process_count(),
        max_gt=cfg.data.max_gt, seed=cfg.train.seed,
        num_shards=jax.process_count(), shard_index=jax.process_index(),
        with_masks=with_masks, flip=cfg.data.flip,
        train_scales=cfg.data.train_scales, orient_buckets=True)

    bundle = build_detector(cfg)
    tb0 = {"images": jnp.zeros((1, cfg.data.pad_h, cfg.data.pad_w, 3)),
           "im_info": jnp.asarray([[cfg.data.pad_h, cfg.data.pad_w, 1.0]]),
           "gt_boxes": jnp.zeros((1, cfg.data.max_gt, 4)),
           "gt_labels": jnp.zeros((1, cfg.data.max_gt), jnp.int32),
           "gt_valid": jnp.zeros((1, cfg.data.max_gt), bool)}
    if with_masks:
        tb0["box_masks"] = jnp.zeros((1, cfg.data.max_gt, 28, 28), jnp.uint8)
    variables = bundle.init(jax.random.PRNGKey(cfg.train.seed), tb0)

    trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                      mesh, steps_per_epoch=loader.steps_per_epoch(), logger=logger)

    ckpt = CheckpointManager(os.path.join(workdir, "ckpt"))
    if args.resume and ckpt.latest_step() is not None:
        trainer.state = ckpt.restore(trainer.state)
        logger.info("resumed from step %d", int(trainer.state.step))

    epochs = args.epochs or cfg.train.optim.total_epochs
    every = cfg.train.checkpoint_every_steps

    def on_metrics(m):
        if m["step"] % every == 0:
            ckpt.save(trainer.state)

    trainer.fit_epochs(loader, epochs, log_every=cfg.train.log_every,
                       on_metrics=on_metrics,
                       metrics_file=os.path.join(workdir, "metrics.jsonl"))
    ckpt.save(trainer.state, force=True)
    logger.info("done at step %d", int(trainer.state.step))


if __name__ == "__main__":
    main()
