#!/usr/bin/env python
"""Export a compiled inference function as a serialized StableHLO artifact.

Serving-deployment story: ``jax.export`` captures the FULL inference program
(fused on-device transform -> network -> decode -> class-aware NMS) as a
portable StableHLO module that a C++ PJRT runtime (or another JAX process)
can load and execute without python model code.

    python tools/export.py --config configs/faster_rcnn_r50_fpn_1x.py \
        --out faster_rcnn.stablehlo [--checkpoint ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from train import parse_overrides  # noqa: E402


def build_serving_fn(cfg, bundle, variables):
    import jax
    import jax.numpy as jnp

    from mxdetection_tpu.data.transforms import batch_transform

    d = cfg.data
    pad_hw = (d.pad_h, d.pad_w)

    def serve(raw, hw):
        """raw (B, raw_h, raw_w, 3) uint8, hw (B, 2) -> fixed-size detections."""
        b = raw.shape[0]
        tb = batch_transform(
            raw, hw, jnp.zeros((b,), bool), jnp.zeros((b, 1, 4)),
            out_hw=pad_hw, scale_size=d.scale, max_size=d.max_size,
            mean=d.mean, std=d.std, dtype=jnp.dtype(cfg.backbone.dtype))
        out = bundle.apply_eval(variables, tb)
        dets = bundle.postprocess(out, cfg, pad_hw, tb["im_info"])
        return dets["boxes"], dets["scores"], dets["labels"], dets["valid"]

    return serve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--override", nargs="*", default=[])
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--raw-hw", type=int, nargs=2, default=(640, 640))
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax import export as jexport

    from mxdetection_tpu.config import load_config
    from mxdetection_tpu.models.registry import build_detector

    cfg = load_config(args.config, parse_overrides(args.override))
    bundle = build_detector(cfg)
    tb0 = {"images": jnp.zeros((1, cfg.data.pad_h, cfg.data.pad_w, 3)),
           "im_info": jnp.asarray([[cfg.data.pad_h, cfg.data.pad_w, 1.0]]),
           "gt_boxes": jnp.zeros((1, cfg.data.max_gt, 4)),
           "gt_labels": jnp.zeros((1, cfg.data.max_gt), jnp.int32),
           "gt_valid": jnp.zeros((1, cfg.data.max_gt), bool)}
    if cfg.mask_head is not None:
        tb0["box_masks"] = jnp.zeros((1, cfg.data.max_gt, 28, 28), jnp.uint8)
    variables = bundle.init(jax.random.PRNGKey(0), tb0)
    if args.checkpoint:
        from mxdetection_tpu.parallel import make_mesh
        from mxdetection_tpu.train import CheckpointManager, Trainer
        trainer = Trainer(cfg, bundle.apply_train, variables, bundle.loss_fn,
                          make_mesh((-1, 1)), steps_per_epoch=1000)
        state = CheckpointManager(args.checkpoint).restore(trainer.state)
        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}

    serve = build_serving_fn(cfg, bundle, variables)
    b = args.batch_size
    rh, rw = args.raw_hw
    exported = jexport.export(jax.jit(serve))(
        jax.ShapeDtypeStruct((b, rh, rw, 3), jnp.uint8),
        jax.ShapeDtypeStruct((b, 2), jnp.float32))
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob)} bytes to {args.out} "
          f"(in: raw{b, rh, rw, 3} u8 + hw{b, 2} f32 -> boxes/scores/labels/valid)")


if __name__ == "__main__":
    main()
