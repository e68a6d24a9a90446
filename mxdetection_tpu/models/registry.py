"""Detector registry: config string -> (model, loss adapter, postprocess).

Reference equivalent: the family's ``sym = eval(cfg.network.symbol).
get_symbol(cfg, is_train)`` dispatch (SURVEY.md §3.1) — replaced by an
explicit registry keyed on ``cfg.detector``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax

from ..config import Config


class DetectorBundle(NamedTuple):
    model: object                    # flax Module (train mode)
    model_eval: object               # flax Module (eval mode)
    init: Callable                   # (rng, device_batch) -> variables
    apply_train: Callable            # (variables, device_batch, rng) -> (outputs, mutated)
    apply_eval: Callable             # (variables, device_batch) -> outputs
    loss_fn: Callable                # (outputs, device_batch, rng, cfg) -> (loss, metrics)
    postprocess: Callable            # (outputs, cfg, image_hw, im_info) -> detections


def build_detector(cfg: Config) -> DetectorBundle:
    if cfg.detector == "retinanet":
        from .detectors.retinanet import (
            RetinaNet, make_anchors, retinanet_loss, retinanet_postprocess,
        )

        model = RetinaNet(cfg, train=True)
        model_eval = RetinaNet(cfg, train=False)
        pad_hw = (cfg.data.pad_h, cfg.data.pad_w)

        def init(rng, tb):
            return model.init(rng, tb["images"])

        def apply_train(variables, tb, rng):
            return model.apply(variables, tb["images"], mutable=["batch_stats"])

        def apply_eval(variables, tb):
            return model_eval.apply(variables, tb["images"])

        def loss_fn(outputs, tb, rng, cfg_):
            anchors = make_anchors(cfg_, pad_hw)
            return retinanet_loss(
                outputs, anchors, tb["gt_boxes"], tb["gt_labels"], tb["gt_valid"],
                rng, cfg_)

        postprocess = retinanet_postprocess

    elif cfg.detector in ("faster_rcnn", "mask_rcnn", "cascade_rcnn", "rfcn"):
        from .detectors.rcnn import RCNN, rcnn_loss, rcnn_postprocess

        if cfg.detector == "rfcn":
            # R-FCN shares the R-CNN loss/postprocess contract; only the
            # per-roi head differs (PSRoIPool vote instead of RoIAlign+fc)
            from .detectors.rfcn import RFCN as cls_
        else:
            cls_ = RCNN
        model = cls_(cfg, train=True)
        model_eval = cls_(cfg, train=False)

        def init(rng, tb):
            return model.init(rng, tb, jax.random.PRNGKey(0))

        def apply_train(variables, tb, rng):
            return model.apply(variables, tb, rng, mutable=["batch_stats"])

        def apply_eval(variables, tb):
            return model_eval.apply(variables, tb, None)

        loss_fn = rcnn_loss
        postprocess = rcnn_postprocess

    else:
        raise ValueError(f"unknown detector {cfg.detector!r}")

    return DetectorBundle(
        model=model,
        model_eval=model_eval,
        init=init,
        apply_train=apply_train,
        apply_eval=apply_eval,
        loss_fn=loss_fn,
        postprocess=postprocess,
    )
