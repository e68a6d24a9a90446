"""Zoo config: Faster R-CNN R50-FPN 1x COCO (BASELINE.json configs[0])."""

from mxdetection_tpu.config import Config


def get() -> Config:
    return Config(name="faster_rcnn_r50_fpn_1x", detector="faster_rcnn")
