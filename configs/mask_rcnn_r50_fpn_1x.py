"""Zoo config: Mask R-CNN R50-FPN 1x COCO (BASELINE.json configs[2])."""

from mxdetection_tpu.config import Config, MaskHeadCfg


def get() -> Config:
    return Config(
        name="mask_rcnn_r50_fpn_1x",
        detector="mask_rcnn",
        mask_head=MaskHeadCfg(),
    )
