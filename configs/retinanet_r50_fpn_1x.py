"""Zoo config: RetinaNet R50-FPN 1x COCO (BASELINE.json configs[1])."""

from mxdetection_tpu.config import (
    BackboneCfg, Config, FPNCfg, RetinaHeadCfg, RoiCfg,
)


def get() -> Config:
    return Config(
        name="retinanet_r50_fpn_1x",
        detector="retinanet",
        backbone=BackboneCfg(depth=50),
        fpn=FPNCfg(out_channels=256, min_level=3, max_level=7, extra_convs="conv"),
        retina_head=RetinaHeadCfg(),
    )
