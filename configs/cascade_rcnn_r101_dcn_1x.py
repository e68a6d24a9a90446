"""Zoo config: Cascade R-CNN R101 + DCN (BASELINE.json configs[3]).

DCN in stages 2-4 (res3/4/5), the family's standard deformable placement.
"""

from mxdetection_tpu.config import BackboneCfg, CascadeCfg, Config


def get() -> Config:
    return Config(
        name="cascade_rcnn_r101_dcn_1x",
        detector="cascade_rcnn",
        backbone=BackboneCfg(depth=101, dcn_stages=(False, True, True, True)),
        cascade=CascadeCfg(),
    )
