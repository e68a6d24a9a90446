"""Zoo config: R-FCN R50 (dilated C5) 1x COCO — family widening beyond the
five contract configs (py-R-FCN / Deformable-ConvNets ``rfcn``; SURVEY.md
§2.2 DCN row). Deformable PSRoIPool ON (the DCN-family flavor); set
``rfcn_head.deform_pool=False`` for the classic paper head. OHEM on, as in
the R-FCN paper (§3: all proposals forward, hardest 128 backward)."""

from mxdetection_tpu.config import (
    AnchorCfg, BackboneCfg, BboxHeadCfg, Config, RfcnHeadCfg, RpnCfg,
)


def get() -> Config:
    return Config(
        name="rfcn_r50_1x",
        detector="rfcn",
        backbone=BackboneCfg(depth=50, dilated_c5=True),
        rpn=RpnCfg(
            # single-level RPN on C4 (stride 16), family anchor set
            anchor=AnchorCfg(strides=(16,), scales=(4.0, 8.0, 16.0, 32.0),
                             ratios=(0.5, 1.0, 2.0)),
            pre_nms_top_n_train=6000, post_nms_top_n_train=300,
            pre_nms_top_n_test=6000, post_nms_top_n_test=300,
        ),
        bbox_head=BboxHeadCfg(
            num_samples=300,      # OHEM: every post-NMS proposal goes forward
            class_agnostic=True,  # k^2*4 reg maps
            ohem=True, ohem_keep=128,
        ),
        rfcn_head=RfcnHeadCfg(ps_grid=7, reduce_channels=1024,
                              deform_pool=True),
    )
