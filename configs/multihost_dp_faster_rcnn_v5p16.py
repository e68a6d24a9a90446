"""Zoo config: multi-host DP COCO training on v5p-16 (BASELINE.json configs[4]).

2 hosts x 8 chips, pure data parallel: 16-way batch sharding, SyncBN in the
backbone, gradient all-reduce over ICI (SURVEY.md §2.4 / §5.8). Same model as
faster_rcnn_r50_fpn_1x; only the parallelism/norm settings differ.
"""

from dataclasses import replace

from mxdetection_tpu.config import BackboneCfg, Config, TrainCfg, OptimCfg


def get() -> Config:
    return Config(
        name="multihost_dp_faster_rcnn_v5p16",
        detector="faster_rcnn",
        backbone=BackboneCfg(norm="sync_bn", frozen_stages=-1),
        train=TrainCfg(
            sync_bn=True,
            mesh_shape=(-1, 1),      # 16-way data axis on v5p-16
            optim=OptimCfg(base_lr=0.04),  # linear-scaled for global batch 32
        ),
    )
