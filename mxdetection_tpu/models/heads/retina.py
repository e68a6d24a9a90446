"""RetinaNet head: shared cls/reg subnets over P3-P7.

Reference equivalent: ``get_retina_symbol`` (family ``*/models/heads/
retina_head.py``; SURVEY.md §2.2): 4x conv256+relu cls subnet and reg subnet,
weights shared across levels, A=9 anchors/cell, final cls conv bias set to
-log((1-pi)/pi) (pi=0.01) so initial focal loss is stable.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import conv

Array = jnp.ndarray


class RetinaHead(nn.Module):
    num_classes: int = 80
    num_anchors: int = 9
    stacked_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> tuple[list, list]:
        """feats: FPN levels -> (cls_logits per level (N,H,W,A*C),
        bbox_deltas per level (N,H,W,A*4))."""
        normal = nn.initializers.normal(0.01)
        cls_convs = [
            conv(self.channels, 3, 1, use_bias=True, dtype=self.dtype,
                 kernel_init=normal, name=f"cls_conv{i}")
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            conv(self.channels, 3, 1, use_bias=True, dtype=self.dtype,
                 kernel_init=normal, name=f"reg_conv{i}")
            for i in range(self.stacked_convs)
        ]
        bias_init = nn.initializers.constant(
            -math.log((1.0 - self.prior_prob) / self.prior_prob))
        cls_out = conv(self.num_anchors * self.num_classes, 3, 1, use_bias=True,
                       dtype=self.dtype, kernel_init=normal, bias_init=bias_init,
                       name="cls_score")
        reg_out = conv(self.num_anchors * 4, 3, 1, use_bias=True,
                       dtype=self.dtype, kernel_init=normal, name="bbox_pred")

        cls_logits, bbox_deltas = [], []
        for f in feats:
            c = f
            for m in cls_convs:
                c = nn.relu(m(c))
            cls_logits.append(cls_out(c))
            r = f
            for m in reg_convs:
                r = nn.relu(m(r))
            bbox_deltas.append(reg_out(r))
        return cls_logits, bbox_deltas
