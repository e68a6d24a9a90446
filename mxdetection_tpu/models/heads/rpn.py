"""RPN head: shared 3x3 conv + 1x1 objectness/regression, all FPN levels.

Reference equivalent: ``get_rpn_symbol`` (family ``*/models/rpn/``;
SURVEY.md §2.2 "RPN head"). The reference used 2A-softmax objectness; this
rebuild uses the A-sigmoid formulation (equivalent decision function, half
the output channels, standard in the post-MXNet family).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import conv

Array = jnp.ndarray


class RPNHead(nn.Module):
    num_anchors: int = 3
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> tuple[list, list]:
        normal = nn.initializers.normal(0.01)
        shared = conv(self.channels, 3, 1, use_bias=True, dtype=self.dtype,
                      kernel_init=normal, name="rpn_conv")
        cls_out = conv(self.num_anchors, 1, 1, use_bias=True, dtype=self.dtype,
                       kernel_init=normal, name="rpn_cls")
        reg_out = conv(self.num_anchors * 4, 1, 1, use_bias=True, dtype=self.dtype,
                       kernel_init=normal, name="rpn_reg")
        cls_logits, bbox_deltas = [], []
        for f in feats:
            x = nn.relu(shared(f))
            cls_logits.append(cls_out(x))
            bbox_deltas.append(reg_out(x))
        return cls_logits, bbox_deltas
