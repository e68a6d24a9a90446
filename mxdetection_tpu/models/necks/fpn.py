"""FPN neck: lateral 1x1 + top-down 2x upsample + 3x3 smooth.

Reference equivalent: ``get_fpn_feature`` (family ``*/models/necks/fpn.py``;
SURVEY.md §2.2 "FPN neck"): P2-P5 from C2-C5, plus P6 via stride-2 max-pool
(R-CNN convention) or P6/P7 via stride-2 convs on C5/P6 (RetinaNet
convention). Upsampling is nearest-2x — expressed as a reshape-broadcast
(cheap on TPU, no gather).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import conv

Array = jnp.ndarray


def upsample2x_nearest(x: Array) -> Array:
    """(N, H, W, C) -> (N, 2H, 2W, C) by nearest; reshape/broadcast only."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


class FPN(nn.Module):
    """Builds levels [min_level .. max_level] from backbone (C2..C5).

    extra_convs: "pool" -> P6 = maxpool(P5) (Faster/Mask R-CNN family);
                 "conv" -> P6 = conv3x3/2(C5), P7 = conv3x3/2(relu(P6))
                 (RetinaNet family).
    """

    out_channels: int = 256
    min_level: int = 2
    max_level: int = 6
    extra_convs: str = "pool"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> list:
        # feats are (C2, C3, C4, C5) at strides 4..32 == levels 2..5
        backbone_levels = {i + 2: f for i, f in enumerate(feats)}
        lo = self.min_level
        hi_backbone = min(self.max_level, 5)

        laterals = {
            lv: conv(self.out_channels, 1, 1, use_bias=True, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name=f"lateral_p{lv}")(backbone_levels[lv])
            for lv in range(lo, hi_backbone + 1)
        }
        # top-down pathway
        for lv in range(hi_backbone - 1, lo - 1, -1):
            laterals[lv] = laterals[lv] + upsample2x_nearest(laterals[lv + 1])

        outs = {
            lv: conv(self.out_channels, 3, 1, use_bias=True, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name=f"smooth_p{lv}")(laterals[lv])
            for lv in range(lo, hi_backbone + 1)
        }

        if self.max_level >= 6:
            if self.extra_convs == "pool":
                assert self.max_level == 6, "pool variant only adds P6"
                outs[6] = nn.max_pool(outs[5], (1, 1), strides=(2, 2))
            elif self.extra_convs == "conv":
                src = backbone_levels[5]
                prev = conv(self.out_channels, 3, 2, use_bias=True, dtype=self.dtype,
                            kernel_init=nn.initializers.xavier_uniform(),
                            name="extra_p6")(src)
                outs[6] = prev
                for lv in range(7, self.max_level + 1):
                    prev = conv(self.out_channels, 3, 2, use_bias=True, dtype=self.dtype,
                                kernel_init=nn.initializers.xavier_uniform(),
                                name=f"extra_p{lv}")(nn.relu(prev))
                    outs[lv] = prev
            else:
                raise ValueError(self.extra_convs)

        return [outs[lv] for lv in range(self.min_level, self.max_level + 1)]
