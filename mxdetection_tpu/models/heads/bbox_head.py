"""Fast R-CNN bbox head (2fc-1024) and Mask R-CNN mask head.

Reference equivalents: ``get_rcnn_symbol`` 2fc head (``*/models/heads/
bbox_head.py``) and the 4conv+deconv mask branch (``*/models/heads/
mask_head.py``; SURVEY.md §2.2). Classification is (C+1)-way softmax with
background at index 0 — the family's label convention, preserved exactly
because proposal-target fixtures depend on it.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..layers import conv

Array = jnp.ndarray


class BBoxHead(nn.Module):
    num_classes: int = 80            # foreground classes; logits = C+1
    fc_channels: int = 1024
    class_agnostic: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, roi_feats: Array) -> tuple[Array, Array]:
        """roi_feats (R, P, P, C) -> (cls_logits (R, C+1), deltas (R, 4 or 4(C+1)))."""
        r = roi_feats.shape[0]
        x = roi_feats.reshape(r, -1)
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype, param_dtype=jnp.float32,
                             kernel_init=nn.initializers.xavier_uniform(), name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype, param_dtype=jnp.float32,
                             kernel_init=nn.initializers.xavier_uniform(), name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=nn.initializers.normal(0.01), name="cls_score")(x)
        reg_dim = 4 if self.class_agnostic else 4 * (self.num_classes + 1)
        reg = nn.Dense(reg_dim, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=nn.initializers.normal(0.001), name="bbox_pred")(x)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


class MaskHead(nn.Module):
    """4x conv256 + 2x deconv upsample + 1x1 -> per-class mask logits."""

    num_classes: int = 80
    num_convs: int = 4
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, roi_feats: Array) -> Array:
        """roi_feats (R, P, P, C) -> (R, 2P, 2P, num_classes) logits."""
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.relu(conv(self.channels, 3, 1, use_bias=True, dtype=self.dtype,
                             kernel_init=nn.initializers.he_normal(),
                             name=f"mask_conv{i}")(x))
        x = nn.relu(nn.ConvTranspose(
            self.channels, (2, 2), strides=(2, 2), dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=nn.initializers.he_normal(),
            name="mask_deconv")(x))
        x = conv(self.num_classes, 1, 1, use_bias=True, dtype=self.dtype,
                 kernel_init=nn.initializers.normal(0.001), name="mask_pred")(x)
        return x.astype(jnp.float32)
