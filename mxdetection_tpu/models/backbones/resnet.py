"""ResNet-50/101 (v1b) backbone — flax.linen, NHWC, bf16 compute.

Reference equivalent: the family's ``symbols/resnet*.py`` symbol builders
(``residual_unit`` bottlenecks, C2-C5 stage outputs, stem+stage1 frozen,
BN frozen unless SyncBN; SURVEY.md §2.2 "Backbones"). v1b = stride-2 on the
3x3 conv of each downsampling bottleneck (torchvision/gluon convention) —
the variant the family's pretrained zoo used.

TPU-first notes: NHWC layout (XLA:TPU native), bf16 activations with fp32
params, optional deformable 3x3 convs per stage (DCN config), stage freezing
via ``jax.lax.stop_gradient`` (semantics: params exist but receive no grads,
matching the reference's ``fixed_param_names``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.dcn import deform_conv2d_batched
from ..layers import conv, make_norm

Array = jax.Array

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class DeformConv(nn.Module):
    """3x3 deformable conv layer: a regular conv predicts per-tap offsets
    (zero-init, the reference's DCN recipe) feeding ``ops.dcn``."""

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    inference: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        offsets = nn.Conv(
            features=2 * 9,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            name="offset_conv",
        )(x.astype(jnp.float32))
        weight = self.param(
            "kernel", nn.initializers.he_normal(), (3, 3, x.shape[-1], self.features), jnp.float32
        )
        out = deform_conv2d_batched(
            x.astype(self.dtype), offsets, weight.astype(self.dtype),
            stride=self.stride, inference=self.inference,
        )
        return out.astype(self.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 with identity/projection shortcut."""

    channels: int            # bottleneck width; output is channels * 4
    stride: int = 1
    use_dcn: bool = False
    norm: Callable[[], nn.Module] = None
    dtype: Any = jnp.bfloat16
    inference: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        out = conv(self.channels, 1, 1, dtype=self.dtype, name="conv1")(x)
        out = self.norm(name="bn1")(out)
        out = nn.relu(out)
        if self.use_dcn:
            out = DeformConv(self.channels, stride=self.stride, dtype=self.dtype,
                             inference=self.inference, name="conv2")(out)
        else:
            out = conv(self.channels, 3, self.stride, dtype=self.dtype, name="conv2")(out)
        out = self.norm(name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.channels * 4, 1, 1, dtype=self.dtype, name="conv3")(out)
        out = self.norm(name="bn3")(out)

        if residual.shape != out.shape:
            residual = conv(self.channels * 4, 1, self.stride, dtype=self.dtype,
                            name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """Returns (C2, C3, C4, C5) feature maps at strides (4, 8, 16, 32)."""

    depth: int = 50
    norm_kind: str = "frozen_bn"
    frozen_stages: int = 1        # freeze stem + first N stages (family default 1)
    dcn_stages: Sequence[bool] = (False, False, False, False)
    train: bool = True
    dtype: Any = jnp.bfloat16
    remat: bool = False           # checkpoint each bottleneck (memory vs FLOPs)

    @nn.compact
    def __call__(self, x: Array) -> tuple:
        norm = make_norm(self.norm_kind, dtype=self.dtype, train=self.train)
        x = x.astype(self.dtype)

        # stem: 7x7/2 conv + 3x3/2 maxpool
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.he_normal(), name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        blocks = STAGE_BLOCKS[self.depth]
        widths = (64, 128, 256, 512)
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for b in range(blocks[stage]):
                x = block_cls(
                    channels=widths[stage],
                    stride=stride if b == 0 else 1,
                    use_dcn=self.dcn_stages[stage],
                    norm=norm,
                    dtype=self.dtype,
                    inference=not self.train,
                    name=f"layer{stage + 1}_block{b}",
                )(x)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
        return tuple(outs)
