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


def _space_to_depth(x: Array, f: int) -> Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def _pack_stem_kernel(w7: Array) -> Array:
    """(7,7,3,64) stride-2 stem kernel -> (3,3,48,256) over s2d4-packed input.

    The TPU's MXU pads conv input channels to the 128-lane width, so the
    C_in=3 stem conv runs ~2.7x off its packed equivalent. Re-expressed over
    the 4x4 space-to-depth input, the stem becomes a 3x3/s1 conv with
    C_in=48 whose output holds the four stride-2 phases as channel blocks
    (s2d2-packed). Numerically EXACT (same taps, re-indexed): packed input
    channel (dy*4+dx)*3+ci reads original pixel (4i+dy, 4j+dx); output block
    (py*2+px)*64+co is original output (2i'+py, 2j'+px). Built at trace time
    from the canonical (7,7,3,64) param so pretrained conversion and
    checkpoints are unchanged.
    """
    import numpy as np

    # constant 0/1 routing tensor: tap (ty,tx) -> packed slot
    # (ki,kj,dy,dx,py,px); one tiny einsum per step, XLA folds T
    t = np.zeros((49, 3, 3, 4, 4, 2, 2), np.float32)
    for py in range(2):
        for px in range(2):
            for ty in range(7):
                for tx in range(7):
                    ry, rx = 2 * py - 3 + ty, 2 * px - 3 + tx
                    t[ty * 7 + tx, 1 + ry // 4, 1 + rx // 4,
                      ry % 4, rx % 4, py, px] = 1.0
    t = jnp.asarray(t.reshape(49, -1), w7.dtype)
    wp = jnp.einsum("ab,aio->bio", t, w7.reshape(49, 3, 64))
    wp = wp.reshape(3, 3, 4, 4, 2, 2, 3, 64).transpose(0, 1, 2, 3, 6, 4, 5, 7)
    return wp.reshape(3, 3, 48, 256)


def _unpack_s2d2(y: Array) -> Array:
    """(B, H, W, 4*C) s2d2-packed -> (B, 2H, 2W, C)."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


class StemConv(nn.Module):
    """7x7/s2 stem conv evaluated as its exact space-to-depth packing.

    Owns the canonical (7,7,3,64) kernel under this module's scope (so the
    variables path is identical to the plain nn.Conv stem), but computes
    s2d4(x) -> conv3x3/s1 (48->256) -> unpack, which keeps the MXU's
    128-lane contraction dimension fed (2.7x faster at COCO scale,
    bit-identical taps).
    """

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w7 = self.param("kernel", nn.initializers.he_normal(), (7, 7, 3, 64),
                        jnp.float32)
        wp = _pack_stem_kernel(w7).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            _space_to_depth(x, 4), wp, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _unpack_s2d2(y)


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
    # Exact space-to-depth stem (MXU-packed). Measured on v5e @ 832x1344
    # batch 32: the packed conv alone is 2.7x faster (3.3 vs 8.8 ms @16),
    # but the s2d/unpack transposes around it cost more than the conv win
    # end-to-end (144.6 vs 152.3 img/s full model), so the default stays
    # the plain conv. Kept as an opt-in for shapes/backends where the
    # transposes fuse away.
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x: Array) -> tuple:
        norm = make_norm(self.norm_kind, dtype=self.dtype, train=self.train)
        x = x.astype(self.dtype)

        # stem: 7x7/2 conv + 3x3/2 maxpool. The param stays the canonical
        # (7,7,3,64) kernel at params/stem_conv/kernel (checkpoint/converter
        # compatible); the s2d path repacks it at trace time and runs the
        # numerically-identical 48->256 packed conv (see _pack_stem_kernel).
        if self.s2d_stem and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            x = StemConv(dtype=self.dtype, name="stem_conv")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=nn.initializers.he_normal(),
                        name="stem_conv")(x)
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
