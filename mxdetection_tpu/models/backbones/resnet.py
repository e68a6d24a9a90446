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


def _packed_maxpool(y: Array) -> Array:
    """Exact 3x3/s2 maxpool of the UNPACKED map, computed in packed layout.

    ``y`` is the s2d2-packed stem output, (B, Hp, Wp, 2, 2, 64): unpacked
    pixel (2i+py, 2j+px) lives at y[:, i, j, py, px]. The standard stem pool
    (3x3, stride 2, pad 1) emits exactly one output per packed cell, so it is
    9 shifted elementwise maxes with NO layout change — this removes the
    unpack transpose that made the round-2 s2d stem a net loss end-to-end
    (BASELINE.md round-2 "measured negative"). Output row i covers unpacked
    rows {2i-1, 2i, 2i+1} = packed {(i-1, py=1), (i, py=0), (i, py=1)};
    the i-1 read at i=0 is the pool's -inf padding row. Same for columns.
    """
    neg = jnp.asarray(-jnp.inf, y.dtype)
    up = jnp.pad(y[:, :, :, 1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)),
                 constant_values=neg)[:, :-1]
    rmax = jnp.maximum(jnp.maximum(up, y[:, :, :, 0]), y[:, :, :, 1])
    left = jnp.pad(rmax[:, :, :, 1], ((0, 0), (0, 0), (1, 0), (0, 0)),
                   constant_values=neg)[:, :, :-1]
    return jnp.maximum(jnp.maximum(left, rmax[:, :, :, 0]), rmax[:, :, :, 1])


class StemConv(nn.Module):
    """7x7/s2 stem conv evaluated as its exact space-to-depth packing.

    Owns the canonical (7,7,3,64) kernel under this module's scope (so the
    variables path is identical to the plain nn.Conv stem), but computes
    s2d4(x) -> conv3x3/s1 (48->256), which keeps the MXU's 128-lane
    contraction dimension fed (2.7x faster at COCO scale, bit-identical
    taps). With ``packed_out`` the s2d2-packed result is returned as
    (B, H/4, W/4, 2, 2, 64) for the packed-layout pool (`_packed_maxpool`);
    otherwise it is unpacked to the canonical (B, H/2, W/2, 64).
    """

    dtype: Any = jnp.bfloat16
    packed_out: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w7 = self.param("kernel", nn.initializers.he_normal(), (7, 7, 3, 64),
                        jnp.float32)
        wp = _pack_stem_kernel(w7).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            _space_to_depth(x, 4), wp, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.packed_out:
            b, h, w, _ = y.shape
            return y.reshape(b, h, w, 2, 2, 64)
        return _unpack_s2d2(y)


class DeformConv(nn.Module):
    """3x3 deformable conv layer: a regular conv predicts per-tap offsets
    (zero-init, the reference's DCN recipe) feeding ``ops.dcn``."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.bfloat16
    inference: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dilation
        offsets = nn.Conv(
            features=2 * 9,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            kernel_dilation=(d, d),
            padding=[(d, d), (d, d)],
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
            stride=self.stride, dilation=d, inference=self.inference,
        )
        return out.astype(self.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 with identity/projection shortcut."""

    channels: int            # bottleneck width; output is channels * 4
    stride: int = 1
    dilation: int = 1        # 3x3 dilation (R-FCN dilated-C5: stride 1, dil 2)
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
            out = DeformConv(self.channels, stride=self.stride,
                             dilation=self.dilation, dtype=self.dtype,
                             inference=self.inference, name="conv2")(out)
        else:
            out = conv(self.channels, 3, self.stride, dilation=self.dilation,
                       dtype=self.dtype, name="conv2")(out)
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
    # Exact space-to-depth stem (MXU-packed, see _pack_stem_kernel) — a
    # twice-measured NEGATIVE kept opt-in. Round 2: packed conv alone 2.7x
    # faster but the unpack transpose loses end-to-end. Round 3 removed the
    # unpack by computing the 3x3/s2 maxpool IN the packed layout
    # (`_packed_maxpool`, 9 shifted maxes) — isolated stem then wins 2x
    # (33 vs 60 ms @ batch 32, tools/exp_stem2.py), yet COMPOSED it still
    # loses (stem+layer1-block: 40.0 plain vs 45.8 best-packed; full
    # backbone 77.3 vs 91.3 ms): with a consumer in-program XLA compiles the
    # plain small-C_in stem near-optimally, and the packed path's layout
    # boundary at the pool output costs more than the conv win. Exact
    # either way; flip on for shapes/toolchains where it might differ.
    s2d_stem: bool = False
    # R-FCN-family dilated stage 5: layer4 runs stride 1 / dilation 2 so C5
    # stays at stride 16 (py-R-FCN & Deformable-ConvNets conv5 convention)
    dilated_c5: bool = False

    @nn.compact
    def __call__(self, x: Array) -> tuple:
        norm = make_norm(self.norm_kind, dtype=self.dtype, train=self.train)
        x = x.astype(self.dtype)

        # stem: 7x7/2 conv + 3x3/2 maxpool. The param stays the canonical
        # (7,7,3,64) kernel at params/stem_conv/kernel (checkpoint/converter
        # compatible); the s2d path repacks it at trace time and runs the
        # numerically-identical 48->256 packed conv (see _pack_stem_kernel).
        # Norm/relu/pool run on the packed (B,H/4,W/4,2,2,64) tensor: norm
        # broadcasts per trailing channel (64) so stats/params are identical
        # to the plain path, and the packed pool emits the canonical
        # (B,H/4,W/4,64) map directly — no unpack transpose anywhere.
        if self.s2d_stem and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            x = StemConv(dtype=self.dtype, packed_out=True, name="stem_conv")(x)
            x = norm(name="stem_bn")(x)
            x = nn.relu(x)
            if self.frozen_stages >= 0:
                x = jax.lax.stop_gradient(x)
            x = _packed_maxpool(x)
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
            dilation = 1
            if stage == 3 and self.dilated_c5:
                stride, dilation = 1, 2
            for b in range(blocks[stage]):
                x = block_cls(
                    channels=widths[stage],
                    stride=stride if b == 0 else 1,
                    dilation=dilation,
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
