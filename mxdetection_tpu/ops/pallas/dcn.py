"""Pallas TPU kernel: deformable conv (stride 1) — windowed VMEM shift-select.

Reference equivalent: ``deformable_im2col.cuh`` / ``deformable_convolution.cu``
(SURVEY.md §2.3). The CUDA design gathers 4 bilinear taps per (position, tap)
with one thread each; on TPU both the XLA gather translation (104 ms/layer,
batch 8, stage-3 shape) and an XLA shift-select (120 ms — HBM re-read per
displacement) are ~25x a plain conv. This kernel keeps an input row-window in
VMEM and evaluates the bounded-offset shift-select there: per (output row,
tap), a fori over the (2R+2) integer y-displacements loads one window row and
applies (2R+2) masked x-shifted FMAs — all VPU work on VMEM-resident data —
then one MXU matmul per tap against the weight slice.

Offsets are clamped to +-R cells (R=3 default; same documented deviation as
``ops.dcn.deform_sample_patches_shift``, which is the golden reference for
this kernel). Stride-2 layers (first block of each DCN stage) use the
``_kernel_s2`` variant below: the input is pre-split by column parity into
channel halves so the stride-2 column walk becomes contiguous slices with a
lane-static phase select.

Round-2 measured (R101-DCN234 backbone minus plain R101, batch 8 @832x1344,
v5e): dense-displacement kernel 460 ms -> dynamic y-range fori (per-block
bounds, ~3 live dy iterations for sub-cell offsets) 216 ms — 2.1x on the DCN
overhead. Batching the grid over images (vs lax.map) and compacting x-terms
via pl.when+scratch both measured neutral: the floor is the dense-x masked
FMA traffic, retained because sublane offsets must be static for Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BR = 8        # output rows per grid step
WIN_R = 24    # window rows: BR + (k-1)*dil + 2R + 2 <= 24 for k=3, dil=1, R<=6


def _kernel(oy_ref, ox_ref, x_hbm, w_ref, out_ref, win, sem, *,
            k: int, dil: int, pad: int, radius: int, wo: int, c: int,
            cout: int, margin: int):
    ib = pl.program_id(0)   # image within the batch
    b = pl.program_id(1)    # row block
    base = pl.multiple_of(b * BR, 8)

    # window DMA: rows [base, base + WIN_R) of image ib of the padded input
    dma = pltpu.make_async_copy(x_hbm.at[ib, pl.ds(base, WIN_R)], win, sem)
    dma.start()
    dma.wait()

    r2 = 2 * radius + 2
    taps = [(ty, tx) for ty in range(k) for tx in range(k)]

    # Per-BLOCK y-displacement bounds (2 scalar reductions per block instead
    # of per (row, tap) — vector->scalar syncs are the overhead here). A
    # term (dy, *) is identically zero unless dy in [floor(min oy),
    # floor(max oy)+1]; offset-lane padding zeros only widen the range to
    # include 0, which trained sub-cell offsets span anyway.
    oy_blk = jnp.clip(oy_ref[0, :, :], -radius, radius)
    blk_lo = jnp.floor(jnp.min(oy_blk)).astype(jnp.int32) + radius
    blk_hi = jnp.floor(jnp.max(oy_blk)).astype(jnp.int32) + radius

    for i in range(BR):
        accs = []
        for t, (ty, tx) in enumerate(taps):
            col = i * 9 + t
            oy = jnp.clip(oy_ref[0, :, col:col + 1], -radius, radius)  # (Wq, 1)
            ox = jnp.clip(ox_ref[0, :, col:col + 1], -radius, radius)
            ylo = jnp.floor(oy)
            fy = oy - ylo
            xlo = jnp.floor(ox)
            fx = ox - xlo

            row_base = i + ty * dil + 1  # + (margin - pad - radius) == +1
            col_base = tx * dil + 1
            out_w = out_ref.shape[2]

            # Dynamic y-displacement range (per-block bounds hoisted above):
            # the fori runs only over the block's actual offset span —
            # trained DCNv1 offsets are mostly sub-cell, so ~3 dy iterations
            # instead of the dense 2R+2 = 8. dim-0 window indexing is
            # untiled, so the dynamic row index is legal; x displacements
            # stay statically unrolled (sublane offsets must be static for
            # Mosaic) with the accumulator carried in registers.
            wxs = [
                (jnp.where(xlo == dxi - radius, 1.0 - fx, 0.0)
                 + jnp.where(xlo + 1 == dxi - radius, fx, 0.0))
                for dxi in range(r2)
            ]

            def dy_body(dyi, acc):
                dy = dyi - radius
                wy = (jnp.where(ylo == dy, 1.0 - fy, 0.0)
                      + jnp.where(ylo + 1 == dy, fy, 0.0))
                data_row = win[row_base + dyi, :, :]  # (Wp, C), dynamic dim-0
                for dxi in range(r2):
                    m = (wy * wxs[dxi]).astype(data_row.dtype)
                    sl = data_row[col_base + dxi:col_base + dxi + out_w, :]
                    acc = acc + m * sl
                return acc

            accs.append(jax.lax.fori_loop(
                blk_lo, blk_hi + 2, dy_body,
                jnp.zeros((out_w, c), win.dtype)))

        # ONE (out_w, 9C) @ (9C, Cout) matmul per row instead of 9 per-tap
        # (out_w, C) @ (C, Cout) matmuls: the per-matmul issue overhead was
        # the radius-independent base cost of this kernel (~7.9 of 14.1 ms
        # on the stage-3 layer, tools/exp_dcn2.py)
        patch = jnp.concatenate(accs, axis=1)                   # (out_w, 9C)
        out_acc = jax.lax.dot_general(
            patch, w_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, i, :, :] = out_acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kernel", "dilation", "radius",
                                             "interpret"))
def deform_conv2d_pallas_batched(
    x: Array,          # (B, H, W, Cin)
    offsets: Array,    # (B, H, W, 2*k*k), (dy, dx) per tap
    weight: Array,     # (k, k, Cin, Cout)
    *,
    kernel: int = 3,
    dilation: int = 1,
    radius: int = 3,
    interpret: bool = False,
) -> Array:
    """Stride-1 deformable conv over a batch (grid = (B, row-blocks) — one
    kernel launch per layer, not per image). Offsets clamped to +-radius."""
    bsz, h, w, c = x.shape
    k = kernel
    cout = weight.shape[-1]
    assert c % 128 == 0 and cout % 128 == 0, "channels must be lane-aligned"
    pad = dilation * (k - 1) // 2
    margin = pad + radius + 1
    assert BR + (k - 1) * dilation + 2 * radius + 2 + margin - pad - radius <= WIN_R

    nb = -(-h // BR)
    hp = nb * BR + WIN_R
    # extra +8 width so x-slices of length ceil(W/8)*8 never overrun; total
    # padded width must itself be sublane-aligned for the window DMA
    wp_total = -(-(w + 2 * margin + 8) // 8) * 8
    xp = jnp.zeros((bsz, hp, wp_total, c), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, margin, margin, 0))

    # offsets transposed to (Wq, nb*128): per row-block a 128-lane group
    # (BR*k*k = 72 used) so in-kernel slices are lane-static and blocks are
    # lane-aligned
    wq = -(-w // 8) * 8
    off = offsets.reshape(bsz, h, w, k * k, 2).astype(jnp.float32)

    def pack(o):  # (h, w, 9) -> (wq, nb*128)
        o = o.transpose(1, 0, 2)                       # (w, h, 9)
        o = jnp.pad(o, ((0, wq - w), (0, nb * BR - h), (0, 0)))
        o = o.reshape(wq, nb, BR * k * k)
        o = jnp.pad(o, ((0, 0), (0, 0), (0, 128 - BR * k * k)))
        return o.reshape(wq, nb * 128)

    oyt = jax.vmap(pack)(off[..., 0])                  # (B, wq, nb*128)
    oxt = jax.vmap(pack)(off[..., 1])

    wmat = weight.reshape(k * k * c, cout).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, dil=dilation, pad=pad, radius=radius,
                          wo=w, c=c, cout=cout, margin=margin),
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, wq, 128), lambda ib, b: (ib, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wq, 128), lambda ib, b: (ib, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BR, wq, cout), lambda ib, b: (ib, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nb * BR, wq, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((WIN_R, wp_total, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(oyt, oxt, xp, wmat)
    return out[:, :h, :w, :]


def deform_conv2d_pallas(x, offsets, weight, *, kernel=3, dilation=1,
                         radius=3, interpret=False):
    """Single-image wrapper over the batched kernel (golden-test surface)."""
    return deform_conv2d_pallas_batched(
        x[None], offsets[None], weight, kernel=kernel, dilation=dilation,
        radius=radius, interpret=interpret)[0]


# ---------------------------------------------------------------------------
# stride 2 (the first block of each DCN stage)

WIN_R2 = 32  # input rows per window: BR*2 + (k-1)*dil + 2R + 2 + 1 <= 32


def _kernel_s2(oy_ref, ox_ref, x_hbm, w_ref, out_ref, win, sem, *,
               k: int, dil: int, radius: int, c: int, cout: int):
    """Stride-2 variant. The input is pre-split by column parity into channel
    halves (win lanes = [phase0 C | phase1 C]), so the stride-2 column walk
    becomes a CONTIGUOUS slice plus a lane-static phase select — Mosaic needs
    static sublane offsets, and a `::2` sublane stride does not exist.
    Rows need no such trick: the window's dim 0 is untiled, so the doubled
    row index stays a plain dynamic index."""
    ib = pl.program_id(0)
    b = pl.program_id(1)
    base = pl.multiple_of(b * BR * 2, 8)

    dma = pltpu.make_async_copy(x_hbm.at[ib, pl.ds(base, WIN_R2)], win, sem)
    dma.start()
    dma.wait()

    r2 = 2 * radius + 2
    taps = [(ty, tx) for ty in range(k) for tx in range(k)]
    out_w = out_ref.shape[2]

    oy_blk = jnp.clip(oy_ref[0, :, :], -radius, radius)
    blk_lo = jnp.floor(jnp.min(oy_blk)).astype(jnp.int32) + radius
    blk_hi = jnp.floor(jnp.max(oy_blk)).astype(jnp.int32) + radius

    for i in range(BR):
        accs = []
        for t, (ty, tx) in enumerate(taps):
            col = i * 9 + t
            oy = jnp.clip(oy_ref[0, :, col:col + 1], -radius, radius)
            ox = jnp.clip(ox_ref[0, :, col:col + 1], -radius, radius)
            ylo = jnp.floor(oy)
            fy = oy - ylo
            xlo = jnp.floor(ox)
            fx = ox - xlo

            row_base = 2 * i + ty * dil + 1  # + (margin - pad - radius) == +1

            wxs = [
                (jnp.where(xlo == dxi - radius, 1.0 - fx, 0.0)
                 + jnp.where(xlo + 1 == dxi - radius, fx, 0.0))
                for dxi in range(r2)
            ]

            def dy_body(dyi, acc):
                dy = dyi - radius
                wy = (jnp.where(ylo == dy, 1.0 - fy, 0.0)
                      + jnp.where(ylo + 1 == dy, fy, 0.0))
                data_row = win[row_base + dyi, :, :]  # (WQ2, 2C)
                for dxi in range(r2):
                    m = (wy * wxs[dxi]).astype(data_row.dtype)
                    colp = tx * dil + 1 + dxi   # padded col = 2j + colp
                    q0, ph = colp // 2, colp % 2
                    sl = data_row[q0:q0 + out_w, ph * c:(ph + 1) * c]
                    acc = acc + m * sl
                return acc

            accs.append(jax.lax.fori_loop(
                blk_lo, blk_hi + 2, dy_body,
                jnp.zeros((out_w, c), win.dtype)))

        # single fused (out_w, 9C) @ (9C, Cout) matmul (see _kernel)
        patch = jnp.concatenate(accs, axis=1)
        out_acc = jax.lax.dot_general(
            patch, w_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, i, :, :] = out_acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kernel", "dilation", "radius",
                                             "interpret"))
def deform_conv2d_s2_pallas_batched(
    x: Array,          # (B, H, W, Cin)
    offsets: Array,    # (B, Ho, Wo, 2*k*k) at OUTPUT resolution
    weight: Array,     # (k, k, Cin, Cout)
    *,
    kernel: int = 3,
    dilation: int = 1,
    radius: int = 3,
    interpret: bool = False,
) -> Array:
    """Stride-2 deformable conv (grid = (B, row-blocks)); offsets clamped to
    +-radius. Covers the first block of each DCN stage, which previously fell
    back to the gather formulation (VERDICT r2 weak #8)."""
    bsz, h, w, c = x.shape
    k = kernel
    cout = weight.shape[-1]
    assert c % 128 == 0 and cout % 128 == 0, "channels must be lane-aligned"
    pad = dilation * (k - 1) // 2
    margin = pad + radius + 1
    ho, wo = -(-h // 2), -(-w // 2)
    assert offsets.shape[1] == ho and offsets.shape[2] == wo
    assert BR * 2 + (k - 1) * dilation + 2 * radius + 2 + 1 <= WIN_R2

    nb = -(-ho // BR)
    hp = nb * BR * 2 + WIN_R2
    # padded width: room for the widest (tap, displacement) slice after the
    # parity split, rounded so both the full width (16) and the half width
    # (8) stay sublane-aligned
    wp_total = -(-(w + 2 * margin + 16) // 16) * 16
    xp = jnp.zeros((bsz, hp, wp_total, c), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, margin, margin, 0))
    # column-parity split: lanes [0:C] = even padded cols, [C:2C] = odd
    wq2 = wp_total // 2
    xq = jnp.concatenate([xp[:, :, 0::2, :], xp[:, :, 1::2, :]], axis=-1)

    wq = -(-wo // 8) * 8
    off = offsets.reshape(bsz, ho, wo, k * k, 2).astype(jnp.float32)

    def pack(o):  # (ho, wo, 9) -> (wq, nb*128)
        o = o.transpose(1, 0, 2)
        o = jnp.pad(o, ((0, wq - wo), (0, nb * BR - ho), (0, 0)))
        o = o.reshape(wq, nb, BR * k * k)
        o = jnp.pad(o, ((0, 0), (0, 0), (0, 128 - BR * k * k)))
        return o.reshape(wq, nb * 128)

    oyt = jax.vmap(pack)(off[..., 0])
    oxt = jax.vmap(pack)(off[..., 1])

    wmat = weight.reshape(k * k * c, cout).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel_s2, k=k, dil=dilation, radius=radius,
                          c=c, cout=cout),
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, wq, 128), lambda ib, b: (ib, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wq, 128), lambda ib, b: (ib, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BR, wq, cout), lambda ib, b: (ib, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nb * BR, wq, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((WIN_R2, wq2, 2 * c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(oyt, oxt, xq, wmat)
    return out[:, :ho, :wo, :]
