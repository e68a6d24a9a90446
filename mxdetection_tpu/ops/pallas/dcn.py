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

    # Banded-MXU x-selection (round 5, 2.4x over the unrolled one-hot FMAs):
    # for each (tap, dy) the x-contraction  patch[x] = sum_dx wx[x,dx] *
    # row[x + col_base + dx]  IS a banded matmul  B @ row  with
    # B[x, xin] = wy[x] * wx(x, xin) built densely from iota comparisons
    # (~6 VPU ops on (Wq, Wp) f32) — the whole +-radius range rides one MXU
    # contraction instead of 2R+2 unrolled (Wq, C) mask-FMA triples per tap.
    # Taps sharing a ty read the same win row, so each dy iteration is k
    # matmuls of (k*Wq, Wp) @ (Wp, C). The dy fori still runs only over the
    # block's actual y-offset span (bounds hoisted above).
    out_w = out_ref.shape[2]
    wp = win.shape[1]
    iota_x = jax.lax.broadcasted_iota(
        jnp.int32, (out_w, wp), 0).astype(jnp.float32)
    iota_xin = jax.lax.broadcasted_iota(
        jnp.int32, (out_w, wp), 1).astype(jnp.float32)
    for i in range(BR):
        tap_params = []
        for t, (ty, tx) in enumerate(taps):
            col = i * 9 + t
            oy = jnp.clip(oy_ref[0, :, col:col + 1], -radius, radius)  # (Wq, 1)
            ox = jnp.clip(ox_ref[0, :, col:col + 1], -radius, radius)
            ylo = jnp.floor(oy)
            fy = oy - ylo
            xlo = jnp.floor(ox)
            fx = ox - xlo
            d = iota_xin - iota_x - (tx * dil + 1) - radius
            bx = (jnp.where(d == xlo, 1.0 - fx, 0.0)
                  + jnp.where(d == xlo + 1, fx, 0.0))
            tap_params.append((ty, ylo, fy, bx))

        def dy_body(dyi, acc, i=i, tap_params=tap_params):
            dy = dyi - radius
            bands = []
            for (ty, ylo, fy, bx) in tap_params:
                wy = (jnp.where(ylo == dy, 1.0 - fy, 0.0)
                      + jnp.where(ylo + 1 == dy, fy, 0.0))
                bands.append((wy * bx).astype(win.dtype))
            parts = []
            for ty_g in range(k):
                grp = [bands[j] for j in range(k * k) if taps[j][0] == ty_g]
                bstack = jnp.concatenate(grp, axis=0)       # (k*Wq, Wp)
                row = win[i + ty_g * dil + 1 + dyi, :, :]   # dynamic dim-0
                parts.append(jax.lax.dot_general(
                    bstack, row, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            return acc + jnp.concatenate(parts, axis=0)     # (k*k*Wq, C)

        acc0 = jnp.zeros((k * k * out_w, c), jnp.float32)
        accs_st = jax.lax.fori_loop(blk_lo, blk_hi + 2, dy_body, acc0)
        # rows of accs_st are in tap order (ty-major): reassemble (Wq, 9C)
        patch = jnp.concatenate(
            [accs_st[t * out_w:(t + 1) * out_w, :] for t in range(k * k)],
            axis=1).astype(win.dtype)
        # ONE (out_w, 9C) @ (9C, Cout) matmul per row instead of 9 per-tap
        # (out_w, C) @ (C, Cout) matmuls: the per-matmul issue overhead was
        # the radius-independent base cost of this kernel (~7.9 of 14.1 ms
        # on the stage-3 layer, tools/exp_dcn2.py)
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
# training (stride 1): backward kernels + custom_vjp entry point
#
# Reference equivalent: the CUDA family's ``deformable_im2col.cuh`` backward
# pair (``deformable_col2im`` / ``deformable_col2im_coord``), which scatter
# one thread per (column entry, corner) with atomicAdd. TPU has no scatter
# unit, and the round-3 fallback (XLA autodiff of the gather formulation,
# under full remat) left cascade R101-DCN training at 2.6 img/s/chip
# (VERDICT r3 missing #2). This section re-derives the backward the same way
# the RoIAlign backward was fixed (matmul-shaped contractions + a
# windowed-VMEM transpose kernel):
#
#   dW       = patches^T @ g                      (one XLA MXU contraction)
#   dpatch   = g @ W^T                            (one XLA MXU contraction)
#   doff_y,t = sum_c dpatch[.,t,c] * ds/doy[.,t,c]  (elementwise + reduce)
#   dx       = shift-select TRANSPOSE of dpatch   (_dx_kernel below)
#
# ``patches`` and the offset-derivative samples ds/doy, ds/dox are
# REMATERIALIZED by ``_patches_kernel`` (a 3-accumulator variant of the
# forward kernel: bilinear weights wy*wx, and their analytic derivatives
# dwy*wx and wy*dwx, where dwy/doy = -[ylo==dy] + [ylo+1==dy]); only
# (x, offsets, weight) are kept as residuals, so HBM cost matches the old
# remat path while the backward never touches a gather or scatter.
#
# The transpose identity behind _dx_kernel: the forward reads input
# (r, s) into output (i, j) = (r - ty*dil + pad - dy, s - tx*dil + pad - dx)
# with mask wy*wx, so dx[r, s] is the SAME masked-shifted-sum structure over
# dpatch with negated shifts — static x-slices, a dynamic (block-bounded)
# y-displacement fori, and per-tap windowed DMA of dpatch.
#
# Semantics: offsets clamped to +-radius, like the inference kernels (the
# documented deviation); the clip gradient (zero outside the interval) is
# applied to doffsets, matching jax.grad of gather-after-jnp.clip, which is
# the golden in tests/test_pallas_dcn_bwd.py.

PBR = 4       # output rows per grid step (smaller than BR: three 9C-wide
              # output blocks must fit VMEM alongside the input window)
WIN_P = 16    # window rows: PBR + (k-1)*dil + 2R + 2 + 1 <= 16 for k=3, R=3


def _pack_offsets(o, wq, nb, br, kk):
    """(h, w, k*k) offset component -> (wq, nb*128) lane-blocked layout:
    per row-block a 128-lane group holding (row-in-block, tap)."""
    h, w = o.shape[0], o.shape[1]
    o = o.transpose(1, 0, 2)
    o = jnp.pad(o, ((0, wq - w), (0, nb * br - h), (0, 0)))
    o = o.reshape(wq, nb, br * kk)
    o = jnp.pad(o, ((0, 0), (0, 0), (0, 128 - br * kk)))
    return o.reshape(wq, nb * 128)


def _patches_kernel(oy_ref, ox_ref, x_hbm, p_ref, dsy_ref, dsx_ref, win, sem,
                    *, k: int, dil: int, radius: int, c: int):
    ib = pl.program_id(0)
    b = pl.program_id(1)
    base = pl.multiple_of(b * PBR, 4)

    dma = pltpu.make_async_copy(x_hbm.at[ib, pl.ds(base, WIN_P)], win, sem)
    dma.start()
    dma.wait()

    r2 = 2 * radius + 2
    taps = [(ty, tx) for ty in range(k) for tx in range(k)]

    oy_blk = jnp.clip(oy_ref[0, :, :], -radius, radius)
    blk_lo = jnp.floor(jnp.min(oy_blk)).astype(jnp.int32) + radius
    blk_hi = jnp.floor(jnp.max(oy_blk)).astype(jnp.int32) + radius

    # Banded-MXU x-selection, like the forward kernel (round 5) — but with
    # THREE band variants per tap: value (wy*wx), d/doy (dwy*wx) and d/dox
    # (wy*dwx). Taps sharing a ty read the same win row, so each dy
    # iteration is k matmuls of (3k*Wq, Wp) @ (Wp, C).
    out_w = p_ref.shape[2]
    wp = win.shape[1]
    iota_x = jax.lax.broadcasted_iota(
        jnp.int32, (out_w, wp), 0).astype(jnp.float32)
    iota_xin = jax.lax.broadcasted_iota(
        jnp.int32, (out_w, wp), 1).astype(jnp.float32)
    for i in range(PBR):
        tap_params = []
        for t, (ty, tx) in enumerate(taps):
            col = i * (k * k) + t
            oy = jnp.clip(oy_ref[0, :, col:col + 1], -radius, radius)
            ox = jnp.clip(ox_ref[0, :, col:col + 1], -radius, radius)
            ylo = jnp.floor(oy)
            fy = oy - ylo
            xlo = jnp.floor(ox)
            fx = ox - xlo
            tap_params.append((ty, tx, ylo, fy, xlo, fx))

        # per-ty-group fori (bands rebuilt per iteration): holding either
        # precomputed (Wq, Wp) band grids or the full 3*k*k*Wq-row f32
        # accumulator across one big fori blows the 16M VMEM stack at the
        # c=512 / wide-stage shapes; per-group the accumulator is k x
        # smaller and the matmul count is unchanged
        for ty_g in range(k):
            grp_params = [p for p in tap_params if p[0] == ty_g]

            def dy_body(dyi, acc, i=i, ty_g=ty_g, grp_params=grp_params):
                dy = dyi - radius
                bands = []
                for (ty, tx, ylo, fy, xlo, fx) in grp_params:
                    d = iota_xin - iota_x - (tx * dil + 1) - radius
                    bx = (jnp.where(d == xlo, 1.0 - fx, 0.0)
                          + jnp.where(d == xlo + 1, fx, 0.0))
                    # d(wx)/d(ox): floor carries zero gradient, so the
                    # one-hot just flips sign between the two corners
                    dbx = (jnp.where(d == xlo, -1.0, 0.0)
                           + jnp.where(d == xlo + 1, 1.0, 0.0))
                    wy = (jnp.where(ylo == dy, 1.0 - fy, 0.0)
                          + jnp.where(ylo + 1 == dy, fy, 0.0))
                    dwy = (jnp.where(ylo == dy, -1.0, 0.0)
                           + jnp.where(ylo + 1 == dy, 1.0, 0.0))
                    bands.extend([(wy * bx).astype(win.dtype),
                                  (dwy * bx).astype(win.dtype),
                                  (wy * dbx).astype(win.dtype)])
                bstack = jnp.concatenate(bands, axis=0)    # (3k*Wq, Wp)
                row = win[i + ty_g * dil + 1 + dyi, :, :]
                return acc + jax.lax.dot_general(
                    bstack, row, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc0 = jnp.zeros((3 * k * out_w, c), jnp.float32)
            accs_st = jax.lax.fori_loop(blk_lo, blk_hi + 2, dy_body, acc0)
            for tj in range(k):
                t = ty_g * k + tj
                base = 3 * tj * out_w
                p_ref[0, i, :, t * c:(t + 1) * c] = (
                    accs_st[base:base + out_w, :].astype(p_ref.dtype))
                dsy_ref[0, i, :, t * c:(t + 1) * c] = (
                    accs_st[base + out_w:base + 2 * out_w, :].astype(dsy_ref.dtype))
                dsx_ref[0, i, :, t * c:(t + 1) * c] = (
                    accs_st[base + 2 * out_w:base + 3 * out_w, :].astype(dsx_ref.dtype))


def _dx_kernel(op_hbm, dp_hbm, out_ref, op_win, dp_win, sem1, sem2, *,
               k: int, dil: int, pad: int, radius: int, lpad: int, wq: int,
               c: int):
    """dx via the transposed shift-select: for input row r, source output row
    i = r - ty*dil + pad - dy and source col j = s - tx*dil + pad - dx; both
    mask and dpatch are read at the source, so each (tap, dy, dx) term is one
    shifted slice FMA. dy runs over block-level dynamic bounds (like the
    forward); dx stays statically unrolled (static sublane offsets)."""
    ib = pl.program_id(0)
    b = pl.program_id(1)
    base = pl.multiple_of(b * BR, 8)
    win_rows = op_win.shape[0]

    cp = pltpu.make_async_copy(op_hbm.at[ib, pl.ds(base, win_rows)], op_win,
                               sem1)
    cp.start()
    cp.wait()

    oy_all = jnp.clip(op_win[:, :, 0:k * k], -radius, radius)
    blk_lo = jnp.floor(jnp.min(oy_all)).astype(jnp.int32) + radius
    blk_hi = jnp.floor(jnp.max(oy_all)).astype(jnp.int32) + radius

    out_ref[...] = jnp.zeros_like(out_ref)

    # Banded-MXU transpose (round 5): for a fixed (tap, dy) the source sum
    # dx[s, c] = sum_j wy[j] * wx(j, s) * dpatch[j, c] is a matmul
    # Bt^T @ dprow with the band TRANSPOSED — source index j on sublanes, so
    # the (wqb, 1) mask vectors broadcast along lanes without a transpose,
    # and dot_general contracts dim 0 of both operands. The 2R+2 static
    # x-shift slices collapse into the band's iota comparison; zero-padded
    # dpatch rows/cols kill out-of-range terms exactly as the sliced
    # formulation did. All NINE taps are fused into ONE matmul per (row, dy)
    # by stacking their bands and dpatch rows along the contraction dim
    # ((9*wqb, Wq) x (9*wqb, C)) — dpatch stays in its natural (R, S, kk*c)
    # layout (no transpose, one window DMA per block instead of nine), and
    # the matmul issue count drops 9x, which was the dominant cost (the
    # per-tap version measured 18.9 ms on the stage-4 layer).
    cp2 = pltpu.make_async_copy(dp_hbm.at[ib, pl.ds(base, win_rows)],
                                dp_win, sem2)
    cp2.start()
    cp2.wait()

    taps = [(ty, tx) for ty in range(k) for tx in range(k)]
    wqb_win = dp_win.shape[1]
    iota_j = jax.lax.broadcasted_iota(
        jnp.int32, (wqb_win, wq), 0).astype(jnp.float32)
    iota_s = jax.lax.broadcasted_iota(
        jnp.int32, (wqb_win, wq), 1).astype(jnp.float32)
    for i in range(BR):
        def dy_body(dyi, acc, i=i):
            dy = dyi - radius
            bands = []
            rhs = []
            for t, (ty, tx) in enumerate(taps):
                # window row of source output i = r + pad - ty*dil - dy,
                # with window row 0 = output row base - (dil + radius + 1)
                iw = i + pad + dil * (1 - ty) + 2 * radius + 1 - dyi
                oy = jnp.clip(op_win[iw, :, t:t + 1], -radius, radius)
                ox = jnp.clip(op_win[iw, :, 16 + t:17 + t], -radius, radius)
                ylo = jnp.floor(oy)
                fy = oy - ylo
                xlo = jnp.floor(ox)
                fx = ox - xlo
                wy = (jnp.where(ylo == dy, 1.0 - fy, 0.0)
                      + jnp.where(ylo + 1 == dy, fy, 0.0))
                # dxv implied by the (j, s) pair for this tap
                dxv_grid = iota_s - iota_j + (lpad + pad - tx * dil)
                bt = wy * (jnp.where(dxv_grid == xlo, 1.0 - fx, 0.0)
                           + jnp.where(dxv_grid == xlo + 1, fx, 0.0))
                bands.append(bt.astype(dp_win.dtype))
                rhs.append(dp_win[iw, :, t * c:(t + 1) * c])
            bt_cat = jnp.concatenate(bands, axis=0)    # (9*wqb, Wq)
            rhs_cat = jnp.concatenate(rhs, axis=0)     # (9*wqb, C)
            return acc + jax.lax.dot_general(
                bt_cat, rhs_cat,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(
            blk_lo, blk_hi + 2, dy_body,
            jnp.zeros((wq, c), jnp.float32))
        out_ref[0, i, :, :] = acc.astype(out_ref.dtype)


def _dx_from_dpatch(dp5, oy, ox, h, w, c, *, k, d, radius, x_dtype,
                    interpret):
    """dx via ``_dx_kernel`` from cotangent patches on a stride-1 SOURCE grid.

    dp5: (B, R, S, k*k, c) — dpatch laid out so source index I relates to
    input row r by the stride-1 identity r = I + ty*d + dy - pad (column
    identity likewise); for stride 1 the source grid IS the output grid.
    oy/ox: (B, Ro, So, k*k) offsets on the same grid. (Stride 2 has its own
    parity-split kernel, ``_dx_kernel_s2`` — running THIS kernel on
    2x-dilated dpatch is exact but does 4x the work and 4x the temporaries.)
    Returns dx (B, h, w, c) in f32 (caller casts)."""
    bsz, rr, ss = dp5.shape[:3]
    ro, so = oy.shape[1], oy.shape[2]
    wq = -(-w // 8) * 8
    nbi = -(-h // BR)
    core = max(rr, ro, nbi * BR)
    pad = d * (k - 1) // 2
    pad_top = d + radius + 1
    pad_bot = d + radius
    rows_dp = pad_top + core + pad_bot
    al8 = lambda v: -(-v // 8) * 8  # noqa: E731
    lpad = al8(radius + 1 + d)
    rpad = al8(radius + d)
    wqb = lpad + max(ss, so, wq) + rpad
    win_b2 = BR + 2 * (d + radius) + 1

    # dpatch stays in its NATURAL (R, S, kk*c) layout — the tap-fused kernel
    # reads per-tap lane slices from one window DMA (no (kk, R, S, c)
    # transpose, which cost a real XLA pass over the 9x-activation buffer)
    dp_t = dp5.astype(x_dtype).reshape(bsz, rr, ss, k * k * c)
    dp_t = jnp.pad(dp_t, ((0, 0),
                          (pad_top, rows_dp - pad_top - rr),
                          (lpad, wqb - lpad - ss), (0, 0)))
    # lane dim 128: HBM windows are DMA-sliced, and Mosaic requires slice
    # shapes aligned to the (8, 128) tiling (taps live in lanes 0:9 / 16:25)
    planes = jnp.zeros((bsz, rows_dp, wqb, 128), jnp.float32)
    planes = planes.at[:, pad_top:pad_top + ro, lpad:lpad + so,
                       0:k * k].set(oy)
    planes = planes.at[:, pad_top:pad_top + ro, lpad:lpad + so,
                       16:16 + k * k].set(ox)

    dxp = pl.pallas_call(
        functools.partial(_dx_kernel, k=k, dil=d, pad=pad, radius=radius,
                          lpad=lpad, wq=wq, c=c),
        grid=(bsz, nbi),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, BR, wq, c), lambda ib, b: (ib, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nbi * BR, wq, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_b2, wqb, 128), jnp.float32),
            pltpu.VMEM((win_b2, wqb, k * k * c), x_dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(planes, dp_t)
    return dxp[:, :h, :w, :]


@functools.partial(jax.jit, static_argnames=("kernel", "dilation", "radius",
                                             "interpret"))
def deform_conv2d_bwd_pallas_batched(
    x: Array,          # (B, H, W, Cin)
    offsets: Array,    # (B, H, W, 2*k*k)
    weight: Array,     # (k, k, Cin, Cout)
    g: Array,          # (B, H, W, Cout) cotangent
    *,
    kernel: int = 3,
    dilation: int = 1,
    radius: int = 3,
    interpret: bool = False,
):
    """Gradients (dx, doffsets, dweight) of the clamped stride-1 deformable
    conv. No gather, no scatter: two Pallas shift-select kernels + XLA MXU
    contractions (see the section comment)."""
    bsz, h, w, c = x.shape
    k = kernel
    d = dilation
    cout = weight.shape[-1]
    assert c % 128 == 0 and cout % 128 == 0, "channels must be lane-aligned"
    pad = d * (k - 1) // 2
    margin = pad + radius + 1
    assert PBR + (k - 1) * d + 2 * radius + 2 + margin - pad - radius <= WIN_P

    # ---- patches + derivative samples (rematerialized, forward-structured)
    nbp = -(-h // PBR)
    hp = nbp * PBR + WIN_P
    wp_total = -(-(w + 2 * margin + 8) // 8) * 8
    xp = jnp.zeros((bsz, hp, wp_total, c), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, margin, margin, 0))

    wq = -(-w // 8) * 8
    off = offsets.reshape(bsz, h, w, k * k, 2).astype(jnp.float32)
    oyt = jax.vmap(lambda o: _pack_offsets(o, wq, nbp, PBR, k * k))(off[..., 0])
    oxt = jax.vmap(lambda o: _pack_offsets(o, wq, nbp, PBR, k * k))(off[..., 1])

    npr = nbp * PBR
    patches, dsy, dsx = pl.pallas_call(
        functools.partial(_patches_kernel, k=k, dil=d, radius=radius, c=c),
        grid=(bsz, nbp),
        in_specs=[
            pl.BlockSpec((1, wq, 128), lambda ib, b: (ib, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wq, 128), lambda ib, b: (ib, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, PBR, wq, k * k * c), lambda ib, b: (ib, b, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((bsz, npr, wq, k * k * c), x.dtype)
                   ] * 3,
        scratch_shapes=[
            pltpu.VMEM((WIN_P, wp_total, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(oyt, oxt, xp)

    # ---- MXU contractions (padded rows/cols of g are zero => contribute 0).
    # Flat 2-D dot_generals: einsums with (b,h,w[,k]) batch/contract dims made
    # XLA materialize f32 layout-copies of the 0.3G operands (0.6-0.8G HLO
    # temps per stage-2 layer); contiguous reshapes are bitcasts, and a plain
    # (N, K) x (N, M) contraction needs no operand relayout. Output dtype
    # x.dtype keeps MXU f32 accumulation without an f32 dpatch buffer.
    g_pad = jnp.pad(g.astype(x.dtype),
                    ((0, 0), (0, npr - h), (0, wq - w), (0, 0)))
    n = bsz * npr * wq
    p2 = patches.reshape(n, k * k * c)
    g2 = g_pad.reshape(n, cout)
    dw = jax.lax.dot_general(p2, g2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    wmat = weight.reshape(k * k * c, cout).astype(x.dtype)
    dpatch = jax.lax.dot_general(g2, wmat, (((1,), (1,)), ((), ())),
                                 preferred_element_type=x.dtype)  # (n, kkc)

    # ---- doffsets: per-tap channel reduction + clip gradient mask
    # (bf16 product fused into an f32-accumulating reduce — no f32 copies)
    dp5 = dpatch.reshape(bsz, npr, wq, k * k, c)
    dsy5 = dsy.reshape(bsz, npr, wq, k * k, c)
    dsx5 = dsx.reshape(bsz, npr, wq, k * k, c)
    doy = jnp.sum(dp5 * dsy5, axis=-1, dtype=jnp.float32)[:, :h, :w, :]
    dox = jnp.sum(dp5 * dsx5, axis=-1, dtype=jnp.float32)[:, :h, :w, :]
    inb = (off >= -radius) & (off <= radius)
    doff = jnp.stack([doy, dox], axis=-1) * inb.astype(jnp.float32)
    doff = doff.reshape(bsz, h, w, 2 * k * k).astype(offsets.dtype)

    # ---- dx: transposed shift-select over dpatch
    dx = _dx_from_dpatch(
        dpatch.reshape(bsz, npr, wq, k * k, c), off[..., 0], off[..., 1],
        h, w, c, k=k, d=d, radius=radius, x_dtype=x.dtype,
        interpret=interpret).astype(x.dtype)

    return dx, doff, dw.reshape(k, k, c, cout).astype(weight.dtype)


@functools.lru_cache(maxsize=None)
def make_trainable_deform_conv(kernel: int = 3, dilation: int = 1,
                               radius: int = 3, interpret: bool = False):
    """Stride-1 deformable conv with Pallas forward AND backward kernels
    (custom_vjp). Signature: (x (B,H,W,Cin), offsets (B,H,W,2k²),
    weight (k,k,Cin,Cout)) -> (B,H,W,Cout). Offsets clamped to +-radius with
    the clip gradient — golden: jax.grad of ops.dcn.deform_conv2d composed
    with jnp.clip (tests/test_pallas_dcn_bwd.py)."""
    kw = dict(kernel=kernel, dilation=dilation, radius=radius,
              interpret=interpret)

    @jax.custom_vjp
    def f(x, offsets, weight):
        return deform_conv2d_pallas_batched(x, offsets, weight, **kw)

    def fwd(x, offsets, weight):
        return f(x, offsets, weight), (x, offsets, weight)

    def bwd(res, g):
        x, offsets, weight = res
        return deform_conv2d_bwd_pallas_batched(x, offsets, weight, g, **kw)

    f.defvjp(fwd, bwd)
    return f


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

    # Banded-MXU x-selection with the column-parity split (round 5, see
    # _kernel): padded col = 2j + colp, so each parity plane ph gets its own
    # band with dxv = 2*(q - j) + ph - tx*dil - 1 - radius; out-of-range
    # (j, q) pairs simply never match the one-hot. Each dy iteration is
    # k(ty) x 2(parity) matmuls of (k*Wq, Wq2) @ (Wq2, C).
    wq2 = win.shape[1]
    iota_j = jax.lax.broadcasted_iota(
        jnp.int32, (out_w, wq2), 0).astype(jnp.float32)
    iota_q = jax.lax.broadcasted_iota(
        jnp.int32, (out_w, wq2), 1).astype(jnp.float32)
    for i in range(BR):
        tap_params = []
        for t, (ty, tx) in enumerate(taps):
            col = i * 9 + t
            oy = jnp.clip(oy_ref[0, :, col:col + 1], -radius, radius)
            ox = jnp.clip(ox_ref[0, :, col:col + 1], -radius, radius)
            ylo = jnp.floor(oy)
            fy = oy - ylo
            xlo = jnp.floor(ox)
            fx = ox - xlo
            bxs = []
            for ph in range(2):
                dxv = (2.0 * (iota_q - iota_j) + ph - tx * dil - 1 - radius)
                bxs.append(jnp.where(dxv == xlo, 1.0 - fx, 0.0)
                           + jnp.where(dxv == xlo + 1, fx, 0.0))
            tap_params.append((ty, ylo, fy, bxs))

        def dy_body(dyi, acc, i=i, tap_params=tap_params):
            dy = dyi - radius
            bands = []
            for (ty, ylo, fy, bxs) in tap_params:
                wy = (jnp.where(ylo == dy, 1.0 - fy, 0.0)
                      + jnp.where(ylo + 1 == dy, fy, 0.0))
                bands.append(tuple((wy * bx).astype(win.dtype) for bx in bxs))
            parts_all = []
            for ty_g in range(k):
                data_row = win[2 * i + ty_g * dil + 1 + dyi, :, :]  # (WQ2, 2C)
                parts = None
                for ph in range(2):
                    grp = [bands[j][ph] for j in range(k * k)
                           if taps[j][0] == ty_g]
                    bstack = jnp.concatenate(grp, axis=0)   # (k*Wq, Wq2)
                    prod = jax.lax.dot_general(
                        bstack, data_row[:, ph * c:(ph + 1) * c],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    parts = prod if parts is None else parts + prod
                parts_all.append(parts)
            return acc + jnp.concatenate(parts_all, axis=0)

        acc0 = jnp.zeros((k * k * out_w, c), jnp.float32)
        accs_st = jax.lax.fori_loop(blk_lo, blk_hi + 2, dy_body, acc0)
        patch = jnp.concatenate(
            [accs_st[t * out_w:(t + 1) * out_w, :] for t in range(k * k)],
            axis=1).astype(win.dtype)
        # single fused (out_w, 9C) @ (9C, Cout) matmul (see _kernel)
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


# ---------------------------------------------------------------------------
# training (stride 2): the same backward decomposition as stride 1.
#
# patches/dsy/dsx come from ``_patches_kernel_s2`` (the 3-accumulator variant
# of ``_kernel_s2``: parity-split window, row_base = 2i). dW/dpatch/doffsets
# are the identical MXU contractions. dx comes from ``_dx_kernel_s2``, a
# parity-split transpose at OUTPUT resolution: input (r, s) receives from
# output (i, j) = ((r + pad - ty*dil - dy)/2, (s + pad - tx*dil - dx)/2),
# defined only when both numerators are even, so splitting output columns by
# s-parity makes every (tap, dx) term a static lane-shift of dpatch and the
# dy walk step by 2 over its parity class. (An earlier design that reused the
# stride-1 ``_dx_kernel`` on zero-interleaved 2x-dilated dpatch was exact but
# did ~4x the work and 4x the temporaries — replaced; see BASELINE.md.)
# This closes the last gather+remat fallback in DCN training (the 3 stride-2
# first-block layers; VERDICT r3 "remaining lever").

PBR2 = 2     # output rows per grid step (3 9C-wide blocks + parity window)
WIN_P2 = 16  # window input rows: PBR2*2 + (k-1)*dil + 2R + 2 + 1 <= 16


def _dx_kernel_s2(op_hbm, dp_hbm, out0_ref, out1_ref, op_win, dp_win, acc0_s,
                  acc1_s, sem1, sem2, *, k: int, dil: int, pad: int,
                  radius: int, p0: int, l0: int, wq_h: int, win_rows: int):
    """Stride-2 dx via the parity-split transpose: input (r, s) receives from
    output (i, j) = ((r + pad - ty*dil - dy)/2, (s + pad - tx*dil - dx)/2),
    defined only when both numerators are even. Splitting output columns by
    s-parity (out0 = even s, out1 = odd s) turns each (tap, dx) term into a
    STATIC lane-shift of output-resolution dpatch (no dilation, no gather):
    phase ph receives (tx, dxv) iff e = pad - tx*dil - dxv has parity ph, at
    source column j = j' + (e + ph)/2. Row parity makes the dy walk step by 2
    over the class (dyi parity == (i + pad + ty*dil + radius) & 1) — half the
    dy iterations of the stride-1 transpose at half the width, ~4x less work
    than running the stride-1 kernel on 2x-dilated dpatch."""
    ib = pl.program_id(0)
    b = pl.program_id(1)
    hb2 = BR // 2
    base2 = pl.multiple_of(b * hb2, 4)

    cp = pltpu.make_async_copy(op_hbm.at[ib, pl.ds(base2, win_rows)], op_win,
                               sem1)
    cp.start()
    cp.wait()

    oy_all = jnp.clip(op_win[:, :, 0:k * k], -radius, radius)
    blk_lo = jnp.floor(jnp.min(oy_all)).astype(jnp.int32) + radius
    blk_hi = jnp.floor(jnp.max(oy_all)).astype(jnp.int32) + radius

    # accumulate across taps in f32 VMEM scratch; HBM outputs stay x.dtype
    acc0_s[...] = jnp.zeros_like(acc0_s)
    acc1_s[...] = jnp.zeros_like(acc1_s)

    # Banded-MXU transpose with the receiving-column parity split (round 5,
    # see _dx_kernel): for phase ph the source relation j - s = l0 +
    # (e + ph)/2 with e = pad - tx*dil - dxv inverts to dxv_grid = pad -
    # tx*dil + ph - 2*(j - s - l0); each (tap, dy-step) is TWO matmuls of
    # (Wqb, Wq_h)^T-contracted bands against the dpatch window row.
    taps = [(ty, tx) for ty in range(k) for tx in range(k)]
    wqb_win = dp_win.shape[1]
    iota_j = jax.lax.broadcasted_iota(
        jnp.int32, (wqb_win, wq_h), 0).astype(jnp.float32)
    iota_s = jax.lax.broadcasted_iota(
        jnp.int32, (wqb_win, wq_h), 1).astype(jnp.float32)
    for t, (ty, tx) in enumerate(taps):
        cp2 = pltpu.make_async_copy(dp_hbm.at[ib, t, pl.ds(base2, win_rows)],
                                    dp_win, sem2)
        cp2.start()
        cp2.wait()
        dxv_grids = [pad - tx * dil + ph - 2.0 * (iota_j - iota_s - l0)
                     for ph in range(2)]
        for i in range(BR):
            # dyi parity class for even source-row numerator (static per i,ty)
            par = (i + pad + ty * dil + radius) & 1
            start_p = blk_lo + jnp.bitwise_and(par - blk_lo, 1)
            cnt = jnp.maximum(0, (blk_hi + 2 - start_p + 1) // 2)

            def dy_body(dyj, accs, i=i, t=t, ty=ty, start_p=start_p,
                        dxv_grids=dxv_grids):
                acc0, acc1 = accs
                dyi = start_p + 2 * dyj
                dyv = dyi - radius
                # source row window index: (i + pad - ty*dil - dyv)/2 + p0
                iw = (i + pad - ty * dil + radius - dyi) // 2 + p0
                oy = jnp.clip(op_win[iw, :, t:t + 1], -radius, radius)
                ox = jnp.clip(op_win[iw, :, 16 + t:17 + t], -radius, radius)
                ylo = jnp.floor(oy)
                fy = oy - ylo
                xlo = jnp.floor(ox)
                fx = ox - xlo
                wy = (jnp.where(ylo == dyv, 1.0 - fy, 0.0)
                      + jnp.where(ylo + 1 == dyv, fy, 0.0))
                dprow = dp_win[iw, :, :]
                outs = []
                for ph in range(2):
                    bt = wy * (jnp.where(dxv_grids[ph] == xlo, 1.0 - fx, 0.0)
                               + jnp.where(dxv_grids[ph] == xlo + 1, fx, 0.0))
                    outs.append(jax.lax.dot_general(
                        bt.astype(dprow.dtype), dprow,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                return acc0 + outs[0], acc1 + outs[1]

            z = jnp.zeros((wq_h, dp_win.shape[2]), jnp.float32)
            acc0, acc1 = jax.lax.fori_loop(0, cnt, dy_body, (z, z))
            acc0_s[i, :, :] = acc0_s[i, :, :] + acc0
            acc1_s[i, :, :] = acc1_s[i, :, :] + acc1

    out0_ref[0, :, :, :] = acc0_s[...].astype(out0_ref.dtype)
    out1_ref[0, :, :, :] = acc1_s[...].astype(out1_ref.dtype)


def _patches_kernel_s2(oy_ref, ox_ref, x_hbm, p_ref, dsy_ref, dsx_ref, win,
                       sem, *, k: int, dil: int, radius: int, c: int):
    ib = pl.program_id(0)
    b = pl.program_id(1)
    base = pl.multiple_of(b * PBR2 * 2, 4)

    dma = pltpu.make_async_copy(x_hbm.at[ib, pl.ds(base, WIN_P2)], win, sem)
    dma.start()
    dma.wait()

    r2 = 2 * radius + 2
    taps = [(ty, tx) for ty in range(k) for tx in range(k)]

    oy_blk = jnp.clip(oy_ref[0, :, :], -radius, radius)
    blk_lo = jnp.floor(jnp.min(oy_blk)).astype(jnp.int32) + radius
    blk_hi = jnp.floor(jnp.max(oy_blk)).astype(jnp.int32) + radius

    # Banded-MXU x-selection with the column-parity split AND three band
    # kinds per tap (value / d_oy / d_ox) — the stride-2 composition of the
    # round-5 _kernel / _patches_kernel redesigns. Each dy iteration is
    # k(ty) x 2(parity) matmuls of (3k*Wq, Wq2) @ (Wq2, C).
    out_w = p_ref.shape[2]
    wq2 = win.shape[1]
    iota_j = jax.lax.broadcasted_iota(
        jnp.int32, (out_w, wq2), 0).astype(jnp.float32)
    iota_q = jax.lax.broadcasted_iota(
        jnp.int32, (out_w, wq2), 1).astype(jnp.float32)
    for i in range(PBR2):
        tap_params = []
        for t, (ty, tx) in enumerate(taps):
            col = i * (k * k) + t
            oy = jnp.clip(oy_ref[0, :, col:col + 1], -radius, radius)
            ox = jnp.clip(ox_ref[0, :, col:col + 1], -radius, radius)
            ylo = jnp.floor(oy)
            fy = oy - ylo
            xlo = jnp.floor(ox)
            fx = ox - xlo
            tap_params.append((ty, tx, ylo, fy, xlo, fx))

        # per-ty-group fori with bands rebuilt per iteration — the same
        # VMEM-stack discipline as the stride-1 patches kernel (one big
        # accumulator + held band grids OOM the 16M scoped vmem)
        for ty_g in range(k):
            grp_params = [p for p in tap_params if p[0] == ty_g]

            def dy_body(dyi, acc, i=i, ty_g=ty_g, grp_params=grp_params):
                dy = dyi - radius
                data_row = win[2 * i + ty_g * dil + 1 + dyi, :, :]  # (WQ2, 2C)
                parts = None
                for ph in range(2):
                    bands = []
                    for (ty, tx, ylo, fy, xlo, fx) in grp_params:
                        wy = (jnp.where(ylo == dy, 1.0 - fy, 0.0)
                              + jnp.where(ylo + 1 == dy, fy, 0.0))
                        dwy = (jnp.where(ylo == dy, -1.0, 0.0)
                               + jnp.where(ylo + 1 == dy, 1.0, 0.0))
                        dxv = (2.0 * (iota_q - iota_j) + ph - tx * dil - 1
                               - radius)
                        bx = (jnp.where(dxv == xlo, 1.0 - fx, 0.0)
                              + jnp.where(dxv == xlo + 1, fx, 0.0))
                        dbx = (jnp.where(dxv == xlo, -1.0, 0.0)
                               + jnp.where(dxv == xlo + 1, 1.0, 0.0))
                        bands.extend([(wy * bx).astype(win.dtype),
                                      (dwy * bx).astype(win.dtype),
                                      (wy * dbx).astype(win.dtype)])
                    bstack = jnp.concatenate(bands, axis=0)  # (3k*Wq, Wq2)
                    prod = jax.lax.dot_general(
                        bstack, data_row[:, ph * c:(ph + 1) * c],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    parts = prod if parts is None else parts + prod
                return acc + parts

            acc0 = jnp.zeros((3 * k * out_w, c), jnp.float32)
            accs_st = jax.lax.fori_loop(blk_lo, blk_hi + 2, dy_body, acc0)
            for tj in range(k):
                t = ty_g * k + tj
                base_r = 3 * tj * out_w
                p_ref[0, i, :, t * c:(t + 1) * c] = (
                    accs_st[base_r:base_r + out_w, :].astype(p_ref.dtype))
                dsy_ref[0, i, :, t * c:(t + 1) * c] = (
                    accs_st[base_r + out_w:base_r + 2 * out_w, :].astype(dsy_ref.dtype))
                dsx_ref[0, i, :, t * c:(t + 1) * c] = (
                    accs_st[base_r + 2 * out_w:base_r + 3 * out_w, :].astype(dsx_ref.dtype))


@functools.partial(jax.jit, static_argnames=("kernel", "dilation", "radius",
                                             "interpret"))
def deform_conv2d_s2_bwd_pallas_batched(
    x: Array,          # (B, H, W, Cin)
    offsets: Array,    # (B, Ho, Wo, 2*k*k) at OUTPUT resolution
    weight: Array,     # (k, k, Cin, Cout)
    g: Array,          # (B, Ho, Wo, Cout) cotangent
    *,
    kernel: int = 3,
    dilation: int = 1,
    radius: int = 3,
    interpret: bool = False,
):
    """Gradients (dx, doffsets, dweight) of the clamped stride-2 deformable
    conv — no gather, no scatter (see the stride-2 training section note)."""
    bsz, h, w, c = x.shape
    k = kernel
    d = dilation
    cout = weight.shape[-1]
    assert c % 128 == 0 and cout % 128 == 0, "channels must be lane-aligned"
    pad = d * (k - 1) // 2
    margin = pad + radius + 1
    ho, wo = -(-h // 2), -(-w // 2)
    assert offsets.shape[1] == ho and offsets.shape[2] == wo
    assert PBR2 * 2 + (k - 1) * d + 2 * radius + 2 + 1 <= WIN_P2

    # ---- patches + derivative samples (parity-split window, like _kernel_s2)
    nb2 = -(-ho // PBR2)
    hp = nb2 * PBR2 * 2 + WIN_P2
    wp_total = -(-(w + 2 * margin + 16) // 16) * 16
    xp = jnp.zeros((bsz, hp, wp_total, c), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, margin, margin, 0))
    wq2 = wp_total // 2
    xq = jnp.concatenate([xp[:, :, 0::2, :], xp[:, :, 1::2, :]], axis=-1)

    wq_o = -(-wo // 8) * 8
    off = offsets.reshape(bsz, ho, wo, k * k, 2).astype(jnp.float32)
    oyt = jax.vmap(lambda o: _pack_offsets(o, wq_o, nb2, PBR2, k * k))(
        off[..., 0])
    oxt = jax.vmap(lambda o: _pack_offsets(o, wq_o, nb2, PBR2, k * k))(
        off[..., 1])

    npr_o = nb2 * PBR2
    patches, dsy, dsx = pl.pallas_call(
        functools.partial(_patches_kernel_s2, k=k, dil=d, radius=radius, c=c),
        grid=(bsz, nb2),
        in_specs=[
            pl.BlockSpec((1, wq_o, 128), lambda ib, b: (ib, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wq_o, 128), lambda ib, b: (ib, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, PBR2, wq_o, k * k * c), lambda ib, b: (ib, b, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((bsz, npr_o, wq_o, k * k * c),
                                        x.dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((WIN_P2, wq2, 2 * c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(oyt, oxt, xq)

    # ---- MXU contractions as flat 2-D dot_generals (see the stride-1 note)
    g_pad = jnp.pad(g.astype(x.dtype),
                    ((0, 0), (0, npr_o - ho), (0, wq_o - wo), (0, 0)))
    n = bsz * npr_o * wq_o
    p2 = patches.reshape(n, k * k * c)
    g2 = g_pad.reshape(n, cout)
    dw = jax.lax.dot_general(p2, g2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    wmat = weight.reshape(k * k * c, cout).astype(x.dtype)
    dpatch = jax.lax.dot_general(g2, wmat, (((1,), (1,)), ((), ())),
                                 preferred_element_type=x.dtype)  # (n, kkc)

    # ---- doffsets: per-tap channel reduction + clip gradient mask
    dp5 = dpatch.reshape(bsz, npr_o, wq_o, k * k, c)
    dsy5 = dsy.reshape(bsz, npr_o, wq_o, k * k, c)
    dsx5 = dsx.reshape(bsz, npr_o, wq_o, k * k, c)
    doy = jnp.sum(dp5 * dsy5, axis=-1, dtype=jnp.float32)[:, :ho, :wo, :]
    dox = jnp.sum(dp5 * dsx5, axis=-1, dtype=jnp.float32)[:, :ho, :wo, :]
    inb = (off >= -radius) & (off <= radius)
    doff = jnp.stack([doy, dox], axis=-1) * inb.astype(jnp.float32)
    doff = doff.reshape(bsz, ho, wo, 2 * k * k).astype(offsets.dtype)

    # ---- dx: parity-split transposed shift-select at OUTPUT resolution
    # (see _dx_kernel_s2 — no dilation, no 2x-res temporaries)
    nbi = -(-h // BR)
    hb2 = BR // 2
    p0 = (d + radius + 2) // 2
    win_rows = (BR - 1 + d + radius) // 2 + p0 + 1
    rows_dp = max((nbi - 1) * hb2 + win_rows, p0 + npr_o)
    al8 = lambda v: -(-v // 8) * 8  # noqa: E731
    l0 = al8((d + radius + 2) // 2)
    wqb = l0 + wq_o + 8
    wq_h = wq_o

    dp_t = dpatch.reshape(bsz, npr_o, wq_o, k * k, c).transpose(0, 3, 1, 2, 4)
    dp_t = jnp.pad(dp_t, ((0, 0), (0, 0), (p0, rows_dp - p0 - npr_o),
                          (l0, wqb - l0 - wq_o), (0, 0)))
    planes = jnp.zeros((bsz, rows_dp, wqb, 128), jnp.float32)
    planes = planes.at[:, p0:p0 + ho, l0:l0 + wo, 0:k * k].set(off[..., 0])
    planes = planes.at[:, p0:p0 + ho, l0:l0 + wo,
                       16:16 + k * k].set(off[..., 1])

    out0, out1 = pl.pallas_call(
        functools.partial(_dx_kernel_s2, k=k, dil=d, pad=pad, radius=radius,
                          p0=p0, l0=l0, wq_h=wq_h, win_rows=win_rows),
        grid=(bsz, nbi),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, BR, wq_h, c), lambda ib, b: (ib, b, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 2,
        out_shape=[jax.ShapeDtypeStruct((bsz, nbi * BR, wq_h, c),
                                        x.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((win_rows, wqb, 128), jnp.float32),
            pltpu.VMEM((win_rows, wqb, c), x.dtype),
            pltpu.VMEM((BR, wq_h, c), jnp.float32),
            pltpu.VMEM((BR, wq_h, c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(planes, dp_t)
    # interleave the column phases: even input cols from out0, odd from out1
    dx = jnp.stack([out0, out1], axis=3)           # (B, rows, wq_h, 2, c)
    dx = dx.reshape(bsz, nbi * BR, 2 * wq_h, c)[:, :h, :w, :].astype(x.dtype)

    return dx, doff, dw.reshape(k, k, c, cout).astype(weight.dtype)


@functools.lru_cache(maxsize=None)
def make_trainable_deform_conv_s2(kernel: int = 3, dilation: int = 1,
                                  radius: int = 3, interpret: bool = False):
    """Stride-2 deformable conv with Pallas forward AND backward kernels
    (custom_vjp) — the s2 analog of ``make_trainable_deform_conv``. Offsets
    at output resolution, clamped to +-radius with the clip gradient; golden:
    jax.grad of ops.dcn.deform_conv2d(stride=2) composed with jnp.clip
    (tests/test_pallas_dcn_bwd.py)."""
    kw = dict(kernel=kernel, dilation=dilation, radius=radius,
              interpret=interpret)

    @jax.custom_vjp
    def f(x, offsets, weight):
        return deform_conv2d_s2_pallas_batched(x, offsets, weight, **kw)

    def fwd(x, offsets, weight):
        return f(x, offsets, weight), (x, offsets, weight)

    def bwd(res, g):
        x, offsets, weight = res
        return deform_conv2d_s2_bwd_pallas_batched(x, offsets, weight, g,
                                                   **kw)

    f.defvjp(fwd, bwd)
    return f
