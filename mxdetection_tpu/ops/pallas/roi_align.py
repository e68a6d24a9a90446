"""Pallas TPU kernel: multilevel RoIAlign as windowed DMA + MXU matmuls.

Reference equivalent: MXNet's CUDA ``roi_align.cu`` (one thread per output
element doing 4-point bilinear reads; SURVEY.md §2.3). A literal translation
(XLA gather) is the measured bottleneck on TPU — random gathers run ~30x off
memory speed-of-light. This kernel re-derives RoIAlign as dense linear
algebra, which is what the hardware wants:

  Bilinear sampling on a cartesian sample grid is SEPARABLE: the pooled
  output of roi r is  out[i, j, c] = sum_{y, x} Wy[i, y] * Wx[j, x] * F[y, x, c]
  where Wy (P, H) / Wx (P, W) hold each bin's averaged bilinear row/column
  weights. Restricted to a bounding window, that's one strided DMA plus two
  tiny matmul-shaped contractions per roi — zero gathers, MXU/VPU compute.

Window coverage: FPN level assignment bounds sqrt(w*h) but NOT the max side,
so extreme-aspect rois can exceed one window axis. Coverage is therefore
multi-pass: pass (py, px) covers the disjoint cell range
[y0 + py*WIN_Y, y0 + (py+1)*WIN_Y) x [x0 + px*WIN_X, ...), with weights
masked to that range (contributions are additive across passes, so outputs
simply sum). Rois that don't reach a pass's range skip its DMA and compute
entirely, so extra passes are nearly free. 2x3 passes cover 112x144 cells —
aspect ratios beyond that are truncated (documented; beyond any COCO box).
Extra passes compact their active rois into a small budget; if a pass
overflows the budget the code falls back to a full-length pass, so results
are exact for any roi distribution.

Grid = one program per roi, double-buffered: roi r+1's window DMA overlaps
roi r's compute. Mosaic constraints shape the code: no in-kernel reshapes
(levels are pre-flattened to (H, W*C)), dynamic DMA row offsets 8-aligned
(pl.multiple_of), lane offsets C-aligned.

Forward-only (inference hot path). Training uses the autodiff-friendly XLA
formulation in ``ops/roi_align.py``; both are tested against the same golden
numpy (tests/test_pallas_roi_align.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..roi_align import fpn_level_assign

Array = jax.Array

WIN_X = 48   # covers level-assigned sqrt-extent (~44 cells) per pass
WIN_Y = 56   # WIN_X + sublane alignment slack (row starts are 8-aligned)
NUM_PASSES_Y = 2
NUM_PASSES_X = 3
_CHUNK = 512  # SMEM fills at ~1KB/grid-step; cap steps per kernel launch

# float scalar layout per roi (flt_ref columns)
_F_Y1, _F_X1, _F_BH, _F_BW = 0, 1, 2, 3
_F_YLO, _F_YHI, _F_XLO, _F_XHI = 4, 5, 6, 7
_F_VALID = 8
_F_YRLO, _F_YRHI, _F_XRLO, _F_XRHI = 9, 10, 11, 12
_NUM_F = 13


def _kernel(int_ref, flt_ref, *refs, num_levels: int, out_size: int,
            sampling_ratio: int, c: int, r_total: int):
    level_refs = refs[:num_levels]
    out_ref = refs[num_levels]
    win, wy_scr, wx_scr, sems = refs[num_levels + 1:]

    r = pl.program_id(0)
    s = sampling_ratio

    def make_dma(slot, ridx, lref):
        y0 = pl.multiple_of(int_ref[ridx, 1], 8)
        x0c = pl.multiple_of(int_ref[ridx, 2], 128)
        return pltpu.make_async_copy(
            lref.at[pl.ds(y0, WIN_Y), pl.ds(x0c, WIN_X * c)],
            win.at[slot], sems.at[slot])

    def start_dma(slot, ridx):
        @pl.when(int_ref[ridx, 3] > 0)  # active flag: skipped passes don't DMA
        def _():
            lvl = int_ref[ridx, 0]
            for li in range(num_levels):
                @pl.when(lvl == li)
                def _():
                    make_dma(slot, ridx, level_refs[li]).start()

    cur = jax.lax.rem(r, 2)
    nxt = jax.lax.rem(r + 1, 2)

    @pl.when(r == 0)
    def _():
        start_dma(0, 0)

    @pl.when(r + 1 < r_total)
    def _():
        start_dma(nxt, r + 1)

    active = int_ref[r, 3] > 0

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:, :, :] = jnp.zeros_like(out_ref)

    @pl.when(active)
    def _():
        make_dma(cur, r, level_refs[0]).wait()

        def accum_weights(scr, start, binsz, lo_b, hi_b, rlo, rhi, width):
            # fully vectorized over (bin, cell): ~12 VPU ops per sample point
            cells = jax.lax.broadcasted_iota(
                jnp.int32, (out_size, width), 1).astype(jnp.float32)
            bins = jax.lax.broadcasted_iota(
                jnp.int32, (out_size, width), 0).astype(jnp.float32)
            in_range = jnp.where((cells >= rlo) & (cells < rhi), 1.0, 0.0)
            inv_s = 1.0 / s
            acc = jnp.zeros((out_size, width), jnp.float32)
            for p in range(s):
                coord = start + (bins + (p + 0.5) * inv_s) * binsz  # (P, W)
                inside = jnp.where((coord >= lo_b - 1.0) & (coord <= hi_b),
                                   1.0, 0.0)
                cc = jnp.clip(coord, lo_b, hi_b - 1.0)
                lo = jnp.floor(cc)
                frac = cc - lo
                hi = jnp.minimum(lo + 1.0, hi_b - 1.0)
                acc = acc + inside * inv_s * (
                    jnp.where(cells == lo, 1.0 - frac, 0.0)
                    + jnp.where(cells == hi, frac, 0.0))
            scr[:, :] = acc * in_range

        f = lambda k: flt_ref[r, k]
        accum_weights(wy_scr, f(_F_Y1), f(_F_BH), f(_F_YLO), f(_F_YHI),
                      f(_F_YRLO), f(_F_YRHI), WIN_Y)
        accum_weights(wx_scr, f(_F_X1), f(_F_BW), f(_F_XLO), f(_F_XHI),
                      f(_F_XRLO), f(_F_XRHI), WIN_X)
        validf = f(_F_VALID)

        # step 1 (y-contraction): ONE MXU matmul (P, WIN_Y) @ (WIN_Y, WIN_X*C)
        w2 = win[cur]
        t1 = jax.lax.dot_general(
            wy_scr[:, :].astype(w2.dtype), w2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (P, WIN_X*C) f32
        # step 2 (x-contraction): lane-sliced FMAs at static C-multiples
        accs = [jnp.zeros((out_size, c), jnp.float32) for _ in range(out_size)]
        for x in range(WIN_X):
            t1_x = t1[:, x * c:(x + 1) * c]
            for j in range(out_size):
                accs[j] = accs[j] + wx_scr[j, x] * t1_x
        for i in range(out_size):
            for j in range(out_size):
                row = i * out_size + j
                out_ref[0, row:row + 1, :] = (
                    accs[j][i:i + 1, :] * validf).astype(out_ref.dtype)
        for row in range(out_size * out_size, out_ref.shape[1]):
            out_ref[0, row:row + 1, :] = jnp.zeros((1, c), out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("strides", "output_size", "sampling_ratio", "min_level",
                     "canonical_scale", "canonical_level", "interpret"))
def multilevel_roi_align_pallas(
    features: Sequence[Array],
    rois: Array,
    strides: tuple,
    *,
    output_size: int = 7,
    sampling_ratio: int = 2,
    min_level: int = 2,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    roi_valid: Array | None = None,
    interpret: bool = False,
) -> Array:
    """Same contract as ``ops.roi_align.multilevel_roi_align`` (avg mode)."""
    num_levels = len(features)
    c = features[0].shape[-1]
    assert c % 128 == 0, "channel count must be lane-aligned for the kernel"
    r_total = rois.shape[0]
    dtype = features[0].dtype

    if num_levels == 1:
        levels = jnp.zeros((r_total,), jnp.int32)
    else:
        levels = fpn_level_assign(
            rois, min_level=min_level, max_level=min_level + num_levels - 1,
            canonical_scale=canonical_scale, canonical_level=canonical_level,
        ) - min_level
    if roi_valid is None:
        roi_valid = jnp.ones((r_total,), bool)

    # pad levels to >= one window AND to 8-row multiples, flatten to 2D
    # (H, W*C) — kernel is reshape-free. The 8-row rounding keeps the clip
    # bound hp-WIN_Y 8-aligned, honoring the DMA's pl.multiple_of(row, 8)
    # contract for rois near the image bottom (matches the bwd padding).
    padded = []
    dims = []
    for feat in features:
        h, w = feat.shape[:2]
        dims.append((h, w))
        ph = -(-max(h, WIN_Y) // 8) * 8 - h
        pw = max(WIN_X - w, 0)
        if ph or pw:
            feat = jnp.pad(feat, ((0, ph), (0, pw), (0, 0)))
        padded.append(feat.reshape(feat.shape[0], feat.shape[1] * c))

    h_arr = jnp.asarray([d[0] for d in dims], jnp.float32)[levels]
    w_arr = jnp.asarray([d[1] for d in dims], jnp.float32)[levels]
    hp_arr = jnp.asarray([p.shape[0] for p in padded], jnp.float32)[levels]
    wp_arr = jnp.asarray([p.shape[1] // c for p in padded], jnp.float32)[levels]
    stride_arr = jnp.asarray(strides, jnp.float32)[levels]

    scale = 1.0 / stride_arr
    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    roi_w = jnp.maximum(rois[:, 2] * scale - x1, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * scale - y1, 1.0)

    # base (pass 0) window origin; rows 8-aligned for the DMA
    y0b = jnp.clip(jnp.floor(y1 / 8.0) * 8.0, 0, jnp.maximum(hp_arr - WIN_Y, 0))
    x0b = jnp.clip(jnp.floor(x1), 0, jnp.maximum(wp_arr - WIN_X, 0))

    out_rows = -(-(output_size * output_size) // 8) * 8

    def run_kernel(ints, flts, n):
        outs = []
        for lo in range(0, n, _CHUNK):
            hi = min(lo + _CHUNK, n)
            m = hi - lo
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(m,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * num_levels,
                out_specs=pl.BlockSpec((1, out_rows, c),
                                       lambda r, *_: (r, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, WIN_Y, WIN_X * c), dtype),
                    pltpu.VMEM((output_size, WIN_Y), jnp.float32),
                    pltpu.VMEM((output_size, WIN_X), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            outs.append(pl.pallas_call(
                functools.partial(
                    _kernel, num_levels=num_levels, out_size=output_size,
                    sampling_ratio=sampling_ratio, c=c, r_total=m),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((m, out_rows, c), dtype),
                interpret=interpret,
            )(ints[lo:hi], flts[lo:hi], *padded))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def pass_scalars(py, px):
        """Scalar arrays + active mask for coverage pass (py, px)."""
        range_y0 = y0b + py * WIN_Y
        range_x0 = x0b + px * WIN_X
        # DMA origin (clipped into the level; weight range masking keeps the
        # covered cell set disjoint across passes)
        sy = jnp.clip(range_y0, 0, jnp.maximum(hp_arr - WIN_Y, 0))
        sx = jnp.clip(range_x0, 0, jnp.maximum(wp_arr - WIN_X, 0))
        need_y = (y1 + roi_h + 1.0) >= range_y0 if py else jnp.ones_like(y1, bool)
        need_x = (x1 + roi_w + 1.0) >= range_x0 if px else jnp.ones_like(x1, bool)
        exists = (range_y0 < h_arr) & (range_x0 < w_arr)
        active = roi_valid & need_y & need_x & exists
        ints = jnp.stack([
            levels, sy.astype(jnp.int32), sx.astype(jnp.int32) * c,
            active.astype(jnp.int32)], axis=1)
        flts = jnp.stack([
            y1 - sy, x1 - sx,
            roi_h / output_size, roi_w / output_size,
            -sy, h_arr - sy,
            -sx, w_arr - sx,
            roi_valid.astype(jnp.float32),
            range_y0 - sy, range_y0 - sy + WIN_Y,
            range_x0 - sx, range_x0 - sx + WIN_X,
        ], axis=1)
        return ints, flts, active

    # base pass: every roi
    ints0, flts0, _ = pass_scalars(0, 0)
    total = run_kernel(ints0, flts0, r_total)

    # Extra coverage passes (wide/tall rois only; FPN level assignment makes
    # them rare — aspect ratio must exceed ~5). All (roi, pass) work items
    # from every extra pass go into ONE combined queue; a while_loop drains
    # it budget-at-a-time with compaction + scatter-add. Exact for ANY roi
    # distribution (no silent truncation), vmap-safe (a lax.cond here would
    # lower to select under vmap and run both branches per image), and free
    # when nothing is active (zero loop iterations).
    ints_l, flts_l, act_l = [], [], []
    for py in range(NUM_PASSES_Y):
        for px in range(NUM_PASSES_X):
            if py == 0 and px == 0:
                continue
            i_p, f_p, a_p = pass_scalars(py, px)
            ints_l.append(i_p)
            flts_l.append(f_p)
            act_l.append(a_p)
    n_pass = len(ints_l)
    ints_all = jnp.concatenate(ints_l, axis=0)      # (n_pass*R, 4)
    flts_all = jnp.concatenate(flts_l, axis=0)      # (n_pass*R, _NUM_F)
    act_all = jnp.concatenate(act_l, axis=0)        # (n_pass*R,)
    roi_idx = jnp.tile(jnp.arange(r_total), n_pass)

    budget = min(n_pass * r_total, max(64, -(-r_total // 4 // 8) * 8))
    max_iters = -(-(n_pass * r_total) // budget)

    def body(state):
        tot, act, it = state
        _, sel = jax.lax.top_k(act.astype(jnp.float32), budget)
        # rows selected as padding carry active=0 -> kernel outputs zeros;
        # already-drained rows are masked the same way
        sel_ints = ints_all[sel].at[:, 3].min(act[sel].astype(jnp.int32))
        part = run_kernel(sel_ints, flts_all[sel], budget)
        tot = tot.at[roi_idx[sel]].add(part)  # dup roi indices accumulate
        act = act & ~jnp.zeros_like(act).at[sel].set(True)
        return tot, act, it + 1

    def cond(state):
        _, act, it = state
        return jnp.any(act) & (it < max_iters)

    total, _, _ = jax.lax.while_loop(
        cond, body, (total, act_all, jnp.int32(0)))

    return total[:, :output_size * output_size, :].reshape(
        r_total, output_size, output_size, c)


# ---------------------------------------------------------------------------
# backward (training): dF accumulation via in-place window DMA


def _bwd_kernel(int_ref, flt_ref, *refs, num_levels: int, out_size: int,
                sampling_ratio: int, c: int, r_total: int):
    """Per roi: dF_window += WyT @ M, where M[i, x*C+c] = sum_j Wx[j,x] g[i,j,c].

    grad level buffers are aliased inputs/outputs in HBM; the grid is
    sequential on one core, so read-modify-write windows cannot race, but the
    accumulate must fully serialize (read wait -> add -> write wait).
    """
    # arg order: inputs (g, aliased grad-ins), outputs (grad-outs), scratch.
    # The aliased output refs are the live buffers for read-modify-write.
    g_ref = refs[0]
    grad_refs = refs[1 + num_levels:1 + 2 * num_levels]
    win, wy_scr, wx_scr, m_scr, sem = refs[1 + 2 * num_levels:]

    r = pl.program_id(0)
    s = sampling_ratio

    def window_copy(ridx, lref, src_is_hbm):
        y0 = pl.multiple_of(int_ref[ridx, 1], 8)
        x0c = pl.multiple_of(int_ref[ridx, 2], 128)
        window = lref.at[pl.ds(y0, WIN_Y), pl.ds(x0c, WIN_X * c)]
        if src_is_hbm:
            return pltpu.make_async_copy(window, win, sem)
        return pltpu.make_async_copy(win, window, sem)

    active = int_ref[r, 3] > 0

    @pl.when(active)
    def _():
        # read current grad window
        for li in range(num_levels):
            @pl.when(int_ref[r, 0] == li)
            def _():
                cp = window_copy(r, grad_refs[li], True)
                cp.start()
                cp.wait()

        def accum_weights(scr, start, binsz, lo_b, hi_b, rlo, rhi, width):
            cells = jax.lax.broadcasted_iota(
                jnp.int32, (out_size, width), 1).astype(jnp.float32)
            bins = jax.lax.broadcasted_iota(
                jnp.int32, (out_size, width), 0).astype(jnp.float32)
            in_range = jnp.where((cells >= rlo) & (cells < rhi), 1.0, 0.0)
            inv_s = 1.0 / s
            acc = jnp.zeros((out_size, width), jnp.float32)
            for p in range(s):
                coord = start + (bins + (p + 0.5) * inv_s) * binsz
                inside = jnp.where((coord >= lo_b - 1.0) & (coord <= hi_b),
                                   1.0, 0.0)
                cc = jnp.clip(coord, lo_b, hi_b - 1.0)
                lo = jnp.floor(cc)
                frac = cc - lo
                hi = jnp.minimum(lo + 1.0, hi_b - 1.0)
                acc = acc + inside * inv_s * (
                    jnp.where(cells == lo, 1.0 - frac, 0.0)
                    + jnp.where(cells == hi, frac, 0.0))
            scr[:, :] = acc * in_range

        f = lambda k: flt_ref[r, k]
        accum_weights(wy_scr, f(_F_Y1), f(_F_BH), f(_F_YLO), f(_F_YHI),
                      f(_F_YRLO), f(_F_YRHI), WIN_Y)
        accum_weights(wx_scr, f(_F_X1), f(_F_BW), f(_F_XLO), f(_F_XHI),
                      f(_F_XRLO), f(_F_XRHI), WIN_X)
        validf = f(_F_VALID)

        # M[i, x*C + c] = sum_j Wx[j, x] * g[i, j, c]   (m_scr: (8, WIN_X*C))
        for i in range(out_size):
            for x in range(WIN_X):
                acc = jnp.zeros((1, c), jnp.float32)
                for j in range(out_size):
                    gij = g_ref[0, i * out_size + j:i * out_size + j + 1, :]
                    acc = acc + wx_scr[j, x] * gij.astype(jnp.float32)
                m_scr[i:i + 1, x * c:(x + 1) * c] = acc * validf
        for i in range(out_size, m_scr.shape[0]):
            m_scr[i:i + 1, :] = jnp.zeros((1, WIN_X * c), jnp.float32)

        # dW = WyT @ M : (WIN_Y, P) @ (P, WIN_X*C)
        wy_t = wy_scr[:, :]                       # (P, WIN_Y)
        dw = jax.lax.dot_general(
            wy_t.astype(jnp.float32), m_scr[:out_size, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (WIN_Y, WIN_X*C)
        win[:, :] = win[:, :] + dw.astype(win.dtype)

        # write back
        for li in range(num_levels):
            @pl.when(int_ref[r, 0] == li)
            def _():
                cp = window_copy(r, grad_refs[li], False)
                cp.start()
                cp.wait()


def multilevel_roi_align_bwd_pallas(
    feature_shapes, g, rois, strides, *, output_size=7, sampling_ratio=2,
    min_level=2, canonical_scale=224.0, canonical_level=4, roi_valid=None,
    interpret=False, dtype=jnp.float32,
):
    """Gradient wrt features. feature_shapes: [(H_l, W_l)] (C from g).

    Returns a list of (H_l, W_l, C) grads (no roi gradient — reference
    semantics: RoIAlign's CUDA backward only produces feature grads).
    """
    r_total = rois.shape[0]
    c = g.shape[-1]
    num_levels = len(feature_shapes)

    if num_levels == 1:
        levels = jnp.zeros((r_total,), jnp.int32)
    else:
        levels = fpn_level_assign(
            rois, min_level=min_level, max_level=min_level + num_levels - 1,
            canonical_scale=canonical_scale, canonical_level=canonical_level,
        ) - min_level
    if roi_valid is None:
        roi_valid = jnp.ones((r_total,), bool)

    padded_shapes = [( -(-max(h, WIN_Y) // 8) * 8, max(w, WIN_X)) for h, w in feature_shapes]
    grads = [jnp.zeros((hp, wp * c), dtype) for hp, wp in padded_shapes]

    h_arr = jnp.asarray([d[0] for d in feature_shapes], jnp.float32)[levels]
    w_arr = jnp.asarray([d[1] for d in feature_shapes], jnp.float32)[levels]
    hp_arr = jnp.asarray([p[0] for p in padded_shapes], jnp.float32)[levels]
    wp_arr = jnp.asarray([p[1] for p in padded_shapes], jnp.float32)[levels]
    stride_arr = jnp.asarray(strides, jnp.float32)[levels]

    scale = 1.0 / stride_arr
    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    roi_w = jnp.maximum(rois[:, 2] * scale - x1, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * scale - y1, 1.0)
    y0b = jnp.clip(jnp.floor(y1 / 8.0) * 8.0, 0, jnp.maximum(hp_arr - WIN_Y, 0))
    x0b = jnp.clip(jnp.floor(x1), 0, jnp.maximum(wp_arr - WIN_X, 0))

    out_rows = -(-(output_size * output_size) // 8) * 8
    g_pad = jnp.pad(g.reshape(r_total, output_size * output_size, c),
                    ((0, 0), (0, out_rows - output_size * output_size), (0, 0)))

    def pass_scalars(py, px):
        range_y0 = y0b + py * WIN_Y
        range_x0 = x0b + px * WIN_X
        sy = jnp.clip(range_y0, 0, jnp.maximum(hp_arr - WIN_Y, 0))
        sx = jnp.clip(range_x0, 0, jnp.maximum(wp_arr - WIN_X, 0))
        need_y = (y1 + roi_h + 1.0) >= range_y0 if py else jnp.ones_like(y1, bool)
        need_x = (x1 + roi_w + 1.0) >= range_x0 if px else jnp.ones_like(x1, bool)
        exists = (range_y0 < h_arr) & (range_x0 < w_arr)
        active = roi_valid & need_y & need_x & exists
        ints = jnp.stack([
            levels, sy.astype(jnp.int32), sx.astype(jnp.int32) * c,
            active.astype(jnp.int32)], axis=1)
        flts = jnp.stack([
            y1 - sy, x1 - sx,
            roi_h / output_size, roi_w / output_size,
            -sy, h_arr - sy,
            -sx, w_arr - sx,
            roi_valid.astype(jnp.float32),
            range_y0 - sy, range_y0 - sy + WIN_Y,
            range_x0 - sx, range_x0 - sx + WIN_X,
        ], axis=1)
        return ints, flts, active

    def run(grads, ints, flts, g_in, n):
        for lo in range(0, n, _CHUNK):
            hi = min(lo + _CHUNK, n)
            m = hi - lo
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(m,),
                in_specs=[pl.BlockSpec((1, out_rows, c), lambda r, *_: (r, 0, 0),
                                       memory_space=pltpu.VMEM)]
                + [pl.BlockSpec(memory_space=pltpu.HBM)] * num_levels,
                out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * num_levels,
                scratch_shapes=[
                    pltpu.VMEM((WIN_Y, WIN_X * c), dtype),
                    pltpu.VMEM((output_size, WIN_Y), jnp.float32),
                    pltpu.VMEM((output_size, WIN_X), jnp.float32),
                    # rows padded to a sublane multiple; supports any
                    # output_size (the mask branch uses 14)
                    pltpu.VMEM((-(-output_size // 8) * 8, WIN_X * c),
                               jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            )
            grads = pl.pallas_call(
                functools.partial(_bwd_kernel, num_levels=num_levels,
                                  out_size=output_size,
                                  sampling_ratio=sampling_ratio, c=c, r_total=m),
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct(gr.shape, gr.dtype) for gr in grads],
                input_output_aliases={3 + li: li for li in range(num_levels)},
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(ints[lo:hi], flts[lo:hi], g_in[lo:hi], *grads)
            if num_levels == 1 and not isinstance(grads, (list, tuple)):
                grads = [grads]
            grads = list(grads)
        return grads

    budget = min(r_total, max(64, -(-r_total // 8 // 8) * 8))
    for py in range(NUM_PASSES_Y):
        for px in range(NUM_PASSES_X):
            ints_p, flts_p, active = pass_scalars(py, px)
            if py == 0 and px == 0:
                grads = run(grads, ints_p, flts_p, g_pad, r_total)
            elif budget == r_total:
                grads = run(grads, ints_p, flts_p, g_pad, r_total)
            else:
                # budget overflow falls back to a full pass (same exactness
                # guarantee as the forward)
                n_act = jnp.sum(active.astype(jnp.int32))
                _, sel = jax.lax.top_k(active.astype(jnp.float32), budget)

                def compact(gs, ints_p=ints_p, flts_p=flts_p, sel=sel):
                    return tuple(run(list(gs), ints_p[sel], flts_p[sel],
                                     g_pad[sel], budget))

                def full(gs, ints_p=ints_p, flts_p=flts_p):
                    return tuple(run(list(gs), ints_p, flts_p, g_pad, r_total))

                grads = list(jax.lax.cond(
                    n_act <= budget, compact, full, tuple(grads)))

    out = []
    for (h, w), (hp, wp), gr in zip(feature_shapes, padded_shapes, grads):
        out.append(gr.reshape(hp, wp, c)[:h, :w, :])
    return out


# ---------------------------------------------------------------------------
# trainable (custom_vjp) batched entry point


def make_trainable_roi_align(strides, *, output_size=7, sampling_ratio=2,
                             min_level=2, canonical_scale=224.0,
                             canonical_level=4):
    """Batched RoIAlign with Pallas forward AND backward kernels.

    Signature of the returned fn: (features: list of (B,H,W,C), rois (B,R,4),
    roi_valid (B,R)) -> (B, R, P, P, C). Gradient flows to features only
    (reference CUDA semantics: no roi gradient). Batched with lax.map (the
    kernels' HBM operands don't support vmap batching).
    """
    strides = tuple(strides)
    kw = dict(output_size=output_size, sampling_ratio=sampling_ratio,
              min_level=min_level, canonical_scale=canonical_scale,
              canonical_level=canonical_level)

    @jax.custom_vjp
    def f(features, rois, roi_valid):
        def one(args):
            feats_i, rois_i, valid_i = args
            return multilevel_roi_align_pallas(
                list(feats_i), rois_i, strides, roi_valid=valid_i, **kw)
        return jax.lax.map(one, (tuple(features), rois, roi_valid))

    def fwd(features, rois, roi_valid):
        shapes = tuple(x.shape[1:3] for x in features)
        return f(features, rois, roi_valid), (shapes, rois, roi_valid)

    def bwd(res, g):
        shapes, rois, roi_valid = res
        out_dtype = g.dtype

        def one(args):
            g_i, rois_i, valid_i = args
            grads = multilevel_roi_align_bwd_pallas(
                list(shapes), g_i.astype(jnp.float32), rois_i, strides,
                roi_valid=valid_i, dtype=jnp.float32, **kw)
            return tuple(gr.astype(out_dtype) for gr in grads)

        feat_grads = jax.lax.map(one, (g, rois, roi_valid))
        return (list(feat_grads), jnp.zeros_like(rois),
                jnp.zeros(roi_valid.shape, out_dtype))

    f.defvjp(fwd, bwd)
    return f
