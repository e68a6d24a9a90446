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

The backward is the transpose of the same factorization and is just as
matmul-shaped:  dF[y, x, c] += Wy[i, y] * Wx[j, x] * g[i, j, c]  becomes
A = Wy^T @ g  (one MXU contraction over the bin-row index) followed by a
lane-sliced x-scatter of A into the roi's window — the same op count as the
forward's step 2. (An earlier formulation materialized an intermediate M via
a triply-unrolled P*WIN_X*P slice loop — ~2.4k Mosaic ops per kernel — which
made kernel compiles pathologically slow; the factorized form is ~7x fewer
ops and compiles in seconds.)

Both directions are BATCHED over images natively: scalar prefetch rows carry
an image index and every window DMA addresses ``feature.at[img, ...]``, so
one kernel launch serves the whole (B*R) roi set — no ``lax.map`` / ``vmap``
wrapper, one drain queue, one compile.

Window coverage: FPN level assignment bounds sqrt(w*h) but NOT the max side,
so extreme-aspect rois can exceed one window axis. Coverage is therefore
multi-pass: pass (py, px) covers the disjoint cell range
[y0 + py*WIN_Y, y0 + (py+1)*WIN_Y) x [x0 + px*WIN_X, ...), with weights
masked to that range (contributions are additive across passes, so outputs
simply sum). Rois that don't reach a pass's range skip its DMA and compute
entirely, so extra passes are nearly free. 2x3 passes cover 112x144 cells —
aspect ratios beyond that are truncated (documented; beyond any COCO box).
All extra-pass work items share ONE compacted drain queue; if it overflows
its budget a full-length fallback pass runs, so results are exact for any
roi distribution.

Grid = one program per (image, roi), double-buffered: item k+1's window DMA
overlaps item k's compute. Mosaic constraints shape the code: no in-kernel
reshapes (levels are pre-flattened to (B, H, W*C)), dynamic DMA row offsets
8-aligned (pl.multiple_of), lane offsets C-aligned.
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

# Window sizing: FPN level assignment bounds sqrt-extent to <=28 cells for
# levels 2-4 (x-span <=30 incl. the +1 bilinear tap; y-span <=37 after 8-row
# origin alignment), so a 40x32 window covers typical rois in ONE pass and
# costs 2.4x less DMA than the former worst-case 56x48 window (the DMA is the
# whole cost of this kernel: fwd 1.38MB -> 0.66MB/roi at C=256 bf16). Only
# level-5 rois beyond ~30 cells and extreme aspects spill into the coverage
# passes (3x5 passes = 120x160 cells total, strictly more than the former
# 112x144).
WIN_X = 32
WIN_Y = 40
NUM_PASSES_Y = 3
NUM_PASSES_X = 5
_CHUNK = 4096  # cap grid steps per kernel launch (SMEM prefetch budget)

# Scalar prefetch operands are stored TRANSPOSED, (num_cols, N): SMEM arrays
# are lane-padded, so an (N, 5) layout burns 128 lanes per roi (~1KB/step,
# SMEM-OOM beyond ~512 steps) while (5, N) pads only the 5 rows to a sublane
# multiple (~8B/step) — 16x more grid steps per launch.

# int scalar layout per roi (int_ref columns)
_I_LVL, _I_SY, _I_SXC, _I_ACT, _I_IMG = 0, 1, 2, 3, 4
_NUM_I = 5

# float scalar layout per roi (flt_ref columns)
_F_Y1, _F_X1, _F_BH, _F_BW = 0, 1, 2, 3
_F_YLO, _F_YHI, _F_XLO, _F_XHI = 4, 5, 6, 7
_F_VALID = 8
_F_YRLO, _F_YRHI, _F_XRLO, _F_XRHI = 9, 10, 11, 12
_NUM_F = 13


def _accum_weights(scr, start, binsz, lo_b, hi_b, rlo, rhi, width, out_size, s):
    """Per-bin averaged bilinear weights, masked to this pass's cell range.

    Fully vectorized over (bin, cell): ~12 VPU ops per sample point.
    """
    cells = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, width), 1).astype(jnp.float32)
    bins = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, width), 0).astype(jnp.float32)
    in_range = jnp.where((cells >= rlo) & (cells < rhi), 1.0, 0.0)
    inv_s = 1.0 / s
    acc = jnp.zeros((out_size, width), jnp.float32)
    for p in range(s):
        coord = start + (bins + (p + 0.5) * inv_s) * binsz  # (P, W)
        inside = jnp.where((coord >= lo_b - 1.0) & (coord <= hi_b), 1.0, 0.0)
        cc = jnp.clip(coord, lo_b, hi_b - 1.0)
        lo = jnp.floor(cc)
        frac = cc - lo
        hi = jnp.minimum(lo + 1.0, hi_b - 1.0)
        acc = acc + inside * inv_s * (
            jnp.where(cells == lo, 1.0 - frac, 0.0)
            + jnp.where(cells == hi, frac, 0.0))
    scr[:, :] = acc * in_range


def _kernel(int_ref, flt_ref, *refs, num_levels: int, out_size: int,
            sampling_ratio: int, c: int, r_total: int):
    level_refs = refs[:num_levels]
    out_ref = refs[num_levels]
    win, wy_scr, wx_scr, sems = refs[num_levels + 1:]

    r = pl.program_id(0)
    s = sampling_ratio

    def make_dma(slot, ridx, lref):
        y0 = pl.multiple_of(int_ref[_I_SY, ridx], 8)
        x0c = pl.multiple_of(int_ref[_I_SXC, ridx], 128)
        img = int_ref[_I_IMG, ridx]
        return pltpu.make_async_copy(
            lref.at[img, pl.ds(y0, WIN_Y), pl.ds(x0c, WIN_X * c)],
            win.at[slot], sems.at[slot])

    def start_dma(slot, ridx):
        @pl.when(int_ref[_I_ACT, ridx] > 0)  # skipped passes don't DMA
        def _():
            lvl = int_ref[_I_LVL, ridx]
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

    active = int_ref[_I_ACT, r] > 0

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:, :, :] = jnp.zeros_like(out_ref)

    @pl.when(active)
    def _():
        make_dma(cur, r, level_refs[0]).wait()

        f = lambda k: flt_ref[k, r]
        _accum_weights(wy_scr, f(_F_Y1), f(_F_BH), f(_F_YLO), f(_F_YHI),
                       f(_F_YRLO), f(_F_YRHI), WIN_Y, out_size, s)
        _accum_weights(wx_scr, f(_F_X1), f(_F_BW), f(_F_XLO), f(_F_XHI),
                       f(_F_XRLO), f(_F_XRHI), WIN_X, out_size, s)
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


def _pad_levels(features_b: Sequence[Array]) -> tuple[list, list]:
    """Pad (B, H, W, C) levels to window/sublane minima, flatten to (B, H, W*C)."""
    padded, dims = [], []
    for feat in features_b:
        b, h, w, c = feat.shape
        dims.append((h, w))
        ph = -(-max(h, WIN_Y) // 8) * 8 - h
        pw = max(WIN_X - w, 0)
        if ph or pw:
            feat = jnp.pad(feat, ((0, 0), (0, ph), (0, pw), (0, 0)))
        padded.append(feat.reshape(b, feat.shape[1], feat.shape[2] * c))
    return padded, dims


class _RoiScalars:
    """Flattened per-(image, roi) scalar prep shared by fwd and bwd."""

    def __init__(self, dims, padded_hw, rois_b, levels_f, valid_f, strides,
                 output_size, c):
        b, r = rois_b.shape[:2]
        rois = rois_b.reshape(b * r, 4)
        self.img = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        self.levels = levels_f
        self.valid = valid_f
        self.c = c
        self.output_size = output_size

        self.h_arr = jnp.asarray([d[0] for d in dims], jnp.float32)[levels_f]
        self.w_arr = jnp.asarray([d[1] for d in dims], jnp.float32)[levels_f]
        self.hp_arr = jnp.asarray([p[0] for p in padded_hw], jnp.float32)[levels_f]
        self.wp_arr = jnp.asarray([p[1] for p in padded_hw], jnp.float32)[levels_f]
        stride_arr = jnp.asarray(strides, jnp.float32)[levels_f]

        scale = 1.0 / stride_arr
        self.x1 = rois[:, 0] * scale
        self.y1 = rois[:, 1] * scale
        self.roi_w = jnp.maximum(rois[:, 2] * scale - self.x1, 1.0)
        self.roi_h = jnp.maximum(rois[:, 3] * scale - self.y1, 1.0)
        # base (pass 0) window origin; rows 8-aligned for the DMA
        self.y0b = jnp.clip(jnp.floor(self.y1 / 8.0) * 8.0, 0,
                            jnp.maximum(self.hp_arr - WIN_Y, 0))
        self.x0b = jnp.clip(jnp.floor(self.x1), 0,
                            jnp.maximum(self.wp_arr - WIN_X, 0))

    def pass_scalars(self, py, px):
        """Scalar arrays + active mask for coverage pass (py, px)."""
        range_y0 = self.y0b + py * WIN_Y
        range_x0 = self.x0b + px * WIN_X
        # DMA origin (clipped into the level; weight range masking keeps the
        # covered cell set disjoint across passes)
        sy = jnp.clip(range_y0, 0, jnp.maximum(self.hp_arr - WIN_Y, 0))
        sx = jnp.clip(range_x0, 0, jnp.maximum(self.wp_arr - WIN_X, 0))
        one = jnp.ones_like(self.y1, bool)
        need_y = (self.y1 + self.roi_h + 1.0) >= range_y0 if py else one
        need_x = (self.x1 + self.roi_w + 1.0) >= range_x0 if px else one
        exists = (range_y0 < self.h_arr) & (range_x0 < self.w_arr)
        active = self.valid & need_y & need_x & exists
        ints = jnp.stack([
            self.levels, sy.astype(jnp.int32),
            sx.astype(jnp.int32) * self.c,
            active.astype(jnp.int32), self.img], axis=0)
        flts = jnp.stack([
            self.y1 - sy, self.x1 - sx,
            self.roi_h / self.output_size, self.roi_w / self.output_size,
            -sy, self.h_arr - sy,
            -sx, self.w_arr - sx,
            self.valid.astype(jnp.float32),
            range_y0 - sy, range_y0 - sy + WIN_Y,
            range_x0 - sx, range_x0 - sx + WIN_X,
        ], axis=0)
        return ints, flts, active


def _flat_levels(features_or_shapes, rois_b, num_levels, min_level,
                 canonical_scale, canonical_level, roi_valid):
    b, r = rois_b.shape[:2]
    rois = rois_b.reshape(b * r, 4)
    if num_levels == 1:
        levels = jnp.zeros((b * r,), jnp.int32)
    else:
        levels = fpn_level_assign(
            rois, min_level=min_level, max_level=min_level + num_levels - 1,
            canonical_scale=canonical_scale, canonical_level=canonical_level,
        ) - min_level
    if roi_valid is None:
        roi_valid = jnp.ones((b, r), bool)
    return levels, roi_valid.reshape(b * r)


@functools.partial(
    jax.jit,
    static_argnames=("strides", "output_size", "sampling_ratio", "min_level",
                     "canonical_scale", "canonical_level", "interpret"))
def multilevel_roi_align_pallas_batched(
    features_b: Sequence[Array],
    rois_b: Array,
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
    """Image-batched forward: features (B, H_l, W_l, C), rois (B, R, 4)
    -> (B, R, P, P, C). One kernel launch (chunked) for the whole batch."""
    num_levels = len(features_b)
    c = features_b[0].shape[-1]
    assert c % 128 == 0, "channel count must be lane-aligned for the kernel"
    b, r = rois_b.shape[:2]
    n_total = b * r
    dtype = features_b[0].dtype

    levels, valid_f = _flat_levels(features_b, rois_b, num_levels, min_level,
                                   canonical_scale, canonical_level, roi_valid)
    padded, dims = _pad_levels(features_b)
    padded_hw = [(p.shape[1], p.shape[2] // c) for p in padded]
    sc = _RoiScalars(dims, padded_hw, rois_b, levels, valid_f, strides,
                     output_size, c)

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
            )(ints[:, lo:hi], flts[:, lo:hi], *padded))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    # base pass: every roi
    ints0, flts0, _ = sc.pass_scalars(0, 0)
    total = run_kernel(ints0, flts0, n_total)

    # Extra coverage passes (wide/tall rois only; FPN level assignment makes
    # them rare — aspect ratio must exceed ~5). All (roi, pass) work items
    # from every extra pass go into ONE combined queue; a while_loop drains
    # it budget-at-a-time with compaction + scatter-add. Exact for ANY roi
    # distribution (no silent truncation) and free when nothing is active
    # (zero loop iterations).
    ints_l, flts_l, act_l = [], [], []
    for py in range(NUM_PASSES_Y):
        for px in range(NUM_PASSES_X):
            if py == 0 and px == 0:
                continue
            i_p, f_p, a_p = sc.pass_scalars(py, px)
            ints_l.append(i_p)
            flts_l.append(f_p)
            act_l.append(a_p)
    n_pass = len(ints_l)
    ints_all = jnp.concatenate(ints_l, axis=1)      # (_NUM_I, n_pass*N)
    flts_all = jnp.concatenate(flts_l, axis=1)      # (_NUM_F, n_pass*N)
    act_all = jnp.concatenate(act_l, axis=0)        # (n_pass*N,)
    roi_idx = jnp.tile(jnp.arange(n_total), n_pass)

    budget = min(n_pass * n_total, max(64, -(-n_total // 4 // 8) * 8))
    max_iters = -(-(n_pass * n_total) // budget)

    def body(state):
        tot, act, it = state
        _, sel = jax.lax.top_k(act.astype(jnp.float32), budget)
        # rows selected as padding carry active=0 -> kernel outputs zeros;
        # already-drained rows are masked the same way
        sel_ints = ints_all[:, sel].at[_I_ACT, :].min(act[sel].astype(jnp.int32))
        part = run_kernel(sel_ints, flts_all[:, sel], budget)
        tot = tot.at[roi_idx[sel]].add(part)  # dup roi indices accumulate
        act = act & ~jnp.zeros_like(act).at[sel].set(True)
        return tot, act, it + 1

    def cond(state):
        _, act, it = state
        return jnp.any(act) & (it < max_iters)

    total, _, _ = jax.lax.while_loop(
        cond, body, (total, act_all, jnp.int32(0)))

    return total[:, :output_size * output_size, :].reshape(
        b, r, output_size, output_size, c)


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
    """Single-image API (contract of ``ops.roi_align.multilevel_roi_align``):
    features (H_l, W_l, C), rois (R, 4) -> (R, P, P, C)."""
    out = multilevel_roi_align_pallas_batched(
        [f[None] for f in features], rois[None], tuple(strides),
        output_size=output_size, sampling_ratio=sampling_ratio,
        min_level=min_level, canonical_scale=canonical_scale,
        canonical_level=canonical_level,
        roi_valid=None if roi_valid is None else roi_valid[None],
        interpret=interpret)
    return out[0]


# ---------------------------------------------------------------------------
# backward (training): dF accumulation via in-place window DMA


def _bwd_kernel(int_ref, flt_ref, *refs, num_levels: int, out_size: int,
                sampling_ratio: int, c: int, r_total: int):
    """Per roi: dF_window += Wx-scatter(Wy^T @ g).

    g arrives laid out (1, P_pad, P*C) (bin-row i on sublanes, (j, c) on
    lanes), so the y-contraction A[y, j*C+c] = sum_i Wy[i, y] g[i, j*C+c]
    is ONE MXU matmul and the x-step is the forward's 336-FMA loop run in
    reverse — no unrolled P*WIN_X*P intermediate (the old formulation's
    Mosaic-compile pathology).

    grad level buffers are aliased inputs/outputs in HBM; the grid is
    sequential on one core, so read-modify-write windows cannot race, but the
    accumulate must fully serialize (read wait -> add -> write wait).
    """
    # arg order: inputs (g, aliased grad-ins), outputs (grad-outs), scratch.
    # The aliased output refs are the live buffers for read-modify-write.
    g_ref = refs[0]
    grad_refs = refs[1 + num_levels:1 + 2 * num_levels]
    win, wy_scr, wx_scr, sem = refs[1 + 2 * num_levels:]

    r = pl.program_id(0)
    s = sampling_ratio

    def window_copy(ridx, lref, src_is_hbm):
        y0 = pl.multiple_of(int_ref[_I_SY, ridx], 8)
        x0c = pl.multiple_of(int_ref[_I_SXC, ridx], 128)
        img = int_ref[_I_IMG, ridx]
        window = lref.at[img, pl.ds(y0, WIN_Y), pl.ds(x0c, WIN_X * c)]
        if src_is_hbm:
            return pltpu.make_async_copy(window, win, sem)
        return pltpu.make_async_copy(win, window, sem)

    active = int_ref[_I_ACT, r] > 0

    @pl.when(active)
    def _():
        # read current grad window
        for li in range(num_levels):
            @pl.when(int_ref[_I_LVL, r] == li)
            def _():
                cp = window_copy(r, grad_refs[li], True)
                cp.start()
                cp.wait()

        f = lambda k: flt_ref[k, r]
        _accum_weights(wy_scr, f(_F_Y1), f(_F_BH), f(_F_YLO), f(_F_YHI),
                       f(_F_YRLO), f(_F_YRHI), WIN_Y, out_size, s)
        _accum_weights(wx_scr, f(_F_X1), f(_F_BW), f(_F_XLO), f(_F_XHI),
                       f(_F_XRLO), f(_F_XRHI), WIN_X, out_size, s)
        validf = f(_F_VALID)

        # step 1 (y-contraction): A = Wy^T @ g : (P, WIN_Y)^T-contracted with
        # (P, P*C) -> (WIN_Y, P*C), one MXU matmul
        g2 = g_ref[0, :out_size, :].astype(jnp.float32)
        a = jax.lax.dot_general(
            wy_scr[:, :], g2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * validf  # (WIN_Y, P*C)

        # step 2 (x-scatter): win[:, x*C:(x+1)*C] += sum_j Wx[j, x] * A_j
        for x in range(WIN_X):
            acc = jnp.zeros((WIN_Y, c), jnp.float32)
            for j in range(out_size):
                acc = acc + wx_scr[j, x] * a[:, j * c:(j + 1) * c]
            win[:, x * c:(x + 1) * c] = (
                win[:, x * c:(x + 1) * c] + acc.astype(win.dtype))

        # write back
        for li in range(num_levels):
            @pl.when(int_ref[_I_LVL, r] == li)
            def _():
                cp = window_copy(r, grad_refs[li], False)
                cp.start()
                cp.wait()


def _convert_pallas(x, out_dtype, *, interpret=False):
    """Elementwise dtype convert as a Pallas kernel, over (B, H, W*C) buffers.

    Exists ONLY as an XLA bf16-propagation firewall: when the backward's
    budget-overflow ``lax.cond`` (aliased Pallas accumulators in both
    branches) is consumed by a plain ``convert`` + reduction, XLA's bf16
    propagation rewrites the conditional's result type but cannot rewrite the
    aliased custom-call roots inside, and TPU AOT compilation fails with
    "Can't deep copy instruction branch_0_fun ... f32[...] vs bf16[...]".
    A custom call is opaque to that pass, so converting THROUGH a kernel pins
    the cond at f32. (``lax.optimization_barrier`` does not block the pass —
    measured.) Cost: one streaming read+write, ~free next to the bwd kernels.
    """
    b, hp, wpc = x.shape
    rows = 8

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(o_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(b, hp // rows),
        in_specs=[pl.BlockSpec((1, rows, wpc), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, wpc), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, out_dtype),
        interpret=interpret,
    )(x)


@functools.partial(
    jax.jit,
    static_argnames=("feature_shapes", "strides", "output_size",
                     "sampling_ratio", "min_level", "canonical_scale",
                     "canonical_level", "interpret", "dtype", "out_dtype"))
def multilevel_roi_align_bwd_pallas_batched(
    feature_shapes, g, rois_b, strides, *, output_size=7, sampling_ratio=2,
    min_level=2, canonical_scale=224.0, canonical_level=4, roi_valid=None,
    interpret=False, dtype=jnp.float32, out_dtype=None,
):
    """Image-batched gradient wrt features. feature_shapes: ((H_l, W_l), ...);
    g (B, R, P, P, C); rois (B, R, 4). Returns [(B, H_l, W_l, C), ...]
    (no roi gradient — reference semantics: RoIAlign's CUDA backward only
    produces feature grads)."""
    feature_shapes = tuple(feature_shapes)
    b, r = rois_b.shape[:2]
    n_total = b * r
    c = g.shape[-1]
    num_levels = len(feature_shapes)

    levels, valid_f = _flat_levels(feature_shapes, rois_b, num_levels,
                                   min_level, canonical_scale,
                                   canonical_level, roi_valid)

    padded_hw = [(-(-max(h, WIN_Y) // 8) * 8, max(w, WIN_X))
                 for h, w in feature_shapes]
    grads = [jnp.zeros((b, hp, wp * c), dtype) for hp, wp in padded_hw]

    sc = _RoiScalars(list(feature_shapes), padded_hw, rois_b, levels, valid_f,
                     strides, output_size, c)

    # g laid out (N, P_pad, P*C): bin-row i on sublanes (padded to the f32
    # sublane multiple), (j, c) interleaved on lanes — the y-contraction's
    # natural MXU layout
    p_pad = -(-output_size // 8) * 8
    g_mat = g.reshape(n_total, output_size, output_size * c)
    g_pad = jnp.pad(g_mat, ((0, 0), (0, p_pad - output_size), (0, 0)))

    def run(grads, ints, flts, g_in, n):
        for lo in range(0, n, _CHUNK):
            hi = min(lo + _CHUNK, n)
            m = hi - lo
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(m,),
                in_specs=[pl.BlockSpec((1, p_pad, output_size * c),
                                       lambda r, *_: (r, 0, 0),
                                       memory_space=pltpu.VMEM)]
                + [pl.BlockSpec(memory_space=pltpu.HBM)] * num_levels,
                out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * num_levels,
                scratch_shapes=[
                    pltpu.VMEM((WIN_Y, WIN_X * c), dtype),
                    pltpu.VMEM((output_size, WIN_Y), jnp.float32),
                    pltpu.VMEM((output_size, WIN_X), jnp.float32),
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
            )(ints[:, lo:hi], flts[:, lo:hi], g_in[lo:hi], *grads)
            if num_levels == 1 and not isinstance(grads, (list, tuple)):
                grads = [grads]
            grads = list(grads)
        return grads

    budget = min(n_total, max(64, -(-n_total // 8 // 8) * 8))
    for py in range(NUM_PASSES_Y):
        for px in range(NUM_PASSES_X):
            ints_p, flts_p, active = sc.pass_scalars(py, px)
            if py == 0 and px == 0:
                grads = run(grads, ints_p, flts_p, g_pad, n_total)
            elif budget == n_total:
                grads = run(grads, ints_p, flts_p, g_pad, n_total)
            else:
                # budget overflow falls back to a full pass (same exactness
                # guarantee as the forward)
                n_act = jnp.sum(active.astype(jnp.int32))
                _, sel = jax.lax.top_k(active.astype(jnp.float32), budget)

                def compact(gs, ints_p=ints_p, flts_p=flts_p, sel=sel):
                    sel_ints = ints_p[:, sel].at[_I_ACT, :].min(
                        active[sel].astype(jnp.int32))
                    return tuple(run(list(gs), sel_ints, flts_p[:, sel],
                                     g_pad[sel], budget))

                def full(gs, ints_p=ints_p, flts_p=flts_p):
                    return tuple(run(list(gs), ints_p, flts_p, g_pad, n_total))

                grads = list(jax.lax.cond(
                    n_act <= budget, compact, full, tuple(grads)))

    out = []
    for (h, w), (hp, wp), gr in zip(feature_shapes, padded_hw, grads):
        if out_dtype is not None and jnp.dtype(out_dtype) != gr.dtype:
            gr = _convert_pallas(gr, out_dtype, interpret=interpret)
        out.append(gr.reshape(b, hp, wp, c)[:, :h, :w, :])
    return out


def multilevel_roi_align_bwd_pallas(
    feature_shapes, g, rois, strides, *, output_size=7, sampling_ratio=2,
    min_level=2, canonical_scale=224.0, canonical_level=4, roi_valid=None,
    interpret=False, dtype=jnp.float32,
):
    """Single-image API: g (R, P, P, C), rois (R, 4) -> [(H_l, W_l, C), ...]."""
    out = multilevel_roi_align_bwd_pallas_batched(
        tuple(tuple(s) for s in feature_shapes), g[None], rois[None],
        tuple(strides), output_size=output_size, sampling_ratio=sampling_ratio,
        min_level=min_level, canonical_scale=canonical_scale,
        canonical_level=canonical_level,
        roi_valid=None if roi_valid is None else roi_valid[None],
        interpret=interpret, dtype=dtype)
    return [gr[0] for gr in out]


# ---------------------------------------------------------------------------
# trainable (custom_vjp) batched entry point


def make_trainable_roi_align(strides, *, output_size=7, sampling_ratio=2,
                             min_level=2, canonical_scale=224.0,
                             canonical_level=4):
    """Batched RoIAlign with Pallas forward AND backward kernels.

    Signature of the returned fn: (features: list of (B,H,W,C), rois (B,R,4),
    roi_valid (B,R)) -> (B, R, P, P, C). Gradient flows to features only
    (reference CUDA semantics: no roi gradient). Both directions are natively
    image-batched kernels — no per-image ``lax.map`` (whose composition with
    the old unrolled bwd kernel made batch>=4 compiles pathological).
    """
    strides = tuple(strides)
    kw = dict(output_size=output_size, sampling_ratio=sampling_ratio,
              min_level=min_level, canonical_scale=canonical_scale,
              canonical_level=canonical_level)

    @jax.custom_vjp
    def f(features, rois, roi_valid):
        return multilevel_roi_align_pallas_batched(
            list(features), rois, strides, roi_valid=roi_valid, **kw)

    def fwd(features, rois, roi_valid):
        shapes = tuple(x.shape[1:3] for x in features)
        return f(features, rois, roi_valid), (shapes, rois, roi_valid)

    def bwd(res, g):
        shapes, rois, roi_valid = res
        out_dtype = g.dtype
        # f32 accumulation; the f32->out_dtype cast happens INSIDE the jitted
        # backward through a Pallas convert kernel (see _convert_pallas for
        # why a plain astype here fails TPU AOT compilation)
        grads = multilevel_roi_align_bwd_pallas_batched(
            shapes, g.astype(jnp.float32), rois, strides,
            roi_valid=roi_valid, dtype=jnp.float32,
            out_dtype=jnp.dtype(out_dtype), **kw)
        return (list(grads),
                jnp.zeros_like(rois), jnp.zeros(roi_valid.shape, out_dtype))

    f.defvjp(fwd, bwd)
    return f
