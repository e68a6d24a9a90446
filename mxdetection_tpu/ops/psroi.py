"""Position-sensitive RoI pooling (PSRoIPool) and its deformable variant.

Reference equivalents: MXNet's native CUDA ``PSROIPooling`` (R-FCN) and
``contrib.DeformablePSROIPooling`` (the deformable PSRoIPool named alongside
DeformableConvolution in the DCN family; SURVEY.md §2.2 "Deformable conv"
row). The CUDA kernels launch one thread per output element; each bin (i, j)
of the p x p output grid reads ONLY its own channel group
``(i*p + j) * c : (i*p + j + 1) * c`` of the position-sensitive score map and
pools over the bin's spatial extent. The deformable variant additionally
shifts every bin by a learned normalized offset scaled by
``trans_std * (roi_w, roi_h)`` and samples bilinearly (DCN paper eq. 3-4).

TPU re-design: no per-element threads. The (H, W, p*p*c) score map is
re-laid-out once to a flat (p*p*H*W, c) buffer so a SINGLE XLA gather serves
every (roi, bin, sample point) — the bin's channel-group selection becomes
part of the gather index (group * H*W + y * W + x) instead of a strided read,
keeping shapes static and letting XLA batch the whole thing onto the VPU.
Sampling follows the family's aligned convention (RoIAlign-style s x s
bilinear sample points per bin, averaged) rather than the legacy
integer-pixel average of the oldest CUDA kernel — same convention the
in-tree RoIAlign uses, exact under autodiff, and the one modern family
reimplementations standardized on (documented deviation, like RPN A-sigmoid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def psroi_pool(
    feature: Array,
    rois: Array,
    stride: int,
    *,
    output_size: int = 7,
    sampling_ratio: int = 2,
    offsets: Array | None = None,
    trans_std: float = 0.1,
    roi_valid: Array | None = None,
    impl: str | None = None,
) -> Array:
    """Position-sensitive RoI pooling, optionally deformable.

    feature: (H, W, p*p*c) position-sensitive score map, channel layout
        group-major — channel ``(i*p + j)*c + k`` belongs to output bin
        (i, j), consistent with the CUDA kernels' ``ctop`` ordering.
    rois: (R, 4) xyxy in image coordinates (padded rows allowed).
    stride: feature stride vs image (spatial_scale = 1/stride).
    offsets: optional (R, p, p, 2) normalized per-bin (dy, dx) offsets; the
        applied shift is ``trans_std * offset * (roi_h, roi_w)`` in image
        units (DeformablePSROIPooling semantics). None = plain PSRoIPool.
    roi_valid: optional (R,) bool; invalid rows are zeroed.
    impl: "gather" (flat-gather formulation, the original golden path),
        "dense" (separable-profile matmul formulation — same math, no
        gather/scatter anywhere, so its autodiff backward is matmuls too),
        or None = dense on TPU, gather elsewhere. The dense path exists
        because the gather path's VJP lowers to XLA:TPU scatter-adds that
        dominate the R-FCN train step (295 of 402 ms at batch 8; see
        BASELINE.md round 5).

    Returns (R, p, p, c) float32-accumulated output in the feature dtype.
    """
    if impl is None:
        impl = "dense" if jax.default_backend() == "tpu" else "gather"
    if impl == "dense":
        return _psroi_pool_dense(
            feature, rois, stride, output_size=output_size,
            sampling_ratio=sampling_ratio, offsets=offsets,
            trans_std=trans_std, roi_valid=roi_valid)
    h, w, c_full = feature.shape
    p = output_size
    s = sampling_ratio
    if c_full % (p * p) != 0:
        raise ValueError(
            f"feature channels {c_full} not divisible by output_size^2 {p*p}")
    c = c_full // (p * p)
    dtype = feature.dtype

    # One-time relayout: (H, W, p*p, c) -> (p*p, H*W, c) -> (p*p*H*W, c) so a
    # single gather index g*H*W + y*W + x selects bin-group g at pixel (y, x).
    flat = feature.reshape(h * w, p * p, c).transpose(1, 0, 2).reshape(-1, c)

    scale = 1.0 / float(stride)
    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    roi_w = jnp.maximum(rois[:, 2] * scale - x1, 1.0)  # (R,)
    roi_h = jnp.maximum(rois[:, 3] * scale - y1, 1.0)
    bin_w = roi_w / p
    bin_h = roi_h / p

    # Per-(bin, sample) fractional positions in bin units: (p, s).
    frac = (jnp.arange(p, dtype=jnp.float32)[:, None]
            + (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s)

    # Full (R, p, p, s, s) coordinates — not separable once per-bin offsets
    # couple y to the bin column, so build the joint grid directly.
    ys = (y1[:, None] + frac.reshape(-1)[None, :] * bin_h[:, None])  # (R, p*s)
    xs = (x1[:, None] + frac.reshape(-1)[None, :] * bin_w[:, None])
    ys = ys.reshape(-1, p, 1, s, 1) * jnp.ones((1, 1, p, 1, s), jnp.float32)
    xs = xs.reshape(-1, 1, p, 1, s) * jnp.ones((1, p, 1, s, 1), jnp.float32)

    if offsets is not None:
        dy = offsets[..., 0].astype(jnp.float32) * trans_std * roi_h[:, None, None]
        dx = offsets[..., 1].astype(jnp.float32) * trans_std * roi_w[:, None, None]
        ys = ys + dy[:, :, :, None, None]
        xs = xs + dx[:, :, :, None, None]

    def weights(coord, size):
        inside = (coord >= -1.0) & (coord <= float(size))
        cc = jnp.clip(coord, 0.0, size - 1.0)
        lo = jnp.floor(cc)
        hi = jnp.minimum(lo + 1.0, size - 1.0)
        hi_w = cc - lo
        lo_w = 1.0 - hi_w
        zero = jnp.zeros_like(lo_w)
        return (lo.astype(jnp.int32), hi.astype(jnp.int32),
                jnp.where(inside, lo_w, zero), jnp.where(inside, hi_w, zero))

    y_lo, y_hi, wy_lo, wy_hi = weights(ys, h)  # (R, p, p, s, s)
    x_lo, x_hi, wx_lo, wx_hi = weights(xs, w)

    # Bin-group base index, broadcast over rois and sample points.
    group = (jnp.arange(p, dtype=jnp.int32)[:, None] * p
             + jnp.arange(p, dtype=jnp.int32)[None, :])  # (p, p)
    base = (group * (h * w))[None, :, :, None, None]

    def gather(yi, xi):
        return flat[base + yi * w + xi]  # (R, p, p, s, s, c)

    val = (gather(y_lo, x_lo) * (wy_lo * wx_lo)[..., None].astype(dtype)
           + gather(y_lo, x_hi) * (wy_lo * wx_hi)[..., None].astype(dtype)
           + gather(y_hi, x_lo) * (wy_hi * wx_lo)[..., None].astype(dtype)
           + gather(y_hi, x_hi) * (wy_hi * wx_hi)[..., None].astype(dtype))
    out = jnp.mean(val.astype(jnp.float32), axis=(3, 4))  # (R, p, p, c)

    if roi_valid is not None:
        out = jnp.where(roi_valid[:, None, None, None], out, 0.0)
    return out.astype(dtype)


def _axis_profile(coords: Array, size: int) -> Array:
    """coords (..., s) sample positions along one axis -> (..., size) dense
    weight profile: the sum over sample points of the clamped bilinear tent.

    Exactly the gather path's ``weights()`` taps (same inside test, clip,
    floor, border clamp), expressed against the full index range with
    equality indicators instead of gathered indices. Autodiff matches the
    gather path too: the indicators are constants, the gradient rides the
    lo/hi tap weights (d/dcc = -1/+1)."""
    inside = (coords >= -1.0) & (coords <= float(size))
    cc = jnp.clip(coords, 0.0, size - 1.0)
    lo = jnp.floor(cc)
    hi = jnp.minimum(lo + 1.0, size - 1.0)
    hi_w = cc - lo
    lo_w = 1.0 - hi_w
    zero = jnp.zeros_like(lo_w)
    lo_w = jnp.where(inside, lo_w, zero)
    hi_w = jnp.where(inside, hi_w, zero)
    grid = jnp.arange(size, dtype=jnp.float32)
    eq_lo = (lo[..., None] == grid).astype(jnp.float32)
    eq_hi = (hi[..., None] == grid).astype(jnp.float32)
    return jnp.sum(lo_w[..., None] * eq_lo + hi_w[..., None] * eq_hi, axis=-2)


def _psroi_pool_dense(
    feature: Array,
    rois: Array,
    stride: int,
    *,
    output_size: int,
    sampling_ratio: int,
    offsets: Array | None,
    trans_std: float,
    roi_valid: Array | None,
) -> Array:
    """Separable-profile PSRoIPool: per bin-group matmul contractions.

    Each bin's s x s sample grid is cartesian, so its pooled value factors
    into row/column tent profiles:  out[r, ij, c] =
    sum_{y,x} Y[r, ij, y] * X[r, ij, x] * B[ij, y, x, c]  — with Y/X the
    closed-form dense profiles of ``_axis_profile`` (cross terms between the
    per-axis sample sums are exactly the cartesian sample points, so this is
    the SAME sum as the gather formulation, reassociated). A ``lax.scan``
    over the p^2 bin groups contracts (R, H) @ (H, W*c) on the MXU and then
    does a VPU-weighted reduce over x — no gather in the forward and, under
    autodiff, no scatter in the backward (dB/dY/dX are matmuls; offset grads
    flow through the profile tap weights). The per-bin offsets couple the y
    profile to the bin column, which only means Y/X carry a full (p, p) bin
    index — the separability within each bin is untouched.
    """
    h, w, c_full = feature.shape
    p = output_size
    s = sampling_ratio
    if c_full % (p * p) != 0:
        raise ValueError(
            f"feature channels {c_full} not divisible by output_size^2 {p*p}")
    c = c_full // (p * p)
    dtype = feature.dtype
    r = rois.shape[0]

    scale = 1.0 / float(stride)
    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    roi_w = jnp.maximum(rois[:, 2] * scale - x1, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * scale - y1, 1.0)
    bin_w = roi_w / p
    bin_h = roi_h / p
    frac = (jnp.arange(p, dtype=jnp.float32)[:, None]
            + (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s)  # (p, s)

    ys = y1[:, None, None] + frac[None] * bin_h[:, None, None]   # (R, p_i, s)
    xs = x1[:, None, None] + frac[None] * bin_w[:, None, None]   # (R, p_j, s)
    ys = jnp.broadcast_to(ys[:, :, None, :], (r, p, p, s))
    xs = jnp.broadcast_to(xs[:, None, :, :], (r, p, p, s))
    if offsets is not None:
        dy = offsets[..., 0].astype(jnp.float32) * trans_std * roi_h[:, None, None]
        dx = offsets[..., 1].astype(jnp.float32) * trans_std * roi_w[:, None, None]
        ys = ys + dy[..., None]
        xs = xs + dx[..., None]

    prof_y = _axis_profile(ys, h)                          # (R, p, p, H)
    prof_x = _axis_profile(xs, w) / float(s * s)           # fold the mean in

    # relayout (H, W, p*p*c) -> (p*p, H, W*c); profiles to group-major
    bmap = feature.reshape(h, w, p * p, c).transpose(2, 0, 1, 3)
    bmap = bmap.reshape(p * p, h, w * c)
    yg = prof_y.reshape(r, p * p, h).transpose(1, 0, 2)    # (p*p, R, H)
    xg = prof_x.reshape(r, p * p, w).transpose(1, 0, 2)    # (p*p, R, W)

    def step(carry, gyx):
        bg, ygi, xgi = gyx   # (H, W*c), (R, H), (R, W)
        t = jax.lax.dot_general(
            ygi.astype(dtype), bg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (R, W*c) f32
        out_g = jnp.sum(xgi[..., None] * t.reshape(r, w, c), axis=1)  # (R, c)
        return carry, out_g

    # checkpoint: the backward recomputes t instead of saving an
    # (R, W*c) f32 residual per group (the cascade-DCN HBM lesson)
    _, outs = jax.lax.scan(jax.checkpoint(step), None, (bmap, yg, xg))
    out = outs.transpose(1, 0, 2).reshape(r, p, p, c)

    if roi_valid is not None:
        out = jnp.where(roi_valid[:, None, None, None], out, 0.0)
    return out.astype(dtype)
