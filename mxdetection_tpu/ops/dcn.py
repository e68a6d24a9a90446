"""Deformable convolution v1 — gather-interpolate im2col + MXU matmul.

Reference equivalent: ``mx.sym.contrib.DeformableConvolution`` backed by
``deformable_im2col.cuh`` / ``deformable_convolution.cu`` (CUDA). The CUDA
design builds an im2col buffer with one thread per (output position, tap)
doing a 4-point bilinear read, then calls cuBLAS. The TPU re-design keeps the
same two-phase shape — (1) bilinear gather of k*k sampled taps into patch
rows, (2) one big ``(H*W, k*k*Cin) x (k*k*Cin, Cout)`` matmul that lands on
the MXU — but expresses phase 1 as a vectorized XLA gather over a flattened
feature map (TPU-friendly: one gather, static shapes; SURVEY.md §7.3.3).

A Pallas variant of phase 1 lives in ``ops/pallas/dcn.py`` for when gather
latency dominates; phase 2 is always left to XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def deform_sample_patches(
    x: Array,
    offsets: Array,
    kernel: int = 3,
    stride: int = 1,
    dilation: int = 1,
) -> Array:
    """Deformable im2col: sample k*k bilinear taps per output position.

    x: (H, W, C); offsets: (Ho, Wo, 2*k*k) ordered (dy, dx) per tap,
    row-major taps (the reference kernel's layout). Returns
    (Ho, Wo, k*k*C) patch rows. Padding is implicit-zero (samples outside
    the map contribute 0), matching the CUDA behavior.
    """
    h, w, c = x.shape
    ho, wo = offsets.shape[0], offsets.shape[1]
    k = kernel
    pad = dilation * (k - 1) // 2

    # base sampling grid: out position (i, j), tap (r, s)
    out_y = jnp.arange(ho, dtype=jnp.float32) * stride
    out_x = jnp.arange(wo, dtype=jnp.float32) * stride
    tap_y = (jnp.arange(k, dtype=jnp.float32) * dilation - pad)
    tap_x = (jnp.arange(k, dtype=jnp.float32) * dilation - pad)
    base_y = out_y[:, None, None, None] + tap_y[None, None, :, None]  # (Ho,1,k,1)
    base_x = out_x[None, :, None, None] + tap_x[None, None, None, :]  # (1,Wo,1,k)

    off = offsets.reshape(ho, wo, k, k, 2)
    sy = base_y + off[..., 0]  # (Ho, Wo, k, k)
    sx = base_x + off[..., 1]

    # bilinear gather with zero padding outside [0, H-1] x [0, W-1]
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    ly = sy - y0
    lx = sx - x0

    def tap(yi, xi, wgt):
        inb = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = x.reshape(-1, c)[yc * w + xc]  # (Ho, Wo, k, k, C)
        return vals * (wgt * inb.astype(wgt.dtype))[..., None]

    acc = (
        tap(y0, x0, (1 - ly) * (1 - lx))
        + tap(y0, x0 + 1, (1 - ly) * lx)
        + tap(y0 + 1, x0, ly * (1 - lx))
        + tap(y0 + 1, x0 + 1, ly * lx)
    )
    return acc.reshape(ho, wo, k * k * c)


def deform_conv2d(
    x: Array,
    offsets: Array,
    weight: Array,
    bias: Array | None = None,
    *,
    stride: int = 1,
    dilation: int = 1,
) -> Array:
    """Deformable conv on one image. x (H, W, Cin); offsets (Ho, Wo, 2*k*k);
    weight (k, k, Cin, Cout) HWIO. Returns (Ho, Wo, Cout)."""
    k = weight.shape[0]
    cin, cout = weight.shape[2], weight.shape[3]
    patches = deform_sample_patches(x, offsets, kernel=k, stride=stride, dilation=dilation)
    wmat = weight.reshape(k * k * cin, cout)
    out = jnp.dot(patches.astype(wmat.dtype), wmat, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_sample_patches_shift(
    x: Array,
    offsets: Array,
    kernel: int = 3,
    stride: int = 1,
    dilation: int = 1,
    radius: int = 4,
) -> Array:
    """Gather-free deformable im2col: bounded offsets -> static slices + masks.

    TPU-native reformulation: random per-pixel gathers are the measured
    bottleneck of the direct translation (~25x a plain conv). With offsets
    clamped to ``radius`` cells (DCNv1 offsets rarely exceed a few cells),
    each tap's sample is a sum over the (2*radius+2)^2 integer displacements,
    selected per pixel by bilinear one-hot masks — static shifted slices and
    elementwise FMAs only, which XLA fuses into vector loops (no gather unit
    needed; the VPU has none).

    Semantics: identical to ``deform_sample_patches`` except offsets are
    clamped to [-radius, radius] (documented deviation; exact path remains
    available via MXDET_DCN_IMPL=gather).
    """
    h, w, c = x.shape
    ho, wo = offsets.shape[0], offsets.shape[1]
    k = kernel
    pad = dilation * (k - 1) // 2

    # pad so every (tap, displacement) slice is in-bounds; zeros give the
    # CUDA zero-padding boundary behavior for free
    margin = pad + radius + 1
    xp = jnp.pad(x, ((margin, margin), (margin, margin), (0, 0)))

    off = jnp.clip(offsets.reshape(ho, wo, k, k, 2), -radius, radius)

    patches = []
    for ty in range(k):
        for tx in range(k):
            oy = off[:, :, ty, tx, 0]           # (Ho, Wo)
            ox = off[:, :, ty, tx, 1]
            ylo = jnp.floor(oy)
            xlo = jnp.floor(ox)
            fy = oy - ylo
            fx = ox - xlo
            acc = jnp.zeros((ho, wo, c), x.dtype)
            for dy in range(-radius, radius + 2):
                wy = jnp.where(ylo == dy, 1.0 - fy, 0.0) + jnp.where(ylo + 1 == dy, fy, 0.0)
                for dx in range(-radius, radius + 2):
                    wx = jnp.where(xlo == dx, 1.0 - fx, 0.0) + jnp.where(xlo + 1 == dx, fx, 0.0)
                    m = (wy * wx).astype(x.dtype)
                    # absolute displacement of this term's input sample
                    ys = margin - pad + ty * dilation + dy
                    xs = margin - pad + tx * dilation + dx
                    sl = jax.lax.slice(
                        xp,
                        (ys, xs, 0),
                        (ys + (ho - 1) * stride + 1, xs + (wo - 1) * stride + 1, c),
                        (stride, stride, 1))
                    acc = acc + m[..., None] * sl
            patches.append(acc)
    return jnp.concatenate(patches, axis=-1).reshape(ho, wo, k * k * c)


def _dcn_impl() -> str:
    import os

    impl = os.environ.get("MXDET_DCN_IMPL", "auto")
    if impl != "auto":
        return impl
    # measured on v5e (52x84x1024 layer, batch 8): gather 104 ms, XLA
    # shift-select 120 ms (HBM re-read per displacement term), Pallas
    # VMEM-windowed shift-select 78 ms (VMEM FMA traffic of the dense
    # displacement terms is its floor). Training layers (stride 1 AND 2)
    # use the Pallas custom_vjp paths (round 4); only unaligned channels
    # or dilation != 1 (and non-TPU backends) fall back to gather+remat.
    return "pallas" if jax.default_backend() == "tpu" else "gather"


def deform_conv2d_batched(x, offsets, weight, bias=None, *, stride=1, dilation=1,
                          inference=False):
    """vmap over leading batch dim; impl dispatch (Pallas kernel on TPU).

    ``inference=True`` enables the forward-only Pallas kernel; the default
    keeps the differentiable gather formulation (training path).
    """
    k = weight.shape[0]
    cin, cout = weight.shape[2], weight.shape[3]
    impl = _dcn_impl()

    if (inference and impl == "pallas" and stride in (1, 2)
            and cin % 128 == 0 and cout % 128 == 0):
        from .pallas.dcn import (deform_conv2d_pallas_batched,
                                 deform_conv2d_s2_pallas_batched)

        if stride == 1:
            out = deform_conv2d_pallas_batched(x, offsets, weight,
                                               dilation=dilation)
        else:
            out = deform_conv2d_s2_pallas_batched(x, offsets, weight,
                                                  dilation=dilation)
        if bias is not None:
            out = out + bias
        return out.astype(x.dtype)

    if impl == "shift":
        wmat = weight.reshape(k * k * cin, cout)

        def one(xi, oi):
            patches = deform_sample_patches_shift(
                xi, oi, kernel=k, stride=stride, dilation=dilation)
            out = jnp.dot(patches.astype(wmat.dtype), wmat,
                          preferred_element_type=jnp.float32)
            if bias is not None:
                out = out + bias
            return out.astype(xi.dtype)
        return jax.vmap(one)(x, offsets)

    # Training path, stride 1 AND 2: Pallas forward + Pallas/MXU backward
    # (custom_vjp, ops/pallas/dcn.py "training" sections) — no gather, no
    # scatter, residuals are just (x, offsets, weight). Clamped-offset
    # semantics like the inference kernels (documented deviation).
    if (not inference and impl == "pallas" and stride in (1, 2)
            and dilation == 1 and cin % 128 == 0 and cout % 128 == 0):
        from .pallas.dcn import (make_trainable_deform_conv,
                                 make_trainable_deform_conv_s2)

        make = (make_trainable_deform_conv if stride == 1
                else make_trainable_deform_conv_s2)
        f = make(kernel=k, dilation=dilation)
        out = f(x, offsets, weight)
        if bias is not None:
            out = out + bias
        return out.astype(x.dtype)

    # Gather fallback (CPU or unaligned channels). The im2col
    # patch tensor is k*k = 9x the activation size per DCN layer; saving it
    # (and its f32 bilinear accumulator) for the backward pass OOMs HBM on
    # deep DCN stacks (R101-DCN batch 8: 64G for 15.75G of HBM).
    # Rematerialize instead: backward recomputes the bilinear gather from
    # (x, offsets, weight), which are the only residuals kept.
    def one(xi, oi, w, b):
        return deform_conv2d(xi, oi, w, b, stride=stride, dilation=dilation)

    one = jax.checkpoint(one)
    return jax.vmap(lambda xi, oi: one(xi, oi, weight, bias))(x, offsets)
