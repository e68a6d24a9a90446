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


def deform_conv2d_batched(x, offsets, weight, bias=None, *, stride=1, dilation=1):
    """vmap over leading batch dim."""
    fn = lambda xi, oi: deform_conv2d(xi, oi, weight, bias, stride=stride, dilation=dilation)
    return jax.vmap(fn)(x, offsets)
