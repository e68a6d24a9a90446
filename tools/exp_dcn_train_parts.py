#!/usr/bin/env python
"""Per-piece timing of the stride-1 Pallas DCN TRAINING path (round 5).

The cascade profile showed the R101-DCN backbone fwd+bwd at 847 ms of the
969 ms train step (plain R101: 81 ms) — a ~10x DCN premium. This splits one
layer's custom_vjp into its pieces to find where those milliseconds live:
fwd kernel, patches+derivative-samples kernel, dW/dpatch MXU contractions,
doffsets channel-reduce, and the dx transpose kernel.

    python tools/exp_dcn_train_parts.py [batch] [h w c]
"""

import sys
import os
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops.pallas import dcn as pdcn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def scalarized(fn):
    """Reduce every output to ONE scalar INSIDE jit. Timing a program whose
    jit output is a large array measures the axon relay's device_get tunnel
    transfer (~tens of MB/s), not the kernel — a 182 MB buffer reads as
    seconds. All timings here go through this wrapper."""
    @jax.jit
    def f(*a):
        outs = fn(*a)
        return sum(jnp.sum(jnp.abs(o).astype(jnp.float32))
                   for o in jax.tree.leaves(outs))
    return f


def timed(name, fn, *args, iters=8):
    jax.device_get(fn(*args))
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.device_get(outs)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<44} {dt:8.2f} ms")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    if len(sys.argv) > 4:
        h, w, c = (int(a) for a in sys.argv[2:5])
    else:
        h, w, c = 52, 84, 256
    k, d, radius = 3, 1, 3
    cout = c
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(batch, h, w, c), jnp.bfloat16)
    off = jnp.asarray(r.randn(batch, h, w, 2 * k * k) * 0.7, jnp.bfloat16)
    wt = jnp.asarray(r.randn(k, k, c, cout) * 0.05, jnp.bfloat16)
    g = jnp.asarray(r.randn(batch, h, w, cout), jnp.bfloat16)
    print(f"layer ({h},{w},{c})x{batch} stride 1")

    # fwd kernel
    timed("fwd kernel", scalarized(functools.partial(
        pdcn.deform_conv2d_pallas_batched, dilation=d)), x, off, wt)

    # full bwd
    timed("bwd full (patches+contractions+doff+dx)", scalarized(
        functools.partial(pdcn.deform_conv2d_bwd_pallas_batched,
                          kernel=k, dilation=d, radius=radius)),
        x, off, wt, g)

    # pieces: replicate the bwd preamble once
    PBR, WIN_P = pdcn.PBR, pdcn.WIN_P
    pad = d * (k - 1) // 2
    margin = pad + radius + 1
    nbp = -(-h // PBR)
    hp = nbp * PBR + WIN_P
    wp_total = -(-(w + 2 * margin + 8) // 8) * 8
    wq = -(-w // 8) * 8
    npr = nbp * PBR

    def patches_only(x, offsets):
        xp = jnp.zeros((batch, hp, wp_total, c), x.dtype)
        xp = jax.lax.dynamic_update_slice(xp, x, (0, margin, margin, 0))
        o = offsets.reshape(batch, h, w, k * k, 2).astype(jnp.float32)
        oyt = jax.vmap(lambda oo: pdcn._pack_offsets(oo, wq, nbp, PBR, k * k))(o[..., 0])
        oxt = jax.vmap(lambda oo: pdcn._pack_offsets(oo, wq, nbp, PBR, k * k))(o[..., 1])
        return pl.pallas_call(
            functools.partial(pdcn._patches_kernel, k=k, dil=d,
                              radius=radius, c=c),
            grid=(batch, nbp),
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
            out_shape=[jax.ShapeDtypeStruct((batch, npr, wq, k * k * c), x.dtype)
                       ] * 3,
            scratch_shapes=[
                pltpu.VMEM((WIN_P, wp_total, c), x.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(oyt, oxt, xp)

    patches, dsy, dsx = jax.jit(patches_only)(x, off)
    timed("  patches+dsy+dsx kernel", scalarized(patches_only), x, off)

    def contractions(patches, g):
        g_pad = jnp.pad(g.astype(x.dtype),
                        ((0, 0), (0, npr - h), (0, wq - w), (0, 0)))
        n = batch * npr * wq
        p2 = patches.reshape(n, k * k * c)
        g2 = g_pad.reshape(n, cout)
        dw = jax.lax.dot_general(p2, g2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        wmat = wt.reshape(k * k * c, cout).astype(x.dtype)
        dpatch = jax.lax.dot_general(g2, wmat, (((1,), (1,)), ((), ())),
                                     preferred_element_type=x.dtype)
        return dw, dpatch

    _, dpatch = jax.jit(contractions)(patches, g)
    timed("  dW + dpatch contractions", scalarized(contractions), patches, g)

    def doffsets(dpatch, dsy, dsx, offsets):
        o = offsets.reshape(batch, h, w, k * k, 2).astype(jnp.float32)
        dp5 = dpatch.reshape(batch, npr, wq, k * k, c)
        dsy5 = dsy.reshape(batch, npr, wq, k * k, c)
        dsx5 = dsx.reshape(batch, npr, wq, k * k, c)
        doy = jnp.sum(dp5 * dsy5, axis=-1, dtype=jnp.float32)[:, :h, :w, :]
        dox = jnp.sum(dp5 * dsx5, axis=-1, dtype=jnp.float32)[:, :h, :w, :]
        inb = (o >= -radius) & (o <= radius)
        doff = jnp.stack([doy, dox], axis=-1) * inb.astype(jnp.float32)
        return doff.reshape(batch, h, w, 2 * k * k).astype(offsets.dtype)

    timed("  doffsets reduce", scalarized(doffsets), dpatch, dsy, dsx, off)

    def dx_only(dpatch, offsets):
        o = offsets.reshape(batch, h, w, k * k, 2).astype(jnp.float32)
        return pdcn._dx_from_dpatch(
            dpatch.reshape(batch, npr, wq, k * k, c), o[..., 0], o[..., 1],
            h, w, c, k=k, d=d, radius=radius, x_dtype=x.dtype,
            interpret=False)

    timed("  dx transpose kernel", scalarized(dx_only), dpatch, off)


if __name__ == "__main__":
    main()
