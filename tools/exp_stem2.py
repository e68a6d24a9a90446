#!/usr/bin/env python
"""Standalone stem-variant shootout (perf tool; VERDICT r3 item 1b).

Times ONLY the stem (7x7/s2 conv + BN + relu + 3x3/s2 maxpool), isolated from
the rest of the backbone, in four formulations that are all numerically exact:

  v0  plain conv + XLA reduce_window pool            (current default OFF path)
  v1  s2d4 conv + 6-D packed norm/relu/pool          (round-3 draft — measured
                                                      18% SLOWER composed)
  v2  s2d4 conv + channel-block norm/relu/pool       (no 6-D tensors: phases
                                                      live as 4x64 channel
                                                      blocks, pool = shifted
                                                      slice maxes)
  v3  s2d4 conv + unpack transpose + XLA pool        (round-2 negative)

Usage: python tools/exp_stem2.py [batch]
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.models.backbones.resnet import (
    _pack_stem_kernel, _packed_maxpool, _space_to_depth, _unpack_s2d2)


def pool_xla(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def blockpool(y):
    """3x3/s2 maxpool of the unpacked map, on the (B,Hp,Wp,256) channel-block
    layout (block index py*2+px, 64 channels each). Zero 6-D tensors."""
    neg = jnp.asarray(-jnp.inf, y.dtype)
    py1 = y[:, :, :, 128:]
    up = jnp.pad(py1, ((0, 0), (1, 0), (0, 0), (0, 0)),
                 constant_values=neg)[:, :-1]
    rmax = jnp.maximum(jnp.maximum(up, y[:, :, :, :128]), py1)
    px1 = rmax[:, :, :, 64:]
    left = jnp.pad(px1, ((0, 0), (0, 0), (1, 0), (0, 0)),
                   constant_values=neg)[:, :, :-1]
    return jnp.maximum(jnp.maximum(left, rmax[:, :, :, :64]), px1)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    hw = (832, 1344)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, *hw, 3), jnp.bfloat16)
    w7 = jnp.asarray(rng.rand(7, 7, 3, 64) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.rand(64) - 0.5, jnp.float32)

    def affine(y, s, b):
        return (y * s.astype(y.dtype) + b.astype(y.dtype)).astype(y.dtype)

    def v0(x):
        y = jax.lax.conv_general_dilated(
            x, w7.astype(x.dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return pool_xla(jax.nn.relu(affine(y, scale, bias)))

    wp = _pack_stem_kernel(w7)

    def packed_conv(x):
        return jax.lax.conv_general_dilated(
            _space_to_depth(x, 4), wp.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def v1(x):
        y = packed_conv(x)
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, 2, 2, 64)
        return _packed_maxpool(jax.nn.relu(affine(y, scale, bias)))

    def v2(x):
        y = packed_conv(x)
        return blockpool(jax.nn.relu(affine(y, jnp.tile(scale, 4),
                                            jnp.tile(bias, 4))))

    def v3(x):
        y = _unpack_s2d2(packed_conv(x))
        return pool_xla(jax.nn.relu(affine(y, scale, bias)))

    fns = {n: jax.jit(f) for n, f in (("v0 plain", v0), ("v1 6d-packed", v1),
                                      ("v2 blockpool", v2), ("v3 unpack", v3))}
    ref = np.asarray(fns["v0 plain"](x), np.float32)
    for n, f in fns.items():
        got = np.asarray(f(x), np.float32)
        exact = np.allclose(got, ref, atol=1e-2, rtol=1e-2)
        print(f"{n:<14} exact={exact}")

    acc = {n: 0.0 for n in fns}
    for _ in range(5):
        for n, f in fns.items():
            t0 = time.perf_counter()
            jax.device_get([jnp.sum(f(x).astype(jnp.float32))
                            for _ in range(5)])
            acc[n] += (time.perf_counter() - t0) / 5 * 1000
    for n in fns:
        print(f"{n:<14} {acc[n] / 5:8.2f} ms")





def suffix_main():
    """Same variants composed with layer1 block0 (the pool consumer):
    isolates the layout boundary that made v1 lose COMPOSED despite winning
    standalone. Usage: python tools/exp_stem2.py suffix [batch]"""
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    hw = (832, 1344)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, *hw, 3), jnp.bfloat16)
    w7 = jnp.asarray(rng.rand(7, 7, 3, 64) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.rand(64) - 0.5, jnp.float32)
    wa = jnp.asarray(rng.rand(1, 1, 64, 64) * 0.1, jnp.bfloat16)
    wb = jnp.asarray(rng.rand(3, 3, 64, 64) * 0.05, jnp.bfloat16)
    wc = jnp.asarray(rng.rand(1, 1, 64, 256) * 0.1, jnp.bfloat16)
    wd = jnp.asarray(rng.rand(1, 1, 64, 256) * 0.1, jnp.bfloat16)

    def cv(x, w, pad=0):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def l1(z):
        o = jax.nn.relu(cv(z, wa))
        o = jax.nn.relu(cv(o, wb, pad=1))
        return jax.nn.relu(cv(o, wc) + cv(z, wd))

    def affine(y, s, b):
        return (y * s.astype(y.dtype) + b.astype(y.dtype)).astype(y.dtype)

    wp = _pack_stem_kernel(w7)

    def packed_conv(x):
        return jax.lax.conv_general_dilated(
            _space_to_depth(x, 4), wp.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def v0(x):
        y = jax.lax.conv_general_dilated(
            x, w7.astype(x.dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return l1(pool_xla(jax.nn.relu(affine(y, scale, bias))))

    def v1(x):
        y = packed_conv(x)
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, 2, 2, 64)
        return l1(_packed_maxpool(jax.nn.relu(affine(y, scale, bias))))

    def v2(x):
        y = packed_conv(x)
        return l1(blockpool(jax.nn.relu(affine(y, jnp.tile(scale, 4),
                                               jnp.tile(bias, 4)))))

    fns = {n: jax.jit(f) for n, f in (("v0+L1", v0), ("v1+L1", v1),
                                      ("v2+L1", v2))}
    for f in fns.values():
        jax.device_get(jnp.sum(f(x).astype(jnp.float32)))
    acc = {n: 0.0 for n in fns}
    for _ in range(5):
        for n, f in fns.items():
            t0 = time.perf_counter()
            jax.device_get([jnp.sum(f(x).astype(jnp.float32))
                            for _ in range(5)])
            acc[n] += (time.perf_counter() - t0) / 5 * 1000
    for n in fns:
        print(f"{n:<8} {acc[n] / 5:8.2f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "suffix":
        suffix_main()
    else:
        main()
