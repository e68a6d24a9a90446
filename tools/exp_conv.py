#!/usr/bin/env python
"""Per-conv-shape MXU utilization microbench (perf tool; VERDICT r3 item 1).

Times every distinct conv shape in R50@832x1344 + FPN individually, printing
ms / TFLOP/s / MFU vs the chip's calibrated bf16 matmul peak. Separates
"XLA's conv ceiling per shape" from graph-level effects (fusion, layout
transitions) visible only in the composed backbone (tools/profile_backbone.py).

Usage: python tools/exp_conv.py [batch]
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=20):
    """fn must return a SCALAR computed inside jit (fused reduction) —
    an eager cast+sum over a GB-sized output costs ~5 ms through HBM and
    would dominate what we are measuring."""
    jax.device_get(fn(*args))
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    out = [fn(*args) for _ in range(iters)]
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def calibrate_peak():
    a = jnp.zeros((8192, 8192), jnp.bfloat16)
    f = jax.jit(lambda a: jnp.sum((a @ a).astype(jnp.float32)))
    dt = timed(f, a)
    return 2 * 8192 ** 3 / dt / 1e12


def calibrate_hbm():
    """Streaming HBM bandwidth: elementwise add over a 1-GiB bf16 array
    (reads + writes 2x its size)."""
    x = jnp.zeros((512 * 1024 * 1024,), jnp.bfloat16)  # 1 GiB
    # fused full-array reduction: pure streaming READ of 1 GiB (a copy-style
    # test would let XLA dead-code-eliminate everything but the slice we
    # reduce, so read-bandwidth is the robust calibration).
    f = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    dt = timed(f, x)
    return x.size * 2 / dt / 1e9  # GB/s


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    H, W = 832, 1344
    peak = calibrate_peak()
    hbm = calibrate_hbm()
    print(f"calibrated bf16 matmul peak: {peak:.1f} TFLOP/s, "
          f"HBM stream: {hbm:.0f} GB/s")

    # (name, h, w, cin, cout, k, stride, count_in_r50)
    shapes = [
        ("stem 7x7/2 3->64", H, W, 3, 64, 7, 2, 1),
        ("L1 1x1 64->64", H // 4, W // 4, 64, 64, 1, 1, 1),
        ("L1 1x1 256->64", H // 4, W // 4, 256, 64, 1, 1, 2),
        ("L1 3x3 64->64", H // 4, W // 4, 64, 64, 3, 1, 3),
        ("L1 1x1 64->256", H // 4, W // 4, 64, 256, 1, 1, 3),
        ("L2 1x1 256->128", H // 4, W // 4, 256, 128, 1, 1, 1),
        ("L2 3x3/2 128", H // 4, W // 4, 128, 128, 3, 2, 1),
        ("L2 1x1 512->128", H // 8, W // 8, 512, 128, 1, 1, 3),
        ("L2 3x3 128", H // 8, W // 8, 128, 128, 3, 1, 3),
        ("L2 1x1 128->512", H // 8, W // 8, 128, 512, 1, 1, 4),
        ("L3 3x3 256", H // 16, W // 16, 256, 256, 3, 1, 6),
        ("L3 1x1 1024->256", H // 16, W // 16, 1024, 256, 1, 1, 5),
        ("L3 1x1 256->1024", H // 16, W // 16, 256, 1024, 1, 1, 6),
        ("L4 3x3 512", H // 32, W // 32, 512, 512, 3, 1, 3),
        ("L4 1x1 2048->512", H // 32, W // 32, 2048, 512, 1, 1, 2),
        ("L4 1x1 512->2048", H // 32, W // 32, 512, 2048, 1, 1, 3),
        ("FPN P2 3x3 256", H // 4, W // 4, 256, 256, 3, 1, 1),
        ("FPN P3 3x3 256", H // 8, W // 8, 256, 256, 3, 1, 1),
        ("FPN lat 256->256", H // 4, W // 4, 256, 256, 1, 1, 1),
    ]

    total_ms = 0.0
    total_tf = 0.0
    total_roof = 0.0
    print(f"{'shape':<22} {'ms':>8} {'TF/s':>7} {'MFU%':>6} {'roof ms':>8} "
          f"{'%roof':>6} {'xN':>3} {'sum ms':>8}")
    for name, h, w, cin, cout, k, s, n in shapes:
        x = jnp.zeros((batch, h, w, cin), jnp.bfloat16)
        wgt = jnp.zeros((k, k, cin, cout), jnp.bfloat16)
        pad = [(k // 2, k // 2)] * 2

        def f(x, wgt):
            return jax.lax.conv_general_dilated(
                x, wgt, (s, s), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        jf = jax.jit(lambda x, wgt: jnp.sum(f(x, wgt).astype(jnp.float32)))
        dt = timed(jf, x, wgt)
        ho, wo = -(-h // s), -(-w // s)
        fl = 2 * batch * ho * wo * cout * cin * k * k
        tf = fl / dt / 1e12
        # roofline: max(MXU time, HBM time) for in+out+weight bf16 traffic
        traffic = 2 * (batch * h * w * cin + batch * ho * wo * cout
                       + k * k * cin * cout)
        roof = max(fl / (peak * 1e12), traffic / (hbm * 1e9))
        total_ms += dt * 1000 * n
        total_tf += fl * n
        total_roof += roof * 1000 * n
        print(f"{name:<22} {dt*1e3:8.2f} {tf:7.1f} {100*tf/peak:6.1f} "
              f"{roof*1e3:8.2f} {100*roof/dt:6.1f} {n:3d} {dt*1e3*n:8.2f}")
    print(f"{'TOTAL (sum of parts)':<22} {total_ms:8.2f} ms  "
          f"avg MFU {100*total_tf/ (total_ms/1e3) / 1e12 / peak:.1f}%  "
          f"roofline total {total_roof:.2f} ms "
          f"({100*total_roof/total_ms:.0f}% of actual)")


if __name__ == "__main__":
    main()
