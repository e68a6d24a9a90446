#!/usr/bin/env python
"""Feasibility microbench: does int8 reach 2x bf16 MXU throughput here?

BASELINE.md's per-conv roofline table shows the R50 backbone at the bf16
HBM/MXU wall — the remaining inference lever is precision. v5e MXU does
int8 at 2x the bf16 rate and int8 halves HBM traffic, so a quantized
backbone could in principle ~2x the conv stack. This measures, through the
axon relay (methodology = tools/exp_conv.py: scalar reduced INSIDE the jit
so only 4 bytes cross the relay per call):

  1. big matmul: bf16 vs int8xint8->int32 (MXU rate check)
  2. conv-shaped matmul (im2col GEMM shape of R50 L3 3x3)
  3. lax.conv_general_dilated with int8 inputs (does it lower at all?)
  4. bandwidth-bound 1x1 conv: does int8 halve the HBM time?

    python tools/exp_int8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(name, fn, *args, iters=20):
    import jax

    jax.device_get(fn(*args))
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    out = [fn(*args) for _ in range(iters)]
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<44} {dt:8.3f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    r = np.random.RandomState(0)
    n = 8192
    a_bf = jnp.asarray(r.randn(n, n), jnp.bfloat16)
    b_bf = jnp.asarray(r.randn(n, n), jnp.bfloat16)
    a_i8 = jnp.asarray(r.randint(-127, 127, (n, n)), jnp.int8)
    b_i8 = jnp.asarray(r.randint(-127, 127, (n, n)), jnp.int8)

    f_bf = jax.jit(lambda a, b: jnp.sum(jnp.dot(a, b).astype(jnp.float32)))
    f_i8 = jax.jit(lambda a, b: jnp.sum(
        jnp.dot(a, b, preferred_element_type=jnp.int32)))

    t_bf = timed(f"matmul {n}^3 bf16", f_bf, a_bf, b_bf)
    t_i8 = timed(f"matmul {n}^3 int8->int32", f_i8, a_i8, b_i8)
    flops = 2 * n**3
    print(f"  bf16 {flops/t_bf/1e9:.1f} TFLOP/s | int8 {flops/t_i8/1e9:.1f} TOP/s "
          f"| ratio {t_bf/t_i8:.2f}x")

    # conv-shaped GEMM: R50 L3 3x3x256 at 52x84, batch 32 im2col
    m, k, c = 32 * 52 * 84, 9 * 256, 256
    g_bf = jnp.asarray(r.randn(m, k), jnp.bfloat16)
    w_bf = jnp.asarray(r.randn(k, c), jnp.bfloat16)
    g_i8 = jnp.asarray(r.randint(-127, 127, (m, k)), jnp.int8)
    w_i8 = jnp.asarray(r.randint(-127, 127, (k, c)), jnp.int8)
    t1 = timed(f"gemm ({m}x{k})x({k}x{c}) bf16", f_bf, g_bf, w_bf)
    t2 = timed(f"gemm same int8->int32", f_i8, g_i8, w_i8)
    print(f"  ratio {t1/t2:.2f}x")

    # native conv with int8 inputs — does XLA:TPU lower it well?
    x8 = jnp.asarray(r.randint(-127, 127, (8, 104, 168, 256)), jnp.int8)
    w8 = jnp.asarray(r.randint(-127, 127, (3, 3, 256, 256)), jnp.int8)
    x16 = x8.astype(jnp.bfloat16)
    w16 = w8.astype(jnp.bfloat16)

    def conv(x, w, pet, s=1):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    t3 = timed("conv 3x3 104x168x256 b8 bf16",
               jax.jit(lambda x, w: jnp.sum(conv(x, w, jnp.float32))), x16, w16)
    try:
        t4 = timed("conv same int8->int32",
                   jax.jit(lambda x, w: jnp.sum(conv(x, w, jnp.int32))), x8, w8)
        print(f"  conv ratio {t3/t4:.2f}x")
    except Exception as e:  # noqa: BLE001
        print(f"conv int8: FAILED to lower: {type(e).__name__}: {e}")

    # bandwidth-bound 1x1: L3 1x1 1024->256 shape at batch 32
    y8 = jnp.asarray(r.randint(-127, 127, (32, 52, 84, 1024)), jnp.int8)
    v8 = jnp.asarray(r.randint(-127, 127, (1, 1, 1024, 256)), jnp.int8)
    y16 = y8.astype(jnp.bfloat16)
    v16 = v8.astype(jnp.bfloat16)
    t5 = timed("1x1 52x84 1024->256 b32 bf16",
               jax.jit(lambda x, w: jnp.sum(conv(x, w, jnp.float32))), y16, v16)
    try:
        t6 = timed("1x1 same int8->int32",
                   jax.jit(lambda x, w: jnp.sum(conv(x, w, jnp.int32))), y8, v8)
        print(f"  1x1 ratio {t5/t6:.2f}x")
    except Exception as e:  # noqa: BLE001
        print(f"1x1 int8: FAILED to lower: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
