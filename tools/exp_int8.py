#!/usr/bin/env python
"""Feasibility microbench: does int8 reach 2x bf16 MXU throughput here?

BASELINE.md's per-conv roofline table shows the R50 backbone at the bf16
HBM/MXU wall — the remaining inference lever is precision. v5e MXU does
int8 at 2x the bf16 rate and int8 halves HBM traffic, so a quantized
backbone could in principle ~2x the conv stack. This measures, through the
axon relay:

  1. big matmul: bf16 vs int8xint8->int32 (MXU rate check)
  2. conv-shaped matmul (im2col GEMM shape of R50 L3 3x3)
  3. lax.conv_general_dilated with int8 inputs (does it lower at all?)

    python tools/exp_int8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(name, fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.device_get(np.asarray(out).ravel()[0] if hasattr(out, "ravel") else out)
    # steady state: second pass onward (relay warm-up)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.device_get([o.ravel()[0] for o in outs])
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

    f_bf = jax.jit(lambda a, b: jnp.dot(a, b))
    f_i8 = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32))

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

    # native conv with int8 inputs — does XLA:TPU lower it?
    x8 = jnp.asarray(r.randint(-127, 127, (8, 104, 168, 256)), jnp.int8)
    w8 = jnp.asarray(r.randint(-127, 127, (3, 3, 256, 256)), jnp.int8)
    x16 = x8.astype(jnp.bfloat16)
    w16 = w8.astype(jnp.bfloat16)

    def conv(x, w, pet):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    t3 = timed("conv 3x3 104x168x256 b8 bf16",
               jax.jit(lambda x, w: conv(x, w, jnp.float32)), x16, w16)
    try:
        t4 = timed("conv same int8->int32",
                   jax.jit(lambda x, w: conv(x, w, jnp.int32)), x8, w8)
        print(f"  conv ratio {t3/t4:.2f}x")
    except Exception as e:  # noqa: BLE001
        print(f"conv int8: FAILED to lower: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
