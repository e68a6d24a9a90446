#!/usr/bin/env python
"""topk_select vs lax.top_k at RPN proposal shapes.

    python tools/exp_topk.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops.topk import topk_select


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args)[0] for _ in range(iters)]
    jax.device_get(outs)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<52} {dt:8.2f} ms", flush=True)
    return dt


def main():
    r = np.random.RandomState(0)
    # (batch, N) at FPN P2/P3 scales for the 832x1344 canvas, and the k
    # values the proposal path uses (1000 test / 2000 train per level).
    cases = [
        (32, 209664, 1000),   # inference default batch, P2
        (32, 52416, 1000),    # P3
        (8, 209664, 2000),    # train batch 8, P2
        (8, 52416, 2000),
    ]
    for b, n, k in cases:
        s = jnp.asarray(r.randn(b, n), jnp.float32)
        t_ref = timed(f"lax.top_k      ({b}, {n}) k={k}",
                      jax.jit(lambda x, k=k: jax.lax.top_k(x, k)), s)
        t_new = timed(f"topk_select    ({b}, {n}) k={k}",
                      jax.jit(lambda x, k=k: topk_select(x, k)), s)
        # vmapped (how proposals actually calls it)
        t_v = timed(f"vmap topk_select same",
                    jax.jit(jax.vmap(lambda x, k=k: topk_select(x, k))), s)
        print(f"  speedup {t_ref / t_new:.2f}x (vmap {t_ref / t_v:.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
