#!/usr/bin/env python
"""DCN TRAINING-path timing: gather(+remat) vs shift-select, fwd+bwd.

Cascade R101-DCN trains at 0.324 steps/s (batch 8) — the gather
formulation's backward is an XLA scatter-add over millions of sampled
taps (the transpose of the bilinear gather), which serializes on TPU.
The shift-select formulation (bounded offsets -> static slices + one-hot
masks) has a dense transpose: its backward is more shifts, no scatter.
This times fwd+bwd of both at the three R101-DCN layer shapes.

    python tools/exp_dcn_bwd.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import jax
    import jax.numpy as jnp

    from mxdetection_tpu.ops import dcn

    # (H, W, C) of the three DCN stages at 832x1344 train canvas
    shapes = [(104, 168, 128), (52, 84, 256), (26, 42, 512)]

    r = np.random.RandomState(0)

    def timed(fn, *args, iters=8):
        jax.device_get(fn(*args))
        jax.device_get(fn(*args))
        t0 = time.perf_counter()
        out = [fn(*args) for _ in range(iters)]
        jax.device_get(out)
        return (time.perf_counter() - t0) / iters * 1000

    for (h, w, c) in shapes:
        x = jnp.asarray(r.randn(batch, h, w, c), jnp.bfloat16)
        wt = jnp.asarray(r.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
        off = jnp.asarray(r.randn(batch, h, w, 18) * 1.5, jnp.float32)

        def loss_gather(x_, o_, w_):
            return jnp.sum(dcn.deform_conv2d_batched(
                x_, o_, w_).astype(jnp.float32) ** 2)

        def loss_shift(x_, o_, w_):
            wmat = w_.reshape(-1, c)

            @jax.checkpoint
            def one(xi, oi, wm):
                p = dcn.deform_sample_patches_shift(xi, oi)
                return jnp.dot(p.astype(wm.dtype), wm,
                               preferred_element_type=jnp.float32)
            return jnp.sum(jax.vmap(lambda xi, oi: one(xi, oi, wmat))(x_, o_) ** 2)

        # scalar-in-jit: fetching full grad pytrees through the relay is
        # ~190MB/iter and dominates the timing (see exp_int8 harness note)
        def scalarize(gradfn):
            def f(x_, o_, w_):
                gs = gradfn(x_, o_, w_)
                return sum(jnp.sum(jnp.abs(g).astype(jnp.float32)) for g in gs)
            return jax.jit(f)

        g1 = scalarize(jax.grad(loss_gather, argnums=(0, 1, 2)))
        g2 = scalarize(jax.grad(loss_shift, argnums=(0, 1, 2)))
        t_gather = timed(g1, x, off, wt)
        print(f"({h},{w},{c})x{batch}: fwd+bwd gather+remat {t_gather:8.1f} ms",
              flush=True)
        t_shift = timed(g2, x, off, wt)
        print(f"({h},{w},{c})x{batch}: fwd+bwd shift+remat  {t_shift:8.1f} ms"
              f"   ratio {t_gather / t_shift:.2f}x", flush=True)


if __name__ == "__main__":
    main()
