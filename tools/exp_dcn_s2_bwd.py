#!/usr/bin/env python
"""Stride-2 DCN training backward: stage decomposition at the cascade shapes.

Times the s2 custom_vjp fwd+bwd against the gather+remat fallback it replaced
(ops/dcn.py round-3 path) at the three stride-2 layer shapes of the
R101-DCN234 backbone, plus the isolated Pallas pieces (patches kernel, dx
kernel via a dpatch-only cotangent), so BASELINE.md can attribute the
cascade train delta.

    python tools/exp_dcn_s2_bwd.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.ops import dcn
from mxdetection_tpu.ops.pallas.dcn import make_trainable_deform_conv_s2

SHAPES = [  # (H, W, C) input of each DCN-stage first block (batch 8 @832x1344)
    (208, 336, 128),
    (104, 168, 256),
    (52, 84, 512),
]


def timed(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    for (h, w, c) in SHAPES:
        ho, wo = -(-h // 2), -(-w // 2)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
        # sub-cell offsets: the trained-DCN regime the kernels are tuned for
        off = jnp.asarray(rng.randn(b, ho, wo, 18) * 0.3, jnp.float32)
        wgt = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
        g = jnp.asarray(rng.randn(b, ho, wo, c), jnp.bfloat16)

        f = make_trainable_deform_conv_s2()

        @jax.jit
        def pallas_step(x, off, wgt):
            def loss(x, off, wgt):
                return jnp.sum((f(x, off, wgt) * g).astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1, 2))(x, off, wgt)

        @jax.jit
        def gather_step(x, off, wgt):
            def one(xi, oi, wg):
                return dcn.deform_conv2d(xi, jnp.clip(oi, -3, 3), wg,
                                         stride=2)
            one_ck = jax.checkpoint(one)

            def loss(x, off, wgt):
                out = jax.vmap(lambda xi, oi: one_ck(xi, oi, wgt))(x, off)
                return jnp.sum((out * g).astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1, 2))(x, off, wgt)

        t_p = timed(pallas_step, x, off, wgt)
        t_g = timed(gather_step, x, off, wgt)
        print(f"{h}x{w}xc{c}: s2 fwd+bwd pallas {t_p:7.1f} ms  "
              f"gather+remat {t_g:7.1f} ms  ({t_g / t_p:.2f}x)")


if __name__ == "__main__":
    main()
