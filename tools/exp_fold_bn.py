#!/usr/bin/env python
"""FrozenBN-fold upper-bound experiment (perf tool; VERDICT r3 item 1a).

Times the eval-mode R50 backbone (a) as-is (FrozenBN per-channel
``x * scale + bias``) and (b) with ``FrozenBatchNorm.__call__`` monkeypatched
to identity — a strict upper bound on what folding gamma/beta/mean/var into
conv weights could save. If (b) is not materially faster, XLA already fuses
the affine into the conv epilogue and weight-folding cannot win anything;
record the measured negative instead of adding fold plumbing.

Usage: python tools/exp_fold_bn.py [batch]
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from mxdetection_tpu.models import layers
from mxdetection_tpu.models.backbones.resnet import ResNet


def timed(name, fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jnp.sum(jax.tree.leaves(out)[-1].astype(jnp.float32)))
    t0 = time.perf_counter()
    s = [jnp.sum(jax.tree.leaves(fn(*args))[-1].astype(jnp.float32))
         for _ in range(iters)]
    jax.device_get(s)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<28} {dt:8.2f} ms")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    hw = (832, 1344)
    x = jnp.zeros((batch, *hw, 3), jnp.bfloat16)

    model = ResNet(depth=50, train=False)
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    a = timed("frozen_bn affine", jax.jit(lambda v, x: model.apply(v, x)),
              variables, x)

    orig = layers.FrozenBatchNorm.__call__
    layers.FrozenBatchNorm.__call__ = lambda self, x: x
    try:
        model2 = ResNet(depth=50, train=False)
        v2 = model2.init(jax.random.PRNGKey(0), x[:1])
        b = timed("identity norm (fold bound)",
                  jax.jit(lambda v, x: model2.apply(v, x)), v2, x)
    finally:
        layers.FrozenBatchNorm.__call__ = orig

    print(f"fold upper bound: {a - b:+.2f} ms ({(a - b) / a * 100:+.1f}%)")


if __name__ == "__main__":
    main()
