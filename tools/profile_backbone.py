#!/usr/bin/env python
"""Backbone stage-by-stage timing (perf tool): stem, layer1..4, FPN.

Times jitted prefixes of the ResNet (XLA dead-code-eliminates the untimed
suffix), isolating where the conv milliseconds go.
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.models.backbones.resnet import ResNet
from mxdetection_tpu.models.necks.fpn import FPN


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jnp.sum(jax.tree.leaves(out)[-1].astype(jnp.float32)))
    t0 = time.perf_counter()
    s = [jnp.sum(jax.tree.leaves(fn(*args))[-1].astype(jnp.float32))
         for _ in range(iters)]
    jax.device_get(s)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<22} {dt:8.2f} ms")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    hw = (832, 1344)

    model = ResNet(depth=depth, train=False)
    x = jnp.zeros((batch, *hw, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    fpn = FPN()
    c_shapes = [(batch, hw[0] // s, hw[1] // s, c)
                for s, c in zip((4, 8, 16, 32), (256, 512, 1024, 2048))]
    cs = [jnp.zeros(s, jnp.bfloat16) for s in c_shapes]
    fpn_vars = fpn.init(jax.random.PRNGKey(1), tuple(cs))

    for k in range(1, 5):
        fn = jax.jit(lambda v, x, k=k: model.apply(v, x)[:k])
        timed(f"stem..layer{k}", fn, variables, x)
    timed("fpn only", jax.jit(lambda v, cs: fpn.apply(v, tuple(cs))),
          fpn_vars, cs)


if __name__ == "__main__":
    main()
