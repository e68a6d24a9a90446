#!/usr/bin/env python
"""Packed-stem A/B (perf tool; VERDICT r3 item 1b).

Interleaved same-process timing of the eval-mode R50 backbone with
(a) plain 7x7/s2 stem + XLA maxpool and (b) s2d-packed stem conv +
packed-layout maxpool (zero unpack transpose). Interleaving cancels
host-load noise; prints per-variant ms and the delta.

Usage: python tools/exp_stem.py [batch]
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from mxdetection_tpu.models.backbones.resnet import ResNet


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    hw = (832, 1344)
    x = jnp.zeros((batch, *hw, 3), jnp.bfloat16)

    fns = {}
    for name, s2d in (("plain", False), ("packed", True)):
        model = ResNet(depth=50, train=False, s2d_stem=s2d)
        v = model.init(jax.random.PRNGKey(0), x[:1])
        f = jax.jit(lambda v, x, m=model: jnp.sum(m.apply(v, x)[-1].astype(jnp.float32)))
        jax.device_get(f(v, x))  # compile + warm
        jax.device_get(f(v, x))
        fns[name] = (f, v)

    acc = {k: 0.0 for k in fns}
    rounds, iters = 5, 5
    for _ in range(rounds):
        for name, (f, v) in fns.items():
            t0 = time.perf_counter()
            jax.device_get([f(v, x) for _ in range(iters)])
            acc[name] += (time.perf_counter() - t0) / iters * 1000

    for name in fns:
        print(f"{name:<8} {acc[name] / rounds:8.2f} ms")
    d = acc["plain"] - acc["packed"]
    print(f"packed stem delta: {d / rounds:+.2f} ms/iter "
          f"({d / acc['plain'] * 100:+.1f}%)")


if __name__ == "__main__":
    main()
