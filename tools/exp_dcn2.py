#!/usr/bin/env python
"""DCN Pallas kernel scaling probe: where does the time actually go?

Times the stride-1 kernel on the three R101-DCN layer shapes (batch 8,
@832x1344 feature sizes) sweeping:
  - radius (x-displacement unroll r2 = 2R+2: 8 for R=3, 6 for R=2, 4 for R=1)
  - BR row-block size (8 vs 16) via module monkeypatch

If time scales ~linearly with r2, the dense-x masked-FMA/slice work is the
cost and sharing shifted rows across taps is the lever. If it barely moves,
the overhead is per-(tap,row) loop structure / DMA serialization instead.

    python tools/exp_dcn2.py [batch]
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

    from mxdetection_tpu.ops.pallas import dcn as pdcn

    r = np.random.RandomState(0)
    shapes = [
        ("stage3 104x168 c128", 104, 168, 128),
        ("stage4 52x84 c256", 52, 84, 256),
        ("stage5 26x42 c512", 26, 42, 512),
    ]

    def timed(fn, *args, iters=10):
        jax.device_get(jnp.sum(fn(*args).astype(jnp.float32)))
        f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        jax.device_get(f(*args))
        t0 = time.perf_counter()
        out = [f(*args) for _ in range(iters)]
        jax.device_get(out)
        return (time.perf_counter() - t0) / iters * 1000

    for name, h, w, c in shapes:
        x = jnp.asarray(r.randn(batch, h, w, c), jnp.bfloat16)
        # sub-cell offsets (the trained-offset regime the kernel optimizes)
        off = jnp.asarray(r.uniform(-0.9, 0.9, (batch, h, w, 18)), jnp.float32)
        wgt = jnp.asarray(r.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
        for radius in (3, 2, 1):
            for br in (8, 16):
                pdcn.BR = br
                pdcn.WIN_R = br + 2 + 2 * radius + 2 + 2
                # BR/WIN_R are module constants invisible to the jit cache key
                pdcn.deform_conv2d_pallas_batched.clear_cache()
                try:
                    fn = lambda xx, oo, ww: pdcn.deform_conv2d_pallas_batched(
                        xx, oo, ww, radius=radius)
                    dt = timed(fn, x, off, wgt)
                    print(f"{name:<22} R={radius} BR={br:2d}  {dt:8.2f} ms")
                except Exception as e:  # noqa: BLE001
                    print(f"{name:<22} R={radius} BR={br:2d}  FAILED "
                          f"{type(e).__name__}: {str(e)[:80]}")
        pdcn.BR = 8
        pdcn.WIN_R = 24


if __name__ == "__main__":
    main()
