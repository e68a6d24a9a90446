#!/usr/bin/env python
"""Component timing for topk_select: where do the 37 ms go at (32, 209k)?

    python tools/exp_topk2.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mxdetection_tpu.ops.topk import _monotone_key, _kth_threshold, _scatter_last


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [jax.tree.leaves(fn(*args))[0] for _ in range(iters)]
    jax.device_get(outs)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<52} {dt:8.2f} ms", flush=True)
    return dt


def kth_threshold_nibble(key, k):
    """4 bits per pass: 15 candidate counts per key read -> 8 passes."""

    def body(i, thr):
        shift = (jnp.uint32(28) - 4 * i.astype(jnp.uint32))
        # counts for prefix | (j << shift), j = 1..15, one key read
        cands = thr + (jnp.arange(1, 16, dtype=jnp.uint32)[:, None] << shift)
        cnt = jnp.sum((key[None, :, :] >= cands[:, :, None]).astype(jnp.int32),
                      axis=-1)                      # (15, B)
        ok = cnt >= k                                # (15, B) monotone in j
        j = jnp.sum(ok.astype(jnp.uint32), axis=0)   # number of passing cands
        return thr + (j[None, :] << shift)

    thr0 = jnp.zeros((1,) + key.shape[:-1], jnp.uint32)
    thr = lax.fori_loop(0, 8, body, thr0)
    return jnp.moveaxis(thr, 0, -1)                  # (..., 1)


def main():
    r = np.random.RandomState(0)
    b, n, k = 32, 209664, 1000
    s = jnp.asarray(r.randn(b, n), jnp.float32)

    timed("baseline lax.top_k", jax.jit(lambda x: lax.top_k(x, k)), s)

    key = jax.jit(_monotone_key)(s)
    jax.device_get(key[0, 0])
    timed("monotone key alone", jax.jit(_monotone_key), s)
    timed("kth_threshold (32x1-bit loop)", jax.jit(partial(_kth_threshold, k=k)), key)
    timed("kth_threshold nibble (8x15-cand)", jax.jit(partial(kth_threshold_nibble, k=k)), key)

    thr = jax.jit(partial(_kth_threshold, k=k))(key)
    jax.device_get(thr[0])

    def compact(key, thr):
        strict = key > thr
        tie = key == thr
        n_strict = jnp.sum(strict.astype(jnp.int32), axis=-1, keepdims=True)
        pos = jnp.where(
            strict, jnp.cumsum(strict.astype(jnp.int32), axis=-1) - 1,
            jnp.where(tie, n_strict + jnp.cumsum(tie.astype(jnp.int32), axis=-1) - 1,
                      k))
        pos = jnp.minimum(pos, k).astype(jnp.int32)
        iota = lax.broadcasted_iota(jnp.int32, key.shape, key.ndim - 1)
        sel = jnp.zeros(key.shape[:-1] + (k + 1,), jnp.int32)
        return _scatter_last(sel, pos, iota)[..., :k]

    timed("compaction (cumsum+scatter)", jax.jit(compact), key, thr)

    sel = jax.jit(compact)(key, thr)
    jax.device_get(sel[0, 0])

    def finish(s, sel):
        vals = jnp.take_along_axis(s, sel, axis=-1)
        v, o = lax.top_k(vals, k)
        return v, jnp.take_along_axis(sel, o, axis=-1)

    timed("gather + small top_k", jax.jit(finish), s, sel)

    # nibble-threshold exactness check
    thr2 = jax.jit(partial(kth_threshold_nibble, k=k))(key)
    np.testing.assert_array_equal(np.asarray(thr), np.asarray(thr2))
    print("nibble threshold exact: ok", flush=True)


if __name__ == "__main__":
    main()
