"""Exact top-k selection without a full sort — a MEASURED NEGATIVE at
proposal shapes; kept opt-in (see verdict below).

``topk_select`` finds the exact k-th-largest threshold by a 32-step radix
bisection on the monotone uint32 image of the float scores (each step is
one vectorized count — O(N) VPU work, no data movement), then compacts the
winners with one cumsum + scatter and sorts just those k.

Semantics match ``lax.top_k`` EXACTLY (same selected set, same output
order, ties broken by lowest index) for non-NaN inputs; -0.0 is
canonicalized to +0.0 so the two compare equal as they do in sorting.
Verified bit-exact against ``lax.top_k`` in tests/test_topk.py.

Measured verdict (TPU v5e, tools/exp_topk.py + exp_topk2.py, BASELINE.md
round 3): at the RPN proposal shapes this was built for ((32, 209k)
k=1000, (8, 209k) k=2000) ``lax.top_k`` is NOT the full-sort pathology —
XLA:TPU emits a fast partial sort (7.8 ms at (32, 209k)) — while this
op's cumsum+scatter compaction alone costs ~40 ms (the bisection itself
is fine: 3.9 ms for 32 exact passes; a 4-bit/15-candidate variant is no
better at 4.2 ms). The full-sort blowup only appears at millions of rows
(RetinaNet's 12.6M (anchor, class) pairs: 1.3 s/batch32), and that case
is better served by the structural two-stage selection in
``models/detectors/retinanet.py::topk_pairs``. Hot paths therefore keep
``lax.top_k``; this op remains for callers with extreme N/k ratios where
a scatter-free compaction would be worth building.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

# Below this ratio a full sort is competitive and simpler; measured on TPU
# (tools/exp_topk.py): the bisection wins ~4-6x at N/k >= 64 and is ~parity
# around N/k ~ 8. Callers can force either path.
_MIN_RATIO = 16
_MIN_N = 16384


def _monotone_key(scores: Array) -> Array:
    """Map float32 -> uint32 preserving order (IEEE total order, -0 == +0)."""
    s = scores.astype(jnp.float32) + 0.0  # -0.0 -> +0.0
    b = lax.bitcast_convert_type(s, jnp.uint32)
    neg = (b >> 31).astype(bool)
    return jnp.where(neg, ~b, b | jnp.uint32(0x80000000))


def _kth_threshold(key: Array, k: int) -> Array:
    """Largest uint32 t with count(key >= t) >= k, by MSB-first bisection."""

    def body(i, thr):
        bit = jnp.uint32(31) - i.astype(jnp.uint32)
        cand = thr | (jnp.uint32(1) << bit)
        cnt = jnp.sum((key >= cand).astype(jnp.int32), axis=-1, keepdims=True)
        return jnp.where(cnt >= k, cand, thr)

    thr0 = jnp.zeros(key.shape[:-1] + (1,), jnp.uint32)
    return lax.fori_loop(0, 32, body, thr0)


def topk_select(scores: Array, k: int) -> tuple[Array, Array]:
    """Drop-in for ``lax.top_k(scores, k)`` over the last axis.

    Returns (values, indices), values sorted descending, ties by lowest
    index — bit-identical to ``lax.top_k`` for non-NaN input. Wins when
    N >> k; falls back to ``lax.top_k`` when the ratio or N is small.
    """
    n = scores.shape[-1]
    if k >= n or n < _MIN_N or n < _MIN_RATIO * k:
        return lax.top_k(scores, k)

    key = _monotone_key(scores)
    thr = _kth_threshold(key, k)          # (..., 1)

    strict = key > thr
    tie = key == thr
    n_strict = jnp.sum(strict.astype(jnp.int32), axis=-1, keepdims=True)
    # output slot for every element: strict winners first (in index order),
    # then threshold ties (in index order) up to k, everything else -> dump
    # slot k which is dropped.
    pos = jnp.where(
        strict, jnp.cumsum(strict.astype(jnp.int32), axis=-1) - 1,
        jnp.where(tie, n_strict + jnp.cumsum(tie.astype(jnp.int32), axis=-1) - 1,
                  k))
    pos = jnp.minimum(pos, k).astype(jnp.int32)

    iota = lax.broadcasted_iota(jnp.int32, scores.shape, len(scores.shape) - 1)
    sel = jnp.zeros(scores.shape[:-1] + (k + 1,), jnp.int32)
    sel = _scatter_last(sel, pos, iota)[..., :k]

    vals = jnp.take_along_axis(scores, sel, axis=-1)
    # order the k winners exactly as lax.top_k would: sort by value desc,
    # ties by lowest original index. ``sel`` is already ascending within
    # each tie class, and lax.top_k on the small set is stable in position,
    # so one small top_k reproduces the global order.
    vals_sorted, order = lax.top_k(vals, k)
    idx_sorted = jnp.take_along_axis(sel, order, axis=-1)
    return vals_sorted, idx_sorted


def _scatter_last(dest: Array, pos: Array, src: Array) -> Array:
    """dest[..., pos[..., i]] = src[..., i] along the last axis."""
    if dest.ndim == 1:
        return dest.at[pos].set(src, mode="drop")
    flat = lambda a: a.reshape((-1, a.shape[-1]))
    out = jax.vmap(lambda d, p, s: d.at[p].set(s, mode="drop"))(
        flat(dest), flat(pos), flat(src))
    return out.reshape(dest.shape[:-1] + (dest.shape[-1],))
