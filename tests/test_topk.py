"""topk_select must be bit-identical to lax.top_k (set AND order).

The proposal path replaces the full-sort lax.top_k with the radix-bisection
selection (ops/topk.py); parity fixtures downstream assume exact equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mxdetection_tpu.ops import topk

N, K = 32768, 512  # above the dispatch thresholds -> selection path


def _check(scores, k=K):
    scores = jnp.asarray(scores, jnp.float32)
    v_ref, i_ref = jax.lax.top_k(scores, k)
    v, i = jax.jit(lambda s: topk.topk_select(s, k))(scores)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_random():
    _check(np.random.RandomState(0).randn(N))


def test_heavy_ties():
    r = np.random.RandomState(1)
    _check(np.round(r.rand(N) * 20) / 20)  # ~1600 duplicates per value


def test_all_equal():
    _check(np.full((N,), 3.25, np.float32))


def test_with_neg_inf_padding():
    r = np.random.RandomState(2)
    s = r.randn(N).astype(np.float32)
    s[K // 2:] = -np.inf  # fewer finite values than k
    _check(s)


def test_negative_and_zero_values():
    r = np.random.RandomState(3)
    s = np.concatenate([-r.rand(N // 2), np.zeros(64), r.rand(N // 2 - 64)])
    _check(s.astype(np.float32))


def test_batched_vmap():
    r = np.random.RandomState(4)
    s = jnp.asarray(np.round(r.randn(4, N) * 100) / 100, jnp.float32)
    v_ref, i_ref = jax.lax.top_k(s, K)
    v, i = jax.jit(jax.vmap(lambda x: topk.topk_select(x, K)))(s)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_small_n_falls_back():
    # below thresholds the function must still be exact (it is lax.top_k)
    _check(np.random.RandomState(5).randn(1024), k=100)


def test_last_axis_batched_direct():
    r = np.random.RandomState(6)
    s = jnp.asarray(r.randn(3, N), jnp.float32)
    v_ref, i_ref = jax.lax.top_k(s, K)
    v, i = jax.jit(lambda x: topk.topk_select(x, K))(s)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
