"""Pallas TPU kernel: tiled pairwise IoU matrix (N x K).

Reference equivalent: Cython ``bbox_overlaps`` / ``bbox.pyx`` (SURVEY.md
§2.3). Used by anchor-target assignment (N ~ 200k anchors x K ~ 100 gts) and
proposal sampling. The kernel tiles N over the grid; each program computes a
(TILE_N, K) slab entirely in VMEM with VPU broadcasts — one HBM read of each
operand, no materialized (N, K, 2) intermediates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_N = 256


def _iou_kernel(a_ref, bt_ref, out_ref):
    # a_ref: (TILE_N, 4) row boxes; bt_ref: (4, K) transposed col boxes
    ax1 = a_ref[:, 0:1]  # (T, 1)
    ay1 = a_ref[:, 1:2]
    ax2 = a_ref[:, 2:3]
    ay2 = a_ref[:, 3:4]
    bx1 = bt_ref[0:1, :]  # (1, K)
    by1 = bt_ref[1:2, :]
    bx2 = bt_ref[2:3, :]
    by2 = bt_ref[3:4, :]

    area_a = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)  # (T, 1)
    area_b = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)  # (1, K)

    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)  # (T, K)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    union = area_a + area_b - inter
    out_ref[:, :] = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_iou_pallas(boxes1: Array, boxes2: Array, interpret: bool = False) -> Array:
    """(N, 4) x (K, 4) -> (N, K) IoU. Pads N to TILE_N, K to 128 internally."""
    n, k = boxes1.shape[0], boxes2.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    k_pad = -(-k // 128) * 128
    a = jnp.pad(boxes1.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    bt = jnp.pad(boxes2.astype(jnp.float32), ((0, k_pad - k), (0, 0))).T

    out = pl.pallas_call(
        _iou_kernel,
        grid=(n_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, k_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        interpret=interpret,
    )(a, bt)
    return out[:n, :k]
