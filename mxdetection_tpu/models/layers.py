"""Shared NN building blocks: norms (FrozenBN / SyncBN), conv inits.

Reference equivalents: MXNet ``BatchNorm(use_global_stats=True)`` (the family's
frozen-BN backbone idiom) and ``mx.sym.contrib.SyncBatchNorm`` (CUDA + engine
allreduce). The TPU SyncBN needs no kernel at all: batch statistics are
``lax.pmean``-ed over the data-parallel mesh axis inside the layer, lowering to
one fused ICI all-reduce (SURVEY.md §2.3).

All modules are NHWC and dtype-polymorphic: params live in fp32, compute dtype
(bf16 by default) is applied on read — the standard TPU mixed-precision recipe.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics AND frozen affine params.

    Collapses to a per-channel affine ``y = x * scale + bias`` computed from
    stored (gamma, beta, mean, var). All four live in the ``batch_stats``
    collection so optimizers never touch them (family semantics: backbone BN
    gamma/beta fixed; SURVEY.md §2.2 "Backbones").
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        gamma = self.variable("batch_stats", "gamma", nn.initializers.ones, None, (c,), jnp.float32)
        beta = self.variable("batch_stats", "beta", nn.initializers.zeros, None, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,), jnp.float32)
        var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,), jnp.float32)
        scale = gamma.value * jax.lax.rsqrt(var.value + self.epsilon)
        bias = beta.value - mean.value * scale
        return (x * scale.astype(self.dtype) + bias.astype(self.dtype)).astype(self.dtype)


class SyncBatchNorm(nn.Module):
    """Cross-device BatchNorm: stats pmean-ed over ``axis_name`` when set.

    Under ``shard_map``/``pmap`` with a ``data`` axis this matches the
    reference's SyncBN semantics (global-batch statistics); without an axis
    name it degrades to plain per-host BN. Running stats are updated when
    ``use_running_average=False`` (train) and used directly at eval.
    """

    axis_name: str | None = "data"
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,), jnp.float32)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=tuple(range(x.ndim - 1)))
            mean2 = jnp.mean(jnp.square(xf), axis=tuple(range(x.ndim - 1)))
            if self.axis_name is not None:
                try:
                    mean = jax.lax.pmean(mean, self.axis_name)
                    mean2 = jax.lax.pmean(mean2, self.axis_name)
                except NameError:
                    pass  # not inside a mapped context with this axis
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        scale = gamma * jax.lax.rsqrt(var + self.epsilon)
        bias = beta - mean * scale
        return (x * scale.astype(self.dtype) + bias.astype(self.dtype)).astype(self.dtype)


class GroupNorm(nn.Module):
    """GroupNorm(32) — family alternative head norm."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon,
                           dtype=self.dtype, param_dtype=jnp.float32)(x)
        return out.astype(self.dtype)


def make_norm(kind: str, dtype=jnp.bfloat16, train: bool = True) -> Callable[..., nn.Module]:
    """Factory keyed by config string; kwargs (e.g. ``name``) pass through."""
    if kind == "frozen_bn":
        return lambda **kw: FrozenBatchNorm(dtype=dtype, **kw)
    if kind == "sync_bn":
        return lambda **kw: SyncBatchNorm(dtype=dtype, use_running_average=not train, **kw)
    if kind == "bn":
        return lambda **kw: SyncBatchNorm(dtype=dtype, axis_name=None,
                                          use_running_average=not train, **kw)
    if kind == "gn":
        return lambda **kw: GroupNorm(dtype=dtype, **kw)
    raise ValueError(f"unknown norm {kind!r}")


def conv(features: int, kernel: int = 3, stride: int = 1, *, dilation: int = 1,
         dtype=jnp.bfloat16,
         name: str | None = None, use_bias: bool = False,
         kernel_init=nn.initializers.he_normal(),
         bias_init=nn.initializers.zeros) -> nn.Conv:
    """NHWC conv with TPU-friendly defaults (fp32 params, bf16 compute)."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        kernel_dilation=(dilation, dilation),
        padding=[(dilation * (kernel // 2), dilation * (kernel // 2))] * 2,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init,
        bias_init=bias_init,
        name=name,
    )
