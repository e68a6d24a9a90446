"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip semantics (psum grads, SyncBN pmean, batch sharding) are validated
on fake CPU devices exactly as they'd run on a TPU pod slice (SURVEY.md §4.4).

Note: this environment's sitecustomize imports jax and pins the ``axon``
(tunneled TPU) platform before conftest runs, so env-var-only overrides are
too late — we must use ``jax.config.update`` (works any time before first
backend initialization).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("MXDET_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
