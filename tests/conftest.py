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


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Work around a deterministic XLA:CPU segfault under long suites.

    With enough accumulated jit executables in one process, a later
    ``lax.scan`` compile (reproducibly the reference-NMS fori_loop in
    test_pallas_nms, ~105 tests in) segfaults inside
    ``backend_compile_and_load`` — an LLVM/JIT resource issue, not a test
    bug: every bisected subset passes, the same compile succeeds in
    isolation, and dropping caches between modules makes the full ordered
    list green (bisected 2026-08-21; three full-suite runs crashed at the
    exact same test without this). Cost: cross-module recompiles.
    """
    import jax

    jax.clear_caches()
    yield
