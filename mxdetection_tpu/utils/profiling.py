"""Profiling hooks: jax.profiler traces + named scopes.

Reference equivalent (SURVEY.md §5.1): the family had only the Speedometer
callback; MXNet's chrome-trace profiler existed but wasn't integrated. Here
tracing is first-class: ``with trace(logdir):`` around any region produces a
TensorBoard/Perfetto trace; the model code uses ``jax.named_scope`` so
backbone/FPN/RPN/RoI/loss show up as named spans on the TPU timeline.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace of the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for timeline labels (usable as decorator or context)."""
    return jax.named_scope(name)
