"""Profiling: a thin wrapper around jax.profiler for trace capture.

Replaces the reference's wall-clock-only story (SURVEY.md 5.1) with real
device traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib

__all__ = ["trace"]


@contextlib.contextmanager
def trace(logdir="/tmp/celerite_tpu_trace"):
    """Capture a jax profiler trace around the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
