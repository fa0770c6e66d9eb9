"""Adaptive wall-clock benchmarking (reference celerite/timer.py analog).

``benchmark`` repeats a callable until enough wall-clock has elapsed for a
stable estimate; jax async dispatch is handled by blocking on the result
when it is a jax array/pytree.
"""

from __future__ import annotations

import time

__all__ = ["benchmark"]


def _block(x):
    try:
        import jax

        jax.block_until_ready(x)
    except Exception:
        pass


def benchmark(fn, *args, minimum_time=0.2, max_time=10.0, warmup=1):
    """Return the best-estimate seconds-per-call of ``fn(*args)``."""
    for _ in range(warmup):
        _block(fn(*args))
    count = 0
    t0 = time.perf_counter()
    while True:
        _block(fn(*args))
        count += 1
        elapsed = time.perf_counter() - t0
        if elapsed >= minimum_time and count >= 3:
            break
        if elapsed > max_time:
            break
    return elapsed / count
