"""Persistent XLA compilation cache management.

Cold-start pain on TPU runtimes is real: the widest fused4 kernels
(P > 8) and the temporal-parallel Kalman smoother (ops/pkalman.py, ~17
``associative_scan`` levels) compile for minutes the first time, and on
remote-compile runtimes every process restart pays it again.  JAX's
persistent compilation cache makes that a once-per-machine cost —
measured on the v5e bench rig: ``bench.py`` cold 4-6 minutes, warm 27
seconds end to end.

The library never mutates global JAX config on import; call
:func:`enable_persistent_cache` explicitly (examples and benchmarks do),
or set ``JAX_COMPILATION_CACHE_DIR`` in the environment.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]


def enable_persistent_cache(path=None, min_compile_secs=1.0):
    """Point JAX's persistent compilation cache at ``path`` and return it.

    ``path`` defaults to ``$CELERITE_TPU_CACHE`` or
    ``~/.cache/celerite_tpu/xla``.  Programs whose compile took less
    than ``min_compile_secs`` are not persisted (keeps the cache small).
    No-op (returns the existing path) when a cache dir is already
    configured, e.g. via ``JAX_COMPILATION_CACHE_DIR``.
    """
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    path = (
        path
        or os.environ.get("CELERITE_TPU_CACHE")
        or os.path.expanduser("~/.cache/celerite_tpu/xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    return path
