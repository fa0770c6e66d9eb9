"""Multi-host bring-up helpers.

Single-host multi-chip needs nothing special; across hosts (a TPU pod
slice or CPU fleet) JAX requires one ``jax.distributed.initialize`` call
per process before any computation.  These helpers wrap that plus the
host-prefixed RNG and the "global mesh over all processes" construction
used by the sharded samplers.

This module cannot be exercised on the single-host CI environment; the
collective code paths it feeds (psum/all_gather in parallel.sharded) are
identical under single-host multi-device meshes, which the test-suite
runs on an 8-device virtual CPU mesh (SURVEY.md 4.3's recommended
pattern).
"""

from __future__ import annotations

import numpy as np

__all__ = ["initialize", "global_chain_mesh", "host_local_batch"]


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Initialize jax.distributed (no-op when already initialized or
    single-process).  On TPU pods the arguments are auto-detected from
    the environment; on CPU/GPU fleets pass them explicitly."""
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (RuntimeError, ValueError):
        # Single-process run (no coordinator) — fine.
        pass


def global_chain_mesh():
    """A 1-D mesh over every device of every process (chains axis).

    With chains sharded over this mesh, the warmup psum collectives ride
    ICI within a slice and DCN across hosts automatically.
    """
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), ("chains",))


def host_local_batch(global_batch_size):
    """This process's share of a global chain/particle batch."""
    import jax

    if global_batch_size % jax.process_count():
        raise ValueError(
            "global batch must divide evenly across processes"
        )
    return global_batch_size // jax.process_count()
