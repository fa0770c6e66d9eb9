"""Worker process for tests/test_multihost.py.

Spawned twice (process_id 0/1); brings up jax.distributed over CPU with 4
virtual devices per process through celerite_tpu.parallel.multihost, runs
the sharded NUTS sampler on the 8-device global mesh, and dumps this
process's addressable chain shards for the parent to reassemble.

Usage: python multihost_worker.py <coordinator> <process_id> <out.npz>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    coordinator, proc_id, out_path = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3]
    )

    from celerite_tpu.parallel import multihost

    assert not multihost.is_distributed_initialized()
    started = multihost.initialize(
        coordinator_address=coordinator, num_processes=2,
        process_id=proc_id,
    )
    assert started is True
    assert multihost.is_distributed_initialized()
    # Idempotent second call.
    assert multihost.initialize() is True

    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8
    assert multihost.host_local_batch(16) == 8

    from celerite_tpu.parallel.sharded import sample_nuts_sharded

    mesh = multihost.global_chain_mesh()

    cov = jnp.asarray([[2.0, 1.2], [1.2, 1.5]])
    mu = jnp.asarray([1.0, -2.0])
    prec = jnp.linalg.inv(cov)

    def logprob(x):
        d = x - mu
        return -0.5 * d @ prec @ d

    init = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 2))
    )
    chain, info = sample_nuts_sharded(
        logprob, init, jax.random.PRNGKey(0), mesh=mesh,
        num_warmup=200, num_samples=300,
    )

    # Dense-mass variant: the pooled CROSS-moment psums must agree
    # across the two processes (the correlated target makes a diagonal
    # metric visibly worse, so a wrong pool would show in step_size).
    chain_dm, info_dm = sample_nuts_sharded(
        logprob, init, jax.random.PRNGKey(1), mesh=mesh,
        num_warmup=200, num_samples=200, dense_mass=True,
    )

    # Sharded SMC across the 2-process mesh: psum'd tempering search +
    # all_gather global systematic resampling over the process boundary.
    from celerite_tpu.parallel.sharded import sample_smc_sharded

    def log_prior(x):
        return -0.5 * jnp.sum((x / 3.0) ** 2)

    smc = sample_smc_sharded(
        log_prior, logprob,
        jnp.asarray(
            np.random.default_rng(1).standard_normal((32, 2)) * 3.0
        ),
        jax.random.PRNGKey(2), mesh=mesh, num_mutations=3,
        hmc_step_size=0.3,
    )

    # Dump this process's addressable shards (chain axis is sharded).
    shards = {}
    for s in chain.addressable_shards:
        lo = s.index[0].start or 0
        shards[f"shard_{lo}"] = np.asarray(s.data)
    for s in chain_dm.addressable_shards:
        lo = s.index[0].start or 0
        shards[f"dm_shard_{lo}"] = np.asarray(s.data)
    for s in smc.particles.addressable_shards:
        lo = s.index[0].start or 0
        shards[f"smc_shard_{lo}"] = np.asarray(s.data)
    shards["step_size"] = np.asarray(info["step_size"])
    shards["dm_step_size"] = np.asarray(info_dm["step_size"])
    shards["dm_inv_mass"] = np.asarray(info_dm["inv_mass"])
    shards["smc_log_evidence"] = np.asarray(smc.log_evidence)
    shards["smc_stages"] = np.asarray(smc.num_stages)
    np.savez(out_path, **shards)
    print("WORKER_OK", proc_id, flush=True)


if __name__ == "__main__":
    main()
