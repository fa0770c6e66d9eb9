"""Real multi-process jax.distributed exercise (SURVEY.md 4.3, 5.8).

Two spawned CPU processes (4 virtual devices each) bring up a 2-process
global mesh through ``parallel.multihost.initialize`` and run
``sample_nuts_sharded`` over the 8-device mesh; the parent reassembles
the sharded chains and asserts posterior agreement with the
single-process 8-device run of the identical configuration.

The reference has no analog (single-process, numpy-only deps,
/root/reference/setup.py:34) — this is blueprint-mandated ground.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_initialize_noop_single_process():
    """Without a coordinator or cluster env, initialize() is a no-op
    single-process decision made without touching the backend."""
    from celerite_tpu.parallel import multihost

    env_backup = {
        v: os.environ.pop(v, None) for v in multihost._AUTO_ENV_VARS
    }
    try:
        assert multihost.initialize() is False
    finally:
        for v, val in env_backup.items():
            if val is not None:
                os.environ[v] = val


@pytest.mark.slow
def test_two_process_sharded_nuts(tmp_path):
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    repo_root = os.path.dirname(HERE)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"worker{pid}.npz"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(log)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log
        assert "WORKER_OK" in log

    # Reassemble the global (8, S, 2) chain from both processes' shards.
    pieces = {}
    dm_pieces = {}
    smc_pieces = {}
    steps, dm_steps, dm_mass, smc_z, smc_stages = [], [], [], [], []
    for out in outs:
        with np.load(out) as z:
            for k in z.files:
                if k.startswith("shard_"):
                    pieces[int(k.split("_")[1])] = z[k]
                elif k.startswith("dm_shard_"):
                    dm_pieces[int(k.split("_")[2])] = z[k]
                elif k.startswith("smc_shard_"):
                    smc_pieces[int(k.split("_")[2])] = z[k]
                elif k == "step_size":
                    steps.append(float(z[k]))
                elif k == "dm_step_size":
                    dm_steps.append(float(z[k]))
                elif k == "dm_inv_mass":
                    dm_mass.append(z[k])
                elif k == "smc_log_evidence":
                    smc_z.append(float(z[k]))
                elif k == "smc_stages":
                    smc_stages.append(int(z[k]))
    chain2 = np.concatenate(
        [pieces[k] for k in sorted(pieces)], axis=0
    )
    assert chain2.shape[0] == 8
    # psum-pooled adaptation must agree exactly across processes.
    assert steps[0] == steps[1]

    # Single-process reference: same config on this process's 8-device
    # CPU mesh (conftest).
    from celerite_tpu.parallel.sharded import sample_nuts_sharded
    from celerite_tpu.parallel.multihost import global_chain_mesh

    cov = jnp.asarray([[2.0, 1.2], [1.2, 1.5]])
    mu = jnp.asarray([1.0, -2.0])
    prec = jnp.linalg.inv(cov)

    def logprob(x):
        d = x - mu
        return -0.5 * d @ prec @ d

    init = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 2))
    )
    chain1, info1 = sample_nuts_sharded(
        logprob, init, jax.random.PRNGKey(0), mesh=global_chain_mesh(),
        num_warmup=200, num_samples=300,
    )
    chain1 = np.asarray(chain1)
    assert chain1.shape == chain2.shape

    # Posterior agreement within MC error (trajectories may diverge
    # bitwise through reduction-order differences; the *distribution*
    # must not).
    s1 = chain1.reshape(-1, 2)
    s2 = chain2.reshape(-1, 2)
    np.testing.assert_allclose(s1.mean(0), s2.mean(0), atol=0.25)
    np.testing.assert_allclose(s1.std(0), s2.std(0), rtol=0.25)
    np.testing.assert_allclose(s2.mean(0), np.asarray(mu), atol=0.3)
    np.testing.assert_allclose(
        np.cov(s2.T), np.asarray(cov), rtol=0.35, atol=0.2
    )

    # Dense-mass variant across the process boundary: the psum-pooled
    # CROSS moments must produce identical adaptation on both
    # processes, a full (2, 2) inverse mass tracking the correlated
    # target, and a posterior matching the target.
    assert dm_steps[0] == dm_steps[1]
    np.testing.assert_array_equal(dm_mass[0], dm_mass[1])
    assert dm_mass[0].shape == (2, 2)
    # The target correlation is 1.2/sqrt(2*1.5) = 0.69; the adapted
    # metric must pick up a clearly positive off-diagonal.
    corr = dm_mass[0][0, 1] / np.sqrt(
        dm_mass[0][0, 0] * dm_mass[0][1, 1]
    )
    assert corr > 0.3, dm_mass[0]
    chain_dm = np.concatenate(
        [dm_pieces[k] for k in sorted(dm_pieces)], axis=0
    )
    sdm = chain_dm.reshape(-1, 2)
    np.testing.assert_allclose(sdm.mean(0), np.asarray(mu), atol=0.35)

    # Sharded SMC across the process boundary: pooled tempering search
    # and the evidence psums agree exactly; the resampled + mutated
    # particle cloud matches the target moments.
    assert smc_stages[0] == smc_stages[1]
    assert abs(smc_z[0] - smc_z[1]) < 1e-6
    parts = np.concatenate(
        [smc_pieces[k] for k in sorted(smc_pieces)], axis=0
    )
    assert parts.shape[0] == 32
    np.testing.assert_allclose(parts.mean(0), np.asarray(mu), atol=0.6)
