"""Multi-device (virtual 8-CPU mesh) tests for the distributed runtime.

Pattern per SURVEY.md section 4.3: simulated multi-device via
xla_force_host_platform_device_count (set in conftest).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite_tpu import terms
from celerite_tpu.ops import seq
from celerite_tpu.ops.lower import Coefficients, lower
from celerite_tpu.parallel import mesh as mesh_lib
from celerite_tpu.parallel.sharded import (
    make_data_mesh,
    sample_nuts_sharded,
    sharded_gp_log_likelihood,
)


def require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip("needs {0} devices".format(n))


def make_problem(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 50, n))
    yerr = rng.uniform(0.1, 0.3, n)
    y = np.sin(0.3 * t) + yerr * rng.standard_normal(n)
    kernel = terms.SHOTerm(
        log_S0=0.1, log_Q=1.0, log_omega0=0.3
    ) + terms.RealTerm(log_a=0.2, log_c=-0.4)
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    ssm = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
    return ssm, jnp.asarray(y)


@pytest.mark.parametrize("n", [1024, 1000])  # even and ragged
@pytest.mark.slow
def test_sharded_ll_matches_seq(n):
    require_devices(8)
    ssm, y = make_problem(n)
    mesh = make_data_mesh(8)
    ll_seq, ok_seq = seq.gp_log_likelihood(ssm, y)
    ll_sh, ok_sh = sharded_gp_log_likelihood(ssm, y, mesh, block_size=16)
    assert bool(ok_sh)
    np.testing.assert_allclose(float(ll_sh), float(ll_seq), rtol=1e-11)


def test_sharded_ll_jit_and_grad():
    require_devices(8)
    n = 512
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 50, n))
    yerr = np.full(n, 0.2)
    y = jnp.asarray(np.sin(0.3 * t))
    kernel = terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3)
    mesh = make_data_mesh(8)

    def ll(params):
        coeffs = Coefficients(
            *kernel.get_padded_coefficients(params), jitter=jnp.zeros(())
        )
        ssm = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
        v, ok = sharded_gp_log_likelihood(ssm, y, mesh, block_size=16)
        return v

    def ll_ref(params):
        coeffs = Coefficients(
            *kernel.get_padded_coefficients(params), jitter=jnp.zeros(())
        )
        ssm = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
        v, ok = seq.gp_log_likelihood(ssm, y)
        return v

    theta = jnp.asarray(kernel.get_parameter_vector())
    np.testing.assert_allclose(
        float(jax.jit(ll)(theta)), float(ll_ref(theta)), rtol=1e-11
    )
    # NOTE: grad of a shard_map'd function must run under jit (eager
    # transpose trips an XLA sharding-override assertion in jax 0.9).
    g = jax.jit(jax.grad(ll))(theta)
    g_ref = jax.grad(ll_ref)(theta)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-8
    )


@pytest.mark.slow
def test_sharded_nuts_gaussian():
    require_devices(8)
    cov = np.array([[2.0, 1.2], [1.2, 1.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -2.0])

    def logprob(x):
        d = x - mu
        return -0.5 * d @ prec @ d

    mesh = mesh_lib.make_mesh(8)
    init = jnp.asarray(
        np.random.default_rng(0).standard_normal((16, 2))
    )
    chain, info = sample_nuts_sharded(
        logprob,
        init,
        jax.random.PRNGKey(0),
        mesh=mesh,
        num_warmup=200,
        num_samples=250,
    )
    assert chain.shape == (16, 250, 2)
    s = np.asarray(chain).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), np.asarray(mu), atol=0.3)
    np.testing.assert_allclose(np.cov(s.T), cov, rtol=0.3, atol=0.25)
    assert 0.5 < float(info["accept_prob"]) <= 1.0


@pytest.mark.slow
def test_sharded_nuts_dense_mass():
    """dense_mass composes with chain sharding: the cross-moment
    Welford psums pool over the mesh axis and every device adapts the
    same (dim, dim) metric."""
    require_devices(8)
    rng = np.random.default_rng(0)
    A = rng.standard_normal((3, 3))
    cov = A @ A.T + 0.05 * np.eye(3)
    prec = jnp.asarray(np.linalg.inv(cov))

    def logprob(x):
        return -0.5 * x @ prec @ x

    mesh = mesh_lib.make_mesh(8)
    init = jnp.asarray(rng.standard_normal((16, 3)) * 0.1)
    chain, info = sample_nuts_sharded(
        logprob, init, jax.random.PRNGKey(1), mesh=mesh,
        num_warmup=300, num_samples=300, dense_mass=True,
    )
    assert info["inv_mass"].shape == (3, 3)
    s = np.asarray(chain).reshape(-1, 3)
    emp = np.cov(s.T)
    err = np.linalg.norm(emp - cov) / np.linalg.norm(cov)
    assert err < 0.25, err
    # The adapted metric approximates the target covariance.
    im = np.asarray(info["inv_mass"])
    err_m = np.linalg.norm(im - cov) / np.linalg.norm(cov)
    assert err_m < 0.5, err_m


def test_sharded_chain_step_collective():
    require_devices(8)
    mesh = mesh_lib.make_mesh(8)
    step = mesh_lib.sharded_chain_step(
        lambda th: -0.5 * jnp.sum(th**2), mesh
    )
    thetas = jnp.asarray(np.random.default_rng(2).standard_normal((16, 3)))
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    new, accept = jax.jit(step)(thetas, keys)
    assert new.shape == thetas.shape
    assert 0.0 <= float(accept) <= 1.0


def test_sharded_smc_gaussian():
    require_devices(8)
    from celerite_tpu.parallel.sharded import sample_smc_sharded

    cov = np.array([[2.0, 1.2], [1.2, 1.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -2.0])

    def loglike(x):
        d = x - mu
        return -0.5 * d @ prec @ d

    def logprior(x):
        return -0.5 * jnp.sum(x**2) / 25.0

    rng = np.random.default_rng(3)
    init = jnp.asarray(rng.standard_normal((512, 2)) * 3.0)
    mesh = mesh_lib.make_mesh(8)
    res = sample_smc_sharded(
        logprior, loglike, init, jax.random.PRNGKey(3), mesh=mesh,
        num_mutations=4, hmc_step_size=0.5,
    )
    s = np.asarray(res.particles)
    assert s.shape == (512, 2)
    np.testing.assert_allclose(s.mean(0), np.asarray(mu), atol=0.4)
    assert int(res.num_stages) >= 1
