"""Kalman/RTS smoother predictive variance vs the dense oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from celerite_tpu import GP, terms
from celerite_tpu.ops import smoother
from celerite_tpu.ops.lower import Coefficients


def coeffs_of(kernel):
    return Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )


KERNELS = [
    terms.RealTerm(log_a=0.1, log_c=0.5),
    terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5),
    terms.SHOTerm(log_S0=0.1, log_Q=-1.0, log_omega0=0.5),
    terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5)
    + terms.RealTerm(log_a=-0.3, log_c=0.0),
    terms.ComplexTerm(log_a=0.1, log_b=-0.2, log_c=0.5, log_d=0.1),
    terms.Matern32Term(log_sigma=0.1, log_rho=0.5),
]


@pytest.mark.parametrize("kernel", KERNELS)
def test_smoother_ll_matches_solver(kernel):
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 20, 200))
    yerr = rng.uniform(0.1, 0.3, 200)
    y = np.sin(t)
    gp = GP(kernel)
    gp.compute(t, yerr)
    ll = smoother.kalman_log_likelihood(
        coeffs_of(kernel), t, yerr**2, y
    )
    np.testing.assert_allclose(
        float(ll), gp.log_likelihood(y), rtol=1e-8
    )


@pytest.mark.parametrize("kernel", KERNELS)
def test_smoother_predict_matches_dense(kernel):
    rng = np.random.default_rng(1)
    n = 150
    t = np.sort(rng.uniform(0, 20, n))
    yerr = rng.uniform(0.1, 0.3, n)
    y = np.sin(t) + 0.1 * rng.standard_normal(n)
    ts = np.linspace(-1.0, 21.0, 77)

    gp = GP(kernel)
    gp.compute(t, yerr)
    mu0, var0 = gp.predict(y, ts, return_var=True)

    mu, var = smoother.predict_var(
        coeffs_of(kernel), t, yerr**2, y, ts
    )
    np.testing.assert_allclose(mu, mu0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(var, var0, rtol=1e-5, atol=1e-8)


def test_smoother_rejects_unrealizable():
    coeffs = Coefficients(
        a_real=jnp.asarray([-1.0]), c_real=jnp.asarray([0.5]),
        a_comp=jnp.zeros(0), b_comp=jnp.zeros(0),
        c_comp=jnp.zeros(0), d_comp=jnp.zeros(0),
        jitter=jnp.zeros(()),
    )
    assert smoother.realize(coeffs) is None
    with pytest.raises(ValueError):
        smoother.predict_var(
            coeffs, np.arange(4.0), np.ones(4), np.ones(4),
            np.arange(4.0) + 0.5,
        )


def test_sample_prior_covariance():
    """Empirical covariance of state-space prior draws matches k(tau)."""
    from celerite_tpu.ops.smoother import sample_prior

    kernel = terms.SHOTerm(log_S0=0.2, log_Q=0.8, log_omega0=0.5)
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    t = np.linspace(0, 10.0, 64)
    rng = np.random.default_rng(0)
    draws = np.stack(
        [sample_prior(coeffs, t, rng=rng) for _ in range(400)]
    )
    emp = draws.T @ draws / draws.shape[0]
    K = np.asarray(kernel.get_value(t[:, None] - t[None, :]))
    scale = K[0, 0]
    assert np.abs(emp - K).max() / scale < 0.35  # MC error at 400 draws
