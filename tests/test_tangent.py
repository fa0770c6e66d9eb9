"""Tangent-augmented fused kernel vs jacfwd of the lax blocked solver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite_tpu import terms
from celerite_tpu.ops import blocked, tangent
from celerite_tpu.ops.lower import Coefficients, lower


def make_inputs_fn(kernel, t, yerr, y):
    tj = jnp.asarray(t)
    diag = jnp.asarray(yerr) ** 2
    yj = jnp.asarray(y)

    def make(params):
        coeffs = Coefficients(
            *kernel.get_padded_coefficients(params),
            jitter=kernel.get_jitter(params),
        )
        return lower(coeffs, tj, diag), yj

    return make


@pytest.mark.parametrize("n,b", [(512, 8), (1000, 16)])
@pytest.mark.slow
def test_jac_matches_jacfwd_blocked(n, b):
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 50, n))
    yerr = rng.uniform(0.1, 0.3, n)
    y = np.sin(0.3 * t) + yerr * rng.standard_normal(n)
    kernel = terms.SHOTerm(
        log_S0=0.1, log_Q=1.0, log_omega0=0.3
    ) + terms.RealTerm(log_a=0.2, log_c=-0.4)
    theta = jnp.asarray(kernel.get_parameter_vector())
    make = make_inputs_fn(kernel, t, yerr, y)

    (ssm, resid), lin = jax.linearize(make, theta)
    dssm, dresid = jax.vmap(lin)(jnp.eye(theta.shape[0], dtype=theta.dtype))
    ll, ok, dll = tangent.gp_log_likelihood_jac(
        ssm, resid, dssm, dresid, num_blocks=b, interpret=True
    )
    assert bool(ok)

    def ll_ref(params):
        s, r = make(params)
        return blocked.gp_log_likelihood(s, r)[0]

    ll0 = ll_ref(theta)
    jac = jax.jacfwd(ll_ref)(theta)
    np.testing.assert_allclose(float(ll), float(ll0), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dll), np.asarray(jac), rtol=1e-8)


@pytest.mark.slow
def test_jac_with_mean_and_resid_tangent():
    # Tangent directions that touch the residual (mean parameter) as well.
    rng = np.random.default_rng(1)
    n = 600
    t = np.sort(rng.uniform(0, 20, n))
    yerr = np.full(n, 0.2)
    y = np.sin(t) + 0.3
    kernel = terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3)
    nk = kernel.full_size
    tj, yj = jnp.asarray(t), jnp.asarray(y)
    diag = jnp.asarray(yerr) ** 2

    def make(params):
        coeffs = Coefficients(
            *kernel.get_padded_coefficients(params[:nk]),
            jitter=kernel.get_jitter(params[:nk]),
        )
        return lower(coeffs, tj, diag), yj - params[nk]

    theta = jnp.concatenate(
        [jnp.asarray(kernel.get_parameter_vector()), jnp.asarray([0.25])]
    )
    (ssm, resid), lin = jax.linearize(make, theta)
    dssm, dresid = jax.vmap(lin)(jnp.eye(theta.shape[0], dtype=theta.dtype))
    ll, ok, dll = tangent.gp_log_likelihood_jac(
        ssm, resid, dssm, dresid, num_blocks=8, interpret=True
    )

    def ll_ref(params):
        s, r = make(params)
        return blocked.gp_log_likelihood(s, r)[0]

    jac = jax.jacfwd(ll_ref)(theta)
    np.testing.assert_allclose(float(ll), float(ll_ref(theta)), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dll), np.asarray(jac), rtol=1e-8)
