"""Pallas solver agreement tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from celerite_tpu import terms
from celerite_tpu.ops import pallas_solver, seq
from celerite_tpu.ops.lower import Coefficients, lower


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


@pytest.mark.parametrize("n,L", [(512, 64), (1000, 64), (1024, 128)])
def test_pallas_ll_matches_seq(n, L):
    ssm, y = make_problem(n)
    ll_seq, ok_seq = seq.gp_log_likelihood(ssm, y)
    ll_pal, ok_pal = pallas_solver.gp_log_likelihood(
        ssm, y, block_size=L, interpret=True
    )
    assert bool(ok_pal)
    np.testing.assert_allclose(float(ll_pal), float(ll_seq), rtol=1e-10)


def test_pallas_non_pd():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 50, 256))
    coeffs = Coefficients(
        a_real=jnp.asarray([-1.0]),
        c_real=jnp.asarray([0.1]),
        a_comp=jnp.zeros(0),
        b_comp=jnp.zeros(0),
        c_comp=jnp.zeros(0),
        d_comp=jnp.zeros(0),
        jitter=jnp.zeros(()),
    )
    ssm = lower(coeffs, jnp.asarray(t), jnp.full(256, 1e-8))
    ll, ok = pallas_solver.gp_log_likelihood(
        ssm, jnp.asarray(np.sin(t)), block_size=64, interpret=True
    )
    assert not bool(ok)
    assert np.isneginf(float(ll))


def test_pallas_custom_vjp_matches_seq():
    import jax

    ssm, y = make_problem(512)
    kernel = terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3)
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 50, 512))
    yerr = np.full(512, 0.2)
    yy = jnp.asarray(np.sin(0.3 * t))

    def ll_p(params):
        coeffs = Coefficients(
            *kernel.get_padded_coefficients(params), jitter=jnp.zeros(())
        )
        s = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
        return pallas_solver.gp_log_likelihood(s, yy, 64, True)[0]

    def ll_s(params):
        coeffs = Coefficients(
            *kernel.get_padded_coefficients(params), jitter=jnp.zeros(())
        )
        s = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
        return seq.gp_log_likelihood(s, yy)[0]

    theta = jnp.asarray(kernel.get_parameter_vector())
    g = jax.grad(ll_p)(theta)
    g_ref = jax.grad(ll_s)(theta)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-9)
