"""One-pass solver validation: closed-form seed corrections + VJP.

The module's identities (logdet / quadratic-form / boundary-state
corrections as functions of the prefix seed) are checked end-to-end
against the sequential scan, and the hand-written sweep VJP against
``jax.grad`` of the lax blocked solver.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite_tpu import GP, terms
from celerite_tpu.ops import blocked, onepass, seq
from celerite_tpu.ops.lower import Coefficients, lower


def make_problem(n=512, seed=0, kernel=None):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 30.0, n))
    yerr = rng.uniform(0.15, 0.3, n)
    y = np.sin(0.3 * t) + 0.2 * rng.standard_normal(n)
    kernel = kernel or (
        terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3)
        + terms.RealTerm(log_a=0.2, log_c=-0.4)
    )
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    ssm = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
    return ssm, jnp.asarray(y), kernel, t, yerr


@pytest.mark.parametrize("num_blocks", [8, 32])
@pytest.mark.parametrize("n", [512, 500])
@pytest.mark.slow
def test_onepass_matches_seq(n, num_blocks):
    ssm, y, *_ = make_problem(n)
    ll_ref, ok_ref = seq.gp_log_likelihood(ssm, y)
    ll, ok = onepass.gp_log_likelihood(ssm, y, num_blocks=num_blocks)
    assert bool(ok) == bool(ok_ref)
    np.testing.assert_allclose(float(ll), float(ll_ref), rtol=1e-9)


def test_onepass_nonpd_flags_not_ok():
    """An indefinite kernel must fail the validity checks."""
    kernel = terms.ComplexTerm(
        log_a=0.0, log_b=3.0, log_c=-1.5, log_d=1.5, quiet=True
    )
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 10.0, 256))
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    ssm = lower(coeffs, jnp.asarray(t), jnp.full(256, 1e-8))
    y = jnp.asarray(rng.standard_normal(256))
    ll_ref, ok_ref = seq.gp_log_likelihood(ssm, y)
    ll, ok = onepass.gp_log_likelihood(ssm, y, num_blocks=16)
    assert not bool(ok_ref)
    assert not bool(ok)
    assert float(ll) == -np.inf


@pytest.mark.slow
def test_onepass_grad_matches_blocked():
    ssm, y, kernel, t, yerr = make_problem(400)
    gp = GP(kernel)
    theta = jnp.asarray(gp.get_parameter_vector())
    fixed = jnp.asarray(gp.parameter_vector)
    idx = np.flatnonzero(np.asarray(gp.unfrozen_mask))
    nk = gp.kernel.full_size

    def ssm_of(th):
        full = fixed.at[idx].set(th)
        coeffs = Coefficients(
            *kernel.get_padded_coefficients(full[:nk]),
            jitter=kernel.get_jitter(full[:nk]),
        )
        return lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))

    def ll_one(th):
        ll, _ = onepass.gp_log_likelihood(ssm_of(th), y, num_blocks=16)
        return ll

    def ll_blk(th):
        ll, _ = blocked.gp_log_likelihood(ssm_of(th), y)
        return ll

    v1, g1 = jax.value_and_grad(ll_one)(theta)
    v2, g2 = jax.value_and_grad(ll_blk)(theta)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-6, atol=1e-8
    )


@pytest.mark.slow
def test_onepass_grad_wrt_data():
    ssm, y, *_ = make_problem(300, seed=4)

    g1 = jax.grad(
        lambda yv: onepass.gp_log_likelihood(ssm, yv, num_blocks=8)[0]
    )(y)
    g2 = jax.grad(
        lambda yv: blocked.gp_log_likelihood(ssm, yv)[0]
    )(y)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-8, atol=1e-12
    )
