"""Adjoint (reverse-mode) kernel validation.

The hand-written VJPs of the two streaming kernels (ops/adjoint.py) are
the transposes of the forward-tangent rules; here the end-to-end
gradient through the split pipeline (kernels in interpret mode + XLA
glue) is checked against ``jax.grad`` of the mathematically identical
lax blocked solver, including the parameter chain rule through the lane
lowering.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite_tpu import GP, terms
from celerite_tpu.ops import adjoint, blocked, lanes
from celerite_tpu.ops.lower import Coefficients, lower


def make_problem(n=256, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 20.0, n))
    yerr = np.full(n, 0.25)
    y = np.sin(0.4 * t) + 0.2 * rng.standard_normal(n)
    return t, yerr, y


@pytest.mark.parametrize("kernel_fn", [
    lambda: terms.RealTerm(log_a=0.3, log_c=-0.4),
    lambda: terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5),
    lambda: terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5)
    + terms.RealTerm(log_a=-0.2, log_c=0.1),
])
@pytest.mark.slow
def test_adjoint_grad_matches_blocked(kernel_fn):
    t, yerr, y = make_problem()
    kernel = kernel_fn()
    gp = GP(kernel)

    theta = jnp.asarray(gp.get_parameter_vector())
    nk = gp.kernel.full_size
    fixed = jnp.asarray(gp.parameter_vector)
    idx = np.flatnonzero(np.asarray(gp.unfrozen_mask))
    plan = lanes.make_plan(t, y, yerr**2, 8, dtype=np.float64)

    def make_inputs(th):
        full = fixed.at[idx].set(th)
        coeffs = Coefficients(
            *kernel.get_padded_coefficients(full[:nk]),
            jitter=kernel.get_jitter(full[:nk]),
        )
        u, v, ph, a = lanes.lower_lanes(coeffs, plan)
        return u, v, ph, a, plan.y

    fn = adjoint.value_and_grad_fn(make_inputs, plan.n)
    ll, ok, grad = fn(theta)
    assert bool(ok)

    def ll_blocked(th):
        full = fixed.at[idx].set(th)
        coeffs = Coefficients(
            *kernel.get_padded_coefficients(full[:nk]),
            jitter=kernel.get_jitter(full[:nk]),
        )
        ssm = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
        return blocked.gp_log_likelihood(ssm, jnp.asarray(y))[0]

    ll_ref, grad_ref = jax.value_and_grad(ll_blocked)(theta)
    np.testing.assert_allclose(float(ll), float(ll_ref), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(grad_ref), rtol=1e-7, atol=1e-9
    )


@pytest.mark.slow
def test_adjoint_ll_matches_seq_ssm_level():
    from celerite_tpu.ops import seq

    t, yerr, y = make_problem(200, seed=3)
    kernel = terms.SHOTerm(log_S0=0.2, log_Q=0.8, log_omega0=0.3)
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    ssm = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
    ll_ref, _ = seq.gp_log_likelihood(ssm, jnp.asarray(y))
    ll, ok = adjoint.gp_log_likelihood(ssm, jnp.asarray(y), num_blocks=8)
    assert bool(ok)
    np.testing.assert_allclose(float(ll), float(ll_ref), rtol=1e-10)


@pytest.mark.slow
def test_adjoint_grad_wrt_data():
    """Cotangents w.r.t. y flow through hy (the -K^-1 resid identity)."""
    t, yerr, y = make_problem(128, seed=5)
    kernel = terms.RealTerm(log_a=0.1, log_c=-0.2)
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    ssm = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))

    def ll_adj(yv):
        ll, _ = adjoint.gp_log_likelihood(ssm, yv, num_blocks=8)
        return ll

    def ll_blk(yv):
        ll, _ = blocked.gp_log_likelihood(ssm, yv)
        return ll

    g1 = jax.grad(ll_adj)(jnp.asarray(y))
    g2 = jax.grad(ll_blk)(jnp.asarray(y))
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-8, atol=1e-12
    )
