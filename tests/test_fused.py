"""Fused single-kernel solver agreement tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite_tpu import terms
from celerite_tpu.ops import blocked, fused, seq
from celerite_tpu.ops.lower import Coefficients, lower


def make_problem(n, seed=0, j=None):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 50, n))
    yerr = rng.uniform(0.1, 0.3, n)
    y = np.sin(0.3 * t) + yerr * rng.standard_normal(n)
    kernel = terms.SHOTerm(
        log_S0=0.1, log_Q=1.0, log_omega0=0.3
    ) + terms.RealTerm(log_a=0.2, log_c=-0.4)
    for i in range(3, (j or 0) + 1):
        kernel = kernel + terms.SHOTerm(
            log_S0=-0.3 * i, log_Q=0.5, log_omega0=0.3 * i
        )
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    ssm = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
    return ssm, jnp.asarray(y)


@pytest.mark.parametrize("n,b", [(512, 8), (1000, 16), (1024, 4)])
def test_fused_ll_matches_seq(n, b):
    ssm, y = make_problem(n)
    ll_seq, ok_seq = seq.gp_log_likelihood(ssm, y)
    ll_f, ok_f = fused.gp_log_likelihood(
        ssm, y, num_blocks=b, interpret=True
    )
    assert bool(ok_f)
    np.testing.assert_allclose(float(ll_f), float(ll_seq), rtol=1e-10)


def test_fused_matches_blocked_general_rank():
    # Higher rank (real + 2 complex -> P = 5) through the fused path.
    rng = np.random.default_rng(3)
    n = 777
    t = np.sort(rng.uniform(0, 20, n))
    yerr = rng.uniform(0.1, 0.3, n)
    y = np.sin(t)
    kernel = (
        terms.RealTerm(log_a=0.1, log_c=0.0)
        + terms.ComplexTerm(log_a=0.0, log_b=-0.3, log_c=0.4, log_d=0.2)
        + terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3)
    )
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    ssm = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
    ll_b, _ = blocked.gp_log_likelihood(ssm, jnp.asarray(y))
    ll_f, ok = fused.gp_log_likelihood(
        ssm, jnp.asarray(y), num_blocks=8, interpret=True
    )
    assert bool(ok)
    np.testing.assert_allclose(float(ll_f), float(ll_b), rtol=1e-10)


def test_fused_non_pd():
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
    ll, ok = fused.gp_log_likelihood(
        ssm, jnp.asarray(np.sin(t)), num_blocks=8, interpret=True
    )
    assert not bool(ok)
    assert np.isneginf(float(ll))


@pytest.mark.slow
def test_fused_custom_vjp_matches_seq():
    kernel = terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3)
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 50, 512))
    yerr = np.full(512, 0.2)
    yy = jnp.asarray(np.sin(0.3 * t))

    def ll_f(params):
        coeffs = Coefficients(
            *kernel.get_padded_coefficients(params), jitter=jnp.zeros(())
        )
        s = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
        return fused.gp_log_likelihood(s, yy, 8, True)[0]

    def ll_s(params):
        coeffs = Coefficients(
            *kernel.get_padded_coefficients(params), jitter=jnp.zeros(())
        )
        s = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2))
        return seq.gp_log_likelihood(s, yy)[0]

    theta = jnp.asarray(kernel.get_parameter_vector())
    g = jax.grad(ll_f)(theta)
    g_ref = jax.grad(ll_s)(theta)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-9)


def test_fused_rejects_bad_block_count():
    ssm, y = make_problem(128)
    with pytest.raises(ValueError):
        fused.gp_log_likelihood(ssm, y, num_blocks=6, interpret=True)


@pytest.mark.slow
def test_wide_model_split_pipeline_matches_seq():
    """P > 8 models route off the in-VMEM-scan kernel on TPU; the
    destination (pallas_solver.run_from_lanes) must agree with seq."""
    from celerite_tpu.ops import pallas_solver

    ssm, y = make_problem(256, j=5)  # P = 10 > 8
    assert ssm.U.shape[1] > 8
    ll_ref, _ = seq.gp_log_likelihood(ssm, y)
    u, v, ph, a, yy, L = fused._to_lanes(ssm, y, 8)
    ll, ok = pallas_solver.run_from_lanes(
        u, v, ph, a, yy, ssm.U.shape[0], interpret=True
    )
    assert bool(ok)
    np.testing.assert_allclose(float(ll), float(ll_ref), rtol=1e-10)
