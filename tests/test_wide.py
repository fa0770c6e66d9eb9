"""Wide-model (large-J) correctness vs the dense oracle.

The reference benchmarks to rank 512 (J=256 in its grid convention,
/root/reference/examples/benchmark/benchmark_linux.csv row
`8,8,256,16384`); its FIXED_SIZE_HACKZ covers rank<=16 with a dynamic
Eigen fallback above (cholesky.h:122-206).  Here J is a static shape
under jit — XLA specializes every width — and these tests pin
correctness of the scan and block-parallel backends at rank 64-128
against dense slogdet/solve.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite_tpu import GP, terms


def _wide_complex_kernel(nterms):
    k = None
    for j in range(nterms):
        term = terms.ComplexTerm(
            log_a=-0.05 * j, log_b=-4.0 - 0.05 * j,
            log_c=-0.5 + 0.005 * j,
            log_d=np.log(0.3 + 0.15 * j + 0.01),
        )
        k = term if k is None else k + term
    return k


def _dense_ll(kernel, t, yerr, y):
    tau = np.abs(t[:, None] - t[None, :])
    ar, cr, ac, bc, cc, dc = [np.asarray(x) for x in kernel.coefficients]
    K = np.zeros((len(t), len(t)))
    for a, c in zip(ar, cr):
        K += a * np.exp(-c * tau)
    for a, b, c, d in zip(ac, bc, cc, dc):
        K += np.exp(-c * tau) * (a * np.cos(d * tau) + b * np.sin(d * tau))
    K[np.diag_indices_from(K)] += yerr**2
    _, logdet = np.linalg.slogdet(K)
    alpha = np.linalg.solve(K, y)
    return -0.5 * (y @ alpha + logdet + len(t) * np.log(2 * np.pi))


@pytest.fixture(scope="module")
def wide_data():
    rng = np.random.default_rng(0)
    n = 256
    t = np.sort(rng.uniform(0, 20, n))
    yerr = 0.1 * np.ones(n)
    y = rng.standard_normal(n)
    return t, yerr, y


@pytest.mark.parametrize("nterms", [32, 64])
def test_wide_seq_matches_dense(wide_data, nterms):
    """rank 64 / 128 sequential-scan ll vs dense oracle (f64)."""
    t, yerr, y = wide_data
    kernel = _wide_complex_kernel(nterms)
    gp = GP(kernel)
    gp.compute(t, yerr)
    ref = _dense_ll(kernel, t, yerr, y)
    np.testing.assert_allclose(float(gp.log_likelihood(y)), ref,
                               rtol=1e-12)
    f = gp.build_loglik(t, y, yerr, solver="seq")
    ll, ok = f(jnp.asarray(gp.get_parameter_vector()))
    assert bool(ok)
    np.testing.assert_allclose(float(ll), ref, rtol=1e-12)


@pytest.mark.slow
def test_wide_blocked_matches_dense_and_grad(wide_data):
    """rank 128 block-parallel ll + AD gradient vs seq AD (f64)."""
    t, yerr, y = wide_data
    kernel = _wide_complex_kernel(64)
    gp = GP(kernel)
    gp.compute(t, yerr)
    ref = _dense_ll(kernel, t, yerr, y)
    theta = jnp.asarray(gp.get_parameter_vector())

    fb = gp.build_loglik(t, y, yerr, solver="blocked")
    ll, ok = fb(theta)
    assert bool(ok)
    np.testing.assert_allclose(float(ll), ref, rtol=1e-12)

    fs = gp.build_loglik(t, y, yerr, solver="seq")
    gb = jax.grad(lambda th: fb(th)[0])(theta)
    gs = jax.grad(lambda th: fs(th)[0])(theta)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gs),
                               rtol=1e-8, atol=1e-10)


def test_wide_solver_ops_match_dense(wide_data):
    """rank 64 solve/dot/logdet through the solver facade vs dense."""
    t, yerr, y = wide_data
    kernel = _wide_complex_kernel(32)
    gp = GP(kernel)
    gp.compute(t, yerr)

    tau = np.abs(t[:, None] - t[None, :])
    ar, cr, ac, bc, cc, dc = [np.asarray(x) for x in kernel.coefficients]
    K = np.zeros((len(t), len(t)))
    for a, b, c, d in zip(ac, bc, cc, dc):
        K += np.exp(-c * tau) * (a * np.cos(d * tau) + b * np.sin(d * tau))
    Kd = K.copy()
    Kd[np.diag_indices_from(Kd)] += yerr**2

    np.testing.assert_allclose(
        np.asarray(gp.apply_inverse(y)).ravel(),
        np.linalg.solve(Kd, y), rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(gp.dot(y)).ravel(), K @ y, rtol=1e-9, atol=1e-10
    )
    _, logdet = np.linalg.slogdet(Kd)
    np.testing.assert_allclose(
        float(gp.solver.log_determinant()), logdet, rtol=1e-12
    )
