"""Native C++ core vs the JAX scan solver (mutual oracle check)."""

import numpy as np
import pytest

import jax.numpy as jnp

from celerite_tpu import native, terms
from celerite_tpu.ops import seq
from celerite_tpu.ops.lower import Coefficients, lower

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def make_problem(n=300, seed=0):
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
    return ssm, y


def test_native_factor_matches_seq():
    ssm, y = make_problem()
    D, W, ok = native.factor(*[np.asarray(v) for v in ssm])
    assert ok
    f = seq.factor(ssm)
    np.testing.assert_allclose(D, np.asarray(f.D), rtol=1e-13)
    np.testing.assert_allclose(W, np.asarray(f.W), rtol=1e-11, atol=1e-13)


def test_native_loglike_matches_seq():
    ssm, y = make_problem()
    ll, ok = native.loglike(*[np.asarray(v) for v in ssm], y)
    assert ok
    ll_seq, ok_seq = seq.gp_log_likelihood(ssm, jnp.asarray(y))
    np.testing.assert_allclose(ll, float(ll_seq), rtol=1e-13)


def test_native_solver_ops():
    ssm, y = make_problem()
    s = native.NativeSolver(*[np.asarray(v) for v in ssm])
    assert s.ok
    fact = seq.factor(ssm)
    np.testing.assert_allclose(
        s.solve(y),
        np.asarray(seq.solve(ssm, fact, jnp.asarray(y))),
        rtol=1e-10, atol=1e-12,
    )
    rng = np.random.default_rng(5)
    z = rng.standard_normal(len(y))
    np.testing.assert_allclose(
        s.dot_L(z),
        np.asarray(seq.dot_L(ssm, fact, jnp.asarray(z))),
        rtol=1e-10, atol=1e-12,
    )


def test_native_matmul():
    ssm, y = make_problem()
    # matmul semantics need the no-yerr diagonal; rebuild accordingly.
    kernel = terms.SHOTerm(
        log_S0=0.1, log_Q=1.0, log_omega0=0.3
    ) + terms.RealTerm(log_a=0.2, log_c=-0.4)
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 50, 300))
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    ssm0 = lower(coeffs, jnp.asarray(t), jnp.zeros(300))
    s = native.NativeSolver(*[np.asarray(v) for v in ssm0])
    got = s.matmul(y)
    want = np.asarray(seq.matmul(ssm0, jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


def test_native_detects_non_pd():
    n = 100
    t = np.linspace(0, 10, n)
    U = np.full((n, 1), -1.0)
    V = np.ones((n, 1))
    phi = np.exp(-0.1 * np.diff(t, prepend=t[0]))[:, None]
    A = np.full(n, 1e-8) + -1.0  # negative diagonal
    D, W, ok = native.factor(U, V, phi, A)
    assert not ok
