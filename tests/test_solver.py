"""Scan-solver tests against dense oracles.

Reference analog: tests/test_celerite.py:45-289 (log-determinant, solve,
dot, dot_L, pickle) — the "fake backend" is exact dense linear algebra.
"""

import pickle

import numpy as np
import pytest

import jax.numpy as jnp

from celerite_tpu import terms
from celerite_tpu.ops import dense, seq
from celerite_tpu.ops.lower import Coefficients, lower
from celerite_tpu.solver import CholeskySolver, LinAlgError


def make_kernel():
    return (
        terms.RealTerm(log_a=0.1, log_c=0.5)
        + terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3)
        + terms.ComplexTerm(log_a=0.0, log_b=-0.4, log_c=0.2, log_d=0.5)
    )


def make_data(n=128, seed=42):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 10, n))
    yerr = rng.uniform(0.1, 0.2, n)
    y = np.sin(t) + yerr * rng.standard_normal(n)
    return t, yerr, y


def make_general(n, t, seed=3):
    """Vandermonde-style general low-rank blocks (sums to a PSD-ish kernel)."""
    rng = np.random.default_rng(seed)
    scale = 0.1
    U = np.vander((t - t.min()) / (t.max() - t.min()), 3).T * scale
    V = 0.5 * U + 0.01 * rng.standard_normal(U.shape)
    A = np.sum(U * V, axis=0) + 0.3
    return A, U, V


def build_ssm(kernel, t, yerr, general=False):
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    kwargs = {}
    dense_kwargs = {}
    if general:
        A, U, V = make_general(len(t), t)
        kwargs = dict(
            A_gen=jnp.asarray(A),
            U_gen=jnp.asarray(U),
            V_gen=jnp.asarray(V),
        )
        dense_kwargs = dict(A_gen=A, U_gen=U, V_gen=V)
    ssm = lower(coeffs, jnp.asarray(t), jnp.asarray(yerr**2), **kwargs)
    K = np.asarray(
        dense.build_matrix(
            coeffs, jnp.asarray(t), diag=yerr**2, **dense_kwargs
        )
    )
    return ssm, K


@pytest.mark.parametrize("general", [False, True])
def test_log_determinant(general):
    t, yerr, _ = make_data(64)
    ssm, K = build_ssm(make_kernel(), t, yerr, general)
    fact = seq.factor(ssm)
    assert bool(fact.ok)
    _, expect = np.linalg.slogdet(K)
    np.testing.assert_allclose(
        float(jnp.sum(jnp.log(fact.D))), expect, rtol=1e-9
    )


@pytest.mark.parametrize("general", [False, True])
def test_solve(general):
    t, yerr, y = make_data(256)
    ssm, K = build_ssm(make_kernel(), t, yerr, general)
    fact = seq.factor(ssm)
    x = np.asarray(seq.solve(ssm, fact, jnp.asarray(y)))
    np.testing.assert_allclose(x, np.linalg.solve(K, y), rtol=1e-7,
                               atol=1e-9)

    # multi-RHS
    B = np.stack([y, np.cos(t), t / 10], axis=1)
    X = np.asarray(seq.solve(ssm, fact, jnp.asarray(B)))
    np.testing.assert_allclose(X, np.linalg.solve(K, B), rtol=1e-7,
                               atol=1e-9)


@pytest.mark.parametrize("general", [False, True])
def test_dot_solve(general):
    t, yerr, y = make_data(200)
    ssm, K = build_ssm(make_kernel(), t, yerr, general)
    fact = seq.factor(ssm)
    got = float(seq.dot_solve(ssm, fact, jnp.asarray(y)))
    expect = y @ np.linalg.solve(K, y)
    np.testing.assert_allclose(got, expect, rtol=1e-9)


@pytest.mark.parametrize("general", [False, True])
def test_dot_L(general):
    t, yerr, _ = make_data(100)
    ssm, K = build_ssm(make_kernel(), t, yerr, general)
    fact = seq.factor(ssm)
    rng = np.random.default_rng(1)
    z = rng.standard_normal(len(t))
    got = np.asarray(seq.dot_L(ssm, fact, jnp.asarray(z)))
    expect = np.linalg.cholesky(K) @ z
    np.testing.assert_allclose(got, expect, rtol=1e-7, atol=1e-9)


def test_matmul():
    t, yerr, y = make_data(150)
    kernel = make_kernel()
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    # matmul semantics: kernel diagonal + jitter, no yerr
    ssm = lower(coeffs, jnp.asarray(t), jnp.zeros(len(t)))
    K = np.asarray(dense.build_matrix(coeffs, jnp.asarray(t)))
    got = np.asarray(seq.matmul(ssm, jnp.asarray(y)))
    np.testing.assert_allclose(got, K @ y, rtol=1e-9, atol=1e-10)


def test_duplicated_times():
    """dt == 0 entries (phi = 1) must factor correctly.

    Reference analog: tests/test_celerite.py:393-404.
    """
    t = np.sort(np.concatenate([np.linspace(0, 5, 50), [1.0, 2.0, 3.0]]))
    t[t.searchsorted(1.0)] = 1.0
    yerr = np.full_like(t, 0.3)
    ssm, K = build_ssm(make_kernel(), t, yerr)
    fact = seq.factor(ssm)
    assert bool(fact.ok)
    _, expect = np.linalg.slogdet(K)
    np.testing.assert_allclose(
        float(jnp.sum(jnp.log(fact.D))), expect, rtol=1e-9
    )


def test_jitter_only():
    """J == 0 kernels degrade to a diagonal solve (cholesky.h:90-95)."""
    t, yerr, y = make_data(50)
    s = CholeskySolver()
    empty = np.empty(0)
    s.compute(
        0.1, empty, empty, empty, empty, empty, empty, t=t, diag=yerr**2
    )
    d = yerr**2 + 0.1
    np.testing.assert_allclose(
        s.log_determinant(), np.sum(np.log(d)), rtol=1e-12
    )
    np.testing.assert_allclose(s.solve(y), y / d, rtol=1e-12)
    np.testing.assert_allclose(s.dot_solve(y), np.sum(y**2 / d), rtol=1e-12)


def test_solver_class_and_errors():
    t, yerr, y = make_data(64)
    kernel = make_kernel()
    s = CholeskySolver()
    with pytest.raises(RuntimeError):
        s.solve(y)
    assert not s.computed()
    s.compute(
        kernel.jitter, *kernel.coefficients, t=t, diag=yerr**2
    )
    assert s.computed()
    x = s.solve(y)
    _, K = build_ssm(kernel, t, yerr)
    np.testing.assert_allclose(x, np.linalg.solve(K, y), rtol=1e-7,
                               atol=1e-9)
    with pytest.raises(ValueError):
        s.solve(y[:-1])


def test_non_positive_definite_raises():
    """Negative-coefficient kernel must raise LinAlgError.

    Reference analog: tests/test_celerite.py:328-339.
    """
    t = np.linspace(0, 10, 101)
    s = CholeskySolver()
    empty = np.empty(0)
    with pytest.raises(LinAlgError):
        s.compute(
            0.0,
            np.array([-1.0]),
            np.array([0.1]),
            empty,
            empty,
            empty,
            empty,
            t=t,
            diag=np.full_like(t, 1e-8),
        )


def test_pickle_roundtrip():
    t, yerr, y = make_data(64)
    kernel = make_kernel()
    s = CholeskySolver()

    s2 = pickle.loads(pickle.dumps(s))
    assert not s2.computed()

    s.compute(kernel.jitter, *kernel.coefficients, t=t, diag=yerr**2)
    s3 = pickle.loads(pickle.dumps(s))
    assert s3.computed()
    np.testing.assert_allclose(
        s3.log_determinant(), s.log_determinant()
    )
    np.testing.assert_allclose(s3.solve(y), s.solve(y))
    np.testing.assert_allclose(
        s3.predict(y, t[:32] + 0.01), s.predict(y, t[:32] + 0.01)
    )


def test_predict_mean_oracle():
    t, yerr, y = make_data(120)
    kernel = make_kernel()
    s = CholeskySolver()
    s.compute(kernel.jitter, *kernel.coefficients, t=t, diag=yerr**2)
    _, K = build_ssm(kernel, t, yerr)
    rng = np.random.default_rng(7)
    x = np.sort(rng.uniform(-1, 11, 60))  # includes extrapolation
    Kxs = kernel.get_value(x[:, None] - t[None, :])
    expect = Kxs @ np.linalg.solve(K, y)
    got = s.predict(y, x)
    np.testing.assert_allclose(got, expect, rtol=1e-7, atol=1e-9)

    # same-grid prediction
    got_same = s.predict(y, t)
    Ktt = kernel.get_value(t[:, None] - t[None, :])
    np.testing.assert_allclose(
        got_same, Ktt @ np.linalg.solve(K, y), rtol=1e-7, atol=1e-9
    )


def test_solver_blocked_method_agrees():
    t, yerr, y = make_data(800)
    kernel = make_kernel()
    s1 = CholeskySolver(method="scan")
    s2 = CholeskySolver(method="blocked")
    for s in (s1, s2):
        s.compute(kernel.jitter, *kernel.coefficients, t=t, diag=yerr**2)
    np.testing.assert_allclose(
        s1.log_determinant(), s2.log_determinant(), rtol=1e-12
    )
    np.testing.assert_allclose(
        s1.solve(y), s2.solve(y), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        s1.dot_solve(y), s2.dot_solve(y), rtol=1e-10
    )
    rng = np.random.default_rng(4)
    z = rng.standard_normal(len(t))
    np.testing.assert_allclose(
        s1.dot_L(z), s2.dot_L(z), rtol=1e-9, atol=1e-11
    )


@pytest.mark.slow
def test_predict_parallel_matches_sequential():
    from celerite_tpu.ops import seq

    t, yerr, y = make_data(150)
    kernel = make_kernel()
    s = CholeskySolver()
    s.compute(kernel.jitter, *kernel.coefficients, t=t, diag=yerr**2)
    alpha = jnp.asarray(s.solve(y))
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.asarray(kernel.jitter),
    )
    x = np.sort(np.random.default_rng(9).uniform(-1, 11, 80))
    m_seq = np.asarray(
        seq.predict_mean(coeffs, jnp.asarray(t), alpha, jnp.asarray(x))
    )
    m_par = np.asarray(
        seq.predict_mean(
            coeffs, jnp.asarray(t), alpha, jnp.asarray(x), parallel=True
        )
    )
    np.testing.assert_allclose(m_par, m_seq, rtol=1e-10, atol=1e-12)


def test_masked_ll_padding_inert():
    """seq.gp_log_likelihood_masked: padded tail contributes exactly
    nothing (the fleet-container contract, data.py)."""
    import jax.numpy as jnp
    from celerite_tpu import terms
    from celerite_tpu.ops import seq
    from celerite_tpu.ops.lower import Coefficients, lower

    rng = np.random.default_rng(0)
    n, npad = 120, 160
    t = np.sort(rng.uniform(0, 20, n))
    y = rng.standard_normal(n)
    d = np.full(n, 0.04)
    k = terms.SHOTerm(log_S0=0.0, log_Q=1.0, log_omega0=1.0)
    cf = Coefficients(
        *[jnp.asarray(c) for c in k.coefficients], jitter=jnp.zeros(())
    )
    ll_ref, ok = seq.gp_log_likelihood(
        lower(cf, jnp.asarray(t), jnp.asarray(d)), jnp.asarray(y)
    )
    assert bool(ok)
    tp = np.concatenate([t, np.full(npad - n, t[-1])])
    yp = np.concatenate([y, rng.standard_normal(npad - n)])
    dp = np.concatenate([d, np.ones(npad - n)])
    mask = np.concatenate([np.ones(n), np.zeros(npad - n)])
    llm, okm = seq.gp_log_likelihood_masked(
        lower(cf, jnp.asarray(tp), jnp.asarray(dp)),
        jnp.asarray(yp) * jnp.asarray(mask), jnp.asarray(mask), n,
    )
    assert bool(okm)
    np.testing.assert_allclose(float(llm), float(ll_ref), rtol=1e-12)
