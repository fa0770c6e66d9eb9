"""GP API tests (reference analog: tests/test_celerite.py:292-525)."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import celerite_tpu
from celerite_tpu import GP, terms
from celerite_tpu.solver import LinAlgError


def make_data(n=100, seed=42):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 10, n))
    yerr = rng.uniform(0.1, 0.2, n)
    y = np.sin(t) + yerr * rng.standard_normal(n)
    return t, yerr, y


def dense_ll(gp, t, yerr, y):
    K = gp.get_matrix(t)
    K[np.diag_indices_from(K)] += yerr**2 + gp.kernel.jitter
    resid = y - gp.mean.get_value(t)
    _, logdet = np.linalg.slogdet(K)
    return -0.5 * (
        resid @ np.linalg.solve(K, resid)
        + logdet
        + len(t) * np.log(2 * np.pi)
    )


KERNELS = [
    terms.RealTerm(log_a=0.1, log_c=0.5),
    terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5),
    terms.SHOTerm(log_S0=0.1, log_Q=-1.0, log_omega0=0.5),
    terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5)
    + terms.JitterTerm(log_sigma=-1.0),
    terms.ComplexTerm(log_a=0.1, log_b=-0.2, log_c=0.5, log_d=0.1),
    terms.Matern32Term(log_sigma=0.1, log_rho=0.5),
    terms.RealTerm(log_a=0.1, log_c=0.5)
    + terms.ComplexTerm(log_a=0.0, log_b=-0.3, log_c=0.4, log_d=0.2),
]


@pytest.mark.parametrize("kernel", KERNELS)
def test_log_likelihood_vs_dense(kernel):
    t, yerr, y = make_data(80)
    gp = GP(kernel)
    gp.compute(t, yerr)
    np.testing.assert_allclose(
        gp.log_likelihood(y), dense_ll(gp, t, yerr, y), rtol=1e-9
    )


def test_build_gp_protocol():
    kernel = terms.RealTerm(log_a=0.1, log_c=0.5) + terms.SHOTerm(
        log_S0=0.1, log_Q=1.0, log_omega0=0.5
    )
    gp = GP(kernel, mean=1.5, fit_mean=True)
    names = gp.get_parameter_names()
    assert "kernel:terms[0]:log_a" in names
    assert "mean:value" in names
    assert gp.vector_size == 6
    gp.set_parameter_vector([0.2, 0.4, 0.1, 0.9, 0.4, 1.0])
    assert gp.dirty
    with pytest.raises(ValueError):
        gp.set_parameter_vector([0.2, 0.4])
    gp.freeze_parameter("mean:value")
    assert gp.vector_size == 5


def test_dirty_flag_recompute():
    t, yerr, y = make_data(60)
    gp = GP(terms.RealTerm(log_a=0.1, log_c=0.5))
    gp.compute(t, yerr)
    ll0 = gp.log_likelihood(y)
    gp.set_parameter("kernel:log_a", 0.4)
    assert gp.dirty
    ll1 = gp.log_likelihood(y)
    assert not gp.dirty
    assert ll0 != ll1
    np.testing.assert_allclose(ll1, dense_ll(gp, t, yerr, y), rtol=1e-9)


def test_log_likelihood_requires_compute():
    gp = GP(terms.RealTerm(log_a=0.1, log_c=0.5))
    with pytest.raises(RuntimeError):
        gp.log_likelihood(np.zeros(5))


def test_non_pd_quiet():
    t, yerr, y = make_data(60)

    class NegTerm(terms.Term):
        parameter_names = ("log_a", "log_c")
        padded_size = (1, 0)

        def get_real_coefficients(self, params):
            return -jnp.exp(params[0]), jnp.exp(params[1])

    gp = GP(NegTerm(log_a=1.0, log_c=-1.0))
    with pytest.raises(LinAlgError):
        gp.compute(t, 1e-6)
    gp2 = GP(NegTerm(log_a=1.0, log_c=-1.0))
    gp2._t = t
    gp2._yerr = np.full_like(t, 1e-6)
    assert gp2.log_likelihood(y, quiet=True) == -np.inf


@pytest.mark.parametrize("fit_mean", [False, True])
@pytest.mark.parametrize("kernel", KERNELS)
def test_grad_log_likelihood(kernel, fit_mean):
    """Gradient vs central finite differences.

    Reference analog: tests/test_celerite.py:407-466 (eps = 1.34e-7).
    """
    t, yerr, y = make_data(60)
    gp = GP(kernel, mean=0.1, fit_mean=fit_mean)
    gp.compute(t, yerr)
    _, grad = gp.grad_log_likelihood(y)

    vector = gp.get_parameter_vector()
    eps = 1.34e-7
    for i in range(len(vector)):
        vector[i] += eps
        gp.set_parameter_vector(vector)
        llp = gp.log_likelihood(y)
        vector[i] -= 2 * eps
        gp.set_parameter_vector(vector)
        llm = gp.log_likelihood(y)
        vector[i] += eps
        gp.set_parameter_vector(vector)
        fd = (llp - llm) / (2 * eps)
        np.testing.assert_allclose(
            grad[i], fd, rtol=2e-5, atol=1e-4,
            err_msg="parameter {0}".format(i),
        )


def test_grad_matches_ll_value():
    t, yerr, y = make_data(60)
    gp = GP(terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5))
    gp.compute(t, yerr)
    val, _ = gp.grad_log_likelihood(y)
    np.testing.assert_allclose(val, gp.log_likelihood(y), rtol=1e-10)


def test_predict():
    """Mean/cov/var vs dense formulas (tests/test_celerite.py:468-496)."""
    t, yerr, y = make_data(80)
    gp = GP(
        terms.RealTerm(log_a=0.1, log_c=0.5)
        + terms.ComplexTerm(log_a=0.0, log_b=-0.3, log_c=0.4, log_d=0.2)
    )
    gp.compute(t, yerr)

    K = gp.get_matrix(include_diagonal=True)
    x = np.sort(np.random.default_rng(5).uniform(-1, 11, 50))
    Kxs = gp.get_matrix(x, t)
    expect_mu = Kxs @ np.linalg.solve(K, y)
    mu, cov = gp.predict(y, x)
    np.testing.assert_allclose(mu, expect_mu, rtol=1e-7, atol=1e-8)
    expect_cov = gp.get_matrix(x) - Kxs @ np.linalg.solve(K, Kxs.T)
    np.testing.assert_allclose(cov, expect_cov, rtol=1e-6, atol=1e-7)

    mu2, var = gp.predict(y, x, return_var=True)
    np.testing.assert_allclose(mu2, mu)
    np.testing.assert_allclose(var, np.diag(expect_cov), rtol=1e-6,
                               atol=1e-7)

    # same-grid fast path
    mu3 = gp.predict(y, return_cov=False)
    Ktt = gp.get_matrix(t, t)
    np.testing.assert_allclose(
        mu3, Ktt @ np.linalg.solve(K, y), rtol=1e-7, atol=1e-8
    )


def test_predict_with_general():
    t, yerr, y = make_data(60)
    gp = GP(terms.RealTerm(log_a=0.1, log_c=0.5))
    scale = 0.1
    U = np.vander((t - t.min()) / (t.max() - t.min()), 2).T * scale
    V = 0.5 * U
    A = np.sum(U * V, axis=0)
    gp.compute(t, yerr, A=A, U=U, V=V)
    ll = gp.log_likelihood(y)
    K = gp.get_matrix(include_diagonal=True, include_general=True)
    resid = y
    _, logdet = np.linalg.slogdet(K)
    expect = -0.5 * (
        resid @ np.linalg.solve(K, resid)
        + logdet
        + len(t) * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(ll, expect, rtol=1e-9)


def test_dot():
    t, yerr, y = make_data(60)
    gp = GP(terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5))
    gp.compute(t, yerr)
    K = gp.get_matrix(t, t)
    K[np.diag_indices_from(K)] += gp.kernel.jitter
    np.testing.assert_allclose(
        np.asarray(gp.dot(y)).reshape(-1), K @ y, rtol=1e-9
    )


def test_apply_inverse():
    t, yerr, y = make_data(60)
    gp = GP(terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5))
    gp.compute(t, yerr)
    K = gp.get_matrix(include_diagonal=True)
    np.testing.assert_allclose(
        np.asarray(gp.apply_inverse(y)).reshape(-1),
        np.linalg.solve(K, y),
        rtol=1e-7,
        atol=1e-9,
    )


def test_sample_shapes_and_moments():
    t, yerr, _ = make_data(40)
    gp = GP(terms.RealTerm(log_a=0.1, log_c=0.5), mean=2.0)
    gp.compute(t, yerr)
    np.random.seed(42)
    s = gp.sample()
    assert s.shape == (40,)
    s = gp.sample(size=500)
    assert s.shape == (500, 40)
    K = gp.get_matrix(include_diagonal=True)
    emp = np.cov(s.T)
    assert np.abs(emp - K).max() < 0.5 * np.abs(K).max()


def test_gp_pickle():
    t, yerr, y = make_data(40)
    gp = GP(terms.RealTerm(log_a=0.1, log_c=0.5))
    gp.compute(t, yerr)
    ll = gp.log_likelihood(y)
    gp2 = pickle.loads(pickle.dumps(gp))
    np.testing.assert_allclose(gp2.log_likelihood(y), ll)


def test_build_loglik_jit_vmap():
    t, yerr, y = make_data(64)
    gp = GP(terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5))
    gp.compute(t, yerr)
    fn = gp.build_loglik(t, y, yerr=yerr)
    theta = jnp.asarray(gp.get_parameter_vector())
    ll, ok = jax.jit(fn)(theta)
    assert bool(ok)
    np.testing.assert_allclose(float(ll), gp.log_likelihood(y), rtol=1e-9)

    # vmap over a batch of parameter vectors
    thetas = jnp.stack([theta, theta + 0.1, theta - 0.1])
    lls, oks = jax.vmap(fn)(thetas)
    assert lls.shape == (3,)
    assert bool(jnp.all(oks))

    # grad through the jitted closure
    g = jax.grad(lambda th: fn(th)[0])(theta)
    assert np.all(np.isfinite(np.asarray(g)))


def test_log_white_noise_compat():
    t, yerr, y = make_data(40)
    with pytest.warns(UserWarning):
        gp = GP(
            terms.RealTerm(log_a=0.1, log_c=0.5), log_white_noise=-1.0
        )
    gp.compute(t, yerr)
    assert np.isfinite(gp.log_likelihood(y))
    assert gp.kernel.jitter > 0


def test_build_loglik_fast_grad_matches():
    t, yerr, y = make_data(512)
    gp = GP(terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5))
    gp.compute(t, yerr)
    fast = gp.build_loglik(t, y, yerr=yerr, solver="blocked",
                           fast_grad=True)
    slow = gp.build_loglik(t, y, yerr=yerr, solver="blocked")
    theta = jnp.asarray(gp.get_parameter_vector())
    (v1, ok1), g1 = jax.value_and_grad(fast, has_aux=True)(theta)
    (v2, ok2), g2 = jax.value_and_grad(slow, has_aux=True)(theta)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9)


@pytest.mark.slow
def test_incremental_kernel_sum():
    """Kernel sums grown term by term up to P=26, each vs the dense ll.

    Reference analog: tests/test_celerite.py:346-370 — catches
    coefficient-ordering bugs at much higher rank than the fixed 3-term
    mixes elsewhere in this suite.  Runs through the facade (seq solver)
    and the blocked build_loglik path at every increment.
    """
    rng = np.random.default_rng(42)
    t = np.sort(rng.uniform(0, 1, 10))
    yerr = rng.uniform(0.1, 0.5, len(t))
    y = np.sin(t)

    U = np.vander(t - np.mean(t), 4).T
    V = U * rng.uniform(size=4)[:, None]
    A = np.sum(U * V, axis=0) + 1e-8

    kernel = terms.RealTerm(0.1, 0.5)
    termlist = [(0.1 + 10.0 / j, 0.5 + 10.0 / j) for j in range(1, 4)]
    termlist += [
        (1.0 + 10.0 / j, 0.01 + 10.0 / j, 0.5, 0.01) for j in range(1, 10)
    ]
    termlist += [(0.6, 0.7, 1.0), (0.3, 0.05, 0.5, 0.6)]
    # The blocked-solver cross-check recompiles per increment (every
    # increment changes P); run it at the first/middle/final ranks only
    # to keep the suite's wall-clock down — the dense-oracle comparison
    # still runs at every increment.
    blocked_at = {0, len(termlist) // 2, len(termlist) - 1}
    for inc, par in enumerate(termlist):
        if len(par) > 2:
            kernel = kernel + terms.ComplexTerm(*par)
        else:
            kernel = kernel + terms.RealTerm(*par)
        for with_general in (False, True):
            gp = GP(kernel)
            if with_general:
                gp.compute(t, yerr, A=A, U=U, V=V)
            else:
                gp.compute(t, yerr)
            ll = gp.log_likelihood(y)

            K = gp.get_matrix(t)
            K[np.diag_indices_from(K)] += yerr**2
            if with_general:
                K[np.diag_indices_from(K)] += A
                K += np.tril(U.T @ V, -1) + np.triu(V.T @ U, 1)
            _, logdet = np.linalg.slogdet(K)
            ll0 = -0.5 * (
                y @ np.linalg.solve(K, y)
                + logdet
                + len(t) * np.log(2 * np.pi)
            )
            np.testing.assert_allclose(ll, ll0, rtol=1e-8)

            # Same increment through the blocked block-parallel solver.
            if inc in blocked_at:
                fn = gp.build_loglik(
                    t, y, yerr=yerr, solver="blocked", block_size=4
                )
                llb, okb = fn(jnp.asarray(gp.get_parameter_vector()))
                assert bool(okb)
                np.testing.assert_allclose(float(llb), ll0, rtol=1e-8)


def test_nyquist_singularity():
    """High-Q Lorentzian sampled at (nearly exactly) Nyquist.

    Reference analog: tests/test_celerite.py:498-525 — a documented
    failure mode of Green's-function-based CARMA solvers that the
    celerite factorization must survive.
    """
    rng = np.random.default_rng(4220)
    kernel = terms.ComplexTerm(1.0, np.log(1e-6), np.log(1.0))
    gp = GP(kernel)

    ts = np.array([0.0, 0.5, 1.0, 1.5])
    ts[1] += 1e-9 * rng.standard_normal()
    ts[2] += 1e-8 * rng.standard_normal()
    ts[3] += 1e-7 * rng.standard_normal()
    ts = np.sort(ts)

    yerr = rng.uniform(0.1, 0.2, len(ts))
    y = rng.standard_normal(len(ts))

    gp.compute(ts, yerr)
    llgp = gp.log_likelihood(y)

    K = gp.get_matrix(ts)
    K[np.diag_indices_from(K)] += yerr**2
    ll = -0.5 * (
        y @ np.linalg.solve(K, y)
        + np.linalg.slogdet(K)[1]
        + len(y) * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(llgp, ll)


def test_build_loglik_fast_compile_matches():
    """fast_compile=True (the cold-start escape hatch: pure-lax blocked
    solver, no Pallas) must agree with the default path and stay
    differentiable via plain AD."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n = 4500  # above the seq cutoff so the default path is non-trivial
    t = np.sort(rng.uniform(0, 20, n))
    yerr = np.full(n, 0.1)
    y = np.sin(t) + yerr * rng.standard_normal(n)
    gp = GP(terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3))
    th = jnp.asarray(gp.get_parameter_vector())

    base = gp.build_loglik(t, y, yerr=yerr)
    fast = gp.build_loglik(t, y, yerr=yerr, fast_compile=True)
    ll0, ok0 = base(th)
    ll1, ok1 = fast(th)
    assert bool(ok0) and bool(ok1)
    np.testing.assert_allclose(float(ll0), float(ll1), rtol=1e-8)
    g = jax.grad(lambda p: fast(p)[0])(th)
    g0 = jax.grad(lambda p: base(p)[0])(th)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g0), rtol=1e-6, atol=1e-8
    )
