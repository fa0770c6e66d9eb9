"""Kernel-algebra tests (reference analog: tests/test_terms.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite_tpu import terms
from celerite_tpu.ops import dense
from celerite_tpu.ops.lower import Coefficients


TERMS = [
    terms.RealTerm(log_a=0.1, log_c=0.5),
    terms.RealTerm(log_a=0.1, log_c=0.5)
    + terms.RealTerm(log_a=-0.1, log_c=0.7),
    terms.ComplexTerm(log_a=0.1, log_c=0.5, log_d=0.1),
    terms.ComplexTerm(log_a=0.1, log_b=-0.2, log_c=0.5, log_d=0.1),
    terms.SHOTerm(log_S0=0.1, log_Q=-1.0, log_omega0=0.5),
    terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5),
    terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5)
    + terms.RealTerm(log_a=0.1, log_c=0.4),
    terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5)
    * terms.RealTerm(log_a=0.1, log_c=0.4),
    terms.Matern32Term(log_sigma=0.1, log_rho=0.4),
]


def test_sum_value():
    t1 = terms.RealTerm(log_a=0.1, log_c=0.5)
    t2 = terms.ComplexTerm(log_a=0.2, log_b=-0.1, log_c=0.3, log_d=0.4)
    both = t1 + t2
    tau = np.linspace(0.0, 5.0, 25)
    np.testing.assert_allclose(
        both.get_value(tau), t1.get_value(tau) + t2.get_value(tau)
    )


def test_product_value():
    t1 = terms.SHOTerm(log_S0=0.1, log_Q=0.8, log_omega0=0.5)
    t2 = terms.ComplexTerm(log_a=0.2, log_b=-0.1, log_c=0.3, log_d=0.4)
    prod = t1 * t2
    tau = np.linspace(0.0, 5.0, 25)
    np.testing.assert_allclose(
        prod.get_value(tau),
        t1.get_value(tau) * t2.get_value(tau),
        rtol=1e-12,
        atol=1e-12,
    )


def test_product_of_real_terms():
    t1 = terms.RealTerm(log_a=0.1, log_c=0.5)
    t2 = terms.RealTerm(log_a=-0.3, log_c=0.2)
    tau = np.linspace(0.0, 3.0, 17)
    np.testing.assert_allclose(
        (t1 * t2).get_value(tau), t1.get_value(tau) * t2.get_value(tau)
    )


def test_jitter_rejected_in_products():
    with pytest.raises(ValueError):
        terms.JitterTerm(log_sigma=0.1) * terms.RealTerm(
            log_a=0.1, log_c=0.5
        )


def test_jitter_sums():
    k = (
        terms.JitterTerm(log_sigma=0.1)
        + terms.JitterTerm(log_sigma=-0.4)
        + terms.RealTerm(log_a=0.1, log_c=0.5)
    )
    expect = np.exp(2 * 0.1) + np.exp(2 * -0.4)
    assert np.allclose(k.jitter, expect)


@pytest.mark.parametrize("term", TERMS)
def test_padded_matches_trimmed(term):
    """The padded lowering must represent the same kernel."""
    tau = np.linspace(0.0, 4.0, 31)
    padded = term.get_padded_coefficients(
        jnp.asarray(term.get_parameter_vector(include_frozen=True))
    )
    from celerite_tpu.ops.kernels import kernel_value

    k_pad = np.asarray(kernel_value(*padded, tau))
    np.testing.assert_allclose(k_pad, term.get_value(tau), rtol=1e-10)

    # padded shapes are static
    jr, jc = term.padded_size
    assert padded[0].shape == (jr,)
    assert padded[2].shape == (jc,)


def test_sho_padded_is_traceable_across_branch():
    term = terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5)

    def k0(params):
        c = term.get_padded_coefficients(params)
        from celerite_tpu.ops.kernels import kernel_value

        return kernel_value(*c, jnp.asarray(1.3))

    fn = jax.jit(k0)
    # Values compare near (not at) Q == 1/2: the eager/reference branch is
    # NaN exactly at the boundary (b = a/0), while the padded lowering stays
    # finite there.  rtol accommodates the b ~ 1/f ill-conditioning nearby.
    for log_q in [-2.0, -0.1, np.log(0.5) - 1e-3, np.log(0.5) + 1e-3,
                  0.3, 2.0]:
        params = jnp.asarray([0.1, log_q, 0.5])
        eager = terms.SHOTerm(
            log_S0=0.1, log_Q=log_q, log_omega0=0.5
        ).get_value(1.3)
        np.testing.assert_allclose(float(fn(params)), eager, rtol=1e-5)
    # Value and gradient must be finite everywhere, including exactly at
    # the branch point.
    for log_q in [-2.0, np.log(0.5), 0.3]:
        params = jnp.asarray([0.1, log_q, 0.5])
        assert np.isfinite(float(fn(params)))
        g = jax.grad(k0)(params)
        assert np.all(np.isfinite(np.asarray(g)))


def test_sho_psd():
    s0, q, w0 = np.exp([0.1, 1.0, 0.5])
    term = terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5)
    w = np.linspace(0.0, 5.0, 100)
    expect = (
        np.sqrt(2.0 / np.pi)
        * s0
        * w0**4
        / ((w**2 - w0**2) ** 2 + w0**2 * w**2 / q**2)
    )
    np.testing.assert_allclose(term.get_psd(w), expect, rtol=1e-10)


def test_bounds():
    bounds = {"log_a": (-1.0, 1.0)}
    term = terms.RealTerm(log_a=0.1, log_c=0.5, bounds=bounds)
    assert term.log_prior() == 0.0
    term.log_a = 2.0
    assert np.isinf(term.log_prior())
    with pytest.raises(ValueError):
        terms.RealTerm(log_a=3.0, log_c=0.5, bounds=bounds)
    # quiet bypasses the check
    terms.RealTerm(log_a=3.0, log_c=0.5, bounds=bounds, quiet=True)


def test_parameter_protocol():
    term = terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5)
    assert term.get_parameter_names() == (
        "log_S0",
        "log_Q",
        "log_omega0",
    )
    term.freeze_parameter("log_Q")
    assert term.get_parameter_names() == ("log_S0", "log_omega0")
    assert term.vector_size == 2
    term.set_parameter_vector([0.3, 0.7])
    np.testing.assert_allclose(
        term.get_parameter_vector(include_frozen=True), [0.3, 1.0, 0.7]
    )
    term.thaw_parameter("log_Q")
    assert term.vector_size == 3


@pytest.mark.parametrize("term", TERMS)
def test_coeffs_jacobian_vs_fd(term):
    if not term._has_coeffs:
        pytest.skip("no coefficients")
    eps = 1e-7
    v = term.get_parameter_vector(include_frozen=True)
    jac = term.get_coeffs_jacobian(include_frozen=True)

    def coeffs_at(vec):
        return np.concatenate(
            [
                np.atleast_1d(np.asarray(c))
                for c in term.get_all_coefficients(vec)
            ]
        )

    for i in range(len(v)):
        vp, vm = v.copy(), v.copy()
        vp[i] += eps
        vm[i] -= eps
        fd = (coeffs_at(vp) - coeffs_at(vm)) / (2 * eps)
        np.testing.assert_allclose(
            jac[i], fd, rtol=1e-5, atol=1e-6
        )


def test_check_parameters():
    assert terms.RealTerm(log_a=0.1, log_c=0.5).check_parameters()
    assert terms.SHOTerm(
        log_S0=0.1, log_Q=2.0, log_omega0=0.5
    ).check_parameters()
    # A complex term with a*c < b*d has negative PSD power somewhere.
    bad = terms.ComplexTerm(
        log_a=0.0, log_b=2.0, log_c=0.0, log_d=2.0, quiet=True
    )
    assert not bad.check_parameters()


def test_custom_term_subclass():
    """User terms by subclassing (reference docs/python/kernel.rst:44-79):
    a custom Term with get_real_coefficients works through compute /
    log_likelihood / build_loglik / grad."""
    import jax

    class MyTerm(terms.Term):
        parameter_names = ("log_a", "log_b")

        def get_real_coefficients(self, params):
            log_a, log_b = params
            return (jnp.exp(log_a), jnp.exp(log_b))

    k = MyTerm(log_a=0.1, log_b=-0.3)
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 10, 200))
    yerr = 0.1 * np.ones_like(t)
    from celerite_tpu import GP

    gp = GP(k)
    gp.compute(t, yerr)
    y = np.asarray(gp.sample(seed=1))
    tau = np.abs(t[:, None] - t[None, :])
    K = np.exp(0.1) * np.exp(-np.exp(-0.3) * tau)
    K[np.diag_indices_from(K)] += yerr**2
    _, ld = np.linalg.slogdet(K)
    al = np.linalg.solve(K, y)
    ref = -0.5 * (y @ al + ld + len(t) * np.log(2 * np.pi))
    np.testing.assert_allclose(float(gp.log_likelihood(y)), ref,
                               rtol=1e-10)
    f = gp.build_loglik(t, y, yerr)
    th = jnp.asarray(gp.get_parameter_vector())
    ll, ok = f(th)
    assert bool(ok)
    np.testing.assert_allclose(float(ll), ref, rtol=1e-10)
    g = jax.grad(lambda q: f(q)[0])(th)
    assert np.all(np.isfinite(np.asarray(g)))
