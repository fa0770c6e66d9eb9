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


def test_auto_routes_small_n_to_native():
    """solver='auto' picks the native C++ core for small-N eager evals
    (below the accelerator dispatch floor) and the XLA path above it
    (VERDICT r3 item 8; reference anchor: 0.26 ms at N=200,
    example-stats.tex)."""
    import numpy as np
    from celerite_tpu import GP, terms
    from celerite_tpu import native as _native

    if not _native.available():
        import pytest

        pytest.skip("no native toolchain")

    rng = np.random.default_rng(0)
    for n, expect_native in ((200, True), (5000, False)):
        t = np.sort(rng.uniform(0, 10, n))
        yerr = np.full(n, 0.1)
        y = np.sin(t) + yerr * rng.standard_normal(n)
        gp = GP(terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3))
        gp.compute(t, yerr)
        assert (gp.solver._native is not None) == expect_native, n
        ll = gp.log_likelihood(y)
        # Cross-check against the jnp scan backend.
        from celerite_tpu.solver import CholeskySolver

        s2 = CholeskySolver(method="scan")
        coeffs, jitter = gp._eval_coefficients()
        s2.compute(jitter, *coeffs, t=t, diag=yerr**2)
        ll2 = -0.5 * (
            s2.dot_solve(y) + s2.log_determinant()
            + n * np.log(2 * np.pi)
        )
        np.testing.assert_allclose(ll, ll2, rtol=1e-10)


def test_same_solver_recompute_small_to_large_clears_native():
    """Re-computing ONE solver from a native small-N factorization to an
    XLA large-N one must clear the stale NativeSolver: before the fix,
    solve()/log_likelihood after the second compute ran the old C++
    factor (old n) against the new-length buffer and returned garbage
    (ADVICE r4 high-severity finding)."""
    import numpy as np
    from celerite_tpu import GP, terms
    from celerite_tpu import native as _native

    if not _native.available():
        import pytest

        pytest.skip("no native toolchain")

    rng = np.random.default_rng(7)
    gp = GP(terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3))
    for n, expect_native in ((200, True), (5000, False)):
        t = np.sort(rng.uniform(0, 10, n))
        yerr = np.full(n, 0.1)
        y = np.sin(t) + yerr * rng.standard_normal(n)
        gp.compute(t, yerr)
        assert (gp.solver._native is not None) == expect_native, n
        ll = gp.log_likelihood(y)
        assert np.isfinite(ll)
        x = gp.solver.solve(y)
        assert x.shape == (n,)
        assert np.all(np.isfinite(x))
        # Cross-check against a fresh scan-backend solver.
        from celerite_tpu.solver import CholeskySolver

        s2 = CholeskySolver(method="scan")
        coeffs, jitter = gp._eval_coefficients()
        s2.compute(jitter, *coeffs, t=t, diag=yerr**2)
        ll2 = -0.5 * (
            s2.dot_solve(y) + s2.log_determinant()
            + n * np.log(2 * np.pi)
        )
        np.testing.assert_allclose(ll, ll2, rtol=1e-8)
        np.testing.assert_allclose(x, np.asarray(s2.solve(y)), rtol=1e-6,
                                   atol=1e-8)


def test_native_solver_facade_ops_match_scan():
    """solve / dot_solve / dot_L / predict agree between the native and
    scan backends on the same factor."""
    import numpy as np
    from celerite_tpu import native as _native
    from celerite_tpu.solver import CholeskySolver

    if not _native.available():
        import pytest

        pytest.skip("no native toolchain")

    rng = np.random.default_rng(1)
    n = 300
    t = np.sort(rng.uniform(0, 10, n))
    diag = rng.uniform(0.01, 0.02, n)
    y = np.sin(t)
    B = np.stack([y, np.cos(t), t / 10], axis=1)
    args = dict(
        jitter=0.01,
        a_real=np.array([0.5]), c_real=np.array([0.7]),
        a_comp=np.array([0.3]), b_comp=np.array([0.1]),
        c_comp=np.array([0.4]), d_comp=np.array([2.0]),
    )
    s_nat = CholeskySolver(method="native")
    s_scan = CholeskySolver(method="scan")
    for s in (s_nat, s_scan):
        s.compute(t=t, diag=diag, **args)
    assert s_nat._native is not None
    np.testing.assert_allclose(
        s_nat.log_determinant(), s_scan.log_determinant(), rtol=1e-12
    )
    np.testing.assert_allclose(
        s_nat.solve(B), s_scan.solve(B), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        s_nat.dot_solve(y), s_scan.dot_solve(y), rtol=1e-10
    )
    z = rng.standard_normal((n, 2))
    np.testing.assert_allclose(
        s_nat.dot_L(z), s_scan.dot_L(z), rtol=1e-9, atol=1e-12
    )
    xs = np.linspace(0, 10, 101)
    np.testing.assert_allclose(
        s_nat.predict(y, xs), s_scan.predict(y, xs), rtol=1e-8,
        atol=1e-10,
    )
    co = dict(args)
    jit = co.pop("jitter")
    np.testing.assert_allclose(
        s_nat.dot(jit, *co.values(), None, None, None, t, y),
        s_scan.dot(jit, *co.values(), None, None, None, t, y),
        rtol=1e-9, atol=1e-12,
    )
