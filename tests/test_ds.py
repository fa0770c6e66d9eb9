"""Double-single (f32x2) precision backend: ops/dsa, ops/dslower,
ops/dsblocked and the ``precision="ds"`` mode of GP.build_loglik.

The reference bar is its float64 core
(/root/reference/cpp/include/celerite/solver/cholesky.h:41-210); on TPU
hardware (f32 datapath) the double-single backend is the native
equivalent.  These tests pin:

- dsa primitive accuracy (add/mul/div/transcendentals ~1e-13),
- the end-to-end ll against the f64 oracle at the f32-input
  information limit on an adversarially ill-conditioned wide stack
  that plain f32 gets wrong by *percent* (ROADMAP known-issue 2),
- the GP facade wiring (precision="ds", jit, vmap, grad).

Requires exact compensated f32 arithmetic under jit; conftest pins
``--xla_cpu_max_isa=SSE4_2`` because XLA:CPU's AVX2 FMA contraction
silently breaks it (TPU preserves it natively).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite_tpu import GP, terms
from celerite_tpu.ops import dsa, dsblocked, dslower, seq
from celerite_tpu.ops.lower import Coefficients, lower


def _val(x: dsa.DS):
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


# -- dsa primitives ----------------------------------------------------------


def test_dsa_arithmetic_accuracy():
    rng = np.random.default_rng(0)
    a64 = rng.uniform(0.5, 2.0, 4096)
    b64 = rng.uniform(0.5, 2.0, 4096)
    A, B = dsa.from_f64(a64), dsa.from_f64(b64)

    def rel(ds_val, ref):
        return np.max(np.abs(_val(ds_val) - ref) / np.abs(ref))

    assert rel(jax.jit(dsa.add)(A, B), a64 + b64) < 1e-13
    assert rel(jax.jit(dsa.mul)(A, B), a64 * b64) < 1e-13
    assert rel(jax.jit(dsa.div)(A, B), a64 / b64) < 1e-13


def test_dsa_cancellation():
    # a - a*(1-1e-8): f32 would return garbage; ds keeps ~7 digits
    # (limited by the ds *representation* error of the inputs, eps32^2).
    a = 2.3456789
    A = dsa.from_f64(np.full(128, a))
    B = dsa.from_f64(np.full(128, a * (1 - 1e-8)))
    d = jax.jit(lambda x, y: dsa.add(x, dsa.neg(y)))(A, B)
    true = a * 1e-8
    assert np.max(np.abs(_val(d) - true)) / true < 1e-6


def test_dsa_sum_matvec():
    rng = np.random.default_rng(1)
    M64 = rng.uniform(-3, 3, (16, 16))
    v64 = rng.uniform(-2, 2, 16)
    r = jax.jit(dsa.matvec)(dsa.from_f64(M64), dsa.from_f64(v64))
    assert np.max(np.abs(_val(r) - M64 @ v64)) < 1e-12
    s = jax.jit(lambda x: dsa.sum_axis(x, 0))(dsa.from_f64(v64))
    assert abs(float(_val(s)) - np.sum(v64)) < 1e-13


def test_dsa_transcendentals():
    rng = np.random.default_rng(2)
    x64 = rng.uniform(-60.0, 0.0, 4096)
    e = jax.jit(dsa.exp_ds)(dsa.from_f64(x64))
    assert np.max(np.abs(_val(e) - np.exp(x64)) / np.exp(x64)) < 1e-12
    r64 = rng.uniform(-np.pi, np.pi, 4096)
    s, c = jax.jit(dsa.sincos_ds)(dsa.from_f64(r64))
    assert np.max(np.abs(_val(s) - np.sin(r64))) < 1e-12
    assert np.max(np.abs(_val(c) - np.cos(r64))) < 1e-12


def test_dsa_refine_inv():
    rng = np.random.default_rng(3)
    M64 = rng.uniform(-1, 1, (8, 8)) + 4.0 * np.eye(8)
    M = dsa.from_f64(M64)
    X = jax.jit(lambda M: dsa.refine_inv(M, jnp.linalg.inv(
        (M.hi + M.lo).astype(jnp.float32))))(M)
    R = _val(X) @ M64
    assert np.max(np.abs(R - np.eye(8))) < 1e-11


# -- solver: adversarial ill-conditioned stack --------------------------------


def _adversarial_problem(n=2048, jc=32, diagv=1e-6, seed=1):
    """Summed variance (= jc) >> diagonal: f32 lowering+solver is off by
    percent here and rank>=64 stacks flip pivots (ROADMAP issue 2)."""
    rng = np.random.default_rng(seed)
    t64 = np.sort(rng.uniform(0, 100.0, n))
    a_c = np.full(jc, 1.0)
    b_c = np.zeros(jc)
    c_c = rng.uniform(0.1, 2.0, jc)
    d_c = rng.uniform(0.5, 30.0, jc)
    y64 = rng.standard_normal(n)

    def coeffs(dtype):
        return Coefficients(
            a_real=jnp.zeros((0,), dtype), c_real=jnp.zeros((0,), dtype),
            a_comp=jnp.asarray(a_c, dtype), b_comp=jnp.asarray(b_c, dtype),
            c_comp=jnp.asarray(c_c, dtype), d_comp=jnp.asarray(d_c, dtype),
            jitter=jnp.zeros((), dtype),
        )

    return t64, y64, coeffs, diagv


def test_dsblocked_adversarial_ll_at_f32_information_limit():
    t64, y64, coeffs, diagv = _adversarial_problem()
    n = t64.shape[0]
    ssm64 = lower(coeffs(jnp.float64), jnp.asarray(t64),
                  jnp.full(n, diagv))
    ll64, ok64 = seq.gp_log_likelihood(ssm64, jnp.asarray(y64))
    assert bool(ok64)

    ssm_ds = dslower.lower_ds(
        coeffs(jnp.float32), dsa.from_f64(t64),
        dsa.from_f64(np.concatenate([[0.0], np.diff(t64)])),
        jnp.full(n, diagv, jnp.float32),
    )
    ll_ds, ok_ds = jax.jit(dsblocked.gp_log_likelihood)(
        ssm_ds, jnp.asarray(y64, jnp.float32))
    assert bool(ok_ds)
    rel = abs(float(ll_ds) - float(ll64)) / abs(float(ll64))
    # f32 information limit: f64-with-f32-rounded-y lands at ~4e-8 on
    # this problem; plain f32 solve is ~3.5e-2.  Allow 5x headroom.
    assert rel < 2e-7


@pytest.mark.parametrize(
    "L",
    [pytest.param(64, marks=pytest.mark.slow), 256,
     pytest.param(None, marks=pytest.mark.slow)],
)
def test_dsblocked_block_size_invariance(L):
    t64, y64, coeffs, diagv = _adversarial_problem(n=1024, jc=8,
                                                   diagv=1e-4)
    n = t64.shape[0]
    ssm64 = lower(coeffs(jnp.float64), jnp.asarray(t64),
                  jnp.full(n, diagv))
    ll64, _ = seq.gp_log_likelihood(ssm64, jnp.asarray(y64))
    ssm_ds = dslower.lower_ds(
        coeffs(jnp.float32), dsa.from_f64(t64),
        dsa.from_f64(np.concatenate([[0.0], np.diff(t64)])),
        jnp.full(n, diagv, jnp.float32),
    )
    ll_ds, ok = jax.jit(
        lambda s, y: dsblocked.gp_log_likelihood(s, y, block_size=L)
    )(ssm_ds, jnp.asarray(y64, jnp.float32))
    assert bool(ok)
    assert abs(float(ll_ds) - float(ll64)) / abs(float(ll64)) < 2e-7


def test_dsblocked_promoted_f32_ssm_runs():
    # promote path: plain f32 SSM accepted (zero lo words)
    t64, y64, coeffs, diagv = _adversarial_problem(n=512, jc=4,
                                                   diagv=1e-2)
    n = t64.shape[0]
    ssm32 = lower(coeffs(jnp.float32), jnp.asarray(t64, jnp.float32),
                  jnp.full(n, diagv, jnp.float32))
    ll, ok = dsblocked.gp_log_likelihood(ssm32, jnp.asarray(y64, jnp.float32))
    assert bool(ok) and np.isfinite(float(ll))


def test_dsblocked_non_pd_flagged():
    # negative diagonal makes the matrix indefinite -> (ok=False, -inf)
    t64, y64, coeffs, _ = _adversarial_problem(n=256, jc=4)
    n = t64.shape[0]
    ssm_ds = dslower.lower_ds(
        coeffs(jnp.float32), dsa.from_f64(t64),
        dsa.from_f64(np.concatenate([[0.0], np.diff(t64)])),
        jnp.full(n, -10.0, jnp.float32),
    )
    ll, ok = jax.jit(dsblocked.gp_log_likelihood)(
        ssm_ds, jnp.asarray(y64, jnp.float32))
    assert not bool(ok)
    assert float(ll) == -np.inf


# -- GP facade ---------------------------------------------------------------


def _gp_problem(n=1024):
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 100.0, n))
    y = np.sin(3.0 * t) + 0.1 * rng.standard_normal(n)
    k = terms.SHOTerm(log_S0=1.0, log_Q=2.0, log_omega0=1.1) \
        + terms.RealTerm(log_a=0.3, log_c=-0.5)
    return GP(k), t, y


def test_gp_precision_ds_matches_f64():
    gp, t, y = _gp_problem()
    th = jnp.asarray(gp.get_parameter_vector())
    ll64, ok64 = gp.build_loglik(t, y, yerr=0.05)(th)
    fn = gp.build_loglik(t, y, yerr=0.05, precision="ds")
    ll_ds, ok_ds = jax.jit(fn)(th)
    assert bool(ok64) and bool(ok_ds)
    # the returned ll is f32, so the bound is |ll| * eps32-class
    assert abs(float(ll_ds) - float(ll64)) < 5e-7 * abs(float(ll64)) + 1e-3


@pytest.mark.slow
def test_gp_precision_ds_grad_beats_f32():
    gp, t, y = _gp_problem()
    th = jnp.asarray(gp.get_parameter_vector())
    g64 = jax.grad(lambda p: gp.build_loglik(t, y, yerr=0.05)(p)[0])(th)
    fn = gp.build_loglik(t, y, yerr=0.05, precision="ds")
    g_ds = jax.grad(lambda p: fn(p)[0])(th)
    n64 = np.linalg.norm(np.asarray(g64))
    dev = np.linalg.norm(np.asarray(g_ds) - np.asarray(g64)) / n64
    # plain-AD-through-ds: forward is ds-exact, the cotangent chain is
    # f32 — measured ~3.6e-3 here vs f32 AD's 8.8e-3 on this problem.
    # The ds adjoint (custom VJP) tightens this further; this test pins
    # the plain-AD level so regressions surface.
    assert dev < 6e-3


@pytest.mark.slow
def test_gp_precision_ds_vmap():
    gp, t, y = _gp_problem(n=512)
    th = jnp.asarray(gp.get_parameter_vector())
    fn = gp.build_loglik(t, y, yerr=0.05, precision="ds")
    ths = jnp.stack([th, th + 0.01, th - 0.01])
    lls, oks = jax.vmap(fn)(ths)
    assert lls.shape == (3,) and bool(jnp.all(oks))
    ll0, _ = fn(th)
    assert abs(float(lls[0]) - float(ll0)) < 1e-3


def test_gp_precision_ds_general_blocks_match_f64():
    """General (A, U, V) blocks in ds mode: value AND dual-ds gradient
    vs the f64 oracle path (cholesky.h:148-152 handles general columns
    in-loop in f64; here they are phi=1 ds lanes — VERDICT r4 item 5)."""
    gp, t, y = _gp_problem(n=256)
    n = t.shape[0]
    rng = np.random.default_rng(5)
    # Vandermonde-style PSD-ish general blocks (same construction as
    # tests/test_general_fast.make_general).
    U_g = np.vander((t - t.min()) / (t.max() - t.min()), 2).T * 0.1
    V_g = 0.5 * U_g + 0.01 * rng.standard_normal(U_g.shape)
    A_g = np.sum(U_g * V_g, axis=0) + 0.3
    gp.compute(t, yerr=0.05, A=A_g, U=U_g, V=V_g)
    th = jnp.asarray(gp.get_parameter_vector())

    f64_fn = gp.build_loglik(t, y, yerr=0.05)
    ll64, ok64 = f64_fn(th)
    g64 = jax.grad(lambda p: f64_fn(p)[0])(th)

    fn = gp.build_loglik(t, y, yerr=0.05, precision="ds")
    ll_ds, ok_ds = jax.jit(fn)(th)
    assert bool(ok64) and bool(ok_ds)
    assert abs(float(ll_ds) - float(ll64)) < 5e-7 * abs(float(ll64)) + 1e-3
    _, _, g_ds = fn.value_ok_grad(th)
    n64 = np.linalg.norm(np.asarray(g64))
    assert np.linalg.norm(np.asarray(g_ds) - np.asarray(g64)) / n64 < 1e-4


def test_gp_precision_ds_unknown_value_raises():
    gp, t, y = _gp_problem(n=128)
    with pytest.raises(ValueError, match="precision"):
        gp.build_loglik(t, y, yerr=0.05, precision="f64")


# -- dual-ds forward-mode gradient -------------------------------------------


def test_dual_ds_gradient_tracks_f64():
    """The headline gradient guarantee: ds tangent arithmetic holds the
    gradient at f32-output-rounding class (~3e-7 here), where plain AD
    through the ds graph is ~3.6e-3 and f32 AD ~8.8e-3."""
    gp, t, y = _gp_problem()
    th = jnp.asarray(gp.get_parameter_vector())
    g64 = np.asarray(
        jax.grad(lambda p: gp.build_loglik(t, y, yerr=0.05)(p)[0])(th))
    fn = gp.build_loglik(t, y, yerr=0.05, precision="ds")
    ll, ok, grad = fn.value_ok_grad(th.astype(jnp.float32))
    assert bool(ok)
    dev = np.linalg.norm(np.asarray(grad, np.float64) - g64)
    assert dev / np.linalg.norm(g64) < 5e-6


@pytest.mark.slow
def test_dual_ds_custom_vjp_matches_value_ok_grad():
    gp, t, y = _gp_problem(n=512)
    th = jnp.asarray(gp.get_parameter_vector(), jnp.float32)
    fn = gp.build_loglik(t, y, yerr=0.05, precision="ds")
    _, _, grad = fn.value_ok_grad(th)
    g_vjp = jax.grad(lambda p: fn(p)[0])(th)
    np.testing.assert_allclose(np.asarray(g_vjp), np.asarray(grad),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_dual_ds_gradient_with_active_mean():
    from celerite_tpu.modeling import ConstantModel

    gp_, t, y = _gp_problem(n=512)
    gp = GP(gp_.kernel, mean=ConstantModel(0.3), fit_mean=True)
    th = jnp.asarray(gp.get_parameter_vector())
    g64 = np.asarray(
        jax.grad(lambda p: gp.build_loglik(t, y, yerr=0.05)(p)[0])(th))
    fn = gp.build_loglik(t, y, yerr=0.05, precision="ds")
    ll, ok, grad = fn.value_ok_grad(th.astype(jnp.float32))
    assert bool(ok)
    dev = np.linalg.norm(np.asarray(grad, np.float64) - g64)
    assert dev / np.linalg.norm(g64) < 5e-6


@pytest.mark.slow
def test_dual_ds_gradient_adversarial_misfit():
    """Mis-fitted 3-term model at N=16384: near-cancelling gradient
    components (the ROADMAP 20-30% f32 failure mode, shrunk to test
    scale).  The dual-ds gradient must stay within 1e-4 of f64."""
    rng = np.random.default_rng(0)
    N = 16384
    t = np.sort(rng.uniform(0, 200.0, N))
    y = np.sin(2.7 * t) * 1.5 + 0.3 * rng.standard_normal(N)
    k = terms.SHOTerm(log_S0=1.8, log_Q=0.7, log_omega0=2.2) \
        + terms.SHOTerm(log_S0=-0.5, log_Q=1.1, log_omega0=0.4) \
        + terms.RealTerm(log_a=0.4, log_c=-2.0)
    gp = GP(k)
    th = jnp.asarray(gp.get_parameter_vector())
    g64 = np.asarray(
        jax.grad(lambda p: gp.build_loglik(t, y, yerr=0.1)(p)[0])(th))
    fn = gp.build_loglik(t, y, yerr=0.1, precision="ds")
    ll, ok, grad = fn.value_ok_grad(th.astype(jnp.float32))
    assert bool(ok)
    dev = np.linalg.norm(np.asarray(grad, np.float64) - g64)
    assert dev / np.linalg.norm(g64) < 1e-4


def test_build_logprob_precision_ds_sampler_contract():
    """build_logprob(precision='ds') exposes the fused value_and_grad
    the samplers consume, with -inf-safe semantics and ds-class
    gradient accuracy."""
    rng = np.random.default_rng(1)
    N = 2048
    t = np.sort(rng.uniform(0, 30.0, N))
    y = np.sin(t) + 0.2 * rng.standard_normal(N)
    gp = GP(terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3))
    lp = gp.build_logprob(t, y, yerr=0.2, precision="ds")
    assert hasattr(lp, "value_and_grad")
    th = jnp.asarray(gp.get_parameter_vector(), jnp.float32)
    val, grad = lp.value_and_grad(th)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))

    # Agreement with f64 AD of the plain logprob.
    lp64 = gp.build_logprob(t, y, yerr=0.2)
    v64, g64 = jax.value_and_grad(lp64)(th.astype(jnp.float64))
    np.testing.assert_allclose(float(val), float(v64), rtol=1e-6)
    rel = np.linalg.norm(
        np.asarray(grad, np.float64) - np.asarray(g64)
    ) / np.linalg.norm(np.asarray(g64))
    assert rel < 1e-5, rel

    # Out-of-box prior region must report -inf, zero grad.
    gp2 = GP(terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3,
                           bounds=dict(log_S0=(-1.0, 1.0),
                                       log_Q=(0.0, 2.0),
                                       log_omega0=(-1.0, 1.0))))
    lp3 = gp2.build_logprob(t, y, yerr=0.2, precision="ds")
    bad = jnp.asarray([5.0, 1.0, 0.3], jnp.float32)
    vb, gb = lp3.value_and_grad(bad)
    assert float(vb) == -np.inf
    assert np.all(np.asarray(gb) == 0.0)
