"""Dual-ds fused Pallas pipeline (ops/dsfused) vs the lax ds oracle.

The ds kernels must reproduce ops/dsblocked (which tests/test_ds.py pins
against hardware f64) — value AND forward-mode gradient — from the same
packed coefficients, through the interpret-mode Pallas executor on the
CPU lane (conftest pins --xla_cpu_max_isa=SSE4_2 so the compensated
arithmetic survives XLA:CPU).

Shapes are deliberately TINY (n = 64, 8 virtual lanes, single terms):
the dual-ds tracing + interpret execution is minutes-scale at realistic
widths; the full-width config is pinned against the same oracle ON CHIP
instead (the committed 3.6e-8 gradient parity in ops/dsfused.py's
module records / ROADMAP).

Reference bar: hardware-f64 core + forward-mode coefficient AD
(/root/reference/cpp/include/celerite/solver/cholesky.h:41-210,
solver.cpp:347-463).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite_tpu.ops import dsa, dsblocked, dsfused, dslower
from celerite_tpu.ops.lower import Coefficients


def _problem(kind, n=64, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 20.0, n))
    yerr = np.full(n, 0.1)
    y = np.sin(0.7 * t) + yerr * rng.standard_normal(n)
    if kind == "real":
        coeffs = Coefficients(
            a_real=jnp.asarray([0.5], jnp.float32),
            c_real=jnp.asarray([0.3], jnp.float32),
            a_comp=jnp.zeros(0, jnp.float32),
            b_comp=jnp.zeros(0, jnp.float32),
            c_comp=jnp.zeros(0, jnp.float32),
            d_comp=jnp.zeros(0, jnp.float32),
            jitter=jnp.asarray(0.01, jnp.float32),
        )
        jr, jc = 1, 0
    else:
        coeffs = Coefficients(
            a_real=jnp.zeros(0, jnp.float32),
            c_real=jnp.zeros(0, jnp.float32),
            a_comp=jnp.asarray([0.8], jnp.float32),
            b_comp=jnp.asarray([0.1], jnp.float32),
            c_comp=jnp.asarray([0.25], jnp.float32),
            d_comp=jnp.asarray([2.0], jnp.float32),
            jitter=jnp.asarray(0.01, jnp.float32),
        )
        jr, jc = 0, 1
    return t, yerr, y, coeffs, jr, jc


def _unit_tangents(coeffs, jr, jc):
    fields = (
        [("a_real", j) for j in range(jr)]
        + [("c_real", j) for j in range(jr)]
        + [("a_comp", j) for j in range(jc)]
        + [("b_comp", j) for j in range(jc)]
        + [("c_comp", j) for j in range(jc)]
        + [("d_comp", j) for j in range(jc)]
        + [("jitter", None)]
    )
    tangents = []
    for name, j in fields:
        z = {
            f: np.zeros(np.shape(getattr(coeffs, f)), np.float32)
            for f in Coefficients._fields
        }
        if j is None:
            z[name] = np.ones((), np.float32)
        else:
            z[name][j] = 1.0
        tangents.append(
            Coefficients(**{f: jnp.asarray(z[f])
                            for f in Coefficients._fields})
        )
    return tangents


def _oracle(t, yerr, y, coeffs, jr, jc, with_grad=False):
    t_ds = dsa.from_f64(t)
    dt_ds = dsa.from_f64(np.concatenate([[0.0], np.diff(t)]))
    diag = jnp.asarray(yerr**2, jnp.float32)
    if not with_grad:
        ssm = dslower.lower_ds(coeffs, t_ds, dt_ds, diag)
        return dsblocked.gp_log_likelihood(
            ssm, jnp.asarray(y, jnp.float32)
        )
    tangents = _unit_tangents(coeffs, jr, jc)
    assert len(tangents) == dsfused.cf_len(jr, jc)
    ssm_d = dslower.lower_ds(
        coeffs, t_ds, dt_ds, diag, coeff_tangents=tangents
    )
    return dsblocked.gp_log_likelihood_grad(
        ssm_d, jnp.asarray(y, jnp.float32)
    )


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["real", "complex"])
def test_dsfused_value_and_grad_match_dsblocked(kind):
    t, yerr, y, coeffs, jr, jc = _problem(kind)
    plan = dsfused.make_plan_ds(t, y, yerr**2, 8)
    cf = dsfused.pack_cf_ds(coeffs)
    fn = dsfused.build_ll_and_grad_ds(
        plan, jr, jc, tan_chunk=2, interpret=True
    )
    ll, ok, g = fn(cf)
    assert bool(ok)

    ll_o, ok_o, g_o = _oracle(t, yerr, y, coeffs, jr, jc,
                              with_grad=True)
    assert bool(ok_o)
    assert abs(float(ll) - float(ll_o)) < 5e-6 * abs(float(ll_o)) + 1e-4
    rel = np.linalg.norm(np.asarray(g) - np.asarray(g_o)) / max(
        np.linalg.norm(np.asarray(g_o)), 1e-12
    )
    assert rel < 1e-5, (np.asarray(g), np.asarray(g_o))


@pytest.mark.slow
def test_dsfused_primal_only():
    t, yerr, y, coeffs, jr, jc = _problem("complex")
    plan = dsfused.make_plan_ds(t, y, yerr**2, 8)
    cf = dsfused.pack_cf_ds(coeffs)
    fn = dsfused.build_ll_ds(plan, jr, jc, interpret=True)
    ll, ok = fn(cf)
    ll_o, ok_o = _oracle(t, yerr, y, coeffs, jr, jc)
    assert bool(ok) and bool(ok_o)
    assert abs(float(ll) - float(ll_o)) < 5e-6 * abs(float(ll_o)) + 1e-4
