"""Tests for the full-tile in-kernel-lowering kernels (ops/fused4.py).

Strategy: an XLA mirror of the in-kernel lowering (same ds formulas on the
same Plan4 statics) feeds the already-validated 3-D adjoint pipeline
(ops/adjoint.run_kernel, itself tested against ops/blocked and the dense
oracle).  The 4-D kernels must agree on values and on gradients w.r.t.
the packed coefficient vector and the data stream.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite_tpu.ops import adjoint, ds as _ds, fused4, lanes4


def _mk_data(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 10.0, n))
    yerr = 0.1 + 0.05 * rng.random(n)
    y = np.sin(t) + 0.1 * rng.standard_normal(n)
    return t, y, yerr


def _xla_lower4(cf, plan, jr, jc):
    """Vectorized mirror of fused4._lower_step over the whole plan."""
    t, tl, dt, dg, m = plan.t, plan.t_lo, plan.dt, plan.diag, plan.mask
    cols_u, cols_v, cols_p = [], [], []
    for j in range(jr):
        cols_u.append(cf[j] * m)
        cols_v.append(m)
        cols_p.append(_ds.accurate_exp(-cf[jr + j] * dt))
    for j in range(jc):
        ac = cf[2 * jr + j]
        bc = cf[2 * jr + jc + j]
        cc = cf[2 * jr + 2 * jc + j]
        dc = cf[2 * jr + 3 * jc + j]
        r_hi, r_lo = _ds.reduced_angle(dc, t, tl)
        cs = jnp.cos(r_hi) - r_lo * jnp.sin(r_hi)
        sn = jnp.sin(r_hi) + r_lo * jnp.cos(r_hi)
        cm = cs * m
        sm = sn * m
        ph = _ds.accurate_exp(-cc * dt)
        cols_u += [ac * cm + bc * sm, ac * sm - bc * cm]
        cols_v += [cm, sm]
        cols_p += [ph, ph]
    u = jnp.stack(cols_u, axis=1)
    v = jnp.stack(cols_v, axis=1)
    ph = jnp.stack(cols_p, axis=1)
    a = (m * (dg + cf[2 * jr + 4 * jc]) + (1.0 - m))[:, None]
    return u, v, ph, a


def _ref_ll(cf, plan, jr, jc, y4=None):
    """Reference: XLA lowering + 3-D adjoint pipeline (interpret mode)."""
    u, v, ph, a = _xla_lower4(cf, plan, jr, jc)
    L, s8, w = plan.t.shape
    b = s8 * w
    p = jr + 2 * jc

    def to3(x):
        return x.reshape(L, -1, b)

    y = plan.y if y4 is None else y4
    ll, ok = adjoint.run_kernel(
        to3(u).reshape(L, p, b), to3(v).reshape(L, p, b),
        to3(ph).reshape(L, p, b), a.reshape(L, 1, b),
        y.reshape(L, 1, b), plan.n,
    )
    return ll, ok


CASES = [
    # (jr, jc, cf-builder); complex terms keep a*c > b*d (PSD)
    (1, 0, lambda: [0.8, 0.7]),
    (0, 1, lambda: [0.9, 0.2, 0.8, 1.7]),
    (2, 1, lambda: [0.5, 0.3, 1.1, 0.6, 0.7, 0.2, 0.8, 2.3]),
]


def _pack(jr, jc, vals, jitter=0.05):
    vals = np.asarray(vals, np.float64)
    a_real = vals[:jr]
    a_comp = vals[2 * jr: 2 * jr + jc]
    total = a_real.sum() + a_comp.sum() + jitter
    return jnp.asarray(np.concatenate([vals, [total]]))


@pytest.mark.parametrize("jr,jc,mk", CASES)
@pytest.mark.parametrize("n,b", [(257, 32)])
def test_primal_matches_reference(jr, jc, mk, n, b):
    t, y, yerr = _mk_data(n)
    plan = lanes4.make_plan4(t, y, yerr**2, b, dtype=np.float64)
    cf = _pack(jr, jc, mk())

    ll4, ok4 = fused4.run_primal(cf, plan, jr, jc, interpret=True)
    llr, okr = _ref_ll(cf, plan, jr, jc)
    assert bool(ok4) and bool(okr)
    np.testing.assert_allclose(float(ll4), float(llr), rtol=1e-12)


@pytest.mark.parametrize("jr,jc,mk", CASES)
@pytest.mark.slow
def test_grad_matches_reference(jr, jc, mk):
    n, b = 257, 32
    t, y, yerr = _mk_data(n, seed=3)
    plan = lanes4.make_plan4(t, y, yerr**2, b, dtype=np.float64)
    cf = _pack(jr, jc, mk())

    fn = fused4.build_ll_and_grad(plan, jr, jc, interpret=True)

    def f4(cf, y4):
        ll, _ = fn(cf, y4)
        return ll

    def fr(cf, y4):
        ll, _ = _ref_ll(cf, plan, jr, jc, y4=y4)
        return ll

    ll4 = f4(cf, plan.y)
    llr = fr(cf, plan.y)
    np.testing.assert_allclose(float(ll4), float(llr), rtol=1e-12)

    g4_cf, g4_y = jax.grad(f4, argnums=(0, 1))(cf, plan.y)
    gr_cf, gr_y = jax.grad(fr, argnums=(0, 1))(cf, plan.y)
    np.testing.assert_allclose(
        np.asarray(g4_cf), np.asarray(gr_cf), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(g4_y), np.asarray(gr_y), rtol=1e-9, atol=1e-12
    )


@pytest.mark.slow
def test_wide_p12_primal_and_grad():
    """P = 12 (three padded SHO terms): the widest fused4-gated model.

    On hardware this width needs the raised Mosaic VMEM limit
    (fused4._cparams); in interpret mode it checks the unrolled (P, P)
    algebra — prefix composition, Gauss-Jordan inverse — at a width the
    parametrized CASES (P <= 4) never reach.
    """
    n, b = 65, 16
    jr, jc = 6, 3
    t, y, yerr = _mk_data(n, seed=23)
    plan = lanes4.make_plan4(t, y, yerr**2, b, dtype=np.float64)
    rng = np.random.default_rng(5)
    a_real = 0.2 + rng.random(jr)
    c_real = 0.5 + rng.random(jr)
    a_comp = 0.3 + rng.random(jc)
    c_comp = 0.8 + rng.random(jc)
    d_comp = 0.5 + 2.0 * rng.random(jc)
    # keep a*c > b*d (PSD)
    b_comp = 0.5 * a_comp * c_comp / d_comp
    cf = _pack(jr, jc, np.concatenate(
        [a_real, c_real, a_comp, b_comp, c_comp, d_comp]
    ))

    ll4, ok4 = fused4.run_primal(cf, plan, jr, jc, interpret=True)
    llr, okr = _ref_ll(cf, plan, jr, jc)
    assert bool(ok4) and bool(okr)
    np.testing.assert_allclose(float(ll4), float(llr), rtol=1e-11)

    fn = fused4.build_ll_and_grad(plan, jr, jc, interpret=True)
    g4 = jax.grad(lambda c: fn(c, plan.y)[0])(cf)
    gr = jax.grad(lambda c: _ref_ll(c, plan, jr, jc)[0])(cf)
    np.testing.assert_allclose(
        np.asarray(g4), np.asarray(gr), rtol=1e-8, atol=1e-11
    )


@pytest.mark.slow
def test_grad_finite_difference():
    n, b = 193, 32
    jr, jc = 0, 1
    t, y, yerr = _mk_data(n, seed=7)
    plan = lanes4.make_plan4(t, y, yerr**2, b, dtype=np.float64)
    cf = _pack(jr, jc, [0.9, 0.2, 0.8, 1.7])

    fn = fused4.build_ll_and_grad(plan, jr, jc, interpret=True)

    def f(cfv):
        ll, _ = fn(cfv, plan.y)
        return ll

    g = np.asarray(jax.grad(f)(cf))
    eps = 1e-6
    for k in range(cf.shape[0]):
        e = np.zeros(cf.shape[0])
        e[k] = eps
        fd = (float(f(cf + e)) - float(f(cf - e))) / (2 * eps)
        np.testing.assert_allclose(g[k], fd, rtol=2e-5, atol=1e-7)


def test_pack_cf_roundtrip():
    from celerite_tpu.ops.lower import Coefficients

    coeffs = Coefficients(
        a_real=jnp.asarray([0.5, 0.3]),
        c_real=jnp.asarray([1.1, 0.6]),
        a_comp=jnp.asarray([0.7]),
        b_comp=jnp.asarray([0.2]),
        c_comp=jnp.asarray([0.5]),
        d_comp=jnp.asarray([2.3]),
        jitter=jnp.asarray(0.05),
    )
    cf = lanes4.pack_cf(coeffs, dtype=jnp.float64)
    assert cf.shape[0] == lanes4.cf_len(2, 1)
    np.testing.assert_allclose(
        float(cf[-1]), 0.5 + 0.3 + 0.7 + 0.05, rtol=1e-12
    )


@pytest.mark.slow
def test_chain_folded_batch():
    """Chain-folding: (n_chain, C) batch on a tiled plan == per-chain runs."""
    n, b, nc = 193, 32, 4
    t, y, yerr = _mk_data(n, seed=11)
    jr, jc = 0, 1
    base = np.array([0.9, 0.2, 0.8, 1.7])
    cfs = jnp.stack([
        _pack(jr, jc, base * (1.0 + 0.05 * k)) for k in range(nc)
    ])

    plan1 = lanes4.make_plan4(t, y, yerr**2, b, dtype=np.float64)
    planb = lanes4.make_plan4(t, y, yerr**2, b, dtype=np.float64,
                              n_chain=nc)

    # batched primal
    llb, okb = fused4.run_primal(cfs, planb, jr, jc, interpret=True)
    assert llb.shape == (nc,)
    for k in range(nc):
        ll1, ok1 = fused4.run_primal(cfs[k], plan1, jr, jc, interpret=True)
        assert bool(okb[k]) == bool(ok1)
        np.testing.assert_allclose(float(llb[k]), float(ll1), rtol=1e-12)

    # batched gradient
    fnb = fused4.build_ll_and_grad(planb, jr, jc, n_chain=nc,
                                   interpret=True)
    fn1 = fused4.build_ll_and_grad(plan1, jr, jc, interpret=True)

    def fsum(cfs):
        ll, _ = fnb(cfs, planb.y)
        return jnp.sum(ll), ll

    (tot, llv), gb = jax.value_and_grad(fsum, has_aux=True)(cfs)
    for k in range(nc):
        ll1, _ = fn1(cfs[k], plan1.y)
        np.testing.assert_allclose(float(llv[k]), float(ll1), rtol=1e-12)
        g1 = jax.grad(lambda c: fn1(c, plan1.y)[0])(cfs[k])
        np.testing.assert_allclose(
            np.asarray(gb[k]), np.asarray(g1), rtol=1e-9, atol=1e-12
        )


def test_fold_lanes_layout():
    """Traced fold_lanes == the host tiling of make_plan4(n_chain=nc)."""
    n, b, nc = 193, 32, 4
    t, y, yerr = _mk_data(n, seed=13)
    planb = lanes4.make_plan4(t, y, yerr**2, b, dtype=np.float64,
                              n_chain=nc)
    L = planb.t.shape[0]
    folded = lanes4.fold_lanes(
        jnp.broadcast_to(jnp.asarray(y), (nc, n)), b, L,
        dtype=planb.y.dtype,
    )
    np.testing.assert_array_equal(np.asarray(folded), np.asarray(planb.y))


@pytest.mark.slow
def test_chain_folded_mean_residuals():
    """Per-chain residual streams (active mean models) through the fold.

    Each chain subtracts its own constant mean; the folded launch must
    match per-chain single runs on host-subtracted data, and the
    gradient w.r.t. the per-chain mean values must flow through the
    folded data stream.
    """
    n, b, nc = 193, 32, 4
    t, y, yerr = _mk_data(n, seed=17)
    jr, jc = 0, 1
    cf = _pack(jr, jc, [0.9, 0.2, 0.8, 1.7])
    cfs = jnp.stack([cf] * nc)
    means = jnp.asarray([0.0, 0.1, -0.2, 0.35])

    planb = lanes4.make_plan4(t, y, yerr**2, b, dtype=np.float64,
                              n_chain=nc)
    plan1 = lanes4.make_plan4(t, y, yerr**2, b, dtype=np.float64)
    L = planb.t.shape[0]
    fnb = fused4.build_ll_and_grad(planb, jr, jc, n_chain=nc,
                                   interpret=True)
    fn1 = fused4.build_ll_and_grad(plan1, jr, jc, interpret=True)

    def folded_ll(mu):
        mvals = jnp.broadcast_to(mu[:, None], (nc, n))
        y4 = planb.y - planb.mask * lanes4.fold_lanes(
            mvals, b, L, dtype=planb.y.dtype
        )
        ll, _ = fnb(cfs, y4)
        return jnp.sum(ll), ll

    (_, llv), gmu = jax.value_and_grad(folded_ll, has_aux=True)(means)
    for k in range(nc):
        y1 = plan1.y - plan1.mask * lanes4.fold_lanes(
            jnp.full((1, n), means[k]), b, L, dtype=plan1.y.dtype
        )
        ll1, _ = fn1(cf, y1)
        np.testing.assert_allclose(float(llv[k]), float(ll1), rtol=1e-12)
        if k == 1:
            # FD check of the mean-value gradient through the folded
            # stream (one representative chain keeps the test cheap).
            eps = 1e-6
            llp, _ = fn1(cf, plan1.y - plan1.mask * lanes4.fold_lanes(
                jnp.full((1, n), means[k] + eps), b, L,
                dtype=plan1.y.dtype))
            llm, _ = fn1(cf, plan1.y - plan1.mask * lanes4.fold_lanes(
                jnp.full((1, n), means[k] - eps), b, L,
                dtype=plan1.y.dtype))
            fd = (float(llp) - float(llm)) / (2 * eps)
            np.testing.assert_allclose(float(gmu[k]), fd, rtol=1e-5)


@pytest.mark.slow
def test_single_step_grid():
    """L = 1 edge: every @pl.when branch fires in one grid step."""
    n, b = 100, 128  # L = ceil(100/128) = 1
    t, y, yerr = _mk_data(n, seed=5)
    jr, jc = 0, 1
    plan = lanes4.make_plan4(t, y, yerr**2, b, dtype=np.float64)
    assert plan.t.shape[0] == 1
    cf = _pack(jr, jc, [0.9, 0.2, 0.8, 1.7])

    ll4, ok4 = fused4.run_primal(cf, plan, jr, jc, interpret=True)
    llr, okr = _ref_ll(cf, plan, jr, jc)
    assert bool(ok4) and bool(okr)
    np.testing.assert_allclose(float(ll4), float(llr), rtol=1e-12)

    fn = fused4.build_ll_and_grad(plan, jr, jc, interpret=True)
    g = jax.grad(lambda c: fn(c, plan.y)[0])(cf)
    gr = jax.grad(lambda c: _ref_ll(c, plan, jr, jc)[0])(cf)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=1e-9)


@pytest.mark.slow
def test_gp_facade_fused4_vs_blocked():
    """build_loglik solver='fused' (fused4 path) vs blocked, incl. grads
    through the terms chain (SHO Q-branch padding) and value_ok_grad."""
    import jax.numpy as jnp_
    from celerite_tpu import GP, terms

    rng = np.random.default_rng(9)
    n = 512
    t = np.sort(rng.uniform(0, 20, n))
    yerr = np.full(n, 0.15)
    y = np.sin(t) + 0.1 * rng.standard_normal(n)
    kernel = terms.SHOTerm(log_S0=0.1, log_Q=0.9, log_omega0=0.4)
    gp = GP(kernel)
    f4 = gp.build_loglik(t, y, yerr=yerr, solver="fused", block_size=32,
                         fast_grad=True)
    fb = gp.build_loglik(t, y, yerr=yerr, solver="blocked")
    theta = jnp_.asarray(kernel.get_parameter_vector())
    ll4, ok4 = f4(theta)
    llb, okb = fb(theta)
    assert bool(ok4) and bool(okb)
    np.testing.assert_allclose(float(ll4), float(llb), rtol=1e-10)
    g4 = jax.grad(lambda th: f4(th)[0])(theta)
    gb = jax.grad(lambda th: fb(th)[0])(theta)
    np.testing.assert_allclose(np.asarray(g4), np.asarray(gb), rtol=1e-8)
    ll, ok, gr = f4.value_ok_grad(theta)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gb), rtol=1e-8)


def test_non_pd_returns_minus_inf():
    """Non-PSD coefficients (a c < b d) -> (-inf, False), no exception."""
    n, b = 257, 32
    t, y, yerr = _mk_data(n)
    plan = lanes4.make_plan4(t, y, yerr**2, b, dtype=np.float64)
    cf = _pack(0, 1, [0.9, 0.3, 0.45, 1.7], jitter=0.0)  # a c < b d
    ll, ok = fused4.run_primal(cf, plan, 0, 1, interpret=True)
    assert not bool(ok)
    assert np.isneginf(float(ll))


def _mk_fleet(seed=21):
    rng = np.random.default_rng(seed)
    lengths = np.array([97, 64, 110])
    Lmax = 128
    t2 = np.zeros((3, Lmax)); y2 = np.zeros((3, Lmax))
    d2 = np.zeros((3, Lmax))
    for i, n in enumerate(lengths):
        t2[i, :n] = np.sort(rng.uniform(0, 10.0, n))
        y2[i, :n] = np.sin(t2[i, :n]) + 0.1 * rng.standard_normal(n)
        d2[i, :n] = (0.1 + 0.05 * rng.random(n)) ** 2
    return t2, y2, d2, lengths


@pytest.mark.slow
def test_fleet_folding_per_curve():
    """One lane per curve == independent single-curve runs (ll + grad)."""
    t2, y2, d2, lengths = _mk_fleet()
    jr, jc = 0, 1
    cf = _pack(jr, jc, [0.9, 0.2, 0.8, 1.7])

    plan = lanes4.make_plan4_curves(t2, y2, d2, lengths,
                                    dtype=np.float64)
    nseg = plan.num_blocks
    lls, oks = fused4.run_primal(cf, plan, jr, jc, n_seg=nseg,
                                 state_seg=1, interpret=True)
    fn = fused4.build_ll_and_grad(plan, jr, jc, n_seg=nseg, state_seg=1,
                                  interpret=True)

    def fsum(c):
        ll, ok = fn(c, plan.y)
        return jnp.sum(ll), (ll, ok)

    (tot, (llg, okg)), g = jax.value_and_grad(fsum, has_aux=True)(cf)

    gsum = np.zeros_like(np.asarray(cf))
    for i, n in enumerate(lengths):
        ti = t2[i, :n]; yi = y2[i, :n]; di = d2[i, :n]
        p1 = lanes4.make_plan4(ti, yi, di, 8, dtype=np.float64)
        ll1, ok1 = fused4.run_primal(cf, p1, jr, jc, interpret=True)
        assert bool(oks[i]) and bool(ok1)
        np.testing.assert_allclose(float(lls[i]), float(ll1), rtol=1e-11)
        np.testing.assert_allclose(float(llg[i]), float(ll1), rtol=1e-11)
        f1 = fused4.build_ll_and_grad(p1, jr, jc, interpret=True)
        g1 = jax.grad(lambda c: f1(c, p1.y)[0])(cf)
        gsum += np.asarray(g1)
    # padded lanes contribute exactly zero
    np.testing.assert_allclose(np.asarray(g), gsum, rtol=1e-9)
    for k in range(len(lengths), nseg):
        np.testing.assert_allclose(float(lls[k]), 0.0, atol=1e-12)


@pytest.mark.slow
def test_fleet_particle_batch():
    """Fleet tiled per particle: per-particle fleet-summed ll + grads."""
    t2, y2, d2, lengths = _mk_fleet(seed=22)
    jr, jc = 0, 1
    base = np.array([0.9, 0.2, 0.8, 1.7])
    nc = 2
    cfs = jnp.stack([_pack(jr, jc, base * (1 + 0.1 * k))
                     for k in range(nc)])

    planb = lanes4.make_plan4_curves(t2, y2, d2, lengths, n_chain=nc,
                                     dtype=np.float64)
    lanes_per = planb.num_blocks // nc
    fnb = fused4.build_ll_and_grad(planb, jr, jc, n_chain=nc,
                                   state_seg=1, interpret=True)

    def fsum(cfs):
        ll, ok = fnb(cfs, planb.y)
        return jnp.sum(ll), (ll, ok)

    (_, (llv, okv)), gb = jax.value_and_grad(fsum, has_aux=True)(cfs)

    plan1 = lanes4.make_plan4_curves(t2, y2, d2, lengths,
                                     dtype=np.float64)
    f1 = fused4.build_ll_and_grad(plan1, jr, jc,
                                  n_seg=plan1.num_blocks, state_seg=1,
                                  interpret=True)
    for k in range(nc):
        def tot1(c):
            ll, ok = f1(c, plan1.y)
            return jnp.sum(ll)
        np.testing.assert_allclose(float(llv[k]), float(tot1(cfs[k])),
                                   rtol=1e-11)
        g1 = jax.grad(tot1)(cfs[k])
        np.testing.assert_allclose(np.asarray(gb[k]), np.asarray(g1),
                                   rtol=1e-9)


@pytest.mark.slow
def test_fold_cap_chunked_matches_direct(monkeypatch):
    """The chunked fold path (batch > CELERITE_TPU_FOLD_CAP) must return
    exactly the same (ll, ok, grad) as the direct folded batch — guards
    the large-N x large-batch constant-size limit (round-3 fix for the
    remote-compile 413 at n_chain * N > 2^23)."""
    import jax
    from celerite_tpu import GP, terms

    rng = np.random.default_rng(0)
    n = 512
    t = np.sort(rng.uniform(0, 20, n))
    yerr = np.full(n, 0.1)
    y = np.sin(0.3 * t) + yerr * rng.standard_normal(n)
    gp = GP(terms.SHOTerm(log_S0=0.1, log_Q=0.8, log_omega0=0.6))
    gp.compute(t, yerr)
    theta = jnp.asarray(gp.get_parameter_vector())
    ths = theta[None, :] + 0.05 * jnp.asarray(
        rng.standard_normal((6, 3))
    )

    # Exercise the real fold machinery off-TPU (interpret mode).
    monkeypatch.setenv("CELERITE_TPU_FORCE_FOLD", "1")

    def batched(cap):
        if cap:
            monkeypatch.setenv("CELERITE_TPU_FOLD_CAP", cap)
        else:
            monkeypatch.delenv("CELERITE_TPU_FOLD_CAP", raising=False)
        f = gp.build_loglik(t, y, yerr, solver="fused")
        return jax.jit(lambda th: jax.vmap(f.value_ok_grad)(th))(ths)

    ll_d, ok_d, g_d = batched(None)
    ll_c, ok_c, g_c = batched("2")
    np.testing.assert_allclose(np.asarray(ll_c), np.asarray(ll_d),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(ok_c), np.asarray(ok_d))
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_d),
                               rtol=1e-10, atol=1e-12)
