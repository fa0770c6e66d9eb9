"""Posterior parity against the reference pipeline.

The reference workflow (docs/tutorials/modeling.rst:227-246 of
/root/reference) is: celerite log-likelihood + emcee's stretch-move
ensemble sampler.  The pinned constants below were produced by
``tests/generate_reference_moments.py``, which reruns exactly that
pipeline independently of celerite_tpu: a pure-NumPy dense float64
log-posterior (the reference solver matches dense LAPACK to ~1e-15,
paper/ms.tex:958-968) sampled with the published Goodman-Weare (2010)
stretch move (the emcee algorithm).

Here celerite_tpu's own stack — padded term lowering, scan solver, NUTS —
samples the same datasets, and the posterior moments must agree within
Monte-Carlo error.  This is the BASELINE.json north-star parity check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite_tpu import GP, terms
from celerite_tpu.inference import sample_nuts

import parity_common as pc

# Pinned output of tests/generate_reference_moments.py (32 walkers x 1500
# steps, burn 300, seed 123).  Regenerate with that script if the dataset
# constructors in parity_common change.
CONFIG0_MEAN = [1.0524809396884662, -1.083848129375718]
CONFIG0_SD = [0.4805475333660417, 0.4901398205891417]
CONFIG0_SE = [0.01600182111388316, 0.0158125332143724]

CONFIG1_MEAN = [0.3599848714214832, 1.610547318827914,
                -0.027220152376672017]
CONFIG1_SD = [0.24170901260327893, 0.5095741573555335,
              0.04440221220782897]
CONFIG1_SE = [0.006293318709994923, 0.018749883226850263,
              0.0013041393327863767]


def _run_nuts(gp, t, yerr, y, log_prior, theta0, seed, n_chains=8,
              num_warmup=600, num_samples=1200, target_accept=0.8):
    logprob = gp.build_logprob(
        t, y, yerr=yerr, log_prior=log_prior
    )
    rng = np.random.default_rng(seed)
    init = jnp.asarray(
        theta0[None, :] + 0.05 * rng.standard_normal(
            (n_chains, len(theta0))
        )
    )
    chain, info = sample_nuts(
        jax.jit(logprob),
        init,
        jax.random.PRNGKey(seed),
        num_warmup=num_warmup,
        num_samples=num_samples,
        target_accept=target_accept,
    )
    return np.asarray(chain).reshape(-1, len(theta0)), info


def _check_moments(flat, ref_mean, ref_sd, ref_se, n_eff_guess=2000.0):
    ref_mean = np.asarray(ref_mean)
    ref_sd = np.asarray(ref_sd)
    # MC error of OUR mean estimate (conservative ESS guess) combined
    # with the pinned reference standard error.
    se_ours = ref_sd / np.sqrt(n_eff_guess)
    tol = 4.0 * np.sqrt(np.asarray(ref_se) ** 2 + se_ours**2)
    diff = np.abs(flat.mean(0) - ref_mean)
    assert np.all(diff <= tol), (
        "posterior means differ beyond MC error: "
        f"ours={flat.mean(0)!r} ref={ref_mean!r} diff={diff!r} tol={tol!r}"
    )
    np.testing.assert_allclose(flat.std(0), ref_sd, rtol=0.15)


@pytest.mark.slow
def test_posterior_parity_config0_realterm():
    """BASELINE config[0]: RealTerm GP, N=1024 simulated series."""
    t, yerr, y, _, names, truth = pc.make_config0()

    kernel = terms.RealTerm(log_a=truth[0], log_c=truth[1])
    gp = GP(kernel)
    assert gp.get_parameter_names() == (
        "kernel:log_a", "kernel:log_c",
    )

    def log_prior(theta):
        in_box = jnp.all(jnp.abs(theta) <= 12.0)
        return jnp.where(
            in_box, -0.5 * jnp.sum((theta / 3.0) ** 2), -jnp.inf
        )

    flat, info = _run_nuts(gp, t, yerr, y, log_prior, truth, seed=0)
    assert float(info["accept_prob"]) > 0.6
    _check_moments(flat, CONFIG0_MEAN, CONFIG0_SD, CONFIG0_SE)


@pytest.mark.slow
def test_posterior_parity_config1_sho():
    """BASELINE config[1]: SHOTerm oscillator, N=500 Kepler-like series."""
    t, yerr, y, _, names, truth = pc.make_config1()

    kernel = terms.SHOTerm(
        log_S0=truth[0], log_Q=truth[1], log_omega0=truth[2]
    )
    gp = GP(kernel)

    lo_q = float(np.log(0.5) + 1e-6)

    def log_prior(theta):
        ok = jnp.all(jnp.abs(theta) <= 12.0) & (theta[1] >= lo_q)
        return jnp.where(
            ok, -0.5 * jnp.sum((theta / 3.0) ** 2), -jnp.inf
        )

    flat, info = _run_nuts(gp, t, yerr, y, log_prior, truth, seed=1)
    assert float(info["accept_prob"]) > 0.6
    _check_moments(flat, CONFIG1_MEAN, CONFIG1_SD, CONFIG1_SE)


def test_loglik_matches_dense_reference_pipeline():
    """The two pipelines' log-posteriors agree pointwise (f64)."""
    t, yerr, y, logpost_ref, _, truth = pc.make_config1()
    kernel = terms.SHOTerm(
        log_S0=truth[0], log_Q=truth[1], log_omega0=truth[2]
    )
    gp = GP(kernel)
    ll_fn = gp.build_loglik(t, y, yerr=yerr)
    rng = np.random.default_rng(3)
    for _ in range(5):
        th = truth + 0.3 * rng.standard_normal(3)
        ll, ok = ll_fn(jnp.asarray(th))
        assert bool(ok)
        ours = float(ll) + pc.log_prior(th)
        np.testing.assert_allclose(ours, logpost_ref(th), rtol=1e-10)


# Pinned output of tests/generate_reference_moments.py configs 2/3
# (CONFIG2: 40 walkers x 2000 steps burn 400; CONFIG3: 32 x 2000 burn
# 400; seed 123).
CONFIG2_MEAN = [0.07890788872387229, 0.4383493309024832,
                -0.26189859851030717, -1.0226629346377833,
                2.9407010521424697, 1.8013033573706274,
                -1.4179510472425874]
CONFIG2_SD = [0.5102373302422807, 0.5797028728675817,
              0.2445514208872881, 0.092000885289419,
              0.2888757430609442, 0.0073559289577607885,
              0.10682556124659207]
CONFIG2_SE = [0.012517608042749111, 0.015838472698976907,
              0.005970787910870407, 0.002264588207447239,
              0.0068093985030381055, 0.00017846158562904736,
              0.0027481348967769706]

# (CONFIG3 regenerated with the mode-bounded prior — see
# parity_common.make_config3; 32 walkers x 3000 steps, burn 600, seed
# 123; cross-checked stable against seed 7: means within 2 SE, sds
# within 7%.)
CONFIG3_MEAN = [0.3618330571812247, -1.867845162764252,
                -0.4840158546659586, 0.34329685493373485]
CONFIG3_SD = [0.25877177036299165, 1.3098089952333238,
              0.4181210702896329, 0.15765242643444272]
CONFIG3_SE = [0.006182418724609081, 0.03430212744520506,
              0.008774213328621347, 0.003920269241581191]


@pytest.mark.slow
def test_posterior_parity_config2_asteroseismic():
    """BASELINE config[2] anchor: 2xSHOTerm + JitterTerm mixture
    (7 params) at N=768 vs the dense/stretch-move reference pipeline."""
    t, yerr, y, _, names, truth = pc.make_config2()

    kernel = (
        terms.SHOTerm(log_S0=truth[0], log_Q=truth[1],
                      log_omega0=truth[2])
        + terms.SHOTerm(log_S0=truth[3], log_Q=truth[4],
                        log_omega0=truth[5])
        + terms.JitterTerm(log_sigma=truth[6])
    )
    gp = GP(kernel)

    lo_q = float(np.log(0.5) + 1e-6)

    def log_prior(theta):
        ok = (
            jnp.all(jnp.abs(theta) <= 12.0)
            & (theta[1] >= lo_q)
            & (theta[4] >= lo_q)
        )
        return jnp.where(
            ok, -0.5 * jnp.sum((theta / 3.0) ** 2), -jnp.inf
        )

    flat, info = _run_nuts(
        gp, t, yerr, y, log_prior, truth, seed=2, n_chains=8,
        num_warmup=800, num_samples=1500,
    )
    assert float(info["accept_prob"]) > 0.6
    # 7-dim weakly-identified mixture: NUTS ESS on the granulation
    # params is lower than the gaussian-ish configs; widen the ESS guess
    # accordingly but keep the 4-sigma MC gate.
    _check_moments(flat, CONFIG2_MEAN, CONFIG2_SD, CONFIG2_SE,
                   n_eff_guess=800.0)


def _config3_log_prior(theta):
    """The make_config3 prior: gaussian x {positivity, log_d in the
    dominant-mode window, log_b ridge floor} (see parity_common —
    the unconstrained posterior is multimodal in the frequency)."""
    ok = (
        jnp.all(jnp.abs(theta) <= 12.0)
        & (theta[0] + theta[2] >= theta[1] + theta[3])
        & (theta[3] >= -0.5)
        & (theta[3] <= 1.5)
        & (theta[1] >= -6.0)
    )
    return jnp.where(
        ok, -0.5 * jnp.sum((theta / 3.0) ** 2), -jnp.inf
    )


@pytest.mark.slow
def test_posterior_parity_config3_complex():
    """BASELINE config[3] anchor: general ComplexTerm kernel vs the
    dense/stretch-move reference pipeline, via NUTS (exact MCMC)."""
    t, yerr, y, _, names, truth = pc.make_config3()

    kernel = terms.ComplexTerm(
        log_a=truth[0], log_b=truth[1], log_c=truth[2], log_d=truth[3]
    )
    gp = GP(kernel)

    # target_accept=0.95: the posterior has a curvature funnel toward
    # the a*c = b*d positivity boundary; at the default 0.8 the adapted
    # step diverges on ~14% of transitions and truncates the log_d
    # tails (sd biased ~15% low).  The tighter target is the standard
    # remedy (Stan's adapt_delta) and restores tail coverage.
    flat, info = _run_nuts(
        gp, t, yerr, y, _config3_log_prior, truth, seed=3, n_chains=8,
        num_warmup=800, num_samples=1500, target_accept=0.95,
    )
    assert float(info["accept_prob"]) > 0.8
    _check_moments(flat, CONFIG3_MEAN, CONFIG3_SD, CONFIG3_SE,
                   n_eff_guess=1500.0)


@pytest.mark.slow
def test_advi_approximates_config3_posterior():
    """config[3]'s ADVI (the BASELINE-designated method) against the
    pinned reference moments: variational means within fractions of the
    posterior sd, scales within a factor ~2 (mean-field bias bound)."""
    from celerite_tpu.inference import fit_advi

    t, yerr, y, _, names, truth = pc.make_config3()
    kernel = terms.ComplexTerm(
        log_a=truth[0], log_b=truth[1], log_c=truth[2], log_d=truth[3]
    )
    gp = GP(kernel)

    logprob = gp.build_logprob(
        t, y, yerr=yerr, log_prior=_config3_log_prior
    )
    res = fit_advi(
        logprob, jnp.asarray(truth), jax.random.PRNGKey(3),
        num_steps=4000, num_mc=8,
    )
    mu = np.asarray(res.mu)
    sd = np.asarray(res.sigma)
    ref_mean = np.asarray(CONFIG3_MEAN)
    ref_sd = np.asarray(CONFIG3_SD)
    # Mean-field ADVI on a correlated posterior: means land within the
    # bulk; scales are underestimated but same order.
    assert np.all(np.abs(mu - ref_mean) < 1.2 * ref_sd), (mu, ref_mean)
    assert np.all(sd < 2.0 * ref_sd)
    assert np.all(sd > 0.05 * ref_sd)
