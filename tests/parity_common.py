"""Shared datasets + dense f64 posteriors for the posterior-parity tests.

Everything here is pure NumPy: the datasets and the reference posterior
are generated independently of celerite_tpu, so the parity test compares
two genuinely separate pipelines.  The reference solver agrees with dense
LAPACK log-likelihoods to ~1e-15 (paper/ms.tex:958-968), so the dense f64
posterior IS the reference posterior for these N<=1024 tutorial-scale
models; the sampling side of the reference pipeline (emcee,
docs/tutorials/modeling.rst:227-246) is reproduced by the same
Goodman-Weare (2010) stretch-move algorithm in
generate_reference_moments.py.
"""

import numpy as np


def _dense_loglik(K, y):
    cf = np.linalg.cholesky(K)
    alpha = np.linalg.solve(cf, y)
    logdet = 2.0 * np.sum(np.log(np.diag(cf)))
    return -0.5 * (
        alpha @ alpha + logdet + len(y) * np.log(2.0 * np.pi)
    )


def log_prior(theta):
    """Shared prior: independent N(0, 3^2) on every log-parameter."""
    return -0.5 * np.sum((np.asarray(theta) / 3.0) ** 2)


def make_config0(n=1024, seed=42):
    """BASELINE config[0]: RealTerm GP, simulated series.

    Returns (t, yerr, y, logpost, names, theta_truth).
    """
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 40, n))
    yerr = np.full(n, 0.25)
    a_true, c_true = np.exp(0.5), np.exp(-0.5)
    tau = np.abs(t[:, None] - t[None, :])
    K = a_true * np.exp(-c_true * tau)
    K[np.diag_indices_from(K)] += yerr**2
    y = np.linalg.cholesky(K) @ rng.standard_normal(n)

    def logpost(theta):
        log_a, log_c = theta
        if np.any(np.abs(theta) > 12):
            return -np.inf
        Kt = np.exp(log_a) * np.exp(-np.exp(log_c) * tau)
        Kt[np.diag_indices_from(Kt)] += yerr**2
        try:
            ll = _dense_loglik(Kt, y)
        except np.linalg.LinAlgError:
            return -np.inf
        return ll + log_prior(theta)

    return t, yerr, y, logpost, ["log_a", "log_c"], np.array([0.5, -0.5])


def sho_kernel(tau, log_S0, log_Q, log_w0):
    """Closed-form SHOTerm covariance, Q > 1/2 branch (f64)."""
    S0, Q, w0 = np.exp(log_S0), np.exp(log_Q), np.exp(log_w0)
    f = np.sqrt(4.0 * Q**2 - 1.0)
    a = S0 * w0 * Q
    b = S0 * w0 * Q / f
    c = 0.5 * w0 / Q
    d = 0.5 * w0 / Q * f
    return np.exp(-c * tau) * (a * np.cos(d * tau) + b * np.sin(d * tau))


def make_config1(n=500, seed=7):
    """BASELINE config[1]: SHOTerm oscillator, Kepler-like series.

    Returns (t, yerr, y, logpost, names, theta_truth).
    """
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 60, n))
    yerr = np.full(n, 0.2)
    truth = np.array([0.3, 1.0, 0.0])  # log_S0, log_Q, log_omega0
    tau = np.abs(t[:, None] - t[None, :])
    K = sho_kernel(tau, *truth)
    K[np.diag_indices_from(K)] += yerr**2
    y = np.linalg.cholesky(K) @ rng.standard_normal(n)

    def logpost(theta):
        if np.any(np.abs(theta) > 12) or theta[1] < np.log(0.5) + 1e-6:
            return -np.inf
        Kt = sho_kernel(tau, *theta)
        Kt[np.diag_indices_from(Kt)] += yerr**2
        try:
            ll = _dense_loglik(Kt, y)
        except np.linalg.LinAlgError:
            return -np.inf
        return ll + log_prior(theta)

    names = ["log_S0", "log_Q", "log_omega0"]
    return t, yerr, y, logpost, names, truth


def make_config2(n=768, seed=11):
    """BASELINE config[2] anchor: asteroseismic 2xSHOTerm + jitter
    mixture (7 params) at tutorial scale, where the dense f64 posterior
    is tractable (N=768).  The full-scale N=1e5 run of the same model is the
    throughput benchmark (benchmarks/nuts_config2.py); posterior parity
    is pinned here.

    Returns (t, yerr, y, logpost, names, theta_truth).
    """
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 100, n))
    yerr = np.full(n, 0.3)
    # log_S0_1, log_Q_1, log_w0_1 (granulation), log_S0_2, log_Q_2,
    # log_w0_2 (oscillation), log_sigma (jitter sd).
    truth = np.array([0.5, np.log(1 / np.sqrt(2.0)), 0.0,
                      -1.0, 2.5, 1.8, -1.5])
    tau = np.abs(t[:, None] - t[None, :])

    def build_K(theta):
        K = sho_kernel(tau, *theta[0:3]) + sho_kernel(tau, *theta[3:6])
        K[np.diag_indices_from(K)] += yerr**2 + np.exp(2.0 * theta[6])
        return K

    K = build_K(truth)
    y = np.linalg.cholesky(K) @ rng.standard_normal(n)

    lo_q = np.log(0.5) + 1e-6

    def logpost(theta):
        if (
            np.any(np.abs(theta) > 12)
            or theta[1] < lo_q
            or theta[4] < lo_q
        ):
            return -np.inf
        try:
            ll = _dense_loglik(build_K(theta), y)
        except np.linalg.LinAlgError:
            return -np.inf
        return ll + log_prior(theta)

    names = ["log_S0_1", "log_Q_1", "log_w0_1",
             "log_S0_2", "log_Q_2", "log_w0_2", "log_sigma"]
    return t, yerr, y, logpost, names, truth


def complex_kernel(tau, log_a, log_b, log_c, log_d):
    """Closed-form 4-parameter ComplexTerm covariance (f64)."""
    a, b, c, d = np.exp([log_a, log_b, log_c, log_d])
    return np.exp(-c * tau) * (a * np.cos(d * tau) + b * np.sin(d * tau))


def make_config3(n=512, seed=3):
    """BASELINE config[3] anchor: general ComplexTerm kernel (the ADVI
    config).  Dense f64 posterior over (log_a, log_b, log_c, log_d) with
    the reference's a*c >= b*d positivity constraint
    (reference terms.py:446-451).

    The prior bounds log_d to [-0.5, 1.5] (around the true frequency)
    and log_b to >= -6: the unconstrained posterior is MULTIMODAL in the
    oscillation frequency (harmonic aliases) and ridge-degenerate as
    b -> 0, so marginal moments are not reproducible across finite
    chains — pinning moments of the dominant mode is the well-defined
    parity statement.  (The multimodal regime is configs[4]'s subject,
    exercised by the SMC tests.)

    Returns (t, yerr, y, logpost, names, theta_truth).
    """
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 40, n))
    yerr = np.full(n, 0.2)
    truth = np.array([0.3, -1.0, -0.3, 0.5])
    tau = np.abs(t[:, None] - t[None, :])
    K = complex_kernel(tau, *truth)
    K[np.diag_indices_from(K)] += yerr**2
    y = np.linalg.cholesky(K) @ rng.standard_normal(n)

    def logpost(theta):
        log_a, log_b, log_c, log_d = theta
        if (
            np.any(np.abs(theta) > 12)
            or log_a + log_c < log_b + log_d
            or not (-0.5 <= log_d <= 1.5)
            or log_b < -6.0
        ):
            return -np.inf
        Kt = complex_kernel(tau, *theta)
        Kt[np.diag_indices_from(Kt)] += yerr**2
        try:
            ll = _dense_loglik(Kt, y)
        except np.linalg.LinAlgError:
            return -np.inf
        return ll + log_prior(theta)

    names = ["log_a", "log_b", "log_c", "log_d"]
    return t, yerr, y, logpost, names, truth


def stretch_sample(logpost, p0, n_steps, rng, a=2.0, map_fn=None):
    """Goodman & Weare (2010) affine-invariant stretch move — the emcee
    algorithm, reimplemented from the published recipe.

    p0: (n_walkers, dim) initial ensemble.  Returns (n_steps, n_walkers,
    dim) chain (post-move positions each step).

    ``map_fn``: optional batch evaluator ``positions -> logpost array``
    (e.g. a multiprocessing pool map) — results are independent of it;
    all randomness is drawn before the evaluations.
    """
    if map_fn is None:
        map_fn = lambda ps: np.array([logpost(p) for p in ps])
    n_walkers, dim = p0.shape
    pos = p0.copy()
    lp = map_fn(pos)
    out = np.empty((n_steps, n_walkers, dim))
    half = n_walkers // 2
    for step in range(n_steps):
        for first, second in (
            (slice(0, half), slice(half, None)),
            (slice(half, None), slice(0, half)),
        ):
            idx = np.arange(n_walkers)[first]
            comp = pos[second]
            z = ((a - 1.0) * rng.uniform(size=len(idx)) + 1.0) ** 2 / a
            partners = comp[rng.integers(0, len(comp), len(idx))]
            prop = partners + z[:, None] * (pos[idx] - partners)
            lp_prop = np.asarray(map_fn(prop))
            log_accept = (dim - 1.0) * np.log(z) + lp_prop - lp[idx]
            acc = np.log(rng.uniform(size=len(idx))) < log_accept
            pos[idx[acc]] = prop[acc]
            lp[idx[acc]] = lp_prop[acc]
        out[step] = pos
    return out
