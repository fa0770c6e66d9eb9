#!/usr/bin/env python
"""BASELINE config[3]: general ComplexTerm kernel with ADVI + Hessian check.

Fits the 4-parameter ComplexTerm with mean-field ADVI and validates the
variational posterior against the Laplace approximation at the mode
(inverse Hessian), reporting the per-parameter scale ratios.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import jax
import jax.numpy as jnp

from celerite_tpu import GP, terms
from celerite_tpu.inference import fit_advi, laplace_fit
from celerite_tpu.utils import enable_persistent_cache

enable_persistent_cache()  # one-time compiles cache to disk


def main(n=512, seed=3):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 40, n))
    yerr = np.full(n, 0.2)

    # (log_a + log_c >= log_b + log_d keeps the term positive-definite.)
    gp_sim = GP(
        terms.ComplexTerm(log_a=0.3, log_b=-1.0, log_c=-0.3, log_d=0.5)
    )
    gp_sim.compute(t, yerr)
    y = gp_sim.sample(seed=seed)

    gp = GP(
        terms.ComplexTerm(log_a=0.0, log_b=-0.7, log_c=0.0, log_d=0.5)
    )
    gp.compute(t, yerr)
    logprob = gp.build_logprob(
        t, y, yerr=yerr,
        log_prior=lambda th: -0.5 * jnp.sum((th / 3.0) ** 2),
    )

    res = fit_advi(
        logprob,
        jnp.asarray(gp.get_parameter_vector()),
        jax.random.PRNGKey(seed),
        num_steps=3000,
        num_mc=8,
    )
    mode, cov = laplace_fit(
        logprob, jnp.asarray(gp.get_parameter_vector()),
        num_steps=3000, learning_rate=2e-2,
    )
    sd_laplace = np.sqrt(np.diag(np.asarray(cov)))

    names = gp.get_parameter_names()
    print("param          ADVI mu   Laplace mode   ADVI sd  Laplace sd")
    for i, name in enumerate(names):
        print(
            "{0:14s} {1:+.3f}    {2:+.3f}         {3:.3f}    {4:.3f}".format(
                name, float(res.mu[i]), float(mode[i]),
                float(res.sigma[i]), sd_laplace[i],
            )
        )
    drift = np.abs(np.asarray(res.mu) - np.asarray(mode))
    print(
        "mode agreement: max |ADVI mu - Laplace mode| = {0:.3f} "
        "({1:.1f} Laplace sd)".format(
            drift.max(), (drift / sd_laplace).max()
        )
    )


if __name__ == "__main__":
    main()
