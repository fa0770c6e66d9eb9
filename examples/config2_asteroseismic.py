#!/usr/bin/env python
"""BASELINE config[2]: asteroseismic granulation model at N ~ 100k.

Sum of SHOTerms (granulation background + oscillation envelope) plus a
JitterTerm, fit with gradient-based NUTS through the block-parallel
solver.  Mirrors the reference's asteroseismology example
(paper/ms.tex Ex.4) at two orders of magnitude more data.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from celerite_tpu import GP, terms
from celerite_tpu.inference import sample_nuts, summary


def main(n=100_000, seed=2, chains=4, warmup=200, samples=200):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 100.0, n))
    yerr = np.full(n, 0.3)

    kernel_true = (
        terms.SHOTerm(log_S0=0.5, log_Q=np.log(1 / np.sqrt(2)),
                      log_omega0=0.0)       # granulation
        + terms.SHOTerm(log_S0=-1.0, log_Q=2.5, log_omega0=1.8)  # osc.
        + terms.JitterTerm(log_sigma=-1.5)
    )
    gp_sim = GP(kernel_true)
    gp_sim.compute(t, yerr)
    y = gp_sim.sample(seed=seed)

    kernel = (
        terms.SHOTerm(log_S0=0.2, log_Q=-0.3, log_omega0=0.2)
        + terms.SHOTerm(log_S0=-0.7, log_Q=2.0, log_omega0=1.6)
        + terms.JitterTerm(log_sigma=-1.0)
    )
    gp = GP(kernel)
    gp.compute(t, yerr)

    logprob = gp.build_logprob(
        t, y, yerr=yerr,
        log_prior=lambda th: -0.5 * jnp.sum((th / 3.0) ** 2),
        solver="blocked",
    )

    dim = gp.vector_size
    init = jnp.asarray(
        gp.get_parameter_vector()[None, :]
        + 0.02 * rng.standard_normal((chains, dim))
    )

    t0 = time.perf_counter()
    chain, info = sample_nuts(
        logprob, init, jax.random.PRNGKey(seed),
        num_warmup=warmup, num_samples=samples, max_tree_depth=8,
    )
    dt = time.perf_counter() - t0
    total = chains * samples
    print(
        "N={0}: {1} samples in {2:.1f}s ({3:.2f} samples/s, "
        "{4} leapfrogs)".format(
            n, total, dt, total / dt, int(info["num_steps"])
        )
    )
    stats = summary(np.asarray(chain),
                    names=gp.get_parameter_names())
    for i, name in enumerate(stats["names"]):
        print(
            "{0:28s} mean={1:+.3f} sd={2:.3f} ess={3:6.0f}".format(
                name, stats["mean"][i], stats["sd"][i], stats["ess"][i]
            )
        )


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    main(n=n)
