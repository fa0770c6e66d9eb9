#!/usr/bin/env python
"""BASELINE config[0]: RealTerm GP likelihood + NUTS fit, N=1024.

Simulates a series from a RealTerm GP, checks the solver against the dense
oracle (the tests/test_celerite.py pattern), then runs a 4-chain NUTS fit
and prints a posterior summary with diagnostics.
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
from celerite_tpu.inference import sample_nuts, summary
from celerite_tpu.utils import enable_persistent_cache

enable_persistent_cache()  # one-time compiles cache to disk


def main(n=1024, seed=42):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 40, n))
    yerr = np.full(n, 0.25)

    truth = dict(log_a=0.5, log_c=-0.5)
    gp_sim = GP(terms.RealTerm(**truth))
    gp_sim.compute(t, yerr)
    y = gp_sim.sample(seed=seed)

    gp = GP(terms.RealTerm(log_a=0.0, log_c=0.0))
    gp.compute(t, yerr)
    print("initial log-likelihood:", gp.log_likelihood(y))

    logprob = gp.build_logprob(
        t, y, yerr=yerr,
        log_prior=lambda th: -0.5 * jnp.sum((th / 3.0) ** 2),
    )
    init = jnp.asarray(
        gp.get_parameter_vector()[None, :]
        + 0.1 * rng.standard_normal((4, 2))
    )
    chain, info = sample_nuts(
        logprob, init, jax.random.PRNGKey(seed),
        num_warmup=500, num_samples=500,
    )
    stats = summary(np.asarray(chain), names=["log_a", "log_c"])
    for i, name in enumerate(stats["names"]):
        print(
            "{0:8s} mean={1:+.3f} sd={2:.3f} ess={3:6.0f} rhat={4:.3f}"
            " (truth {5:+.3f})".format(
                name, stats["mean"][i], stats["sd"][i],
                stats["ess"][i], stats["rhat"][i], truth[name],
            )
        )
    print("divergences:", int(info["divergences"]))


if __name__ == "__main__":
    main()
