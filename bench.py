#!/usr/bin/env python
"""Headline benchmark: GP log-likelihood evals/s at N = 1e6, J = 2, per chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline anchor (BASELINE.md): the reference's single-core compute+ll at
J=1-ish SHO class, N=524,288 is 73.8 ms => ~13.5 evals/s.  Scaled linearly to
N = 1e6 that is ~7.1 evals/s; ``vs_baseline`` reports our evals/s over that
reference figure (>1 is better).  Target: <10 ms/eval (>=100 evals/s).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from celerite_tpu import terms
    from celerite_tpu.ops import best_ll
    from celerite_tpu.ops.lower import Coefficients, lower

    n = 1_000_000
    dtype = jnp.float32

    rng = np.random.default_rng(42)
    t = np.sort(rng.uniform(0, 1000.0, n)).astype(np.float32)
    yerr = np.full(n, 0.1, dtype=np.float32)
    y = rng.standard_normal(n).astype(np.float32)

    kernel = terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5)
    params = jnp.asarray(
        kernel.get_parameter_vector(include_frozen=True), dtype
    )

    tj = jnp.asarray(t)
    diagj = jnp.asarray(yerr) ** 2
    yj = jnp.asarray(y)

    @jax.jit
    def ll(params):
        coeffs = Coefficients(
            *[
                c.astype(dtype)
                for c in kernel.get_padded_coefficients(params)
            ],
            jitter=jnp.zeros((), dtype),
        )
        ssm = lower(coeffs, tj, diagj)
        return best_ll(ssm, yj)

    # compile + warmup
    out = ll(params)
    jax.block_until_ready(out)

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = ll(params)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    evals_per_s = 1.0 / dt
    # Reference: 73.8 ms at N=524288 -> scaled to N=1e6 single core.
    ref_evals_per_s = 1.0 / (73.8e-3 * (n / 524288))
    print(
        json.dumps(
            {
                "metric": "gp_loglik_evals_per_s_N1e6_J2_per_chip",
                "value": round(evals_per_s, 3),
                "unit": "evals/s",
                "vs_baseline": round(evals_per_s / ref_evals_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
