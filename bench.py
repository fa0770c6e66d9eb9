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

    from celerite_tpu import GP, terms
    from celerite_tpu.ops import best_ll
    from celerite_tpu.ops.lower import Coefficients, lower
    from celerite_tpu.utils import enable_persistent_cache

    # One-time compiles through the remote-compile tunnel are
    # minutes-scale; the persistent cache makes re-runs ~27 s total.
    enable_persistent_cache()

    n = 1_000_000

    rng = np.random.default_rng(42)
    t = np.sort(rng.uniform(0, 1000.0, n))
    yerr = np.full(n, 0.1)
    y = rng.standard_normal(n)

    # SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5) expressed directly as
    # its rank-2 complex lowering: identical covariance, but the padded
    # representation is (0 real, 1 complex) = P=2 instead of the SHO
    # Q-branch padding's P=4 — ~30% faster through the fused kernel.
    sho = terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5)
    a, b, c, d = [float(x[0]) for x in sho.coefficients[2:6]]
    kernel = terms.ComplexTerm(
        log_a=np.log(a), log_b=np.log(b), log_c=np.log(c), log_d=np.log(d)
    )
    params = jnp.asarray(
        kernel.get_parameter_vector(include_frozen=True), jnp.float32
    )

    if jax.default_backend() == "tpu":
        # Lane-layout fused Pallas path: static (L, P, B) grid precomputed
        # host-side in f64 (ops/lanes.py), one fused kernel per eval.
        gp = GP(kernel)
        # Primal-only measurement: B=16384 is the primal kernel's sweet
        # spot at N=1e6, P=2 (the shared primal+grad default is 8192).
        ll = jax.jit(
            gp.build_loglik(
                t, y, yerr=yerr, solver="fused", block_size=16384
            )
        )
    else:
        tj = jnp.asarray(t, jnp.float32)
        diagj = jnp.asarray(yerr, jnp.float32) ** 2
        yj = jnp.asarray(y, jnp.float32)

        @jax.jit
        def ll(params):
            coeffs = Coefficients(
                *[
                    c.astype(jnp.float32)
                    for c in kernel.get_padded_coefficients(params)
                ],
                jitter=jnp.zeros((), jnp.float32),
            )
            ssm = lower(coeffs, tj, diagj)
            return best_ll(ssm, yj)

    # compile + warmup
    out = ll(params)
    jax.block_until_ready(out)

    # The tunneled chip shows ms-scale run-to-run variance from external
    # contention (observed 660-1,070 evals/s across rounds).  Report the
    # median of several batches as the headline plus p10/p90/best spread
    # fields so round-over-round deltas are interpretable as contention
    # noise rather than regressions.
    n_iter = 20
    batch_rates = []
    for _ in range(9):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = ll(params)
        jax.block_until_ready(out)
        batch_rates.append(n_iter / (time.perf_counter() - t0))
    rates = np.sort(np.asarray(batch_rates))

    evals_per_s = float(np.median(rates))
    # Reference: 73.8 ms at N=524288 -> scaled to N=1e6 single core.
    ref_evals_per_s = 1.0 / (73.8e-3 * (n / 524288))
    print(
        json.dumps(
            {
                "metric": "gp_loglik_evals_per_s_N1e6_J2_per_chip",
                "value": round(evals_per_s, 3),
                "unit": "evals/s",
                "vs_baseline": round(evals_per_s / ref_evals_per_s, 2),
                "spread": {
                    "n_batches": len(batch_rates),
                    "iters_per_batch": n_iter,
                    "p10": round(float(np.percentile(rates, 10)), 3),
                    "p90": round(float(np.percentile(rates, 90)), 3),
                    "best": round(float(rates[-1]), 3),
                    "worst": round(float(rates[0]), 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
