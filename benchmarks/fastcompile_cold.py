#!/usr/bin/env python
"""Cold-start wall clock for the ``fast_compile=True`` escape hatch.

Measures what a first-contact user pays on a fresh machine (empty
persistent cache): build ``build_logprob(fast_compile=True)`` for the
config[2] model (N=1e5, 7 params), compile value+grad, evaluate.  Run
with ``CELERITE_TPU_CACHE`` pointed at an empty directory for a true
cold measurement:

    CELERITE_TPU_CACHE=$(mktemp -d) python benchmarks/fastcompile_cold.py

Measured on the one v5e chip (2026-08-21, fresh cache):
  - cold compile + first eval: 76.1 s (includes ~30 s backend bring-up)
  - warm eval: 50.3 ms per value+grad at N=1e5 (the pure-lax blocked
    AD program; the fused Pallas path is ~2.5 ms but pays a 4-6 min
    first-process compile)

Known limitation (measured, reproducible): composing this program into
the monolithic NUTS *warmup segment* (vag inlined in tree while_loops
inside a scanned chunk) crashes the TPU worker (UNAVAILABLE device
error) at N=1e5 — same failure class as the monolithic SMC while_loop
that motivated the host-driven stage loop (see fleet_smc.py).  The
hatch is for interactive first-contact work (fit/optimize/predict,
shallow scans); full MCMC should warm the kernel cache instead.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from celerite_tpu import GP, terms
    from celerite_tpu.utils import enable_persistent_cache

    cache = enable_persistent_cache()

    n = 100_000
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0, 100.0, n))
    yerr = np.full(n, 0.3)
    y = np.sin(t) + 0.3 * rng.standard_normal(n)
    kernel = (
        terms.SHOTerm(log_S0=0.2, log_Q=-0.3, log_omega0=0.2)
        + terms.SHOTerm(log_S0=-0.7, log_Q=2.0, log_omega0=1.6)
        + terms.JitterTerm(log_sigma=-1.0)
    )
    gp = GP(kernel)
    lp = gp.build_logprob(t, y, yerr=yerr, fast_compile=True)
    th = jnp.asarray(gp.get_parameter_vector())
    vag = jax.jit(
        getattr(lp, "value_and_grad", None) or jax.value_and_grad(lp)
    )
    t0 = time.time()
    v, g = jax.block_until_ready(vag(th))
    cold_s = time.time() - t0
    t0 = time.time()
    for _ in range(20):
        v, g = vag(th)
    jax.block_until_ready(v)
    eval_ms = (time.time() - t0) / 20 * 1e3
    rec = {
        "metric": "fastcompile_cold_wall",
        "value": round(cold_s, 1),
        "unit": "s",
        "n": n,
        "dim": int(th.shape[0]),
        "eval_ms": round(eval_ms, 2),
        "platform": jax.default_backend(),
        "cache_dir": str(cache),
        "note": "compile + first value_and_grad eval, empty cache",
    }
    print(json.dumps(rec))
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results", "fastcompile_cold_tpu.json",
    )
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
