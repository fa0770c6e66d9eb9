#!/usr/bin/env python
"""One committed grid row for general (A, U, V) semiseparable blocks.

The reference's native core handles general blocks in-loop at full
speed (cholesky.h:65-69, 148-152).  Here they lower to phi=1 lanes of
the same (N, P) SSM arrays, so the block-parallel TPU solver consumes
them on its fast path (tests/test_general_fast.py pins correctness vs
the dense oracle).  This records the timing evidence:
celerite rank 4 + general rank 3 at N = 65536, primal + value-and-grad
through the production facade, with a CPU-f64 oracle check.

Appends/updates ``benchmarks/results/general_row.json``.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def make_problem(n=65536, seed=11):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, n / 100.0, n))
    y = rng.standard_normal(n)
    yerr = np.full(n, 0.316227766)
    scale = 0.1
    U = np.vander((t - t.min()) / (t.max() - t.min()), 3).T * scale
    V = 0.5 * U + 0.01 * rng.standard_normal(U.shape)
    A = np.sum(U * V, axis=0) + 0.3
    return t, y, yerr, A, U, V


def main():
    import jax
    import jax.numpy as jnp

    from celerite_tpu import GP, terms
    from celerite_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    n = 65536
    t, y, yerr, A, U, V = make_problem(n)
    kernel = (
        terms.SHOTerm(log_S0=-0.7, log_Q=1.0, log_omega0=0.0)
        + terms.SHOTerm(log_S0=-0.9, log_Q=0.7, log_omega0=0.3)
    )
    gp = GP(kernel)
    gp.compute(t, yerr, A=A, U=U, V=V)
    th = jnp.asarray(gp.get_parameter_vector(), jnp.result_type(float))

    ll = jax.jit(gp.build_loglik(t, y, yerr=yerr))
    lp = gp.build_logprob(t, y, yerr=yerr)
    vag = jax.jit(
        getattr(lp, "value_and_grad", None) or jax.value_and_grad(lp)
    )

    def timeit(fn):
        out = jax.block_until_ready(fn(th))
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = fn(th)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    t_ll = timeit(ll)
    t_vg = timeit(vag)
    val = float(np.asarray(ll(th)[0]))

    # CPU f64 oracle in a subprocess (TPU process has no x64).
    import subprocess

    code = (
        "import jax;"
        "jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_enable_x64',True);"
        "import sys, numpy as np, jax.numpy as jnp;"
        "sys.path.insert(0, %r); sys.path.insert(0, %r);"
        "from general_row import make_problem;"
        "from celerite_tpu import GP, terms;"
        "t, y, yerr, A, U, V = make_problem(%d);"
        "kernel = (terms.SHOTerm(log_S0=-0.7, log_Q=1.0, log_omega0=0.0)"
        " + terms.SHOTerm(log_S0=-0.9, log_Q=0.7, log_omega0=0.3));"
        "gp = GP(kernel); gp.compute(t, yerr, A=A, U=U, V=V);"
        "fn = gp.build_loglik(t, y, yerr=yerr, solver='blocked');"
        "ll, ok = fn(jnp.asarray(gp.get_parameter_vector()));"
        "print('ORACLE', repr(float(ll)))"
    ) % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.path.dirname(os.path.abspath(__file__)),
        n,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1200,
    )
    ll64 = None
    for line in proc.stdout.splitlines():
        if line.startswith("ORACLE "):
            ll64 = float(line.split()[1])
    rel = (
        abs(val - ll64) / max(1.0, abs(ll64))
        if ll64 is not None else None
    )

    rec = {
        "P_celerite": 4,
        "J_general": 3,
        "N": n,
        "backend": "blocked" if jax.default_backend() == "tpu"
        else jax.default_backend(),
        "ll_ms": round(1e3 * t_ll, 2),
        "vag_ms": round(1e3 * t_vg, 2),
        "rel_err_vs_f64": None if rel is None else float(f"{rel:.3e}"),
    }
    print(json.dumps(rec))
    out = "benchmarks/results/general_row.json"
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
