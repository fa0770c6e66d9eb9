#!/usr/bin/env python
"""TPU sweep: fused-kernel block counts, trimmed rank, error attribution.

For each solver config measures wall-clock (device-side lowering included)
and f32 accuracy vs the native C++ f64 oracle, twice: with the lowering
computed on device (exp/cos/sin on TPU) and with host-f64-computed inputs
rounded to f32 (isolates recursion error from lowering/transcendental
error).  Run: nohup python benchmarks/sweep_fused.py > /tmp/sweep_fused.log 2>&1 &
"""

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

    from celerite_tpu import native, terms
    from celerite_tpu.ops import fused, pallas_solver
    from celerite_tpu.ops.lower import SSM, Coefficients, lower

    n = 1_000_000
    dtype = jnp.float32
    rng = np.random.default_rng(42)
    t = np.sort(rng.uniform(0, 1000.0, n))
    yerr = np.full(n, 0.1)
    y = rng.standard_normal(n)

    kernel = terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.5)
    params64 = np.asarray(kernel.get_parameter_vector(include_frozen=True))
    params = jnp.asarray(params64, dtype)

    # Host f64 lowering (trimmed, P=2) -> oracle + host-rounded inputs.
    s0, q, w0 = np.exp(params64)
    f = np.sqrt(4 * q**2 - 1)
    a_c, b_c = s0 * w0 * q, s0 * w0 * q / f
    c_c, d_c = 0.5 * w0 / q, 0.5 * w0 / q * f
    dt = np.concatenate([[0.0], np.diff(t)])
    arg = d_c * t[:, None]
    cos, sin = np.cos(arg), np.sin(arg)
    U64 = np.concatenate([a_c * cos + b_c * sin, a_c * sin - b_c * cos], 1)
    V64 = np.concatenate([cos, sin], 1)
    ph = np.exp(-c_c * dt[:, None])
    phi64 = np.concatenate([ph, ph], 1)
    A64 = yerr**2 + a_c
    ll_ref = native.loglike(U64, V64, phi64, A64, y)[0]
    print(f"native f64 oracle ll = {ll_ref:.6f}", flush=True)

    ssm_host = SSM(
        U=jnp.asarray(U64, dtype), V=jnp.asarray(V64, dtype),
        phi=jnp.asarray(phi64, dtype), A=jnp.asarray(A64, dtype),
    )

    tj = jnp.asarray(t.astype(np.float32))
    diagj = jnp.asarray(yerr.astype(np.float32)) ** 2
    yj = jnp.asarray(y.astype(np.float32))

    def padded_ssm(params):
        coeffs = Coefficients(
            *[c.astype(dtype)
              for c in kernel.get_padded_coefficients(params)],
            jitter=jnp.zeros((), dtype),
        )
        return lower(coeffs, tj, diagj)

    def trimmed_ssm(params):
        a, b, c, d = kernel.get_complex_coefficients(params)
        coeffs = Coefficients(
            a_real=jnp.zeros(0, dtype), c_real=jnp.zeros(0, dtype),
            a_comp=jnp.atleast_1d(a).astype(dtype),
            b_comp=jnp.atleast_1d(b).astype(dtype),
            c_comp=jnp.atleast_1d(c).astype(dtype),
            d_comp=jnp.atleast_1d(d).astype(dtype),
            jitter=jnp.zeros((), dtype),
        )
        return lower(coeffs, tj, diagj)

    solvers = [
        ("pallas3_L2048", lambda s: pallas_solver.gp_log_likelihood(
            s, yj, block_size=2048)[0]),
        ("fused_B1024", lambda s: fused.gp_log_likelihood(
            s, yj, num_blocks=1024)[0]),
        ("fused_B2048", lambda s: fused.gp_log_likelihood(
            s, yj, num_blocks=2048)[0]),
        ("fused_B4096", lambda s: fused.gp_log_likelihood(
            s, yj, num_blocks=4096)[0]),
        ("fused_B8192", lambda s: fused.gp_log_likelihood(
            s, yj, num_blocks=8192)[0]),
    ]

    for name, sfn in solvers:
        for lname, lowfn in (("P4dev", padded_ssm), ("P2dev", trimmed_ssm)):
            try:
                jfn = jax.jit(lambda p: sfn(lowfn(p)))
                t0 = time.perf_counter()
                val = jax.block_until_ready(jfn(params))
                t_compile = time.perf_counter() - t0
                n_iter = 30
                t0 = time.perf_counter()
                for _ in range(n_iter):
                    out = jfn(params)
                jax.block_until_ready(out)
                dt_ = (time.perf_counter() - t0) / n_iter
                rel = abs(float(val) - ll_ref) / abs(ll_ref)
                print(
                    f"{name}_{lname}: {dt_*1e3:.3f} ms/eval "
                    f"({1/dt_:.1f} evals/s) rel_err={rel:.3e} "
                    f"(compile {t_compile:.0f}s)", flush=True,
                )
            except Exception as e:
                print(f"{name}_{lname}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        # Error with host-exact inputs (recursion error only).
        try:
            jfn2 = jax.jit(sfn)
            val2 = jax.block_until_ready(jfn2(ssm_host))
            rel2 = abs(float(val2) - ll_ref) / abs(ll_ref)
            print(f"{name}_hostlower: rel_err={rel2:.3e}", flush=True)
        except Exception as e:
            print(f"{name}_hostlower: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
