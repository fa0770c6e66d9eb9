#!/usr/bin/env python
"""Exact-mode (precision="ds") leapfrog micro-benchmark on one chip.

Times the config[2] posterior's value+gradient and a 16-step leapfrog
scan at 4 folded chains, for BOTH ds implementations:

- kernel path (ops/dsfused; dual-ds fused Pallas, chain-folded), and
- lax path (ops/dsblocked via CELERITE_TPU_DS_LAX semantics),

plus the f32 fused4 reference point.  This isolates the per-leapfrog
speed question from the sampler-program compile tax (a full NUTS
program inlines the chunked ds pipeline several times and its XLA+
Mosaic compile runs past an hour — see docs/precision.md; the
committed ds sampler record therefore rides the lax path, and THIS
benchmark is the committed evidence for the kernel path's step cost).

Writes benchmarks/results/ds_leapfrog_tpu.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--leapfrog", type=int, default=16)
    ap.add_argument("--skip-lax", action="store_true",
                    help="skip the slow lax-path timing")
    ap.add_argument("--out", type=str,
                    default="benchmarks/results/ds_leapfrog_tpu.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from celerite_tpu import GP, terms
    from celerite_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    n = args.n
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0, 100.0, n))
    yerr = np.full(n, 0.3)
    y = np.sin(t)

    def build(precision, force_lax=False, fast_grad=True):
        if force_lax:
            os.environ["CELERITE_TPU_DS_LAX"] = "1"
        else:
            os.environ.pop("CELERITE_TPU_DS_LAX", None)
        kernel = (
            terms.SHOTerm(log_S0=0.2, log_Q=-0.3, log_omega0=0.2)
            + terms.SHOTerm(log_S0=-0.7, log_Q=2.0, log_omega0=1.6)
            + terms.JitterTerm(log_sigma=-1.0)
        )
        gp = GP(kernel)
        lp = gp.build_logprob(
            t, y, yerr=yerr,
            log_prior=lambda th: -0.5 * jnp.sum((th / 3.0) ** 2),
            precision=precision,
            fast_grad=None if fast_grad else False,
        )
        th = jnp.asarray(gp.get_parameter_vector(), jnp.float32)
        return lp, th

    def time_path(tag, lp, th):
        vag = getattr(lp, "value_and_grad", None)
        if vag is None:
            vag = jax.value_and_grad(lp)
        ths = jnp.stack(
            [th + 0.01 * k for k in range(args.chains)]
        )

        def leapfrog_scan(qs):
            eps = 1e-3

            def step(carry, _):
                q, p = carry
                _, g = jax.vmap(vag)(q)
                p = p + 0.5 * eps * g
                q = q + eps * p
                _, g = jax.vmap(vag)(q)
                p = p + 0.5 * eps * g
                return (q, p), None

            (q, p), _ = lax.scan(
                step, (qs, jnp.zeros_like(qs)), None,
                length=args.leapfrog,
            )
            return q

        rec = {}
        t0 = time.perf_counter()
        out = jax.block_until_ready(jax.jit(jax.vmap(vag))(ths))
        rec["vag_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        for _ in range(10):
            out = jax.jit(jax.vmap(vag))(ths)
        jax.block_until_ready(out)
        rec["vag_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)

        t0 = time.perf_counter()
        q = jax.block_until_ready(jax.jit(leapfrog_scan)(ths))
        rec["scan_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            q = jax.jit(leapfrog_scan)(ths)
        jax.block_until_ready(q)
        rec["leapfrog_ms"] = round(
            (time.perf_counter() - t0) / (reps * args.leapfrog) * 1e3,
            2,
        )
        print(tag, json.dumps(rec), flush=True)
        return rec

    results = {
        "metric": "ds_leapfrog_ms_per_step_4chains",
        "n": n,
        "chains": args.chains,
        "leapfrog": args.leapfrog,
    }
    lp, th = build(None)
    results["f32_kernel"] = time_path("f32_kernel", lp, th)
    lp, th = build("ds")
    results["ds_kernel"] = time_path("ds_kernel", lp, th)
    if not args.skip_lax:
        lp, th = build("ds", force_lax=True)
        results["ds_lax"] = time_path("ds_lax", lp, th)
    results["value"] = results["ds_kernel"]["leapfrog_ms"]
    results["unit"] = "ms/leapfrog"
    print(json.dumps(results))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()


