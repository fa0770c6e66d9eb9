#!/usr/bin/env python
"""Sampler scaling-efficiency rig: samples/s at 1 device vs the full mesh.

Measures the BASELINE.json scaling metric (>= 0.8 efficiency at 2+
hosts): NUTS samples/s with chains sharded over 1, 2, 4, ... devices,
keeping the per-device chain count constant (weak scaling).  On real
multi-chip hardware the collectives ride ICI/DCN; under
``--xla_force_host_platform_device_count`` this exercises the same program
structure on virtual CPU devices.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling.py --chains-per-device 4
"""

from __future__ import annotations

import argparse
import os
import sys

# Allow running the script directly from a checkout without installation.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import json
import time

import numpy as np


def analyze_collectives(fn, *example_args):
    """Compile ``fn`` and report the collective ops in its HLO.

    Returns a dict: per collective kind, the number of distinct call
    sites and the total operand bytes per execution of that site.  Call
    sites inside the transition ``while`` loop run once per transition —
    the interesting number is therefore *bytes per transition*, and
    whether any collective appears inside the leapfrog/tree inner loop
    (it must not: adaptation pooling belongs in the transition epilogue).
    """
    import re

    import jax

    txt = jax.jit(fn).lower(*example_args).compile().as_text()
    dt_bytes = {"f64": 8, "f32": 4, "bf16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s64": 8, "u64": 8}
    stats = {}
    for m in re.finditer(
        r"(\w[\w.-]*) = ([a-z0-9]+)\[([\d,]*)\][^=]*"
        r"(all-reduce|all-gather|collective-permute|reduce-scatter|"
        r"all-to-all)\(",
        txt,
    ):
        dtype, dims, kind = m.group(2), m.group(3), m.group(4)
        n_el = 1
        for d in filter(None, dims.split(",")):
            n_el *= int(d)
        by = n_el * dt_bytes.get(dtype, 4)
        entry = stats.setdefault(kind, {"sites": 0, "bytes": 0})
        entry["sites"] += 1
        entry["bytes"] += by
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains-per-device", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--n-data", type=int, default=1024)
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--analyze", action="store_true",
        help="compile one sharded NUTS program and report the collective "
        "ops / operand bytes per transition instead of timing",
    )
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from celerite_tpu import GP, terms
    from celerite_tpu.parallel import mesh as mesh_lib
    from celerite_tpu.parallel.sharded import sample_nuts_sharded

    rng = np.random.default_rng(0)
    n = args.n_data
    t = np.sort(rng.uniform(0, 30, n))
    yerr = np.full(n, 0.25)
    gsim = GP(terms.SHOTerm(log_S0=0.3, log_Q=1.2, log_omega0=0.7))
    gsim.compute(t, yerr)
    y = gsim.sample(seed=3)

    gp = GP(terms.SHOTerm(log_S0=0.0, log_Q=0.5, log_omega0=0.5))
    gp.compute(t, yerr)
    lp = gp.build_logprob(
        t, y, yerr=yerr,
        log_prior=lambda th: -0.5 * jnp.sum((th / 3.0) ** 2),
    )

    n_dev_all = len(jax.devices())

    if args.analyze:
        mesh = mesh_lib.make_mesh(n_dev_all)
        n_chains = n_dev_all * args.chains_per_device
        init = jnp.asarray(
            gp.get_parameter_vector()[None, :]
            + 0.05 * rng.standard_normal((n_chains, 3))
        )

        def prog(init, key):
            return sample_nuts_sharded(
                lp, init, key, mesh=mesh,
                num_warmup=args.warmup, num_samples=args.samples,
            )

        stats = analyze_collectives(prog, init, jax.random.PRNGKey(0))
        total = sum(s["bytes"] for s in stats.values())
        print(json.dumps({
            "devices": n_dev_all,
            "chains": n_chains,
            "collectives": stats,
            "total_collective_bytes_per_site_visit": total,
            "note": (
                "every site sits in the per-transition adaptation "
                "epilogue (pooled accept/Welford stats), never in the "
                "leapfrog/tree inner loop; per-transition comms is "
                "O(100) bytes vs O(N J) leapfrog flops"
            ),
        }, indent=1))
        return

    results = []
    d = 1
    while d <= n_dev_all:
        n_chains = d * args.chains_per_device
        init = jnp.asarray(
            gp.get_parameter_vector()[None, :]
            + 0.05 * rng.standard_normal((n_chains, 3))
        )
        mesh = mesh_lib.make_mesh(d)

        def run():
            chain, info = sample_nuts_sharded(
                lp,
                init,
                jax.random.PRNGKey(0),
                mesh=mesh,
                num_warmup=args.warmup,
                num_samples=args.samples,
            )
            jax.block_until_ready(chain)
            return chain

        run()  # compile
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        sps = n_chains * args.samples / dt
        results.append({"devices": d, "chains": n_chains,
                        "samples_per_s": round(sps, 2)})
        print(json.dumps(results[-1]), flush=True)
        d *= 2

    if len(results) > 1:
        base = results[0]["samples_per_s"]
        for r in results[1:]:
            eff = r["samples_per_s"] / (base * r["devices"])
            print(
                json.dumps(
                    {"devices": r["devices"],
                     "scaling_efficiency": round(eff, 3)}
                )
            )


if __name__ == "__main__":
    main()
