#!/usr/bin/env python
"""Speed-of-light accounting for the fused4 likelihood kernel.

Decomposes the N=1e6 GP log-likelihood evaluation into:
- steady-state per-eval device time (pipelined submission),
- the Pallas kernel alone vs the XLA glue around it,
- kernel-launch census from the compiled HLO,
- HBM-bandwidth floor (bytes streamed / peak bandwidth) and a
  VPU-throughput floor (the two-phase kernel's per-step elementwise
  algebra), whichever binds,
- batched-eval amortization (the chain-folded batching rule).

Writes a markdown table to stdout; numbers feed docs/benchmark.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import jax
import jax.numpy as jnp


def steady(fn, *a, repeat=50, warmup=3):
    for _ in range(warmup):
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeat):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="v5e peak HBM bandwidth")
    args = ap.parse_args()
    n = args.n

    from celerite_tpu import GP, terms
    from celerite_tpu.ops import fused4, lanes4
    from celerite_tpu.utils import enable_persistent_cache

    enable_persistent_cache()  # one-time compiles cache to disk

    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 100.0, n))
    yerr = np.full(n, 0.1)
    gp = GP(terms.SHOTerm(log_S0=0.1, log_Q=0.7, log_omega0=1.0))
    gp.compute(t, yerr)
    y = np.asarray(gp.sample(seed=1))
    theta = jnp.asarray(gp.get_parameter_vector())

    # --- full-facade eval (what bench.py measures) ---
    f = gp.build_loglik(t, y, yerr)
    jf = jax.jit(lambda th: f(th)[0])
    t_eval = steady(jf, theta)
    print(f"facade eval (N={n}): {1e6*t_eval:.0f} us "
          f"-> {1/t_eval:.0f} evals/s")

    # --- the primal kernel alone, fixed inputs ---
    jr, jc = gp.kernel.padded_size
    p = jr + 2 * jc
    nb = lanes4.default_num_blocks4(n, p)
    nb = max(nb, 1024)
    plan = lanes4.make_plan4(
        t, y, np.asarray(yerr) ** 2, nb, dtype=np.float32
    )
    L, s8, w = plan.t.shape
    from celerite_tpu.ops.lower import Coefficients
    coeffs = Coefficients(
        *gp.kernel.get_padded_coefficients(
            jnp.asarray(gp.kernel.get_parameter_vector())
        ),
        jitter=gp.kernel.get_jitter(
            jnp.asarray(gp.kernel.get_parameter_vector())
        ),
    )
    cf = lanes4.pack_cf(coeffs, dtype=jnp.float32)
    kern = jax.jit(
        lambda cf: fused4.run_primal(cf, plan, jr, jc)[0]
    )
    t_kern = steady(kern, cf)
    print(f"run_primal alone:  {1e6*t_kern:.0f} us")

    # --- HLO census ---
    txt = jax.jit(lambda th: f(th)[0]).lower(theta).compile().as_text()
    n_cc = txt.count("custom_call_target=\"tpu_custom_call\"")
    n_fus = txt.count(" fusion(")
    print(f"compiled HLO: {n_cc} pallas launches, ~{n_fus} XLA fusions")

    # --- bandwidth floor ---
    lanes_bytes = 4 * (L * s8 * w)  # one f32 plane
    streams = 6  # t, t_lo, dt, diag, mask, y
    in_bytes = streams * lanes_bytes
    t_hbm = in_bytes / (args.hbm_gbps * 1e9)
    print(f"plan layout (L,8,W) = ({L},{s8},{w}); "
          f"input stream {in_bytes/1e6:.1f} MB; "
          f"HBM floor {1e6*t_hbm:.0f} us")

    # --- VPU floor model ---
    # Two grid passes over L blocks; each block step runs the unrolled
    # (p x p) state algebra on (8, W) vector tiles.  Ops per step per
    # lane-element (measured from the kernel body): ~(6 p^2 + 8 p + 20)
    # multiply-adds for the compose/lower/update chain.
    ops_per_step = (6 * p * p + 8 * p + 20) * s8 * w
    total_ops = 2 * L * ops_per_step
    vpu_flops = 0.5e12  # ~v5e VPU f32 multiply-add throughput
    t_vpu = total_ops / vpu_flops
    print(f"VPU model: 2 x {L} steps x {ops_per_step/1e3:.0f} kops "
          f"= {total_ops/1e9:.2f} Gop -> floor {1e6*t_vpu:.0f} us "
          f"(at {vpu_flops/1e12:.1f} Top/s)")

    # --- batched amortization through the vog batching rule ---
    vog = f.value_ok_grad
    print("\nbatched value+grad (chain-folded):")
    print("| batch | total ms | per-eval us | evals/s |")
    print("|---|---|---|---|")
    for nc in (1, 2, 4, 8, 16, 32):
        ths = theta[None, :] + 0.01 * jax.random.normal(
            jax.random.PRNGKey(nc), (nc, theta.shape[0])
        )
        bat = jax.jit(lambda th: jax.vmap(vog)(th))
        t_b = steady(bat, ths, repeat=20)
        print(f"| {nc} | {1e3*t_b:.2f} | {1e6*t_b/nc:.0f} | "
              f"{nc/t_b:.0f} |")


if __name__ == "__main__":
    main()
