"""Utils: timer, debug mode, backend agreement."""

import numpy as np

import jax.numpy as jnp

from celerite_tpu import terms
from celerite_tpu.ops.lower import Coefficients, lower
from celerite_tpu.utils import benchmark, check_backends_agree, debug_mode


def test_backends_agree():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 50, 300))
    kernel = terms.SHOTerm(log_S0=0.1, log_Q=1.0, log_omega0=0.3)
    coeffs = Coefficients(
        *[jnp.asarray(c) for c in kernel.coefficients],
        jitter=jnp.zeros(()),
    )
    ssm = lower(coeffs, jnp.asarray(t), jnp.full(300, 0.04))
    vals = check_backends_agree(
        ssm, jnp.asarray(np.sin(t)), include_pallas=True
    )
    assert set(vals) >= {"seq", "blocked"}


def test_benchmark_returns_positive():
    dt = benchmark(lambda: sum(range(100)), minimum_time=0.01)
    assert dt > 0


def test_debug_mode_restores():
    import jax

    before = jax.config.jax_debug_nans
    with debug_mode(nans=True):
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == before
