import os

# Tests run on a virtual 8-device CPU mesh with 64-bit numerics so oracle
# comparisons match the reference's double-precision behavior.
#
# The environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon
# (the tunneled TPU) before any user code runs, so plain env vars are too
# late — override through jax.config instead.  XLA_FLAGS still works because
# the CPU client is created lazily on first use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
# XLA:CPU's AVX2 codegen contracts a*b+c into FMA and (fusion-dependent)
# reorders compensated-summation chains, silently destroying the
# double-single arithmetic of ops/dsa (measured: jitted ds mul loses its
# lo word, 3e-8 error vs 6e-15 eager).  Pinning the ISA to SSE4_2 (no
# FMA) restores exact compensation; TPU — the deployment target —
# preserves it natively, so this is a test-lane-only pin.  Measured
# suite impact: none (compile time dominates).
if "xla_cpu_max_isa" not in flags:
    flags = flags + " --xla_cpu_max_isa=SSE4_2"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

# Two-tier suite: the default lane must stay fast for iteration; tests
# marked ``slow`` (>~30 s each: wide-P Mosaic compiles, posterior parity
# chains, multi-process spawns) run with --runslow (CI full lane:
# ``python -m pytest tests/ -q --runslow``).


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full lane)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: takes >30s; excluded from the default lane "
        "(enable with --runslow)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
