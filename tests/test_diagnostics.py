"""Diagnostics + checkpoint tests."""

import os

import numpy as np

from celerite_tpu.inference.checkpoint import (
    SamplerState,
    load_state,
    save_state,
)
from celerite_tpu.inference.diagnostics import (
    effective_sample_size,
    split_rhat,
    summary,
)


def test_rhat_iid_near_one():
    rng = np.random.default_rng(0)
    chains = rng.standard_normal((4, 500, 3))
    r = split_rhat(chains)
    assert np.all(r < 1.02)


def test_rhat_detects_nonconvergence():
    rng = np.random.default_rng(1)
    chains = rng.standard_normal((4, 500, 1))
    chains[0] += 5.0  # one chain stuck elsewhere
    assert split_rhat(chains)[0] > 1.5


def test_ess_iid_near_n():
    rng = np.random.default_rng(2)
    chains = rng.standard_normal((4, 500, 2))
    ess = effective_sample_size(chains)
    assert np.all(ess > 1000)  # ~2000 total, allow slack


def test_ess_correlated_much_smaller():
    rng = np.random.default_rng(3)
    c, s = 4, 2000
    rho = 0.95
    x = np.zeros((c, s, 1))
    for i in range(1, s):
        x[:, i, 0] = rho * x[:, i - 1, 0] + np.sqrt(
            1 - rho**2
        ) * rng.standard_normal(c)
    ess = effective_sample_size(x)
    # AR(1) with rho=0.95: tau ~ (1+rho)/(1-rho) = 39 -> ESS ~ 8000/39
    assert 50 < ess[0] < 800


def test_summary_keys():
    rng = np.random.default_rng(4)
    out = summary(rng.standard_normal((2, 100, 3)), names=["a", "b", "c"])
    for k in ["mean", "sd", "q5", "q95", "ess", "rhat", "names"]:
        assert k in out


def test_checkpoint_roundtrip(tmp_path):
    state = SamplerState.create(
        positions=np.random.randn(8, 3),
        step_size=0.1,
        inv_mass=np.ones(3),
        rng_key=np.array([0, 42], dtype=np.uint32),
        iteration=100,
    )
    path = os.path.join(tmp_path, "chk.npz")
    state.save(path)
    loaded = SamplerState.load(path)
    np.testing.assert_array_equal(
        loaded["positions"], state["positions"]
    )
    assert float(loaded["step_size"]) == 0.1
    assert int(loaded["iteration"]) == 100


def test_nested_state_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "nested.npz")
    save_state(
        path,
        {"a": np.arange(3), "b": {"c": np.eye(2), "d": [1.0, 2.0]}},
        meta={"version": 1},
    )
    flat, meta = load_state(path)
    assert meta == {"version": 1}
    np.testing.assert_array_equal(flat["a"], np.arange(3))
    np.testing.assert_array_equal(flat["b.c"], np.eye(2))


def test_ebfmi_white_noise_near_two():
    from celerite_tpu.inference.diagnostics import ebfmi

    rng = np.random.default_rng(0)
    e = rng.standard_normal((3, 4000))
    np.testing.assert_allclose(ebfmi(e), 2.0, rtol=0.15)


def test_ebfmi_sticky_energy_small():
    from celerite_tpu.inference.diagnostics import ebfmi

    rng = np.random.default_rng(1)
    # AR(1) with phi ~ 1: successive differences tiny vs variance.
    n = 4000
    x = np.empty(n)
    x[0] = 0.0
    for i in range(1, n):
        x[i] = 0.995 * x[i - 1] + 0.1 * rng.standard_normal()
    assert ebfmi(x[None]) [0] < 0.3
