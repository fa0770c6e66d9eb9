"""Golden-value regression anchors.

Exact float64 log-likelihood values pinned at round 1 (validated against
the dense oracle at generation time: tests/test_gp.py compares the same
pipeline to slogdet/solve at 1e-9).  These guard against silent numeric
drift across refactors — any change beyond ~1e-9 relative here is a
correctness regression, not noise.
"""

import numpy as np
import pytest

from celerite_tpu import GP, terms


GOLDEN = {
    "real": -36.2203357460497,
    "sho_under": -0.08770623866679728,
    "sho_over": 12.235288541433178,
    "mix": -71.18381174955559,
    "matern": 15.39744527705696,
    "product": -92.41432624451689,
}


def make_kernels():
    return {
        "real": terms.RealTerm(log_a=0.1, log_c=0.5),
        "sho_under": terms.SHOTerm(
            log_S0=0.1, log_Q=1.0, log_omega0=0.5
        ),
        "sho_over": terms.SHOTerm(
            log_S0=0.1, log_Q=-1.0, log_omega0=0.5
        ),
        "mix": (
            terms.RealTerm(log_a=0.1, log_c=0.5)
            + terms.ComplexTerm(
                log_a=0.0, log_b=-0.3, log_c=0.4, log_d=0.2
            )
            + terms.JitterTerm(log_sigma=-1.0)
        ),
        "matern": terms.Matern32Term(log_sigma=0.1, log_rho=0.5),
        "product": terms.SHOTerm(
            log_S0=0.1, log_Q=1.0, log_omega0=0.5
        )
        * terms.RealTerm(log_a=0.1, log_c=0.4),
    }


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_log_likelihood(name):
    rng = np.random.default_rng(2026)
    t = np.sort(rng.uniform(0, 10, 100))
    yerr = np.full(100, 0.25)
    y = np.sin(t)
    gp = GP(make_kernels()[name])
    gp.compute(t, yerr)
    np.testing.assert_allclose(
        gp.log_likelihood(y), GOLDEN[name], rtol=1e-9
    )
