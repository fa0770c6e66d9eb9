"""Numeric core: semiseparable solver ops, lowering, oracles.

Layout (each module documents the reference component it replaces):

- ``kernels``: closed-form kernel / PSD evaluation (utils.h analog)
- ``lower``: coefficient arrays -> semiseparable (U, V, phi, A) lowering
- ``seq``: sequential ``lax.scan`` solver (cholesky.h analog)
- ``blocked``: two-level block-parallel solver (no reference analog;
  the TPU-native reformulation)
- ``dense``: O(N^3) dense oracle (direct.h analog)
- ``poly``: polynomial algebra + Sturm PSD positivity check (poly.h analog)
- ``carma``: CARMA Kalman filter + conversion (carma.h analog)
"""

from . import blocked, carma, dense, kernels, lower, poly, seq  # noqa: F401


def best_ll(ssm, resid):
    """GP log-likelihood via the fastest available backend.

    Small N: sequential scan.  Large N: fused Pallas kernels on TPU
    (8.5 ms at N=1e6, L=1024 on v5e), block-parallel lax elsewhere.
    Returns the ll value only (-inf when the factorization fails).
    """
    import jax

    n = ssm.U.shape[0]
    if n < 4096:
        ll, _ = seq.gp_log_likelihood(ssm, resid)
    elif jax.default_backend() == "tpu":
        from . import fused

        ll, _ = fused.gp_log_likelihood(ssm, resid)
    else:
        from . import blocked

        ll, _ = blocked.gp_log_likelihood(ssm, resid)
    return ll
