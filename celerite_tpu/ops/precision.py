"""Float32 matmul-precision pinning for the semiseparable algebra.

On TPU, XLA's default matmul/dot precision for float32 operands is
*bfloat16* on the MXU (~8 mantissa bits).  The celerite recursions and
the cross-block Riccati/affine prefix compositions are pivot-critical:
the factor pivots ``d_n`` sit orders of magnitude below the raw data
scale (min d ~ 1e-2 on the N=1e6 two-SHO bench config), so an ~8-bit
seed error from a bf16 8x8 compose flips pivots negative and the
``(ok, ll)`` contract reports an (incorrect) non-PD failure — measured
on a v5e: the P=8 adjoint/blocked pipelines returned -inf while the
identical arithmetic in f32 (CPU, or the Pallas kernels' elementwise VPU
forms) is healthy with min d = 1.05e-2.

Every module whose numeric path uses ``@`` / ``jnp.dot`` / ``einsum``
wraps its public entry points with :func:`f32_matmuls` so those ops bind
at HIGHEST (true f32) precision.  The affected contractions are tiny
(P x P with P <= ~32), so the 6-pass f32 emulation cost is noise; the
Pallas kernels themselves are unaffected (they use unrolled elementwise
multiply-accumulate on the VPU, which is always f32).
"""

from __future__ import annotations

import functools

import jax

__all__ = ["f32_matmuls"]


def f32_matmuls(fn):
    """Trace ``fn`` with float32 (HIGHEST) default matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
