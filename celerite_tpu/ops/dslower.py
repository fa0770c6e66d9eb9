"""Double-single lowering: coefficients -> ds (U, V, phi, A) streams.

Companion to :mod:`celerite_tpu.ops.dsblocked` (the ``precision="ds"``
backend).  The f32 lowering of :func:`celerite_tpu.ops.lower.lower`
rounds every exp/cos/sin to eps32; those per-point roundings are an
*incoherent* perturbation of the semiseparable representation — unlike
coefficient-level rounding (which evaluates a nearby valid kernel), they
can push the represented matrix indefinite whenever the PD margin is
below ~N_terms*eps32 (the rank>=64 summed-variance>>diag stacks of
ROADMAP known-issue 2), and their theta-jitter is the gradient-noise
floor measured in round 3.  Here every stream is a double-single pair
built from exact argument reduction + ds transcendental kernels
(:mod:`celerite_tpu.ops.dsa`), accurate to ~1e-13.

The reference needs none of this: its lowering runs inside the f64
factor loop (/root/reference/cpp/include/celerite/solver/cholesky.h:
129-152).  This module is the TPU-native (f32-hardware) equivalent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import dsa
from .dsa import DS
from . import ds as _ds
from .lower import Coefficients

__all__ = ["SSMDS", "lower_ds", "promote_ssm"]


class SSMDS(NamedTuple):
    """Semiseparable representation with double-single streams."""

    U: DS  # (N, P)
    V: DS  # (N, P)
    phi: DS  # (N, P), phi[0] == 1
    A: DS  # (N,)


def promote_ssm(ssm) -> SSMDS:
    """Promote a plain f32 SSM to SSMDS with zero lo parts."""
    return SSMDS(
        U=dsa.from_f32(ssm.U),
        V=dsa.from_f32(ssm.V),
        phi=dsa.from_f32(ssm.phi),
        A=dsa.from_f32(ssm.A),
    )


def _col(x: DS) -> DS:
    return DS(x.hi[:, None], x.lo[:, None])


def lower_ds(
    coeffs: Coefficients,
    t: DS,
    dt: DS,
    diag,
) -> SSMDS:
    """Build ds (U, V, phi, A) for sorted coordinates.

    ``t``/``dt`` are static ds pairs of the time grid and spacings
    (split host-side from float64 via :func:`dsa.from_f64`; ``dt`` has
    dt[0] == 0).  ``diag`` is the f32 per-point variance (or a DS).
    The coefficient arrays are traced f32 values — their own rounding
    is a coefficient-level perturbation (a nearby valid kernel) and is
    kept coherent here by computing A from the same stored values with
    compensated sums.
    """
    a_real, c_real, a_comp, b_comp, c_comp, d_comp, jitter = coeffs
    n = t.hi.shape[0]
    jr = a_real.shape[0]
    jc = a_comp.shape[0]
    dtype = t.hi.dtype

    dt_col = _col(dt)

    parts_hi_u, parts_lo_u = [], []
    parts_hi_v, parts_lo_v = [], []
    parts_hi_p, parts_lo_p = [], []

    if jr:
        u_r = dsa.from_f32(
            jnp.broadcast_to(a_real.astype(dtype), (n, jr))
        )
        v_r = dsa.from_f32(jnp.ones((n, jr), dtype))
        p_r = dsa.exp_ds(dsa.mul_f(dsa.neg(dt_col), c_real.astype(dtype)))
        parts_hi_u.append(u_r.hi); parts_lo_u.append(u_r.lo)
        parts_hi_v.append(v_r.hi); parts_lo_v.append(v_r.lo)
        parts_hi_p.append(p_r.hi); parts_lo_p.append(p_r.lo)

    if jc:
        r_hi, r_lo = _ds.reduced_angle(
            d_comp.astype(dtype), t.hi[:, None], t.lo[:, None]
        )
        sin, cos = dsa.sincos_ds(DS(r_hi, r_lo))
        a_c = a_comp.astype(dtype)
        b_c = b_comp.astype(dtype)
        u0 = dsa.add(dsa.mul_f(cos, a_c), dsa.mul_f(sin, b_c))
        u1 = dsa.sub(dsa.mul_f(sin, a_c), dsa.mul_f(cos, b_c))
        p_half = dsa.exp_ds(
            dsa.mul_f(dsa.neg(dt_col), c_comp.astype(dtype))
        )

        def interleave(x0, x1):
            return jnp.stack([x0, x1], axis=-1).reshape(n, 2 * jc)

        parts_hi_u.append(interleave(u0.hi, u1.hi))
        parts_lo_u.append(interleave(u0.lo, u1.lo))
        parts_hi_v.append(interleave(cos.hi, sin.hi))
        parts_lo_v.append(interleave(cos.lo, sin.lo))
        parts_hi_p.append(interleave(p_half.hi, p_half.hi))
        parts_lo_p.append(interleave(p_half.lo, p_half.lo))

    if parts_hi_u:
        cat = lambda parts: jnp.concatenate(parts, axis=1)
        U = DS(cat(parts_hi_u), cat(parts_lo_u))
        V = DS(cat(parts_hi_v), cat(parts_lo_v))
        phi = DS(cat(parts_hi_p), cat(parts_lo_p))
    else:  # jitter-only kernel (P = 0)
        z = jnp.zeros((n, 0), dtype)
        U = V = phi = DS(z, z)

    # A = diag + sum(a_real) + sum(a_comp) + jitter, compensated so a
    # tiny diagonal survives next to a large summed variance.
    asum = dsa.from_f32(jnp.zeros((), dtype))
    if jr:
        asum = dsa.add(asum, dsa.sum_axis(dsa.from_f32(a_real), 0))
    if jc:
        asum = dsa.add(asum, dsa.sum_axis(dsa.from_f32(a_comp), 0))
    asum = dsa.add_f(asum, jnp.asarray(jitter, dtype))
    if isinstance(diag, DS):
        A = dsa.add(
            DS(jnp.broadcast_to(asum.hi, (n,)),
               jnp.broadcast_to(asum.lo, (n,))),
            diag,
        )
    else:
        A = dsa.add_f(
            DS(jnp.broadcast_to(asum.hi, (n,)),
               jnp.broadcast_to(asum.lo, (n,))),
            jnp.asarray(diag, dtype),
        )
    return SSMDS(U=U, V=V, phi=phi, A=A)
