"""Lane-layout lowering: build the kernel's (L, P, B) inputs directly.

The fused kernel streams time-major ``(L, P, B)`` arrays.  Producing them
from the natural ``(N, P)`` lowering costs a per-eval transpose of ~50 MB
plus padding glue — measured at ~1.4 ms of the ~2.6 ms N=1e6 budget.  But
everything shape-shaping about that transform is *static per dataset*:
only the coefficient scalars change between likelihood evaluations.

So: :func:`make_plan` precomputes the time grid, spacings, ds lo-parts,
mask, diag and data already in lane layout (host-side, float64-exact),
and :func:`lower_lanes` builds (U, V, phi, A) as pure elementwise
broadcasts of the coefficients against those static arrays — no
transposes, no concatenation glue in the hot path, and XLA fuses the
whole lowering into the kernel's input stream.

Padding contract (matches ops/fused._to_lanes): pad rows have dt = 0
(hence phi = 1 with no masking), U = V = 0, A = 1, y = 0 via the static
``mask``.

Reference analog: cholesky.h:103-152 builds the same quantities row by
row inside the factorization loop; here they are a fused map over a
pre-laid-out grid.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import ds as _ds
from .lower import Coefficients

__all__ = ["LanePlan", "make_plan", "lower_lanes", "gp_log_likelihood",
           "gp_log_likelihood_jac"]


class LanePlan(NamedTuple):
    """Static per-dataset arrays in lane layout (see module docstring)."""

    t: jnp.ndarray      # (L, 1, B) f32 time grid (hi part)
    t_lo: jnp.ndarray   # (L, 1, B) ds lo part of the f64 grid
    dt: jnp.ndarray     # (L, 1, B) exact spacings; 0 at block starts' pad
    diag: jnp.ndarray   # (L, 1, B) per-point variance (yerr^2), 0 on pad
    y: jnp.ndarray      # (L, 1, B) data, 0 on pad
    mask: jnp.ndarray   # (L, 1, B) 1.0 on real rows, 0.0 on pad
    n: int              # unpadded point count (static)


def _lane1(x, b, L):
    return np.ascontiguousarray(
        x.reshape(b, L).T[:, None, :]
    )


def make_plan(t, y, diag, num_blocks, dtype=np.float32) -> LanePlan:
    """Host-side plan construction from float64 inputs.

    ``num_blocks`` must be a power of two.  Spacings are differenced in
    f64 (percent-level relative error if differenced after f32 rounding);
    the first row of every *block* keeps its true spacing — only the very
    first point and pad rows get dt = 0, because blocks are seeded by the
    cross-block prefix, not by resetting the recursion.
    """
    b = num_blocks
    if b & (b - 1):
        raise ValueError("num_blocks must be a power of two")
    t = np.asarray(t, np.float64)
    n = t.shape[0]
    L = -(-n // b)
    pad = b * L - n

    def padded(x, fill):
        return np.concatenate([x, np.full(pad, fill, np.float64)])

    t_pad = padded(t, t[-1] if n else 0.0)
    dt = np.concatenate([[0.0], np.diff(t)])
    dt_pad = padded(dt, 0.0)
    diag_pad = padded(np.asarray(diag, np.float64), 0.0)
    y_pad = padded(np.asarray(y, np.float64), 0.0)
    mask = padded(np.ones(n), 0.0)

    t_hi = t_pad.astype(dtype)
    t_lo = (t_pad - np.float64(t_hi)).astype(dtype)

    return LanePlan(
        t=jnp.asarray(_lane1(t_hi, b, L)),
        t_lo=jnp.asarray(_lane1(t_lo, b, L)),
        dt=jnp.asarray(_lane1(dt_pad.astype(dtype), b, L)),
        diag=jnp.asarray(_lane1(diag_pad.astype(dtype), b, L)),
        y=jnp.asarray(_lane1(y_pad.astype(dtype), b, L)),
        mask=jnp.asarray(_lane1(mask.astype(dtype), b, L)),
        n=n,
    )


def lower_lanes(coeffs: Coefficients, plan: LanePlan):
    """Elementwise (U, V, phi, A) build in lane layout.

    Returns (u, v, ph, a) with shapes (L, P, B)/(L, 1, B), P following
    the standard ordering (real block, then interleaved complex pairs).
    Uses the compensated exp and ds mod-2pi phase reduction (ops/ds.py).
    """
    a_real, c_real, a_comp, b_comp, c_comp, d_comp, jitter = coeffs
    L, _, b = plan.t.shape
    dtype = plan.t.dtype
    jr = a_real.shape[0]
    jc = a_comp.shape[0]

    parts_u, parts_v, parts_p = [], [], []

    if jr:
        ar = a_real.astype(dtype)[None, :, None]
        cr = c_real.astype(dtype)[None, :, None]
        parts_u.append(
            jnp.broadcast_to(ar, (L, jr, b)) * plan.mask
        )
        parts_v.append(jnp.broadcast_to(plan.mask, (L, jr, b)))
        parts_p.append(_ds.accurate_exp(-cr * plan.dt))

    if jc:
        ac = a_comp.astype(dtype)[None, :, None]
        bc = b_comp.astype(dtype)[None, :, None]
        cc = c_comp.astype(dtype)[None, :, None]
        dc = d_comp.astype(dtype)[None, :, None]
        r_hi, r_lo = _ds.reduced_angle(dc, plan.t, plan.t_lo)
        cos, sin = _ds.ds_cos_sin(r_hi, r_lo)  # (L, Jc, B)
        cos = cos * plan.mask
        sin = sin * plan.mask
        u_c = jnp.stack(
            [ac * cos + bc * sin, ac * sin - bc * cos], axis=2
        ).reshape(L, 2 * jc, b)
        v_c = jnp.stack([cos, sin], axis=2).reshape(L, 2 * jc, b)
        p_half = _ds.accurate_exp(-cc * plan.dt)
        p_c = jnp.stack([p_half, p_half], axis=2).reshape(L, 2 * jc, b)
        parts_u.append(u_c)
        parts_v.append(v_c)
        parts_p.append(p_c)

    u = jnp.concatenate(parts_u, axis=1)
    v = jnp.concatenate(parts_v, axis=1)
    ph = jnp.concatenate(parts_p, axis=1)
    total = jnp.sum(a_real) + jnp.sum(a_comp) + jnp.asarray(jitter, dtype)
    a = plan.mask * (plan.diag + total.astype(dtype)) + (1.0 - plan.mask)
    return u, v, ph, a


def gp_log_likelihood(coeffs: Coefficients, plan: LanePlan, resid_delta=None,
                      interpret=False):
    """(ll, ok) through the fused kernel, fully in lane layout.

    ``resid_delta``: optional (L, 1, B) mean values to subtract from the
    plan's data (already masked by the caller via ``plan.mask``).
    """
    from . import fused

    u, v, ph, a = lower_lanes(coeffs, plan)
    y = plan.y if resid_delta is None else plan.y - resid_delta
    return fused.run_kernel(u, v, ph, a, y, plan.n, interpret=interpret)


def gp_log_likelihood_jac(make_inputs, theta, plan_n, interpret=False):
    """Primal + forward-mode jacobian from a lane-layout input builder.

    ``make_inputs(theta) -> (u, v, ph, a, y)`` in lane layout.  The
    builder is linearized once (it is cheap elementwise math); the T
    basis tangents push through its linear part directly into the
    tangent-augmented kernel's (L, T, P, B) stream slots.
    """
    from . import tangent

    dim = theta.shape[0]
    (u, v, ph, a, y), lin = jax.linearize(make_inputs, theta)
    du, dv, dph, da, dy = jax.vmap(lin, out_axes=1)(
        jnp.eye(dim, dtype=theta.dtype)
    )
    # Largest direction chunk whose scoped-VMEM fits the plan's lane count.
    p, b = u.shape[1], u.shape[2]
    chunk = tangent.max_chunk_for(p, b, dim)
    return tangent.run_jac_kernel(
        u, v, ph, a, y, du, dv, dph, da, dy, plan_n, interpret=interpret,
        max_tangents=chunk,
    )
