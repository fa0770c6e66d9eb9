"""Tangent-augmented Pallas kernels: GP log-likelihood + T-direction
forward-mode gradient.

The NUTS/HMC hot path is gradient-bound: with d parameters, the round-1
gradient unrolled one ``jax.jvp`` per direction through the lax blocked
solver (~d sequential augmented scans).  Here the T tangent recursions ride
*inside* the same streaming kernels as the primal, so the sequential depth
is unchanged and each extra direction only widens the (already
lane-parallel) VPU ops by one T slot.  This is the TPU-native equivalent of
the reference's forward-mode coefficient AD
(/root/reference/celerite/solver.cpp:347-463), which seeds one dual slot
per coefficient through the same factorization loop.

Two implementations, dispatched on the model width P:

1. **Single fused kernel** (P <= 8, the common case): two streaming
   phases over the time axis with the cross-block prefix compositions
   run *inside* the kernel as Hillis-Steele scans along the lane axis —
   nothing round-trips to HBM and there is no XLA small-op glue.  The
   unrolled scans' live temporaries grow ~P^2 per composition step, so
   scoped VMEM bounds the usable lane count (see ``_fused_per_lane``).
2. **Split two-kernel pipeline + XLA glue** (wide models): kernel 1
   accumulates each block's Riccati (A, J, C) element and its T tangents
   directly in the output refs; the O(B) cross-block exclusive prefix
   runs in plain JAX (``blocked._exclusive_prefix_elements`` and its
   ``jax.linearize`` for the tangents); kernel 2 streams again with the
   per-block S-hat seeds, emitting factor/solve statistics whose final
   affine prefix and scalar assembly are again plain JAX.  Cross-kernel
   traffic is only O(B P^2 T) bytes — negligible — and every kernel is a
   straight streaming loop with a small stack, so this path compiles at
   any P (the fused kernel's scans blow past the 16 MB scoped VMEM at
   P >= 16).

Very wide parameter vectors additionally process the direction axis in
chunks (``plan_jac_launch``), trading launches for VMEM.

All tangent update rules are the exact differentials of the primal lines
(hand-derived; validated against ``jax.jacfwd`` of the lax blocked solver
in tests/test_tangent.py).

Layout: primal time-major ``(L, P, B)`` (lanes = blocks, B a power of
two); tangents ``(L, T, P, B)`` with the direction axis T ahead of the
small dims.  Tangent state lives in ``(T, P, P, B)`` refs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blocked
from .fused import _inv, _rolled, _shift_lanes, default_num_blocks
from .lower import SSM

__all__ = ["gp_log_likelihood_jac", "run_jac_kernel", "plan_jac_launch"]


def _bi(x):
    """Lift (..., P, B) onto the row axis of (..., P, P, B)."""
    return x[..., :, None, :]


def _bj(x):
    """Lift (..., P, B) onto the column axis of (..., P, P, B)."""
    return x[..., None, :, :]


def _elements_jvp_kernel(u_ref, v_ref, ph_ref, a_ref,
                         du_ref, dv_ref, dph_ref, da_ref,
                         A_out, J_out, C_out, DA_out, DJ_out, DC_out):
    """Per-block Riccati (A, J, C) elements + tangents, state in out refs.

    Primal math identical to ops/pallas_solver._elements_kernel (the
    stable trajectory formulation of ops/blocked._block_elements).
    """
    i = pl.program_id(0)
    p = u_ref.shape[1]
    b = u_ref.shape[2]
    dtype = A_out.dtype

    @pl.when(i == 0)
    def _():
        eye = jnp.broadcast_to(
            jnp.eye(p, dtype=dtype)[:, :, None], (p, p, b)
        )
        A_out[:] = eye
        J_out[:] = jnp.zeros_like(J_out)
        C_out[:] = jnp.zeros_like(C_out)
        DA_out[:] = jnp.zeros_like(DA_out)
        DJ_out[:] = jnp.zeros_like(DJ_out)
        DC_out[:] = jnp.zeros_like(DC_out)

    u, v, ph, a = u_ref[0], v_ref[0], ph_ref[0], a_ref[0]
    du, dv, dph, da = du_ref[0], dv_ref[0], dph_ref[0], da_ref[0]

    A_c, DA_c, Sh_c, DSh_c = A_out[:], DA_out[:], C_out[:], DC_out[:]

    # Zero-seeded factor recursion carries the element's C (stable).
    S = _bi(ph) * Sh_c * _bj(ph)
    DS = (
        _bi(dph) * Sh_c * _bj(ph)
        + _bi(ph) * DSh_c * _bj(ph)
        + _bi(ph) * Sh_c * _bj(dph)
    )
    su = jnp.sum(S * _bj(u), axis=-2)
    Dsu = jnp.sum(DS * _bj(u) + S * _bj(du), axis=-2)
    d = a - jnp.sum(u * su, axis=-2, keepdims=True)
    Dd = da - jnp.sum(du * su + u * Dsu, axis=-2, keepdims=True)
    w = (v - su) / d
    Dw = (dv - Dsu) / d - w * (Dd / d)
    C_out[:] = S + d[None, :, :] * _bi(w) * _bj(w)
    DC_out[:] = (
        DS
        + Dd[..., None, :, :] * _bi(w) * _bj(w)
        + d[None, :, :] * (_bi(Dw) * _bj(w) + _bi(w) * _bj(Dw))
    )

    # Closed-loop transition (I - w u^T) Phi applied to A in rank-1 form;
    # J as stable rank-1 information sums (ops/blocked._block_elements).
    ut = ph * u
    Dut = dph * u + ph * du
    uAc = jnp.sum(A_c * _bi(ut), axis=-3)
    DuAc = jnp.sum(DA_c * _bi(ut) + A_c * _bi(Dut), axis=-3)
    A_out[:] = _bi(ph) * A_c - _bi(w) * _bj(uAc)
    DA_out[:] = (
        _bi(dph) * A_c + _bi(ph) * DA_c
        - _bi(Dw) * _bj(uAc) - _bi(w) * _bj(DuAc)
    )
    q = uAc / d
    Dq = DuAc / d - q * (Dd / d)
    J_out[:] = J_out[:] - _bi(uAc) * _bj(q)
    DJ_out[:] = DJ_out[:] - _bi(DuAc) * _bj(q) - _bi(uAc) * _bj(Dq)


def _factor_jvp_kernel(sh0_ref, dsh0_ref,
                       u_ref, v_ref, ph_ref, a_ref, y_ref,
                       du_ref, dv_ref, dph_ref, da_ref, dy_ref,
                       M_out, m_out, Qm_out, qv_out, q0_out, ld_out,
                       mind_out,
                       DM_out, Dm_out, DQm_out, Dqv_out, Dq0_out, Dld_out,
                       Sh, DSh, cq0, cld):
    """Factor + affine solve map + quadratic-form stats (+ tangents).

    Seeded by the per-block S-hat prefix (and its tangents).  The solve's
    dependence on the block's incoming state h_in is affine,
    z_n = z0_n - g_n . h_in, so the kernel accumulates
    (q0 = sum z0^2/d, qv = sum z0 g / d, Qm = sum g g^T / d) plus the
    affine map (M, m) — the exact quadratic term is assembled per block
    afterwards: quad_b = q0_b - 2 qv_b . h_b + h_b^T Qm_b h_b.
    """
    i = pl.program_id(0)
    L = pl.num_programs(0)
    p = u_ref.shape[1]
    b = u_ref.shape[2]
    dtype = Sh.dtype

    @pl.when(i == 0)
    def _():
        eye = jnp.broadcast_to(
            jnp.eye(p, dtype=dtype)[:, :, None], (p, p, b)
        )
        Sh[:] = sh0_ref[:]
        DSh[:] = dsh0_ref[:]
        M_out[:] = eye
        m_out[:] = jnp.zeros_like(m_out)
        Qm_out[:] = jnp.zeros_like(Qm_out)
        qv_out[:] = jnp.zeros_like(qv_out)
        q0_out[:] = jnp.zeros_like(q0_out)
        ld_out[:] = jnp.zeros_like(ld_out)
        mind_out[:] = jnp.full_like(mind_out, jnp.inf)
        DM_out[:] = jnp.zeros_like(DM_out)
        Dm_out[:] = jnp.zeros_like(Dm_out)
        DQm_out[:] = jnp.zeros_like(DQm_out)
        Dqv_out[:] = jnp.zeros_like(Dqv_out)
        Dq0_out[:] = jnp.zeros_like(Dq0_out)
        Dld_out[:] = jnp.zeros_like(Dld_out)
        cq0[:] = jnp.zeros_like(cq0)
        cld[:] = jnp.zeros_like(cld)

    u, v, ph, a, y = u_ref[0], v_ref[0], ph_ref[0], a_ref[0], y_ref[0]
    du, dv, dph, da, dy = (
        du_ref[0], dv_ref[0], dph_ref[0], da_ref[0], dy_ref[0]
    )

    Sh_c, DSh_c = Sh[:], DSh[:]
    S = _bi(ph) * Sh_c * _bj(ph)
    DS = (
        _bi(dph) * Sh_c * _bj(ph)
        + _bi(ph) * DSh_c * _bj(ph)
        + _bi(ph) * Sh_c * _bj(dph)
    )
    su = jnp.sum(S * _bj(u), axis=-2)
    Dsu = jnp.sum(DS * _bj(u) + S * _bj(du), axis=-2)
    d = a - jnp.sum(u * su, axis=-2, keepdims=True)
    Dd = da - jnp.sum(du * su + u * Dsu, axis=-2, keepdims=True)
    w = (v - su) / d
    Dw = (dv - Dsu) / d - w * (Dd / d)
    Sh[:] = S + d[None, :, :] * _bi(w) * _bj(w)
    DSh[:] = (
        DS
        + Dd[..., None, :, :] * _bi(w) * _bj(w)
        + d[None, :, :] * (_bi(Dw) * _bj(w) + _bi(w) * _bj(Dw))
    )

    # Affine solve map: h_n = M_n h_{n-1} + m_n with M_n = (I - w u^T) Phi;
    # g_n = (Phi u)^T M_cum is the sensitivity of z_n to the incoming state.
    M_c, DM_c = M_out[:], DM_out[:]
    PhM = _bi(ph) * M_c
    DPhM = _bi(dph) * M_c + _bi(ph) * DM_c
    g = jnp.sum(PhM * _bi(u), axis=-3)
    Dg = jnp.sum(DPhM * _bi(u) + PhM * _bi(du), axis=-3)
    M_out[:] = PhM - _bi(w) * _bj(g)
    DM_out[:] = DPhM - _bi(Dw) * _bj(g) - _bi(w) * _bj(Dg)

    m_c, Dm_c = m_out[:], Dm_out[:]
    mh = ph * m_c
    Dmh = dph * m_c + ph * Dm_c
    z0 = y - jnp.sum(u * mh, axis=-2, keepdims=True)
    Dz0 = dy - jnp.sum(du * mh + u * Dmh, axis=-2, keepdims=True)
    m_out[:] = mh + w * z0
    Dm_out[:] = Dmh + Dw * z0 + w * Dz0

    # Kahan-compensated scalar accumulators (primal only; tangent sums
    # are plain — their error enters the gradient, not the ll).
    x1 = z0 * z0 / d - cq0[:]
    t1 = q0_out[:] + x1
    cq0[:] = (t1 - q0_out[:]) - x1
    q0_out[:] = t1
    x2 = jnp.log(d) - cld[:]
    t2 = ld_out[:] + x2
    cld[:] = (t2 - ld_out[:]) - x2
    ld_out[:] = t2
    qv_out[:] = qv_out[:] + (z0 / d) * g
    Qm_out[:] = Qm_out[:] + _bi(g) * _bj(g / d)
    mind_out[:] = jnp.minimum(mind_out[:], d)

    rdd = Dd / d
    Dq0_out[:] = Dq0_out[:] + (2.0 * z0 * Dz0 - z0 * z0 * rdd) / d
    Dld_out[:] = Dld_out[:] + rdd
    Dqv_out[:] = Dqv_out[:] + (Dz0 * g + z0 * Dg - z0 * g * rdd) / d
    DQm_out[:] = DQm_out[:] + (
        _bi(Dg) * _bj(g) + _bi(g) * _bj(Dg)
        - _bi(g) * _bj(g) * rdd[..., None, :, :]
    ) / d[None, :, :]

    # Fold the compensations in before the outputs leave VMEM.
    @pl.when(i == L - 1)
    def _():
        q0_out[:] = q0_out[:] + cq0[:]
        ld_out[:] = ld_out[:] + cld[:]


def _run_elements_jvp(u, v, ph, a, du, dv, dph, da, interpret):
    L, p, b = u.shape
    tdim = du.shape[1]
    dtype = u.dtype
    stepP = pl.BlockSpec((1, p, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    step1 = pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    stepTP = pl.BlockSpec((1, tdim, p, b), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    stepT1 = pl.BlockSpec((1, tdim, 1, b), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    full_pp = pl.BlockSpec((p, p, b), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    full_tpp = pl.BlockSpec((tdim, p, p, b), lambda i: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _elements_jvp_kernel,
        grid=(L,),
        in_specs=[stepP, stepP, stepP, step1,
                  stepTP, stepTP, stepTP, stepT1],
        out_specs=[full_pp] * 3 + [full_tpp] * 3,
        out_shape=(
            [jax.ShapeDtypeStruct((p, p, b), dtype)] * 3
            + [jax.ShapeDtypeStruct((tdim, p, p, b), dtype)] * 3
        ),
        interpret=interpret,
    )(u, v, ph, a, du, dv, dph, da)


def _run_factor_jvp(sh0, dsh0, u, v, ph, a, y, du, dv, dph, da, dy,
                    interpret):
    L, p, b = u.shape
    tdim = du.shape[1]
    dtype = u.dtype
    stepP = pl.BlockSpec((1, p, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    step1 = pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    stepTP = pl.BlockSpec((1, tdim, p, b), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    stepT1 = pl.BlockSpec((1, tdim, 1, b), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    full_pp = pl.BlockSpec((p, p, b), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    full_p = pl.BlockSpec((p, b), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    full_1 = pl.BlockSpec((1, b), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    full_tpp = pl.BlockSpec((tdim, p, p, b), lambda i: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    full_tp = pl.BlockSpec((tdim, p, b), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    full_t1 = pl.BlockSpec((tdim, 1, b), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _factor_jvp_kernel,
        grid=(L,),
        in_specs=[full_pp, full_tpp,
                  stepP, stepP, stepP, step1, step1,
                  stepTP, stepTP, stepTP, stepT1, stepT1],
        out_specs=[full_pp, full_p, full_pp, full_p, full_1, full_1,
                   full_1,
                   full_tpp, full_tp, full_tpp, full_tp, full_t1,
                   full_t1],
        out_shape=[
            jax.ShapeDtypeStruct((p, p, b), dtype),       # M
            jax.ShapeDtypeStruct((p, b), dtype),          # m
            jax.ShapeDtypeStruct((p, p, b), dtype),       # Qm
            jax.ShapeDtypeStruct((p, b), dtype),          # qv
            jax.ShapeDtypeStruct((1, b), dtype),          # q0
            jax.ShapeDtypeStruct((1, b), dtype),          # ld
            jax.ShapeDtypeStruct((1, b), dtype),          # mind
            jax.ShapeDtypeStruct((tdim, p, p, b), dtype),  # DM
            jax.ShapeDtypeStruct((tdim, p, b), dtype),    # Dm
            jax.ShapeDtypeStruct((tdim, p, p, b), dtype),  # DQm
            jax.ShapeDtypeStruct((tdim, p, b), dtype),    # Dqv
            jax.ShapeDtypeStruct((tdim, 1, b), dtype),    # Dq0
            jax.ShapeDtypeStruct((tdim, 1, b), dtype),    # Dld
        ],
        scratch_shapes=[
            pltpu.VMEM((p, p, b), dtype),        # Sh
            pltpu.VMEM((tdim, p, p, b), dtype),  # DSh
            pltpu.VMEM((1, b), dtype),           # cq0
            pltpu.VMEM((1, b), dtype),           # cld
        ],
        interpret=interpret,
    )(sh0, dsh0, u, v, ph, a, y, du, dv, dph, da, dy)


def _jac_impl(u, v, ph, a, y, du, dv, dph, da, dy, n, interpret):
    """One T-chunk evaluation: two kernels + XLA prefix glue."""
    L, p, b = u.shape
    dtype = u.dtype

    A_el, J_el, C_el, DA_el, DJ_el, DC_el = _run_elements_jvp(
        u, v, ph, a, du, dv, dph, da, interpret
    )

    # Cross-block exclusive prefix composition (+ tangents via linearize).
    elems = tuple(x.transpose(2, 0, 1) for x in (A_el, J_el, C_el))
    delems = tuple(
        x.transpose(0, 3, 1, 2) for x in (DA_el, DJ_el, DC_el)
    )
    pref, lin = jax.linearize(blocked._exclusive_prefix_elements, elems)
    dpref = jax.vmap(lin)(delems)
    sh0 = pref[2].transpose(1, 2, 0)           # (P, P, B)
    dsh0 = dpref[2].transpose(0, 2, 3, 1)      # (T, P, P, B)

    (M, m, Qm, qv, q0, ld, mind,
     DM, Dm, DQm, Dqv, Dq0, Dld) = _run_factor_jvp(
        sh0, dsh0, u, v, ph, a, y, du, dv, dph, da, dy, interpret
    )

    # Affine prefix -> incoming state h per block (+ tangents).
    Mb = M.transpose(2, 0, 1)
    mb = m.transpose(1, 0)
    (Mp, mp), lin2 = jax.linearize(
        blocked._exclusive_prefix_affine, Mb, mb
    )
    DMb = DM.transpose(0, 3, 1, 2)
    Dmb = Dm.transpose(0, 2, 1)
    dmp = jax.vmap(lambda dM_, dm_: lin2(dM_, dm_)[1])(DMb, Dmb)
    h = mp.transpose(1, 0)                     # (P, B)
    Dh = dmp.transpose(0, 2, 1)                # (T, P, B)

    # Assemble quad = q0 - 2 qv.h + h^T Qm h and its differential.
    Qh = jnp.sum(Qm * h[None, :, :], axis=1)   # (P, B)
    quad = jnp.sum(
        q0[0]
        - 2.0 * jnp.sum(qv * h, axis=0)
        + jnp.sum(h * Qh, axis=0)
    )
    logdet = jnp.sum(ld)
    hDQh = jnp.sum(_bi(h) * DQm * _bj(h), axis=(-3, -2))  # (T, B)
    dquad = jnp.sum(
        Dq0[:, 0, :]
        - 2.0 * jnp.sum(Dqv * h[None] + qv[None] * Dh, axis=-2)
        + 2.0 * jnp.sum(Qh[None] * Dh, axis=-2)
        + hDQh,
        axis=-1,
    )
    dld = jnp.sum(Dld[:, 0, :], axis=-1)

    ll = -0.5 * (
        quad + logdet + n * jnp.log(2.0 * jnp.pi).astype(dtype)
    )
    ok = (jnp.min(mind) > 0) & jnp.isfinite(ll)
    dll = -0.5 * (dquad + dld)
    return jnp.where(ok, ll, -jnp.inf), ok, dll


_VMEM_BUDGET = 12e6  # of the 16 MB scoped-VMEM limit (margin for model error)


def _vmem_per_lane(p, tdim):
    """Scoped-VMEM bytes per lane of the factor-jvp kernel (model).

    Dominant state: ~3 primal + 3T tangent (P, P, B) refs (sublane dim
    padded to >= 8), plus streamed input double-buffers and stack slack.
    """
    pp = p * max(p, 8)
    return 4.0 * pp * (3.5 + 3.5 * tdim) + 60.0 * tdim * max(p, 8)


def _feasible_blocks(p, tdim):
    """Largest power-of-two lane count within the scoped-VMEM budget."""
    b = 4096
    while b > 128 and b * _vmem_per_lane(p, tdim) > _VMEM_BUDGET:
        b //= 2
    return b


_FUSED_BUDGET = 11e6


def _fused_per_lane(p, tdim):
    """Scoped-VMEM bytes per lane of the single fused jac kernel.

    Anchored on v5e compiler reports (T=3, P=4, B=4096 -> ~6.1 KB/lane;
    the unrolled in-kernel prefix scans dominate).
    """
    return 1536.0 * (1 + tdim) * (max(p, 4) / 4.0) ** 2


def _use_fused(p, tdim, b):
    """Whether the single fused kernel handles (P, T) at lane count b."""
    return p <= 8 and _fused_per_lane(p, tdim) * b <= _FUSED_BUDGET


def plan_jac_launch(n, p, tdim):
    """Pick (tangent_chunk, num_blocks) for a T-direction jac evaluation.

    Directions are processed ``tangent_chunk`` at a time (the primal
    recursion is recomputed per chunk — it is a small fraction of the
    augmented work), so wide-parameter models degrade to more chunks
    instead of compile-time VMEM failures.

    P <= 8 routes to the single fused kernel (fastest; rarely chunks);
    wider models use the split two-kernel pipeline, whose chunk is the
    largest one still admitting a >= 256-lane launch.
    """
    cap = default_num_blocks(n)
    if p <= 8:
        b = 4096
        while b > 128 and _fused_per_lane(p, tdim) * b > _FUSED_BUDGET:
            b //= 2
        if _use_fused(p, tdim, b):
            return tdim, min(b, cap)
        chunk = tdim
        while chunk > 1 and not _use_fused(p, chunk, 128):
            chunk -= 1
        return chunk, min(128, cap)
    chunk = tdim
    while chunk > 1 and _feasible_blocks(p, chunk) < 256:
        chunk -= 1
    return chunk, min(_feasible_blocks(p, chunk), cap)


def max_chunk_for(p, b, tdim):
    """Largest direction chunk whose scoped VMEM fits lane count ``b``.

    For callers whose lane layout is already fixed by a prebuilt plan
    (ops/lanes.py).
    """
    chunk = tdim
    if p <= 8:
        while chunk > 1 and not _use_fused(p, chunk, b):
            chunk -= 1
    else:
        while chunk > 1 and _feasible_blocks(p, chunk) < b:
            chunk -= 1
    return chunk


def default_jac_blocks(n, p, tdim):
    """Lane-block count for the (possibly chunked) jac kernel launch."""
    return plan_jac_launch(n, p, tdim)[1]


def run_jac_kernel(u, v, ph, a, y, du, dv, dph, da, dy, n,
                   interpret=False, max_tangents=None):
    """Invoke the tangent-augmented pipeline on pre-laned inputs.

    Primal arrays are (L, P, B)/(L, 1, B); tangent arrays are
    (L, T, P, B)/(L, T, 1, B).  Returns (ll, ok, dll (T,)).

    ``max_tangents``: process the direction axis in chunks of at most
    this many (one pipeline invocation per chunk, primal recomputed each
    time) so wide-parameter models stay inside scoped VMEM.
    """
    tdim_total = du.shape[1]
    if max_tangents is not None and tdim_total > max_tangents:
        lls, oks, dlls = [], [], []
        for s in range(0, tdim_total, max_tangents):
            e = min(s + max_tangents, tdim_total)
            ll, ok, dll = run_jac_kernel(
                u, v, ph, a, y,
                du[:, s:e], dv[:, s:e], dph[:, s:e],
                da[:, s:e], dy[:, s:e],
                n, interpret=interpret,
            )
            lls.append(ll)
            oks.append(ok)
            dlls.append(dll)
        return lls[0], oks[0], jnp.concatenate(dlls)

    p, b = u.shape[1], u.shape[2]
    if _use_fused(p, tdim_total, b):
        return _run_fused_jac(
            u, v, ph, a, y, du, dv, dph, da, dy, n, interpret=interpret
        )
    return _jac_impl(u, v, ph, a, y, du, dv, dph, da, dy, n, interpret)




# ---- single fused two-phase kernel (P <= 8 fast path) ----------------
# The in-kernel Hillis-Steele prefix scans keep everything resident in
# VMEM (no cross-kernel HBM round trip, no XLA small-op glue), but the
# unrolled scans' live temporaries grow ~P^2 per composition and blow
# scoped VMEM at P >= 16 -- hence the split pipeline above for wide
# models and this kernel for the common small-P case.

def _gmm(x, y):
    """Lane-batched small matmul with leading-dim broadcasting.

    out[..., i, j, b] = sum_k x[..., i, k, b] * y[..., k, j, b]; either
    argument may carry a leading tangent axis.
    """
    p = x.shape[-3]
    acc = x[..., :, 0:1, :] * y[..., 0:1, :, :]
    for k in range(1, p):
        acc = acc + x[..., :, k:k + 1, :] * y[..., k:k + 1, :, :]
    return acc


def _gtr(x):
    return jnp.swapaxes(x, -3, -2)



def _compose_elem_jvp(e1, e2, de1, de2, eye):
    """(A, J, C) composition and its differential (e1 acts first)."""
    a1, j1, c1 = e1
    a2, j2, c2 = e2
    da1, dj1, dc1 = de1
    da2, dj2, dc2 = de2

    m = eye + _gmm(c1, j2)
    dm = _gmm(dc1, j2) + _gmm(c1, dj2)
    e = _inv(m)
    de = -_gmm(e, _gmm(dm, e))

    ea1 = _gmm(e, a1)
    a12 = _gmm(a2, ea1)
    da12 = _gmm(da2, ea1) + _gmm(a2, _gmm(de, a1) + _gmm(e, da1))

    a2e = _gmm(a2, e)
    c1a2t = _gmm(c1, _gtr(a2))
    c12 = _gmm(a2e, c1a2t) + c2
    da2e = _gmm(da2, e) + _gmm(a2, de)
    dc1a2t = _gmm(dc1, _gtr(a2)) + _gmm(c1, _gtr(da2))
    dc12 = _gmm(da2e, c1a2t) + _gmm(a2e, dc1a2t) + dc2

    j2e = _gmm(j2, e)
    j2ea1 = _gmm(j2e, a1)
    j12 = j1 + _gmm(_gtr(a1), j2ea1)
    dj2e = _gmm(dj2, e) + _gmm(j2, de)
    dj12 = dj1 + _gmm(_gtr(da1), j2ea1) + _gmm(
        _gtr(a1), _gmm(dj2e, a1) + _gmm(j2e, da1)
    )
    return (a12, j12, c12), (da12, dj12, dc12)


def _jac_kernel(u_ref, v_ref, ph_ref, a_ref, y_ref,
                du_ref, dv_ref, dph_ref, da_ref, dy_ref,
                quad_out, ld_out, mind_out, dquad_out, dld_out,
                Sh, Ac, Jc, Mc, mc, Qm, qv, q0, cq0, ld, cld, mind,
                DSh, DAc, DJc, DMc, Dmc, DQm, Dqv, Dq0, Dld):
    phase = pl.program_id(0)
    i = pl.program_id(1)
    L = pl.num_programs(1)
    p = u_ref.shape[1]
    b = u_ref.shape[2]
    dtype = Sh.dtype
    eye = jnp.broadcast_to(jnp.eye(p, dtype=dtype)[:, :, None], (p, p, b))

    # ---- phase 0: per-block Riccati elements + tangents -------------------
    @pl.when((phase == 0) & (i == 0))
    def _():
        Ac[:] = eye
        Jc[:] = jnp.zeros_like(Jc)
        Sh[:] = jnp.zeros_like(Sh)
        DAc[:] = jnp.zeros_like(DAc)
        DJc[:] = jnp.zeros_like(DJc)
        DSh[:] = jnp.zeros_like(DSh)

    @pl.when(phase == 0)
    def _():
        u, v, ph, a = u_ref[0], v_ref[0], ph_ref[0], a_ref[0]
        du, dv, dph, da = du_ref[0], dv_ref[0], dph_ref[0], da_ref[0]

        A_c, DA_c, Sh_c, DSh_c = Ac[:], DAc[:], Sh[:], DSh[:]

        S = _bi(ph) * Sh_c * _bj(ph)
        DS = (
            _bi(dph) * Sh_c * _bj(ph)
            + _bi(ph) * DSh_c * _bj(ph)
            + _bi(ph) * Sh_c * _bj(dph)
        )
        su = jnp.sum(S * _bj(u), axis=-2)
        Dsu = jnp.sum(DS * _bj(u) + S * _bj(du), axis=-2)
        d = a - jnp.sum(u * su, axis=-2, keepdims=True)
        Dd = da - jnp.sum(du * su + u * Dsu, axis=-2, keepdims=True)
        w = (v - su) / d
        Dw = (dv - Dsu) / d - w * (Dd / d)
        Sh[:] = S + d[None, :, :] * _bi(w) * _bj(w)
        DSh[:] = (
            DS
            + Dd[..., None, :, :] * _bi(w) * _bj(w)
            + d[None, :, :] * (_bi(Dw) * _bj(w) + _bi(w) * _bj(Dw))
        )

        ut = ph * u
        Dut = dph * u + ph * du
        uAc = jnp.sum(A_c * _bi(ut), axis=-3)
        DuAc = jnp.sum(DA_c * _bi(ut) + A_c * _bi(Dut), axis=-3)
        Ac[:] = _bi(ph) * A_c - _bi(w) * _bj(uAc)
        DAc[:] = (
            _bi(dph) * A_c + _bi(ph) * DA_c
            - _bi(Dw) * _bj(uAc) - _bi(w) * _bj(DuAc)
        )
        q = uAc / d
        Dq = DuAc / d - q * (Dd / d)
        Jc[:] = Jc[:] - _bi(uAc) * _bj(q)
        DJc[:] = DJc[:] - _bi(DuAc) * _bj(q) - _bi(uAc) * _bj(Dq)

    # ---- phase boundary: prefix composition (+ tangent), seed phase 1 -----
    @pl.when((phase == 1) & (i == 0))
    def _():
        es = (Ac[:], Jc[:], Sh[:])
        des = (DAc[:], DJc[:], DSh[:])
        s = 1
        while s < b:
            lane = lax.broadcasted_iota(jnp.int32, (p, p, b), 2)
            e1 = tuple(_rolled(x, s) for x in es)
            de1 = tuple(_rolled(x, s) for x in des)
            ce, cde = _compose_elem_jvp(e1, es, de1, des, eye)
            keep = lane < s
            es = tuple(jnp.where(keep, x, c) for x, c in zip(es, ce))
            des = tuple(jnp.where(keep, x, c) for x, c in zip(des, cde))
            s *= 2
        Sh[:] = _shift_lanes(es[2], jnp.zeros_like(es[2]))
        DSh[:] = _shift_lanes(des[2], jnp.zeros_like(des[2]))

        Mc[:] = eye
        mc[:] = jnp.zeros_like(mc)
        Qm[:] = jnp.zeros_like(Qm)
        qv[:] = jnp.zeros_like(qv)
        q0[:] = jnp.zeros_like(q0)
        cq0[:] = jnp.zeros_like(cq0)
        ld[:] = jnp.zeros_like(ld)
        cld[:] = jnp.zeros_like(cld)
        mind[:] = jnp.full_like(mind, jnp.inf)
        DMc[:] = jnp.zeros_like(DMc)
        Dmc[:] = jnp.zeros_like(Dmc)
        DQm[:] = jnp.zeros_like(DQm)
        Dqv[:] = jnp.zeros_like(Dqv)
        Dq0[:] = jnp.zeros_like(Dq0)
        Dld[:] = jnp.zeros_like(Dld)

    # ---- phase 1: factor + solve map + quadratic-form stats (+ tangents) --
    @pl.when(phase == 1)
    def _():
        u, v, ph, a, y = u_ref[0], v_ref[0], ph_ref[0], a_ref[0], y_ref[0]
        du, dv, dph, da, dy = (
            du_ref[0], dv_ref[0], dph_ref[0], da_ref[0], dy_ref[0]
        )

        Sh_c, DSh_c = Sh[:], DSh[:]
        S = _bi(ph) * Sh_c * _bj(ph)
        DS = (
            _bi(dph) * Sh_c * _bj(ph)
            + _bi(ph) * DSh_c * _bj(ph)
            + _bi(ph) * Sh_c * _bj(dph)
        )
        su = jnp.sum(S * _bj(u), axis=-2)
        Dsu = jnp.sum(DS * _bj(u) + S * _bj(du), axis=-2)
        d = a - jnp.sum(u * su, axis=-2, keepdims=True)
        Dd = da - jnp.sum(du * su + u * Dsu, axis=-2, keepdims=True)
        w = (v - su) / d
        Dw = (dv - Dsu) / d - w * (Dd / d)
        Sh[:] = S + d[None, :, :] * _bi(w) * _bj(w)
        DSh[:] = (
            DS
            + Dd[..., None, :, :] * _bi(w) * _bj(w)
            + d[None, :, :] * (_bi(Dw) * _bj(w) + _bi(w) * _bj(Dw))
        )

        M_c, DM_c = Mc[:], DMc[:]
        PhM = _bi(ph) * M_c
        DPhM = _bi(dph) * M_c + _bi(ph) * DM_c
        g = jnp.sum(PhM * _bi(u), axis=-3)
        Dg = jnp.sum(DPhM * _bi(u) + PhM * _bi(du), axis=-3)
        Mc[:] = PhM - _bi(w) * _bj(g)
        DMc[:] = DPhM - _bi(Dw) * _bj(g) - _bi(w) * _bj(Dg)

        m_c, Dm_c = mc[:], Dmc[:]
        mh = ph * m_c
        Dmh = dph * m_c + ph * Dm_c
        z0 = y - jnp.sum(u * mh, axis=-2, keepdims=True)
        Dz0 = dy - jnp.sum(du * mh + u * Dmh, axis=-2, keepdims=True)
        mc[:] = mh + w * z0
        Dmc[:] = Dmh + Dw * z0 + w * Dz0

        # Kahan-compensated scalar accumulators (primal only; tangent sums
        # are plain — their error enters the gradient, not the ll).
        x1 = z0 * z0 / d - cq0[:]
        t1 = q0[:] + x1
        cq0[:] = (t1 - q0[:]) - x1
        q0[:] = t1
        x2 = jnp.log(d) - cld[:]
        t2 = ld[:] + x2
        cld[:] = (t2 - ld[:]) - x2
        ld[:] = t2
        qv[:] = qv[:] + (z0 / d) * g
        Qm[:] = Qm[:] + _bi(g) * _bj(g / d)
        mind[:] = jnp.minimum(mind[:], d)

        rdd = Dd / d
        Dq0[:] = Dq0[:] + (2.0 * z0 * Dz0 - z0 * z0 * rdd) / d
        Dld[:] = Dld[:] + rdd
        Dqv[:] = Dqv[:] + (Dz0 * g + z0 * Dg - z0 * g * rdd) / d
        DQm[:] = DQm[:] + (
            _bi(Dg) * _bj(g) + _bi(g) * _bj(Dg)
            - _bi(g) * _bj(g) * rdd[..., None, :, :]
        ) / d[None, :, :]

    # ---- final: affine prefix (+ tangent) -> h_in, assemble, reduce -------
    @pl.when((phase == 1) & (i == L - 1))
    def _():
        M_s, m_s = Mc[:], mc[:]
        DM_s, Dm_s = DMc[:], Dmc[:]
        s = 1
        while s < b:
            lane_m = lax.broadcasted_iota(jnp.int32, (p, p, b), 2)
            lane_v = lax.broadcasted_iota(jnp.int32, (p, b), 1)
            m1, v1 = _rolled(M_s, s), _rolled(m_s, s)
            dm1, dv1 = _rolled(DM_s, s), _rolled(Dm_s, s)
            cm = _gmm(M_s, m1)
            dcm = _gmm(DM_s, m1) + _gmm(M_s, dm1)
            cv = jnp.sum(M_s * _bj(v1), axis=-2) + m_s
            dcv = (
                jnp.sum(DM_s * _bj(v1) + M_s * _bj(dv1), axis=-2) + Dm_s
            )
            M_s = jnp.where(lane_m < s, M_s, cm)
            m_s = jnp.where(lane_v < s, m_s, cv)
            DM_s = jnp.where(lane_m < s, DM_s, dcm)
            Dm_s = jnp.where(lane_v < s, Dm_s, dcv)
            s *= 2
        h = _shift_lanes(m_s, jnp.zeros_like(m_s))
        Dh = _shift_lanes(Dm_s, jnp.zeros_like(Dm_s))

        Qh = jnp.sum(Qm[:] * _bi(h), axis=-3)
        quad_b = (
            q0[:] + cq0[:]
            - 2.0 * jnp.sum(qv[:] * h, axis=-2, keepdims=True)
            + jnp.sum(h * Qh, axis=-2, keepdims=True)
        )
        quad_out[:] = jnp.sum(quad_b).reshape(1, 1)
        ld_out[:] = jnp.sum(ld[:] + cld[:]).reshape(1, 1)
        mind_out[:] = jnp.min(mind[:]).reshape(1, 1)

        # d(h^T Qm h) = 2 Qh . Dh + h^T DQm h (Qm symmetric).  Reductions
        # stay keepdims-shaped: Mosaic's layout inference rejects
        # rank-changing reshapes through rank-1.
        hDQh = jnp.sum(
            jnp.sum(_bi(h) * DQm[:] * _bj(h), axis=-3),
            axis=-2, keepdims=True,
        )
        dquad_b = (
            Dq0[:]
            - 2.0 * jnp.sum(Dqv[:] * h + qv[:] * Dh, axis=-2, keepdims=True)
            + 2.0 * jnp.sum(Qh * Dh, axis=-2, keepdims=True)
            + hDQh
        )
        dquad_out[:] = jnp.sum(dquad_b, axis=-1)
        dld_out[:] = jnp.sum(Dld[:], axis=-1)



def _run_fused_jac(u, v, ph, a, y, du, dv, dph, da, dy, n,
                    interpret=False):
    """Single fused two-phase kernel (in-kernel prefix scans).

    Primal arrays are (L, P, B)/(L, 1, B); tangent arrays are
    (L, T, P, B)/(L, T, 1, B).  Returns (ll, ok, dll (T,)).
    """
    L, p, b = u.shape
    tdim = du.shape[1]
    dtype = u.dtype

    stepP = pl.BlockSpec((1, p, b), lambda ph_, i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    step1 = pl.BlockSpec((1, 1, b), lambda ph_, i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    stepTP = pl.BlockSpec((1, tdim, p, b), lambda ph_, i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    stepT1 = pl.BlockSpec((1, tdim, 1, b), lambda ph_, i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((1, 1), lambda ph_, i: (0, 0),
                        memory_space=pltpu.VMEM)
    tvec = pl.BlockSpec((tdim, 1), lambda ph_, i: (0, 0),
                        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _jac_kernel,
        grid=(2, L),
        in_specs=[stepP, stepP, stepP, step1, step1,
                  stepTP, stepTP, stepTP, stepT1, stepT1],
        out_specs=[scal, scal, scal, tvec, tvec],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((tdim, 1), dtype),
            jax.ShapeDtypeStruct((tdim, 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((p, p, b), dtype),        # Sh
            pltpu.VMEM((p, p, b), dtype),        # Ac
            pltpu.VMEM((p, p, b), dtype),        # Jc
            pltpu.VMEM((p, p, b), dtype),        # Mc
            pltpu.VMEM((p, b), dtype),           # mc
            pltpu.VMEM((p, p, b), dtype),        # Qm
            pltpu.VMEM((p, b), dtype),           # qv
            pltpu.VMEM((1, b), dtype),           # q0
            pltpu.VMEM((1, b), dtype),           # cq0
            pltpu.VMEM((1, b), dtype),           # ld
            pltpu.VMEM((1, b), dtype),           # cld
            pltpu.VMEM((1, b), dtype),           # mind
            pltpu.VMEM((tdim, p, p, b), dtype),  # DSh
            pltpu.VMEM((tdim, p, p, b), dtype),  # DAc
            pltpu.VMEM((tdim, p, p, b), dtype),  # DJc
            pltpu.VMEM((tdim, p, p, b), dtype),  # DMc
            pltpu.VMEM((tdim, p, b), dtype),     # Dmc
            pltpu.VMEM((tdim, p, p, b), dtype),  # DQm
            pltpu.VMEM((tdim, p, b), dtype),     # Dqv
            pltpu.VMEM((tdim, 1, b), dtype),     # Dq0
            pltpu.VMEM((tdim, 1, b), dtype),     # Dld
        ],
        interpret=interpret,
    )(u, v, ph, a, y, du, dv, dph, da, dy)

    quad, ld_, mind, dquad, dld = out
    ll = -0.5 * (
        quad[0, 0] + ld_[0, 0] + n * jnp.log(2.0 * jnp.pi).astype(dtype)
    )
    ok = (mind[0, 0] > 0) & jnp.isfinite(ll)
    dll = -0.5 * (dquad[:, 0] + dld[:, 0])
    return jnp.where(ok, ll, -jnp.inf), ok, dll


def _to_lanes_tan(x, num_blocks, L, pad, pad_value=0.0):
    """(T, B*L-ish, P) or (T, N) tangent arrays -> (L, T, P, B)/(L, T, 1, B)."""
    tdim = x.shape[0]
    if x.ndim == 2:
        x = x[:, :, None]
    p = x.shape[2]
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((tdim, pad, p), pad_value, x.dtype)], axis=1
        )
    b = num_blocks
    return x.reshape(tdim, b, L, p).transpose(2, 0, 3, 1)


def gp_log_likelihood_jac(ssm: SSM, resid, dssm: SSM, dresid,
                          num_blocks=None, interpret=False):
    """Fused primal + T-direction forward-mode jacobian of the GP ll.

    ``dssm`` / ``dresid`` carry a leading tangent axis T on every array.
    Returns ``(ll, ok, dll)`` with ``dll`` of shape (T,).
    """
    n, p = ssm.U.shape
    tdim = dssm.U.shape[0]
    chunk, auto_b = plan_jac_launch(n, p, tdim)
    b = num_blocks or auto_b
    if b & (b - 1):
        raise ValueError("num_blocks must be a power of two")
    L = -(-n // b)
    pad = b * L - n

    U, V, phi, A, y = ssm.U, ssm.V, ssm.phi, ssm.A, resid
    if pad:
        zU = jnp.zeros((pad, p), U.dtype)
        U = jnp.concatenate([U, zU])
        V = jnp.concatenate([V, zU])
        phi = jnp.concatenate([phi, jnp.ones((pad, p), U.dtype)])
        A = jnp.concatenate([A, jnp.ones((pad,), A.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])

    def tm(x):
        return x.reshape(b, L, p).transpose(1, 2, 0)

    def tm1(x):
        return x.reshape(b, L).transpose(1, 0)[:, None, :]

    du = _to_lanes_tan(dssm.U, b, L, pad)
    dv = _to_lanes_tan(dssm.V, b, L, pad)
    dph = _to_lanes_tan(dssm.phi, b, L, pad)
    da = _to_lanes_tan(dssm.A, b, L, pad)
    dy = _to_lanes_tan(dresid, b, L, pad)

    return run_jac_kernel(
        tm(U), tm(V), tm(phi), tm1(A), tm1(y), du, dv, dph, da, dy, n,
        interpret=interpret, max_tangents=chunk,
    )
