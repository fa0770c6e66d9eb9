"""Tangent-augmented fused Pallas kernel: GP log-likelihood + T-direction
forward-mode gradient in a single device program.

The NUTS/HMC hot path is gradient-bound: with d parameters, the round-1
gradient unrolled one ``jax.jvp`` per direction through the lax blocked
solver (~d sequential augmented scans).  Here the T tangent recursions ride
*inside* the same two-phase fused kernel as the primal
(:mod:`ops.fused`), so the sequential depth is unchanged and each extra
direction only widens the (already lane-parallel) VPU ops by one T slot.
This is the TPU-native equivalent of the reference's forward-mode
coefficient AD (/root/reference/celerite/solver.cpp:347-463), which seeds
one dual slot per coefficient through the same factorization loop.

All tangent update rules below are the exact differentials of the fused
kernel's primal lines (hand-derived; validated against ``jax.jacfwd`` of
the lax blocked solver in tests/test_tangent.py).

Layout: primal time-major ``(L, P, B)`` (lanes = blocks, B a power of
two); tangents ``(L, T, P, B)`` with the direction axis T ahead of the
small dims.  Tangent state lives in ``(T, P, P, B)`` VMEM scratch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused import _inv, _rolled, _shift_lanes, default_num_blocks
from .lower import SSM

__all__ = ["gp_log_likelihood_jac"]


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


def _bi(x):
    """Lift (..., P, B) onto the row axis of (..., P, P, B)."""
    return x[..., :, None, :]


def _bj(x):
    """Lift (..., P, B) onto the column axis of (..., P, P, B)."""
    return x[..., None, :, :]


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


def default_jac_blocks(n, p, tdim):
    """Largest power-of-two lane count that keeps the jac kernel in VMEM.

    Empirical model anchored on v5e: P=4, T=3, B=4096 needs ~25 MB of
    scoped VMEM (sublane padding inflates every (T, P, P, B) scratch to
    sublane multiples of 8); budget ~11 MB of the 16 MB limit.
    """
    # Anchors (v5e scoped-VMEM reports): T=3, P=4, B=4096 -> 6.04 KB/lane;
    # T=7, P=8, B=512 -> 48.8 KB/lane.  Both fit 1536 (1+T) (P/4)^2.
    per_lane = 1536.0 * (1 + tdim) * (max(p, 4) / 4.0) ** 2
    b = 4096
    while b > 128 and b * per_lane > 11e6:
        b //= 2
    from .fused import default_num_blocks

    return min(b, default_num_blocks(n))


def run_jac_kernel(u, v, ph, a, y, du, dv, dph, da, dy, n,
                   interpret=False):
    """Invoke the tangent-augmented kernel on pre-laned inputs.

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


def gp_log_likelihood_jac(ssm: SSM, resid, dssm: SSM, dresid,
                          num_blocks=None, interpret=False):
    """Fused primal + T-direction forward-mode jacobian of the GP ll.

    ``dssm`` / ``dresid`` carry a leading tangent axis T on every array.
    Returns ``(ll, ok, dll)`` with ``dll`` of shape (T,).
    """
    n, p = ssm.U.shape
    b = num_blocks or default_num_blocks(n)
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
        interpret=interpret,
    )
