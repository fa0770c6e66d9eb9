"""Full-tile Pallas kernels with in-kernel coefficient lowering.

Fourth-generation hot path (round 2).  Three design changes over
ops/fused.py / ops/adjoint.py, driven by on-chip profiling at N=1e6:

1. **In-kernel lowering.**  The XLA-side build of (U, V, phi, A) from the
   kernel coefficients cost ~1.7 ms/eval — more than 5x the recursion
   kernels themselves — because the transcendental-heavy phase/decay math
   ran on ``(L, 1, B)`` arrays (``T(1,128)`` tilings, 1/8 sublane
   occupancy) and the column interleave into ``(L, P, B)`` added several
   strided-copy fusions.  Here the kernels stream the *static* per-dataset
   arrays (t grid with double-single lo parts, spacings, diag, mask,
   ops/lanes4.Plan4) and lower per step in VMEM: the same ds-accurate
   formulas (ops/ds.py), a few hundred VPU flops per (8, W) tile.

2. **Full-tile lane layout** ``(..., 8, W)``: the virtual-lane (block)
   axis occupies sublanes and lanes, so every elementwise op runs on full
   ``(8, 128)`` tiles (the 3-D ``(P, B)`` layout used P of 8 sublanes).

3. **In-kernel coefficient cotangents.**  The backward kernels do not
   write per-step (hu, hv, hph, ha) streams for XLA to chain through the
   lowering (that VJP costs what the lowering costs); they accumulate the
   hand-derived per-coefficient cotangents directly in VMEM and emit one
   ``(C, 8, W)`` block.  Gradient cost stays independent of the parameter
   count (reference ships only forward-mode coefficient AD,
   /root/reference/celerite/solver.cpp:347-463).

Math is identical to ops/blocked.py (the factorization/element algebra is
tested against it in tests/test_fused4.py): phase 0 accumulates each
block's Riccati (A, J, C) element, the cross-block prefix composes them,
phase 1 runs the seeded factorization + affine forward-substitution
statistics; quad_b = q0_b - 2 qv_b.h_b + h_b^T Qm_b h_b.

Reference hot loops replaced: cholesky.h:126-179 (factor), 343-398
(dot_solve ll pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ds as _ds
from .lanes4 import SUB, Plan4, cf_len, pack_cf
from .precision import f32_matmuls

__all__ = [
    "gp_log_likelihood",
    "build_ll",
    "build_ll_and_grad",
]


# ---------------------------------------------------------------------------
# Lane-batched helpers on (P, P, 8, W) / (P, 8, W) values
# ---------------------------------------------------------------------------


def _bi(x):
    """(P, 8, W) -> column broadcast (P, 1, 8, W)."""
    return x[..., :, None, :, :]


def _bj(x):
    """(P, 8, W) -> row broadcast (1, P, 8, W)."""
    return x[..., None, :, :, :]


def _mm(x, y):
    """(P,P,8,W) batched matmul over the two leading dims."""
    p = x.shape[0]
    acc = x[:, 0:1] * y[0:1, :]
    for k in range(1, p):
        acc = acc + x[:, k:k + 1] * y[k:k + 1, :]
    return acc


def _tr(x):
    return jnp.swapaxes(x, 0, 1)


def _eye(p, s8, w, dtype):
    """Lane-broadcast identity (P, P, 8, W) built without reshapes.

    ``jnp.eye(p)[:, :, None, None]`` lowers to a (P,P)->(P,P,1,1) vector
    shape cast that Mosaic's layout inference rejects; the iota compare
    form lowers cleanly.
    """
    ii = lax.broadcasted_iota(jnp.int32, (p, p, s8, w), 0)
    jj = lax.broadcasted_iota(jnp.int32, (p, p, s8, w), 1)
    return jnp.where(ii == jj, jnp.ones((), dtype), jnp.zeros((), dtype))


def _inv(m):
    """Unrolled Gauss-Jordan inverse over the leading (P, P) dims."""
    p = m.shape[0]
    s8, w = m.shape[-2], m.shape[-1]
    eye = _eye(p, s8, w, m.dtype)
    aug = jnp.concatenate([m, eye], axis=1)  # (P, 2P, 8, W)
    row_ids = lax.broadcasted_iota(jnp.int32, (p, 2 * p, s8, w), 0)
    for k in range(p):
        row = aug[k:k + 1] / aug[k:k + 1, k:k + 1]
        elim = aug - aug[:, k:k + 1] * row
        aug = jnp.where(row_ids == k, row, elim)
    return aug[:, p:]


def _roll_vl(x, s, w):
    """Virtual-lane roll: out[l] = x[l - s] (circular), l = r*w + c.

    Minor dims of ``x`` are (8, w).  For s < w: lane shift with a sublane
    borrow on the wrapped columns; for s a multiple of w: pure sublane
    roll.  Only power-of-two s are used (Hillis-Steele prefix).
    """
    if s % w == 0:
        k = (s // w) % SUB
        if k == 0:
            return x
        return jnp.concatenate([x[..., -k:, :], x[..., :-k, :]], axis=-2)
    assert s < w
    xs = jnp.concatenate([x[..., -1:, :], x[..., :-1, :]], axis=-2)
    return jnp.concatenate([xs[..., -s:], x[..., :-s]], axis=-1)


def _vl_iota(shape, w):
    """Virtual-lane index l = r*w + c broadcast to ``shape``."""
    ii = lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
    jj = lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return ii * w + jj


def _shift_vl(x, ident, w, seg=None):
    """Exclusive shift by one virtual lane; segment starts get ``ident``.

    ``seg`` = lanes per independent segment (power of two; default = all
    lanes).  Segments are the chain-folding boundaries: lane streams of
    different chains/datasets must not exchange state.
    """
    rolled = _roll_vl(x, 1, w)
    lidx = _vl_iota(x.shape, w)
    if seg is not None:
        lidx = lidx % seg
    return jnp.where(lidx == 0, ident, rolled)


def _planes(cf, s8, w):
    """Coefficient input -> (C, 8, W) per-lane planes.

    A flat ``(C,)`` vector broadcasts (single model across all lanes); a
    ``(n_chain, C)`` batch repeats each chain's value over its lane
    segment (chain-folding: the batch axis lives on the lane axis, so
    vmapped-chain workloads run one kernel launch instead of a
    serialized outer grid).
    """
    if cf.ndim == 1:
        return jnp.broadcast_to(cf[:, None, None], (cf.shape[0], s8, w))
    nc, c = cf.shape
    seg = (s8 * w) // nc
    return jnp.repeat(cf.T, seg, axis=1).reshape(c, s8, w)


def _seg_sum(x, seg):
    """Per-segment sums of a per-lane (1, 8, W) value -> (n_seg,)."""
    flat = x.reshape(-1)
    return jnp.sum(flat.reshape(-1, seg), axis=1)


def _seg_min(x, seg):
    flat = x.reshape(-1)
    return jnp.min(flat.reshape(-1, seg), axis=1)


def _compose_elem(a1, j1, c1, a2, j2, c2, eye):
    """Riccati (A, J, C) composition, e1 first (ops/blocked._compose_full)."""
    e = _inv(eye + _mm(c1, j2))
    j2e = _mm(j2, e)
    a12 = _mm(a2, _mm(e, a1))
    c12 = _mm(_mm(a2, e), _mm(c1, _tr(a2))) + c2
    j12 = j1 + _mm(_tr(a1), _mm(j2e, a1))
    return a12, j12, c12


# ---------------------------------------------------------------------------
# In-kernel coefficient lowering (the VPU version of ops/lanes.lower_lanes)
# ---------------------------------------------------------------------------


def _lower_step(cf, jr, jc, t, tl, dt, dg, m, want_trig=False):
    """Build (u, v, ph, a) for one streamed step from SMEM coefficients.

    ``cf`` is the packed vector of ops/lanes4.pack_cf; t/tl/dt/dg/m are
    (8, W) values.  Returns u, v, ph stacked (P, 8, W) and a (1, 8, W).
    With ``want_trig`` also returns the per-complex-term intermediates
    needed by the backward chain: (cs, sn) unmasked trig values and the
    shared decay phi per term.
    """
    def c(k):
        return cf[k]

    cols_u, cols_v, cols_p = [], [], []
    trig = []
    for j in range(jr):
        ar = c(j)
        cr = c(jr + j)
        cols_u.append(ar * m)
        cols_v.append(m)
        cols_p.append(_ds.accurate_exp(-cr * dt))
    for j in range(jc):
        ac = c(2 * jr + j)
        bc = c(2 * jr + jc + j)
        cc = c(2 * jr + 2 * jc + j)
        dc = c(2 * jr + 3 * jc + j)
        r_hi, r_lo = _ds.reduced_angle(dc, t, tl)
        cs = jnp.cos(r_hi) - r_lo * jnp.sin(r_hi)
        sn = jnp.sin(r_hi) + r_lo * jnp.cos(r_hi)
        cm = cs * m
        sm = sn * m
        ph_j = _ds.accurate_exp(-cc * dt)
        cols_u += [ac * cm + bc * sm, ac * sm - bc * cm]
        cols_v += [cm, sm]
        cols_p += [ph_j, ph_j]
        if want_trig:
            trig.append((cm, sm, ph_j))
    total = c(2 * jr + 4 * jc)
    u = jnp.stack(cols_u, axis=0)
    v = jnp.stack(cols_v, axis=0)
    ph = jnp.stack(cols_p, axis=0)
    a = (m * (dg + total) + (1.0 - m))[None]
    if want_trig:
        return u, v, ph, a, trig
    return u, v, ph, a


def _chain_step(cf, jr, jc, hu, hv, hph, ha, trig, t, tl, dt, m, hcf_ref):
    """Accumulate d(ll)/d(cf) contributions of one step into ``hcf_ref``.

    Hand-written transpose of :func:`_lower_step` (the reduced_angle /
    accurate_exp tangent shortcuts of ops/ds.py apply: d(angle)/d(d) = t,
    d(phi)/d(c) = -dt phi).  hu/hv/hph are (P, 8, W), ha (1, 8, W);
    rows of ``hcf_ref`` accumulate elementwise per lane and are reduced
    to scalars by the caller outside the kernel.
    """
    for j in range(jr):
        hcf_ref[j] += hu[j] * m
        ph_j = _ds.accurate_exp(-cf[jr + j] * dt)
        hcf_ref[jr + j] += hph[j] * ph_j * (-dt)
    for j in range(jc):
        p0 = jr + 2 * j
        p1 = p0 + 1
        ac = cf[2 * jr + j]
        bc = cf[2 * jr + jc + j]
        cm, sm, ph_j = trig[j]
        hcf_ref[2 * jr + j] += hu[p0] * cm + hu[p1] * sm
        hcf_ref[2 * jr + jc + j] += hu[p0] * sm - hu[p1] * cm
        hcf_ref[2 * jr + 2 * jc + j] += (hph[p0] + hph[p1]) * ph_j * (-dt)
        hcm = ac * hu[p0] - bc * hu[p1] + hv[p0]
        hsm = bc * hu[p0] + ac * hu[p1] + hv[p1]
        # cm = cos(ang) * m, sm = sin(ang) * m (to first order in r_lo);
        # d cm / d ang = -sm, d sm / d ang = cm (mask folds through).
        hang = hsm * cm - hcm * sm
        hcf_ref[2 * jr + 3 * jc + j] += hang * (t + tl)
    hcf_ref[2 * jr + 4 * jc] += (ha * m)[0]


# ---------------------------------------------------------------------------
# Fused primal kernel: lowering + elements + prefix + factor + assembly
# ---------------------------------------------------------------------------


def _primal_kernel(jr, jc, seg,
                   cf_ref, t_ref, tl_ref, dt_ref, dg_ref, m_ref, y_ref,
                   quad_out, ld_out, mind_out,
                   Sh, Ac, Jc, Mc, mc, Qm, qv, q0, cq0, ld, cld, mind):
    phase = pl.program_id(0)
    i = pl.program_id(1)
    L = pl.num_programs(1)
    p = Sh.shape[0]
    s8, w = Sh.shape[-2], Sh.shape[-1]
    dtype = Sh.dtype
    eye = _eye(p, s8, w, dtype)

    @pl.when((phase == 0) & (i == 0))
    def _():
        Ac[:] = eye
        Jc[:] = jnp.zeros_like(Jc)
        Sh[:] = jnp.zeros_like(Sh)

    t = t_ref[0]
    tl = tl_ref[0]
    dt = dt_ref[0]
    dg = dg_ref[0]
    m = m_ref[0]

    @pl.when(phase == 0)
    def _():
        u, v, ph, a = _lower_step(cf_ref, jr, jc, t, tl, dt, dg, m)
        A_c = Ac[:]

        S = _bi(ph) * Sh[:] * _bj(ph)
        su = jnp.sum(S * _bj(u), axis=-3)
        d = a - jnp.sum(u * su, axis=0, keepdims=True)
        w_ = (v - su) / d
        Sh[:] = S + d[None] * _bi(w_) * _bj(w_)

        uAc = jnp.sum(A_c * _bi(ph * u), axis=-4)
        Ac[:] = _bi(ph) * A_c - _bi(w_) * _bj(uAc)
        Jc[:] = Jc[:] - _bi(uAc) * _bj(uAc / d)

    @pl.when((phase == 1) & (i == 0))
    def _():
        A_s, J_s, C_s = Ac[:], Jc[:], Sh[:]
        s = 1
        while s < seg:
            lidx = _vl_iota((p, p, s8, w), w) % seg
            a1 = _roll_vl(A_s, s, w)
            j1 = _roll_vl(J_s, s, w)
            c1 = _roll_vl(C_s, s, w)
            ca, cj, cc = _compose_elem(a1, j1, c1, A_s, J_s, C_s, eye)
            keep = lidx < s
            A_s = jnp.where(keep, A_s, ca)
            J_s = jnp.where(keep, J_s, cj)
            C_s = jnp.where(keep, C_s, cc)
            s *= 2
        Sh[:] = _shift_vl(C_s, jnp.zeros_like(C_s), w, seg)

        Mc[:] = eye
        mc[:] = jnp.zeros_like(mc)
        Qm[:] = jnp.zeros_like(Qm)
        qv[:] = jnp.zeros_like(qv)
        q0[:] = jnp.zeros_like(q0)
        cq0[:] = jnp.zeros_like(cq0)
        ld[:] = jnp.zeros_like(ld)
        cld[:] = jnp.zeros_like(cld)
        mind[:] = jnp.full_like(mind, jnp.inf)

    @pl.when(phase == 1)
    def _():
        u, v, ph, a = _lower_step(cf_ref, jr, jc, t, tl, dt, dg, m)
        y = y_ref[0][None]

        S = _bi(ph) * Sh[:] * _bj(ph)
        su = jnp.sum(S * _bj(u), axis=-3)
        d = a - jnp.sum(u * su, axis=0, keepdims=True)
        w_ = (v - su) / d
        Sh[:] = S + d[None] * _bi(w_) * _bj(w_)

        PhM = _bi(ph) * Mc[:]
        g = jnp.sum(PhM * _bi(u), axis=-4)
        Mc[:] = PhM - _bi(w_) * _bj(g)
        mh = ph * mc[:]
        z0 = y - jnp.sum(u * mh, axis=0, keepdims=True)
        mc[:] = mh + w_ * z0

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

    @pl.when((phase == 1) & (i == L - 1))
    def _():
        M_s, m_s = Mc[:], mc[:]
        s = 1
        while s < seg:
            lidx_m = _vl_iota((p, p, s8, w), w) % seg
            lidx_v = _vl_iota((p, s8, w), w) % seg
            m1 = _roll_vl(M_s, s, w)
            v1 = _roll_vl(m_s, s, w)
            cm = _mm(M_s, m1)
            cv = jnp.sum(M_s * _bj(v1), axis=-3) + m_s
            M_s = jnp.where(lidx_m < s, M_s, cm)
            m_s = jnp.where(lidx_v < s, m_s, cv)
            s *= 2
        h = _shift_vl(m_s, jnp.zeros_like(m_s), w, seg)

        Qh = jnp.sum(Qm[:] * _bj(h), axis=-3)
        quad_b = (
            q0[:] + cq0[:]
            - 2.0 * jnp.sum(qv[:] * h, axis=0, keepdims=True)
            + jnp.sum(h * Qh, axis=0, keepdims=True)
        )
        quad_out[:] = quad_b
        ld_out[:] = ld[:] + cld[:]
        mind_out[:] = mind[:]


def _static_specs(s8, w):
    step = pl.BlockSpec((1, s8, w), lambda ph, i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return step


def _cparams(p):
    """Mosaic compiler params: raise the scoped-VMEM limit for wide models.

    The default 16 MB scoped limit fits every P <= 8 kernel; at wider P
    the unrolled (P, P, 8, W) temporaries (prefix composition, the
    Gauss-Jordan inverse's augmented arrays) exceed it on a 128 MB-VMEM
    v5e core.  The practical width ceiling is P = 12 (one-time compile
    ~3 min at N=1e6; P = 16 compiles are >20 min in Mosaic and are
    routed to the 3-D pipeline instead, celerite_tpu/gp.py).
    """
    if p <= 8:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def run_primal(cf, plan: Plan4, jr, jc, y=None, n_seg=None,
               state_seg=None, interpret=False):
    """(ll, ok) from the packed coefficient vector and a Plan4.

    ``cf`` is a flat ``(C,)`` vector for a single model, or an
    ``(n_chain, C)`` batch on a chain-folded plan (lanes4.make_plan4
    with ``n_chain > 1``) — then (ll, ok) come back per chain.

    ``n_seg`` decouples the lane segmentation from the coefficient
    batch: with a *shared* ``(C,)`` cf and ``n_seg > 1`` the plan holds
    n_seg independent datasets (fleet folding, one lane group per
    light curve — lanes4.make_plan4_curves) and (ll, ok) come back per
    segment.  A batched cf requires n_seg == n_chain.

    ``y`` overrides the plan's data stream (mean-model residuals),
    shaped (L, 8, W).  No AD rule — use :func:`build_ll_and_grad`.
    """
    L, s8, w = plan.t.shape
    p = jr + 2 * jc
    c = cf_len(jr, jc)
    nc = 1 if cf.ndim == 1 else cf.shape[0]
    if n_seg is None:
        n_seg = nc
    elif nc != 1 and nc != n_seg:
        raise ValueError("batched cf requires n_seg == n_chain")
    seg = (s8 * w) // n_seg
    if state_seg is None:
        state_seg = seg
    scalar_out = cf.ndim == 1 and n_seg == 1
    dtype = plan.t.dtype
    if y is None:
        y = plan.y

    step = _static_specs(s8, w)
    cfspec = pl.BlockSpec((c, s8, w), lambda ph, i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    full_1 = pl.BlockSpec((1, s8, w), lambda ph, i: (0, 0, 0),
                          memory_space=pltpu.VMEM)

    quad, ld, mind = pl.pallas_call(
        functools.partial(_primal_kernel, jr, jc, state_seg),
        grid=(2, L),
        in_specs=[cfspec, step, step, step, step, step, step],
        out_specs=[full_1, full_1, full_1],
        out_shape=[jax.ShapeDtypeStruct((1, s8, w), dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((p, p, s8, w), dtype),  # Sh
            pltpu.VMEM((p, p, s8, w), dtype),  # Ac
            pltpu.VMEM((p, p, s8, w), dtype),  # Jc
            pltpu.VMEM((p, p, s8, w), dtype),  # Mc
            pltpu.VMEM((p, s8, w), dtype),     # mc
            pltpu.VMEM((p, p, s8, w), dtype),  # Qm
            pltpu.VMEM((p, s8, w), dtype),     # qv
            pltpu.VMEM((1, s8, w), dtype),     # q0
            pltpu.VMEM((1, s8, w), dtype),     # cq0
            pltpu.VMEM((1, s8, w), dtype),     # ld
            pltpu.VMEM((1, s8, w), dtype),     # cld
            pltpu.VMEM((1, s8, w), dtype),     # mind
        ],
        compiler_params=_cparams(p),
        interpret=interpret,
    )(_planes(cf, s8, w), plan.t, plan.t_lo, plan.dt, plan.diag,
      plan.mask, y)

    llv = -0.5 * (
        _seg_sum(quad, seg) + _seg_sum(ld, seg)
        + jnp.asarray(plan.n, dtype) * jnp.log(2.0 * jnp.pi).astype(dtype)
    )
    okv = (_seg_min(mind, seg) > 0) & jnp.isfinite(llv)
    llv = jnp.where(okv, llv, -jnp.inf)
    if scalar_out:
        return llv[0], okv[0]
    return llv, okv


# ---------------------------------------------------------------------------
# Adjoint pipeline: split kernels with saves + hand-written VJP
# ---------------------------------------------------------------------------


def _elem_fwd_kernel(jr, jc,
                     cf_ref, t_ref, tl_ref, dt_ref, dg_ref, m_ref,
                     A_out, J_out, C_out, sv_out):
    i = pl.program_id(0)
    p = A_out.shape[0]
    s8, w = A_out.shape[-2], A_out.shape[-1]
    dtype = A_out.dtype

    @pl.when(i == 0)
    def _():
        A_out[:] = _eye(p, s8, w, dtype)
        J_out[:] = jnp.zeros_like(J_out)
        C_out[:] = jnp.zeros_like(C_out)

    u, v, ph, a = _lower_step(
        cf_ref, jr, jc, t_ref[0], tl_ref[0], dt_ref[0], dg_ref[0], m_ref[0]
    )
    A_c, Sh_c = A_out[:], C_out[:]

    sv_out[0] = jnp.concatenate(
        [Sh_c.reshape(p * p, s8, w), A_c.reshape(p * p, s8, w)], axis=0
    )

    S = _bi(ph) * Sh_c * _bj(ph)
    su = jnp.sum(S * _bj(u), axis=-3)
    d = a - jnp.sum(u * su, axis=0, keepdims=True)
    w_ = (v - su) / d
    C_out[:] = S + d[None] * _bi(w_) * _bj(w_)

    uAc = jnp.sum(A_c * _bi(ph * u), axis=-4)
    A_out[:] = _bi(ph) * A_c - _bi(w_) * _bj(uAc)
    J_out[:] = J_out[:] - _bi(uAc) * _bj(uAc / d)


def _elem_bwd_kernel(jr, jc,
                     cf_ref, t_ref, tl_ref, dt_ref, dg_ref, m_ref,
                     sv_ref, hA0_ref, hJ0_ref, hC0_ref,
                     hcf_out, hA, hJ, hSh):
    i = pl.program_id(0)
    L = pl.num_programs(0)
    p = hA.shape[0]
    s8, w = hA.shape[-2], hA.shape[-1]

    @pl.when(i == 0)
    def _():
        hA[:] = hA0_ref[:]
        hJ[:] = hJ0_ref[:]
        hSh[:] = hC0_ref[:]
        hcf_out[:] = jnp.zeros_like(hcf_out)

    t = t_ref[0]
    tl = tl_ref[0]
    dt = dt_ref[0]
    dg = dg_ref[0]
    m = m_ref[0]
    u, v, ph, a, trig = _lower_step(
        cf_ref, jr, jc, t, tl, dt, dg, m, want_trig=True
    )
    sv = sv_ref[0]
    Shin = sv[: p * p].reshape(p, p, s8, w)
    A_in = sv[p * p:].reshape(p, p, s8, w)

    S = _bi(ph) * Shin * _bj(ph)
    su = jnp.sum(S * _bj(u), axis=-3)
    d = a - jnp.sum(u * su, axis=0, keepdims=True)
    w_ = (v - su) / d
    ut = ph * u
    uAc = jnp.sum(A_in * _bi(ut), axis=-4)

    hA_c, hJ_c, hSh_c = hA[:], hJ[:], hSh[:]
    hJsym_uAc = jnp.sum((hJ_c + _tr(hJ_c)) * _bj(uAc), axis=-3)

    # F9: J_out = J_in - uAc (uAc/d)^T
    huAc = -hJsym_uAc / d
    hd = jnp.sum(hJ_c * _bi(uAc) * _bj(uAc), axis=(0, 1))[None] / (d * d)

    # F8: A_out = Phi A_in - w uAc^T
    hph = jnp.sum(hA_c * A_in, axis=-3)
    hA_in = _bi(ph) * hA_c
    hw = -jnp.sum(hA_c * _bj(uAc), axis=-3)
    huAc = huAc - jnp.sum(hA_c * _bi(w_), axis=-4)

    # F7: uAc = A_in^T ut
    hut = jnp.sum(A_in * _bj(huAc), axis=-3)
    hA_in = hA_in + _bi(ut) * _bj(huAc)

    # F6: ut = ph * u
    hph = hph + hut * u
    hu = hut * ph

    # F5: Sh_out = S + d w w^T
    hS = hSh_c
    hd = hd + jnp.sum(hSh_c * _bi(w_) * _bj(w_), axis=(0, 1))[None]
    hw = hw + d * jnp.sum((hSh_c + _tr(hSh_c)) * _bj(w_), axis=-3)

    # F4: w = (v - su)/d
    hv = hw / d
    hsu = -hw / d
    hd = hd - jnp.sum(hw * w_, axis=0, keepdims=True) / d

    # F3: d = a - u . su
    ha = hd
    hu = hu - hd * su
    hsu = hsu - hd * u

    # F2: su = S u
    hu = hu + jnp.sum(S * _bi(hsu), axis=-4)
    hS = hS + _bi(hsu) * _bj(u)

    # F1: S = Phi Shin Phi
    hph = hph + jnp.sum(
        (hS * Shin + _tr(hS * Shin)) * _bj(ph), axis=-3
    )
    hSh[:] = _bi(ph) * hS * _bj(ph)
    hA[:] = hA_in

    _chain_step(cf_ref, jr, jc, hu, hv, hph, ha, trig, t, tl, dt, m,
                hcf_out)


def _factor_fwd_kernel(jr, jc,
                       cf_ref, t_ref, tl_ref, dt_ref, dg_ref, m_ref,
                       y_ref, sh0_ref,
                       M_out, m_out, Qm_out, qv_out, q0_out, ld_out,
                       mind_out, sv_out,
                       Sh, cq0, cld):
    i = pl.program_id(0)
    L = pl.num_programs(0)
    p = Sh.shape[0]
    s8, w = Sh.shape[-2], Sh.shape[-1]
    dtype = Sh.dtype

    @pl.when(i == 0)
    def _():
        Sh[:] = sh0_ref[:]
        M_out[:] = _eye(p, s8, w, dtype)
        m_out[:] = jnp.zeros_like(m_out)
        Qm_out[:] = jnp.zeros_like(Qm_out)
        qv_out[:] = jnp.zeros_like(qv_out)
        q0_out[:] = jnp.zeros_like(q0_out)
        ld_out[:] = jnp.zeros_like(ld_out)
        mind_out[:] = jnp.full_like(mind_out, jnp.inf)
        cq0[:] = jnp.zeros_like(cq0)
        cld[:] = jnp.zeros_like(cld)

    u, v, ph, a = _lower_step(
        cf_ref, jr, jc, t_ref[0], tl_ref[0], dt_ref[0], dg_ref[0], m_ref[0]
    )
    y = y_ref[0][None]
    Sh_c, M_c, m_c = Sh[:], M_out[:], m_out[:]

    sv_out[0] = jnp.concatenate(
        [Sh_c.reshape(p * p, s8, w), M_c.reshape(p * p, s8, w), m_c],
        axis=0,
    )

    S = _bi(ph) * Sh_c * _bj(ph)
    su = jnp.sum(S * _bj(u), axis=-3)
    d = a - jnp.sum(u * su, axis=0, keepdims=True)
    w_ = (v - su) / d
    Sh[:] = S + d[None] * _bi(w_) * _bj(w_)

    PhM = _bi(ph) * M_c
    g = jnp.sum(PhM * _bi(u), axis=-4)
    M_out[:] = PhM - _bi(w_) * _bj(g)
    mh = ph * m_c
    z0 = y - jnp.sum(u * mh, axis=0, keepdims=True)
    m_out[:] = mh + w_ * z0

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

    @pl.when(i == L - 1)
    def _():
        q0_out[:] = q0_out[:] + cq0[:]
        ld_out[:] = ld_out[:] + cld[:]


def _factor_bwd_kernel(jr, jc,
                       cf_ref, t_ref, tl_ref, dt_ref, dg_ref, m_ref,
                       y_ref, sv_ref,
                       hM0_ref, hm0_ref, hQm_ref, hqv_ref, hq0_ref,
                       hld_ref,
                       hcf_out, hy_out, hsh0_out,
                       hSh, hM, hm):
    i = pl.program_id(0)
    L = pl.num_programs(0)
    p = hM.shape[0]
    s8, w = hM.shape[-2], hM.shape[-1]

    @pl.when(i == 0)
    def _():
        hSh[:] = jnp.zeros_like(hSh)
        hM[:] = hM0_ref[:]
        hm[:] = hm0_ref[:]
        hcf_out[:] = jnp.zeros_like(hcf_out)

    t = t_ref[0]
    tl = tl_ref[0]
    dt = dt_ref[0]
    dg = dg_ref[0]
    m = m_ref[0]
    u, v, ph, a, trig = _lower_step(
        cf_ref, jr, jc, t, tl, dt, dg, m, want_trig=True
    )
    y = y_ref[0][None]
    sv = sv_ref[0]
    Shin = sv[: p * p].reshape(p, p, s8, w)
    Mprev = sv[p * p: 2 * p * p].reshape(p, p, s8, w)
    mprev = sv[2 * p * p:]

    hQm, hqv = hQm_ref[:], hqv_ref[:]
    hq0, hld = hq0_ref[:], hld_ref[:]

    S = _bi(ph) * Shin * _bj(ph)
    su = jnp.sum(S * _bj(u), axis=-3)
    d = a - jnp.sum(u * su, axis=0, keepdims=True)
    w_ = (v - su) / d
    PhM = _bi(ph) * Mprev
    g = jnp.sum(PhM * _bi(u), axis=-4)
    mh = ph * mprev
    z0 = y - jnp.sum(u * mh, axis=0, keepdims=True)

    hSh_c, hM_c, hm_c = hSh[:], hM[:], hm[:]

    # E12 stats (constant per-block cotangents, contribution each step):
    hqv_g = jnp.sum(hqv * g, axis=0, keepdims=True)
    gQg = jnp.sum(hQm * _bi(g) * _bj(g), axis=(0, 1))[None]
    hz0 = hq0 * (2.0 * z0 / d) + hqv_g / d
    hd = (
        -hq0 * z0 * z0 / (d * d)
        + hld / d
        - hqv_g * z0 / (d * d)
        - gQg / (d * d)
    )
    hQm_sym_g = jnp.sum((hQm + _tr(hQm)) * _bj(g), axis=-3)
    hg = hqv * (z0 / d) + hQm_sym_g / d

    # E11: m_out = mh + w z0
    hmh = hm_c
    hw = hm_c * z0
    hz0 = hz0 + jnp.sum(hm_c * w_, axis=0, keepdims=True)

    # E10: z0 = y - u . mh
    hy = hz0
    hu = -hz0 * mh
    hmh = hmh - hz0 * u

    # E9: mh = ph * mprev
    hph = hmh * mprev
    hm[:] = hmh * ph

    # E8: M_out = PhM - w g^T
    hPhM = hM_c
    hw = hw - jnp.sum(hM_c * _bj(g), axis=-3)
    hg = hg - jnp.sum(hM_c * _bi(w_), axis=-4)

    # E7: g = PhM^T u
    hu = hu + jnp.sum(PhM * _bj(hg), axis=-3)
    hPhM = hPhM + _bi(u) * _bj(hg)

    # E6: PhM = Phi Mprev (row scale)
    hph = hph + jnp.sum(hPhM * Mprev, axis=-3)
    hM[:] = _bi(ph) * hPhM

    # E5: Sh_out = S + d w w^T
    hS = hSh_c
    hd = hd + jnp.sum(hSh_c * _bi(w_) * _bj(w_), axis=(0, 1))[None]
    hw = hw + d * jnp.sum((hSh_c + _tr(hSh_c)) * _bj(w_), axis=-3)

    # E4: w = (v - su)/d
    hv = hw / d
    hsu = -hw / d
    hd = hd - jnp.sum(hw * w_, axis=0, keepdims=True) / d

    # E3: d = a - u . su
    ha = hd
    hu = hu - hd * su
    hsu = hsu - hd * u

    # E2: su = S u
    hu = hu + jnp.sum(S * _bi(hsu), axis=-4)
    hS = hS + _bi(hsu) * _bj(u)

    # E1: S = Phi Shin Phi
    hph = hph + jnp.sum(
        (hS * Shin + _tr(hS * Shin)) * _bj(ph), axis=-3
    )
    hSh[:] = _bi(ph) * hS * _bj(ph)

    hy_out[0] = hy[0]
    _chain_step(cf_ref, jr, jc, hu, hv, hph, ha, trig, t, tl, dt, m,
                hcf_out)

    @pl.when(i == L - 1)
    def _():
        hsh0_out[:] = hSh[:]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _specs1(s8, w):
    step = pl.BlockSpec((1, s8, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return step


def _rspecs1(s8, w, L):
    rstep = pl.BlockSpec((1, s8, w), lambda i: (L - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM)
    return rstep


def _run_elem_fwd(cf, plan, jr, jc, interpret=False):
    L, s8, w = plan.t.shape
    p = jr + 2 * jc
    dtype = plan.t.dtype
    step = _specs1(s8, w)
    cfspec = pl.BlockSpec((cf_len(jr, jc), s8, w),
                          lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    full_pp = pl.BlockSpec((p, p, s8, w), lambda i: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    step_sv = pl.BlockSpec((1, 2 * p * p, s8, w), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_elem_fwd_kernel, jr, jc),
        grid=(L,),
        in_specs=[cfspec, step, step, step, step, step],
        out_specs=[full_pp, full_pp, full_pp, step_sv],
        out_shape=[
            jax.ShapeDtypeStruct((p, p, s8, w), dtype),
            jax.ShapeDtypeStruct((p, p, s8, w), dtype),
            jax.ShapeDtypeStruct((p, p, s8, w), dtype),
            jax.ShapeDtypeStruct((L, 2 * p * p, s8, w), dtype),
        ],
        compiler_params=_cparams(p),
        interpret=interpret,
    )(_planes(cf, s8, w), plan.t, plan.t_lo, plan.dt, plan.diag, plan.mask)


def _run_elem_bwd(cf, plan, jr, jc, sv, hA0, hJ0, hC0, interpret=False):
    L, s8, w = plan.t.shape
    p = jr + 2 * jc
    dtype = plan.t.dtype
    c = cf_len(jr, jc)
    rstep = _rspecs1(s8, w, L)
    cfspec = pl.BlockSpec((cf_len(jr, jc), s8, w),
                          lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    full_pp = pl.BlockSpec((p, p, s8, w), lambda i: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    full_c = pl.BlockSpec((c, s8, w), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    rstep_sv = pl.BlockSpec((1, 2 * p * p, s8, w),
                            lambda i: (L - 1 - i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_elem_bwd_kernel, jr, jc),
        grid=(L,),
        in_specs=[cfspec, rstep, rstep, rstep, rstep, rstep,
                  rstep_sv, full_pp, full_pp, full_pp],
        out_specs=full_c,
        out_shape=jax.ShapeDtypeStruct((c, s8, w), dtype),
        scratch_shapes=[pltpu.VMEM((p, p, s8, w), dtype)] * 3,
        compiler_params=_cparams(p),
        interpret=interpret,
    )(_planes(cf, s8, w), plan.t, plan.t_lo, plan.dt, plan.diag, plan.mask,
      sv, hA0, hJ0, hC0)


def _run_factor_fwd(cf, plan, jr, jc, y, sh0, interpret=False):
    L, s8, w = plan.t.shape
    p = jr + 2 * jc
    dtype = plan.t.dtype
    step = _specs1(s8, w)
    cfspec = pl.BlockSpec((cf_len(jr, jc), s8, w),
                          lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    full_pp = pl.BlockSpec((p, p, s8, w), lambda i: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    full_p = pl.BlockSpec((p, s8, w), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    full_1 = pl.BlockSpec((1, s8, w), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    nsv = 2 * p * p + p
    step_sv = pl.BlockSpec((1, nsv, s8, w), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_factor_fwd_kernel, jr, jc),
        grid=(L,),
        in_specs=[cfspec, step, step, step, step, step, step, full_pp],
        out_specs=[full_pp, full_p, full_pp, full_p, full_1, full_1,
                   full_1, step_sv],
        out_shape=[
            jax.ShapeDtypeStruct((p, p, s8, w), dtype),   # M
            jax.ShapeDtypeStruct((p, s8, w), dtype),      # m
            jax.ShapeDtypeStruct((p, p, s8, w), dtype),   # Qm
            jax.ShapeDtypeStruct((p, s8, w), dtype),      # qv
            jax.ShapeDtypeStruct((1, s8, w), dtype),      # q0
            jax.ShapeDtypeStruct((1, s8, w), dtype),      # ld
            jax.ShapeDtypeStruct((1, s8, w), dtype),      # mind
            jax.ShapeDtypeStruct((L, nsv, s8, w), dtype),  # saves
        ],
        scratch_shapes=[
            pltpu.VMEM((p, p, s8, w), dtype),
            pltpu.VMEM((1, s8, w), dtype),
            pltpu.VMEM((1, s8, w), dtype),
        ],
        compiler_params=_cparams(p),
        interpret=interpret,
    )(_planes(cf, s8, w), plan.t, plan.t_lo, plan.dt, plan.diag, plan.mask, y, sh0)


def _run_factor_bwd(cf, plan, jr, jc, y, sv, cots, interpret=False):
    L, s8, w = plan.t.shape
    p = jr + 2 * jc
    dtype = plan.t.dtype
    c = cf_len(jr, jc)
    hM0, hm0, hQm, hqv, hq0, hld = cots
    rstep = _rspecs1(s8, w, L)
    cfspec = pl.BlockSpec((cf_len(jr, jc), s8, w),
                          lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    full_pp = pl.BlockSpec((p, p, s8, w), lambda i: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    full_p = pl.BlockSpec((p, s8, w), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    full_1 = pl.BlockSpec((1, s8, w), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    full_c = pl.BlockSpec((c, s8, w), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    nsv = 2 * p * p + p
    rstep_sv = pl.BlockSpec((1, nsv, s8, w),
                            lambda i: (L - 1 - i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_factor_bwd_kernel, jr, jc),
        grid=(L,),
        in_specs=[cfspec, rstep, rstep, rstep, rstep, rstep, rstep,
                  rstep_sv, full_pp, full_p, full_pp, full_p, full_1,
                  full_1],
        out_specs=[full_c, rstep, full_pp],
        out_shape=[
            jax.ShapeDtypeStruct((c, s8, w), dtype),      # hcf
            jax.ShapeDtypeStruct((L, s8, w), dtype),      # hy
            jax.ShapeDtypeStruct((p, p, s8, w), dtype),   # hsh0
        ],
        scratch_shapes=[
            pltpu.VMEM((p, p, s8, w), dtype),
            pltpu.VMEM((p, p, s8, w), dtype),
            pltpu.VMEM((p, s8, w), dtype),
        ],
        compiler_params=_cparams(p),
        interpret=interpret,
    )(_planes(cf, s8, w), plan.t, plan.t_lo, plan.dt, plan.diag, plan.mask, y,
      sv, hM0, hm0, hQm, hqv, hq0, hld)


# ---------------------------------------------------------------------------
# XLA glue: cross-block prefixes on the tiny per-block arrays
# ---------------------------------------------------------------------------


@f32_matmuls
def _prefix_sh0(A, J, C, seg=None):
    """Exclusive-prefix C (the factor seeds) from per-block elements.

    Flat unrolled Hillis-Steele directly on the native ``(P, P, 8, W)``
    layout.  ``lax.associative_scan`` compiles to a slice-heavy
    odd/even recursion that XLA cannot fuse — measured 50 ms forward /
    126 ms VJP at B=4096 on v5e, vs 1.4 / 2.4 ms for this flat form
    (log2(B) chunky full-tile fusions).  ``seg`` segments the scan at
    chain-folding boundaries.
    """
    p = A.shape[0]
    s8, w = A.shape[-2], A.shape[-1]
    eye = _eye(p, s8, w, A.dtype)
    if seg is None:
        seg = s8 * w
    s = 1
    while s < seg:
        lidx = _vl_iota((p, p, s8, w), w) % seg
        a1 = _roll_vl(A, s, w)
        j1 = _roll_vl(J, s, w)
        c1 = _roll_vl(C, s, w)
        ca, cj, cc = _compose_elem(a1, j1, c1, A, J, C, eye)
        keep = lidx < s
        A = jnp.where(keep, A, ca)
        J = jnp.where(keep, J, cj)
        C = jnp.where(keep, C, cc)
        s *= 2
    return _shift_vl(C, jnp.zeros_like(C), w, seg)


@f32_matmuls
def _assemble_ll(M, m, Qm, qv, q0, ld, n, dtype, seg=None, seg_out=None):
    """Affine prefix over blocks + quadratic-form assembly -> ll.

    Same flat Hillis-Steele rationale as :func:`_prefix_sh0`.  ``seg``
    segments the affine *scan* (state must not cross chain/curve
    boundaries); ``seg_out`` segments the output *reduction* (lanes per
    returned ll).  ``seg_out=None`` returns the scalar total.
    """
    p = M.shape[0]
    s8, w = M.shape[-2], M.shape[-1]
    scalar = seg_out is None
    if seg is None:
        seg = s8 * w
    if seg_out is None:
        seg_out = s8 * w
    s = 1
    while s < seg:
        lidx_m = _vl_iota((p, p, s8, w), w) % seg
        lidx_v = _vl_iota((p, s8, w), w) % seg
        m1 = _roll_vl(M, s, w)
        v1 = _roll_vl(m, s, w)
        cm = _mm(M, m1)
        cv = jnp.sum(M * _bj(v1), axis=1) + m
        M = jnp.where(lidx_m < s, M, cm)
        m = jnp.where(lidx_v < s, m, cv)
        s *= 2
    h = _shift_vl(m, jnp.zeros_like(m), w, seg)

    Qh = jnp.sum(Qm * h[None], axis=1)
    quad_l = (
        q0 - 2.0 * jnp.sum(qv * h, axis=0, keepdims=True)
        + jnp.sum(h * Qh, axis=0, keepdims=True)
    )
    ll = -0.5 * (
        _seg_sum(quad_l, seg_out) + _seg_sum(ld, seg_out)
        + jnp.asarray(n, dtype) * jnp.log(2.0 * jnp.pi).astype(dtype)
    )
    return ll[0] if scalar else ll


# ---------------------------------------------------------------------------
# Public builders
# ---------------------------------------------------------------------------


def build_ll(plan: Plan4, jr, jc, interpret=False):
    """``(cf, y4) -> (ll, ok)`` through the single fused primal kernel."""

    def fn(cf, y4=None):
        return run_primal(cf, plan, jr, jc, y=y4, interpret=interpret)

    return fn


def build_ll_and_grad(plan: Plan4, jr, jc, n_chain=1, n_seg=None,
                      state_seg=None, interpret=False):
    """``(cf, y4) -> (ll, ok)`` differentiable w.r.t. cf and y4.

    Forward: split elements/factor kernels with per-step saves (the
    cross-block prefixes and final assembly are XLA glue and
    reverse-differentiate automatically).  Backward: the two reversed
    streaming kernels above, emitting packed-coefficient and data
    cotangents directly.

    With ``n_chain > 1`` the plan must be chain-folded
    (lanes4.make_plan4 with the same ``n_chain``), ``cf`` is an
    ``(n_chain, C)`` batch, and (ll, ok) come back per chain — one
    kernel launch for the whole batch.

    ``n_seg`` (default ``n_chain``) decouples the lane segmentation
    from the coefficient batch: a fleet-folded plan
    (lanes4.make_plan4_curves) has many independent datasets sharing
    one ``(C,)`` coefficient vector — (ll, ok) come back per segment
    and the coefficient cotangent sums over every segment.
    """
    _, s8, w = plan.t.shape
    if n_seg is None:
        n_seg = n_chain
    elif n_chain != 1 and n_chain != n_seg:
        raise ValueError("batched cf requires n_seg == n_chain")
    seg = (s8 * w) // n_seg
    if state_seg is None:
        state_seg = seg

    @jax.custom_vjp
    def core(cf, y4):
        out, _ = core_fwd(cf, y4)
        return out

    def core_fwd(cf, y4):
        A_el, J_el, C_el, sv0 = _run_elem_fwd(
            cf, plan, jr, jc, interpret=interpret
        )
        sh0 = _prefix_sh0(A_el, J_el, C_el, state_seg)
        M, m, Qm, qv, q0, ld, mind, sv1 = _run_factor_fwd(
            cf, plan, jr, jc, y4, sh0, interpret=interpret
        )
        out = (M, m, Qm, qv, q0, ld, mind)
        res = (cf, y4, sv0, sv1, A_el, J_el, C_el)
        return out, res

    def core_bwd(res, cots):
        cf, y4, sv0, sv1, A_el, J_el, C_el = res
        hM, hm, hQm, hqv, hq0, hld, _hmind = cots
        hcf1, hy, hsh0 = _run_factor_bwd(
            cf, plan, jr, jc, y4, sv1, (hM, hm, hQm, hqv, hq0, hld),
            interpret=interpret,
        )
        _, vjp = jax.vjp(
            lambda a, j, c_: _prefix_sh0(a, j, c_, state_seg),
            A_el, J_el, C_el
        )
        hA0, hJ0, hC0 = vjp(hsh0)
        hcf0 = _run_elem_bwd(
            cf, plan, jr, jc, sv0, hA0, hJ0, hC0, interpret=interpret
        )
        hrows = hcf0 + hcf1
        if n_chain == 1:
            hcf = jnp.sum(hrows, axis=(1, 2))
        else:
            hcf = jnp.sum(
                hrows.reshape(hrows.shape[0], n_chain, seg), axis=2
            ).T
        return hcf, hy

    core.defvjp(core_fwd, core_bwd)

    def fn(cf, y4=None):
        if y4 is None:
            y4 = plan.y
        M, m, Qm, qv, q0, ld, mind = core(cf, y4)
        ll = _assemble_ll(
            M, m, Qm, qv, q0, ld, plan.n, cf.dtype,
            seg=state_seg,
            seg_out=None if (n_seg == 1 and cf.ndim == 1
                             and state_seg == s8 * w) else seg,
        )
        scalar_out = (n_seg == 1 and cf.ndim == 1
                      and state_seg == s8 * w)
        mind_c = (
            jnp.min(mind) if scalar_out else _seg_min(mind, seg)
        )
        ok = (jax.lax.stop_gradient(mind_c) > 0) & jnp.isfinite(
            jax.lax.stop_gradient(ll)
        )
        return jnp.where(ok, ll, -jnp.inf), ok

    return fn


def gp_log_likelihood(coeffs, plan: Plan4, y4=None, interpret=False):
    """(ll, ok) for lowered coefficients through the fused primal kernel."""
    jr = coeffs.a_real.shape[0]
    jc = coeffs.a_comp.shape[0]
    cf = pack_cf(coeffs, dtype=plan.t.dtype)
    return run_primal(cf, plan, jr, jc, y=y4, interpret=interpret)
