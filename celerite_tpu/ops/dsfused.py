"""Double-single Pallas kernels: exact-mode ll + forward-mode gradient.

Round-5 closure of the "make exact mode fast" item (VERDICT r3/r4): the
``precision="ds"`` path of :meth:`GP.build_loglik` previously ran only as
a lax-level program (:mod:`celerite_tpu.ops.dsblocked`), ~50-200x the f32
hot path per point because the f32 path rides the hand-written fused4
Pallas kernels.  This module is the same double-single arithmetic
(:mod:`celerite_tpu.ops.dsa` — Dekker/Knuth/QD compensated f32 pairs,
~48-bit significand) moved INSIDE the fused full-tile kernel family
(:mod:`celerite_tpu.ops.fused4`):

- **In-kernel ds lowering** — the streams (U, V, phi, A) are built per
  step in VMEM from the packed coefficients with the ds transcendental
  kernels (``dsa.exp_ds``, ``dsa.sincos_ds``, exact angle reduction), so
  the lowering error floor matches :mod:`celerite_tpu.ops.dslower`.
- **Dual-ds forward-mode gradient** — every stream and every recursion
  carry is a :class:`dsa.DD` dual: a ds value plus T ds tangent
  components, one per packed coefficient.  The gradient arithmetic runs
  in ds alongside the value (single sweep, NO per-step saves, no
  backward kernels), which is what plain f32 cotangent chains cannot
  give (their eps32 noise is amplified ~1000x by the solver's
  cancelling reductions — ROADMAP "float32 accuracy").
- **Split pipeline + XLA ds glue** — per-block Riccati elements stream
  in kernel 1; the O(B) cross-block exclusive prefix and the final
  affine prefix/assembly run as flat Hillis-Steele scans in plain-jax
  dsa ops (log2(B) chunky fusions on (P, P, 8, W) tiles); the seeded
  factorization streams in kernel 2.  Same split rationale as the wide
  path of :mod:`celerite_tpu.ops.tangent`: each kernel stays a straight
  streaming loop with a small stack.

The reference bar is its hardware-float64 core
(/root/reference/cpp/include/celerite/solver/cholesky.h:41-210) with
forward-mode coefficient AD (solver.cpp:347-463).  On TPU (f32
datapath) this dual-ds kernel family is the native equivalent at
kernel speed.

Storage convention: a DD value with T tangents packs into ``2 * (1 + T)``
f32 words ``[val.hi, val.lo, tan0.hi, tan0.lo, ...]`` stacked on a
leading axis — scratch refs and kernel outputs carry that axis; the
helpers `_load`/`_store`/`_stack`/`_unstack` convert.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ds as _dshelp
from . import dsa
from .dsa import DD, DS
from .fused4 import (
    SUB,
    _cparams,
    _eye,
    _inv,
    _roll_vl,
    _seg_min,
    _shift_vl,
    _vl_iota,
)
from .lower import Coefficients

__all__ = [
    "pack_cf_ds",
    "cf_len",
    "build_ll_ds",
    "build_ll_and_grad_ds",
]


def cf_len(jr, jc):
    return 2 * jr + 4 * jc + 1


def pack_cf_ds(coeffs: Coefficients, dtype=jnp.float32):
    """Packed coefficient vector for the ds kernels.

    Layout [a_real(jr), c_real(jr), a_c, b_c, c_c, d_c (jc each),
    jitter].  Unlike :func:`fused4.pack_cf` the LAST slot is the raw
    jitter, not the pre-summed diagonal total: the kernel re-sums
    ``sum(a_real) + sum(a_comp) + jitter`` with compensated ds adds so
    the diagonal stays coherent with the streams to ds accuracy (an f32
    pre-rounded total shifts A by ~eps32 * sum(a) — fatal when the
    summed variance dwarfs the measurement diagonal, the adversarial
    stacks of tests/test_ds.py).
    """
    a_real, c_real, a_comp, b_comp, c_comp, d_comp, jitter = coeffs
    parts = [a_real, c_real, a_comp, b_comp, c_comp, d_comp,
             jnp.asarray(jitter).reshape(1)]
    return jnp.concatenate(
        [jnp.asarray(p).reshape(-1) for p in parts]
    ).astype(dtype)


# ---------------------------------------------------------------------------
# DD <-> stacked-word array conversion and structural helpers
# ---------------------------------------------------------------------------


def _nwords(T):
    return 2 * (1 + T)


def _stack(x):
    """DS/DD -> one array with the word axis leading."""
    leaves = jtu.tree_leaves(x)
    return jnp.stack(leaves, axis=0)


def _unstack(arr, T):
    """Inverse of :func:`_stack` for a known tangent count."""
    if T == 0:
        return DS(arr[0], arr[1])
    val = DS(arr[0], arr[1])
    tan = tuple(
        DS(arr[2 + 2 * j], arr[3 + 2 * j]) for j in range(T)
    )
    return DD(val, tan)


def _load(ref, T):
    """Read a DS/DD from a scratch/output ref with a leading word axis."""
    if T == 0:
        return DS(ref[0], ref[1])
    val = DS(ref[0], ref[1])
    tan = tuple(
        DS(ref[2 + 2 * j], ref[3 + 2 * j]) for j in range(T)
    )
    return DD(val, tan)


def _store(ref, x):
    leaves = jtu.tree_leaves(x)
    for i, leaf in enumerate(leaves):
        ref[i] = leaf


def _zero_like_plane(shape, dtype, T):
    z = jnp.zeros(shape, dtype)
    v = DS(z, z)
    return v if T == 0 else dsa.dd_lift(v, T)


def _lift(x, T):
    if T and not isinstance(x, DD):
        return dsa.dd_lift(x, T)
    return x


def _hi(x):
    v = x.val if isinstance(x, DD) else x
    return v.hi


def _f32(x):
    v = x.val if isinstance(x, DD) else x
    return v.hi + v.lo


# Structural tree maps (work on DS and DD alike).


def _tm(f, *xs):
    return jtu.tree_map(f, *xs)


def _dbi(x):
    """(P, 8, W) -> (P, 1, 8, W) column broadcast."""
    return _tm(lambda a: a[..., :, None, :, :], x)


def _dbj(x):
    """(P, 8, W) -> (1, P, 8, W) row broadcast."""
    return _tm(lambda a: a[..., None, :, :, :], x)


def _dtr(x):
    return _tm(lambda a: jnp.swapaxes(a, 0, 1), x)


def _dsum(x, axis, keepdims=False):
    """Compensated (exact-ds) sum over one small leading axis, unrolled."""
    leaf0 = jtu.tree_leaves(x)[0]
    ax = axis if axis >= 0 else axis + leaf0.ndim
    p = leaf0.shape[ax]

    def sl(k):
        return _tm(
            lambda a: lax.index_in_dim(a, k, ax, keepdims=keepdims), x
        )

    acc = sl(0)
    for k in range(1, p):
        acc = dsa.add(acc, sl(k))
    return acc


def _dmm(x, y):
    """ds batched matmul over the leading (P, P) dims of (P,P,8,W)."""
    p = jtu.tree_leaves(x)[0].shape[0]

    def col(a, k):
        return _tm(lambda b: b[:, k:k + 1], a)

    def row(a, k):
        return _tm(lambda b: b[k:k + 1, :], a)

    acc = dsa.mul(col(x, 0), row(y, 0))
    for k in range(1, p):
        acc = dsa.add(acc, dsa.mul(col(x, k), row(y, k)))
    return acc


def _eye_ds(p, s8, w, dtype, T):
    e = _eye(p, s8, w, dtype)
    v = DS(e, jnp.zeros_like(e))
    return v if T == 0 else dsa.dd_lift(v, T)


def _drefine_inv(M, X0f, T):
    """ds inverse of a lane-layout ds matrix from an f32 seed.

    One ds Newton step on the value (residual eps32 -> eps32^2), then
    the exact dual rule d(M^-1) = -M^-1 dM M^-1 for the tangents.
    """
    Mval = M.val if isinstance(M, DD) else M
    X0 = DS(X0f, jnp.zeros_like(X0f))
    R = _dmm(Mval, X0)
    p = X0f.shape[0]
    s8, w = X0f.shape[-2], X0f.shape[-1]
    eye = _eye_ds(p, s8, w, X0f.dtype, 0)
    E = dsa.add(eye, dsa.neg(R))
    X = dsa.add(X0, _dmm(X0, E))
    if T == 0 or not isinstance(M, DD):
        return _lift(X, T)
    tan = tuple(
        dsa.neg(_dmm(X, _dmm(dm, X))) for dm in M.tan
    )
    return DD(X, tan)


def _dcompose_elem(e1, e2, T):
    """ds Riccati (A, J, C) composition, e1 acts first."""
    A1, J1, C1 = e1
    A2, J2, C2 = e2
    p = _hi(A1).shape[0]
    s8, w = _hi(A1).shape[-2], _hi(A1).shape[-1]
    eyeb = _eye(p, s8, w, _hi(A1).dtype)
    M = dsa.add_f(_dmm(C1, J2), eyeb)
    E = _drefine_inv(M, _inv(_f32(M)), T)
    A12 = _dmm(A2, _dmm(E, A1))
    C12 = dsa.add(_dmm(_dmm(A2, E), _dmm(C1, _dtr(A2))), C2)
    J12 = dsa.add(J1, _dmm(_dtr(A1), _dmm(_dmm(J2, E), A1)))
    return A12, J12, C12




# ---------------------------------------------------------------------------
# In-kernel ds lowering (the dual-ds version of fused4._lower_step)
# ---------------------------------------------------------------------------


def _ds_lower_step(cf_ref, jr, jc, T, toff, tan_count, t, tl, dthi,
                   dtlo, dg, m):
    """Build dual-ds (u, v, ph, a) for one streamed step.

    ``cf_ref`` holds the (C, 8, W) coefficient planes of
    :func:`pack_cf_ds` (f32; coefficient-level rounding evaluates a
    nearby valid kernel and stays coherent — dslower docstring).
    Tangent direction ``j`` carries a STATIC unit seed on packed
    coefficient ``toff + j`` (zero past ``tan_count``).  Static seeds
    matter: XLA constant-folds every structurally-zero tangent chain
    (e.g. a c_real direction's u/v tangents), which is the difference
    between a minutes-scale and an hour-scale Mosaic compile — a
    runtime seed-plane variant was tried and tripled the instruction
    count.  t/tl and dthi/dtlo are the exact ds splits of the time
    grid and spacings; dg/m the f32 diag and mask.

    Mirrors :func:`celerite_tpu.ops.dslower.lower_ds` formula-for-
    formula on (8, W) tiles.
    """
    t_ds = DS(t, tl)
    dt_ds = DS(dthi, dtlo)
    one_plane = jnp.ones_like(t)
    zero_plane = jnp.zeros_like(t)

    def cnum(k):
        v = DS(cf_ref[k], zero_plane)
        if T == 0:
            return v
        tans = []
        for j in range(T):
            if toff + j == k and toff + j < tan_count:
                tans.append(DS(one_plane, zero_plane))
            else:
                tans.append(DS(zero_plane, zero_plane))
        return DD(v, tuple(tans))

    ndt = _lift(dsa.neg(dt_ds), T)

    cols_u, cols_v, cols_p = [], [], []
    for j in range(jr):
        ar = cnum(j)
        cr = cnum(jr + j)
        cols_u.append(dsa.mul_f(ar, m))
        cols_v.append(_lift(DS(m, zero_plane), T))
        cols_p.append(dsa.exp_ds(dsa.mul(ndt, cr)))
    for j in range(jc):
        ac = cnum(2 * jr + j)
        bc = cnum(2 * jr + jc + j)
        cc = cnum(2 * jr + 2 * jc + j)
        dc = cnum(2 * jr + 3 * jc + j)
        r_hi, r_lo = _dshelp.reduced_angle(_hi(dc), t, tl)
        r = DS(r_hi, r_lo)
        if T:
            # d(angle)/d(d_comp) = t exactly (the mod-2pi shift is
            # locally constant); tangents computed in ds from the
            # exact time pair (dslower.lower_ds).
            r = dsa.dd_seed(
                r, tuple(dsa.mul(t_ds, dt_) for dt_ in dc.tan)
            )
        sin, cos = dsa.sincos_ds(r)
        cm = dsa.mul_f(cos, m)
        sm = dsa.mul_f(sin, m)
        u0 = dsa.add(dsa.mul(cm, ac), dsa.mul(sm, bc))
        u1 = dsa.add(dsa.mul(sm, ac), dsa.neg(dsa.mul(cm, bc)))
        ph_j = dsa.exp_ds(dsa.mul(ndt, cc))
        cols_u += [u0, u1]
        cols_v += [cm, sm]
        cols_p += [ph_j, ph_j]

    def cat(cols):
        return jtu.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *cols
        )

    u, v, ph = cat(cols_u), cat(cols_v), cat(cols_p)

    # Diagonal: compensated re-sum of the stored coefficient values
    # (see pack_cf_ds docstring) + data diag, masked to 1 on pads.
    total = _lift(DS(zero_plane, zero_plane), T)
    for j in range(jr):
        total = dsa.add(total, cnum(j))
    for j in range(jc):
        total = dsa.add(total, cnum(2 * jr + j))
    total = dsa.add(total, cnum(2 * jr + 4 * jc))
    a_val = dsa.add_f(total, dg)
    a = dsa.where(
        m > 0.5, a_val, _lift(DS(one_plane, zero_plane), T)
    )
    a = _tm(lambda x: x[None], a)  # (1, 8, W)
    return u, v, ph, a


def _ds_factor_step(Sh, u, v, ph, a):
    """One dual-ds factor step; returns (Sh_new, S, su, d, w_)."""
    S = dsa.mul(dsa.mul(_dbi(ph), Sh), _dbj(ph))
    su = _dsum(dsa.mul(S, _dbj(u)), axis=-3)
    d = dsa.add(a, dsa.neg(_dsum(dsa.mul(u, su), axis=0, keepdims=True)))
    w_ = dsa.div(dsa.add(v, dsa.neg(su)), d)
    dww = dsa.mul(
        dsa.mul(_dbi(w_), _dbj(w_)), _tm(lambda x: x[None], d)
    )
    return dsa.add(S, dww), S, su, d, w_


# ---------------------------------------------------------------------------
# Kernel 1: per-block Riccati elements with dual-ds carries
# ---------------------------------------------------------------------------


def _elem_kernel(jr, jc, T, toff, tan_count,
                 cf_ref, t_ref, tl_ref, dt_ref, dtl_ref,
                 dg_ref, m_ref,
                 A_out, J_out, C_out):
    i = pl.program_id(0)
    nw = _nwords(T)
    p = A_out.shape[1]
    s8, w = A_out.shape[-2], A_out.shape[-1]
    dtype = t_ref.dtype

    @pl.when(i == 0)
    def _():
        eye = _eye(p, s8, w, dtype)
        zpp = jnp.zeros((p, p, s8, w), dtype)
        A_out[0] = eye
        for k in range(1, nw):
            A_out[k] = zpp
        for k in range(nw):
            J_out[k] = zpp
            C_out[k] = zpp

    u, v, ph, a = _ds_lower_step(
        cf_ref, jr, jc, T, toff, tan_count,
        t_ref[0], tl_ref[0], dt_ref[0], dtl_ref[0], dg_ref[0], m_ref[0],
    )

    A_c = _load(A_out, T)
    J_c = _load(J_out, T)
    Sh_c = _load(C_out, T)

    Sh_new, S, su, d, w_ = _ds_factor_step(Sh_c, u, v, ph, a)

    ut = dsa.mul(ph, u)
    uAc = _dsum(dsa.mul(A_c, _dbi(ut)), axis=-4)
    A_new = dsa.add(
        dsa.mul(A_c, _dbi(ph)),
        dsa.neg(dsa.mul(_dbi(w_), _dbj(uAc))),
    )
    # J -= uAc (uAc / d)^T (d broadcasts (1,8,W) under the row lift)
    J_new = dsa.add(
        J_c,
        dsa.neg(dsa.mul(_dbi(uAc), _dbj(dsa.div(uAc, d)))),
    )
    _store(A_out, A_new)
    _store(J_out, J_new)
    _store(C_out, Sh_new)


# ---------------------------------------------------------------------------
# Kernel 2: seeded factorization + affine/solve statistics
# ---------------------------------------------------------------------------


def _factor_kernel(jr, jc, T, toff, tan_count,
                   cf_ref, t_ref, tl_ref, dt_ref, dtl_ref,
                   dg_ref, m_ref, y_ref, sh0_ref,
                   M_out, m_out, Qm_out, qv_out, q0_out, ld_out,
                   mind_out, Sh_scr):
    i = pl.program_id(0)
    nw = _nwords(T)
    p = M_out.shape[1]
    s8, w = M_out.shape[-2], M_out.shape[-1]
    dtype = t_ref.dtype

    @pl.when(i == 0)
    def _():
        eye = _eye(p, s8, w, dtype)
        zpp = jnp.zeros((p, p, s8, w), dtype)
        zp = jnp.zeros((p, s8, w), dtype)
        z1 = jnp.zeros((1, s8, w), dtype)
        M_out[0] = eye
        for k in range(1, nw):
            M_out[k] = zpp
        for k in range(nw):
            m_out[k] = zp
            Qm_out[k] = zpp
            qv_out[k] = zp
            q0_out[k] = z1
            ld_out[k] = z1
        mind_out[:] = jnp.full((1, s8, w), jnp.inf, dtype)
        # Seed the S-hat carry scratch from the prefix-composed input
        # (input refs must never be written).
        Sh_scr[:] = sh0_ref[:]

    u, v, ph, a = _ds_lower_step(
        cf_ref, jr, jc, T, toff, tan_count,
        t_ref[0], tl_ref[0], dt_ref[0], dtl_ref[0], dg_ref[0], m_ref[0],
    )
    y = y_ref[0][None]

    Sh_c = _load(Sh_scr, T)
    Sh_new, S, su, d, w_ = _ds_factor_step(Sh_c, u, v, ph, a)
    _store(Sh_scr, Sh_new)

    M_c = _load(M_out, T)
    m_c = _load(m_out, T)

    PhM = dsa.mul(M_c, _dbi(ph))
    g = _dsum(dsa.mul(PhM, _dbi(u)), axis=-4)
    M_new = dsa.add(PhM, dsa.neg(dsa.mul(_dbi(w_), _dbj(g))))
    mh = dsa.mul(m_c, ph)
    z0 = dsa.add_f(
        dsa.neg(_dsum(dsa.mul(u, mh), axis=0, keepdims=True)), y
    )
    m_new = dsa.add(mh, dsa.mul(w_, z0))
    _store(M_out, M_new)
    _store(m_out, m_new)

    # Stats: all ds adds (ds addition IS the compensated accumulation).
    q0_c = _load(q0_out, T)
    _store(
        q0_out,
        dsa.add(q0_c, dsa.div(dsa.mul(z0, z0), d)),
    )
    ld_c = _load(ld_out, T)
    _store(ld_out, dsa.add(ld_c, dsa.log_ds(d)))
    qv_c = _load(qv_out, T)
    _store(qv_out, dsa.add(qv_c, dsa.mul(g, dsa.div(z0, d))))
    Qm_c = _load(Qm_out, T)
    gd = dsa.div(g, _tm(lambda x: x[..., 0, :, :], d))
    _store(
        Qm_out,
        dsa.add(Qm_c, dsa.mul(_dbi(g), _dbj(gd))),
    )
    mind_out[:] = jnp.minimum(mind_out[:], _f32(d))


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _step_spec(s8, w):
    return pl.BlockSpec((1, s8, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _run_elems(cf, plan, jr, jc, T, toff, tan_count, interpret=False):
    L, s8, w = plan.t.shape
    p = jr + 2 * jc
    nw = _nwords(T)
    dtype = plan.t.dtype
    step = _step_spec(s8, w)
    cfspec = pl.BlockSpec((cf_len(jr, jc), s8, w), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec((nw, p, p, s8, w), lambda i: (0, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_elem_kernel, jr, jc, T, toff, tan_count),
        grid=(L,),
        in_specs=[cfspec, step, step, step, step, step, step],
        out_specs=[full, full, full],
        out_shape=[jax.ShapeDtypeStruct((nw, p, p, s8, w), dtype)] * 3,
        compiler_params=_cparams_ds(p, T),
        interpret=interpret,
    )(_planes(cf, s8, w), plan.t, plan.t_lo, plan.dt, plan.dt_lo,
      plan.diag, plan.mask)


def _run_factor(cf, plan, jr, jc, T, toff, tan_count, y, sh0,
                interpret=False):
    L, s8, w = plan.t.shape
    p = jr + 2 * jc
    nw = _nwords(T)
    dtype = plan.t.dtype
    step = _step_spec(s8, w)
    cfspec = pl.BlockSpec((cf_len(jr, jc), s8, w), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    full_pp = pl.BlockSpec((nw, p, p, s8, w), lambda i: (0, 0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    full_p = pl.BlockSpec((nw, p, s8, w), lambda i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    full_1 = pl.BlockSpec((nw, 1, s8, w), lambda i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    full_f = pl.BlockSpec((1, s8, w), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_factor_kernel, jr, jc, T, toff, tan_count),
        grid=(L,),
        in_specs=[cfspec, step, step, step, step, step, step,
                  step, full_pp],
        out_specs=[full_pp, full_p, full_pp, full_p, full_1, full_1,
                   full_f],
        out_shape=[
            jax.ShapeDtypeStruct((nw, p, p, s8, w), dtype),   # M
            jax.ShapeDtypeStruct((nw, p, s8, w), dtype),      # m
            jax.ShapeDtypeStruct((nw, p, p, s8, w), dtype),   # Qm
            jax.ShapeDtypeStruct((nw, p, s8, w), dtype),      # qv
            jax.ShapeDtypeStruct((nw, 1, s8, w), dtype),      # q0
            jax.ShapeDtypeStruct((nw, 1, s8, w), dtype),      # ld
            jax.ShapeDtypeStruct((1, s8, w), dtype),          # mind
        ],
        scratch_shapes=[pltpu.VMEM((nw, p, p, s8, w), dtype)],
        compiler_params=_cparams_ds(p, T),
        interpret=interpret,
    )(_planes(cf, s8, w), plan.t, plan.t_lo, plan.dt, plan.dt_lo,
      plan.diag, plan.mask, y, sh0)


def _cparams_ds(p, T):
    """Raised scoped-VMEM limit: ds doubles and duals multiply the
    (P, P, 8, W) temporaries by 2(1+T)."""
    if p <= 4 and T == 0:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024
    )


def _planes(cf, s8, w):
    if cf.ndim == 1:
        return jnp.broadcast_to(cf[:, None, None], (cf.shape[0], s8, w))
    nc, c = cf.shape
    seg = (s8 * w) // nc
    return jnp.repeat(cf.T, seg, axis=1).reshape(c, s8, w)


# ---------------------------------------------------------------------------
# XLA ds glue: cross-block prefixes + assembly (flat Hillis-Steele)
# ---------------------------------------------------------------------------


def _ds_prefix_sh0(A, J, C, T, seg, w):
    """Exclusive-prefix C (factor seeds) in ds, on stacked-word arrays."""
    A_, J_, C_ = (_unstack(x, T) for x in (A, J, C))
    p = _hi(A_).shape[0]
    s8 = _hi(A_).shape[-2]
    s = 1
    while s < seg:
        lidx = _vl_iota((p, p, s8, w), w) % seg
        keep = lidx < s
        a1 = _tm(lambda x: _roll_vl(x, s, w), A_)
        j1 = _tm(lambda x: _roll_vl(x, s, w), J_)
        c1 = _tm(lambda x: _roll_vl(x, s, w), C_)
        ca, cj, cc = _dcompose_elem((a1, j1, c1), (A_, J_, C_), T)
        A_ = _tm(lambda old, new: jnp.where(keep, old, new), A_, ca)
        J_ = _tm(lambda old, new: jnp.where(keep, old, new), J_, cj)
        C_ = _tm(lambda old, new: jnp.where(keep, old, new), C_, cc)
        s *= 2
    sh0 = _tm(lambda x: _shift_vl(x, jnp.zeros_like(x), w, seg), C_)
    return _stack(sh0)


def _ds_assemble(M, m, Qm, qv, q0, ld, T, seg, seg_out, w, n, dtype):
    """Affine prefix + quadratic assembly in ds; returns per-segment
    stacked-word (quad + ld) totals."""
    M_, m_, Qm_, qv_, q0_, ld_ = (
        _unstack(x, T) for x in (M, m, Qm, qv, q0, ld)
    )
    p = _hi(M_).shape[0]
    s8 = _hi(M_).shape[-2]
    s = 1
    while s < seg:
        lidx_m = _vl_iota((p, p, s8, w), w) % seg
        lidx_v = _vl_iota((p, s8, w), w) % seg
        m1 = _tm(lambda x: _roll_vl(x, s, w), M_)
        v1 = _tm(lambda x: _roll_vl(x, s, w), m_)
        cm = _dmm(M_, m1)
        cv = dsa.add(
            _dsum(dsa.mul(M_, _dbj(v1)), axis=1), m_
        )
        M_ = _tm(lambda old, new: jnp.where(lidx_m < s, old, new),
                 M_, cm)
        m_ = _tm(lambda old, new: jnp.where(lidx_v < s, old, new),
                 m_, cv)
        s *= 2
    h = _tm(lambda x: _shift_vl(x, jnp.zeros_like(x), w, seg), m_)

    Qh = _dsum(dsa.mul(Qm_, _dbj(h)), axis=1)
    two = jnp.asarray(2.0, dtype)
    quad = dsa.add(
        q0_,
        dsa.add(
            dsa.neg(
                dsa.mul_f(
                    _dsum(dsa.mul(qv_, h), axis=0, keepdims=True), two
                )
            ),
            _dsum(dsa.mul(h, Qh), axis=0, keepdims=True),
        ),
    )
    total = dsa.add(quad, ld_)

    # Per-segment ds reduction over lanes.
    def seg_fold(x):
        flat = _tm(lambda a: a.reshape(-1, seg), x)
        return dsa.sum_axis(flat, 1)

    tot_seg = seg_fold(total)  # per-segment ds/dd scalars
    return tot_seg


# ---------------------------------------------------------------------------
# Plan with ds spacings
# ---------------------------------------------------------------------------


class PlanDS:
    """A :class:`lanes4.Plan4` plus the exact ds lo-part of the
    spacings (the f32 ``Plan4.dt`` alone rounds every decay argument —
    an incoherent perturbation the ds solver must not inherit)."""

    __slots__ = ("t", "t_lo", "dt", "dt_lo", "diag", "y", "mask", "n",
                 "num_blocks")

    def __init__(self, plan4, dt_lo):
        self.t = plan4.t
        self.t_lo = plan4.t_lo
        self.dt = plan4.dt
        self.dt_lo = dt_lo
        self.diag = plan4.diag
        self.y = plan4.y
        self.mask = plan4.mask
        self.n = plan4.n
        self.num_blocks = plan4.num_blocks


def make_plan_ds(t, y, diag, num_blocks, n_chain=1):
    """Host-side ds plan: Plan4 layout + exact spacing splits."""
    import numpy as np

    from .lanes4 import make_plan4, _lane4

    plan4 = make_plan4(t, y, diag, num_blocks, n_chain=n_chain)
    t64 = np.asarray(t, np.float64)
    n = t64.shape[0]
    b = int(num_blocks)
    L = -(-n // b)
    pad = b * L - n
    dt64 = np.concatenate([[0.0], np.diff(t64)])
    dt64 = np.concatenate([dt64, np.zeros(pad)])
    if n_chain > 1:
        dt64 = np.tile(dt64, n_chain)
    dt_hi = np.asarray(dt64, np.float32)
    dt_lo = np.asarray(dt64 - np.asarray(dt_hi, np.float64), np.float32)
    bt = b * n_chain
    plan = PlanDS(plan4, jnp.asarray(_lane4(dt_lo, bt, L)))
    # Plan4.dt is already the f32 hi part (differenced in f64 then cast).
    return plan


# ---------------------------------------------------------------------------
# Public builders
# ---------------------------------------------------------------------------


def _run_pipeline(cf, plan, jr, jc, T, toff, tan_count, y, state_seg,
                  interpret):
    _, s8, w = plan.t.shape
    A, J, C = _run_elems(cf, plan, jr, jc, T, toff, tan_count,
                         interpret=interpret)
    sh0 = _ds_prefix_sh0(A, J, C, T, state_seg, w)
    M, m, Qm, qv, q0, ld, mind = _run_factor(
        cf, plan, jr, jc, T, toff, tan_count, y, sh0,
        interpret=interpret,
    )
    return M, m, Qm, qv, q0, ld, mind


def build_ll_ds(plan: PlanDS, jr, jc, n_chain=1, n_seg=None,
                state_seg=None, interpret=False):
    """``cf -> (ll, ok)`` exact-mode via the ds kernels (no gradient)."""
    fn = build_ll_and_grad_ds(
        plan, jr, jc, n_chain=n_chain, n_seg=n_seg,
        state_seg=state_seg, tan_count=0, interpret=interpret,
    )

    def ll_fn(cf, y4=None):
        ll, ok, _ = fn(cf, y4)
        return ll, ok

    return ll_fn


def build_ll_and_grad_ds(plan: PlanDS, jr, jc, n_chain=1, n_seg=None,
                         state_seg=None, tan_count=None, tan_chunk=None,
                         interpret=False):
    """``cf -> (ll, ok, d ll / d cf)`` with dual-ds forward mode.

    ``cf`` is a flat (C,) packed vector (:func:`pack_cf_ds`) or an
    (n_chain, C) batch on a chain-folded plan.  The gradient covers the
    first ``tan_count`` packed coefficients (default: all C), computed
    ``tan_chunk`` directions per kernel launch with STATIC unit seeds:
    Mosaic compile time grows superlinearly in the dual width
    (measured: T=7/P=3 ~5 min, T=9/P=4 ran >50 min before being
    killed), so the default keeps T <= 4 per launch — the last chunk
    pads with structurally-zero directions, which XLA folds away.
    """
    _, s8, w = plan.t.shape
    c = cf_len(jr, jc)
    if n_seg is None:
        n_seg = n_chain
    elif n_chain != 1 and n_chain != n_seg:
        raise ValueError("batched cf requires n_seg == n_chain")
    seg = (s8 * w) // n_seg
    if state_seg is None:
        state_seg = seg
    if tan_count is None:
        tan_count = c
    if tan_chunk is None:
        # Equal-ish chunks, each <= 4 directions (compile-time sweet
        # spot); the last chunk zero-pads to the same T.
        tan_chunk = (
            min(4, tan_count) if tan_count else 1
        )
    dtype = plan.t.dtype

    def fn(cf, y4=None):
        if y4 is None:
            y4 = plan.y
        scalar_out = cf.ndim == 1 and n_seg == 1
        tot_val = None
        grads = []
        offs = list(range(0, tan_count, tan_chunk)) or [0]
        for toff in offs:
            T = tan_chunk if tan_count else 0
            n_live = (
                min(tan_chunk, tan_count - toff) if tan_count else 0
            )
            outs = _run_pipeline(
                cf, plan, jr, jc, T, toff, tan_count,
                y4, state_seg, interpret,
            )
            M, m, Qm, qv, q0, ld, mind = outs
            tot_seg = _ds_assemble(
                M, m, Qm, qv, q0, ld, T, state_seg, seg, w,
                plan.n, dtype,
            )
            if tot_val is None:
                v = tot_seg.val if isinstance(tot_seg, DD) else tot_seg
                tot_val = v
                mind_keep = mind
            if isinstance(tot_seg, DD):
                grads.extend(
                    dsa.to_f32(t) for t in tot_seg.tan[:n_live]
                )

        nlog = jnp.asarray(plan.n, dtype) * jnp.log(
            2.0 * jnp.pi
        ).astype(dtype)
        llv = -0.5 * (dsa.to_f32(tot_val) + nlog)
        ok = (_seg_min(mind_keep, seg) > 0) & jnp.isfinite(llv)
        llv = jnp.where(ok, llv, -jnp.inf)
        if grads:
            g = jnp.stack(grads, axis=-1) * (-0.5)  # (n_seg, T)
            if tan_count < c:
                padg = jnp.zeros(g.shape[:-1] + (c - tan_count,), dtype)
                g = jnp.concatenate([g, padg], axis=-1)
            g = jnp.where(ok[..., None], g, jnp.zeros_like(g))
        else:
            g = None
        if scalar_out:
            llv, ok = llv[0], ok[0]
            if g is not None:
                g = g[0]
        return llv, ok, g

    return fn
