"""Reverse-mode (adjoint) Pallas kernels for the GP log-likelihood.

Forward-mode tangent kernels (ops/tangent.py) cost ~(1 + T) primal
passes for T gradient directions.  This module implements the analytic
adjoint: ONE forward sweep that streams the per-step recursion states to
HBM, plus ONE reverse sweep that carries the cotangent state backward —
gradient cost independent of the parameter count.  This is the TPU
analog of the celerite2 reverse pass (the reference itself only ships
forward-mode coefficient AD, /root/reference/celerite/solver.cpp:347).

Structure mirrors the split pipeline of ops/tangent.py: two streaming
kernels (per-block Riccati elements; factor + affine-solve statistics)
with the tiny O(B) cross-block prefix compositions as plain JAX between
them.  Each pallas kernel gets a hand-written ``jax.custom_vjp`` whose
backward is a reversed-stream kernel; everything else (prefix glue,
quadratic-form assembly, the coefficient lowering) is ordinary JAX that
reverse-mode differentiates automatically.  The backward update rules
are the exact transposes of the forward-tangent rules validated in
tests/test_tangent.py; end-to-end gradients are checked against
``jax.grad`` of the lax blocked solver in tests/test_adjoint.py.

Saved state per step (streamed to HBM in the forward, re-streamed
reversed in the backward):

- elements kernel: ``Shin`` (the incoming S-hat, (P, P)) and ``A_in``
  (the running closed-loop transition product, (P, P)).
- factor kernel: ``Shin`` (P, P), ``Mprev`` (P, P), ``mprev`` (P,).

Everything else (su, d, w, g, mh, z0, ...) is recomputed in the
backward kernel from the saved state + the re-streamed inputs — cheaper
than the HBM traffic to save it.

Layout: time-major ``(L, P, B)`` with the block axis B on lanes, as in
ops/fused.py.  VMEM per lane is O(P^2) with no tangent axis, so a
single launch handles any model width at full lane counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blocked

__all__ = ["gp_log_likelihood", "value_and_grad_fn"]


def _bi(x):
    return x[..., :, None, :]


def _bj(x):
    return x[..., None, :, :]


# ---------------------------------------------------------------------------
# Elements kernel: forward with saves + reversed backward
# ---------------------------------------------------------------------------


def _elements_fwd_kernel(u_ref, v_ref, ph_ref, a_ref,
                         A_out, J_out, C_out, Shin_sv, Ain_sv):
    """ops/pallas_solver._elements_kernel + per-step state saves."""
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

    u, v, ph, a = u_ref[0], v_ref[0], ph_ref[0], a_ref[0]
    A_c, Sh_c = A_out[:], C_out[:]

    Shin_sv[0] = Sh_c
    Ain_sv[0] = A_c

    S = _bi(ph) * Sh_c * _bj(ph)
    su = jnp.sum(S * _bj(u), axis=-2)
    d = a - jnp.sum(u * su, axis=-2, keepdims=True)
    w = (v - su) / d
    C_out[:] = S + d[None, :, :] * _bi(w) * _bj(w)

    ut = ph * u
    uAc = jnp.sum(A_c * _bi(ut), axis=-3)
    A_out[:] = _bi(ph) * A_c - _bi(w) * _bj(uAc)
    J_out[:] = J_out[:] - _bi(uAc) * _bj(uAc / d)


def _elements_bwd_kernel(u_ref, v_ref, ph_ref, a_ref,
                         Shin_ref, Ain_ref,
                         hA0_ref, hJ0_ref, hC0_ref,
                         hu_out, hv_out, hph_out, ha_out,
                         hA, hJ, hSh):
    """Transpose of the elements recursion, streamed in reverse."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hA[:] = hA0_ref[:]
        hJ[:] = hJ0_ref[:]
        hSh[:] = hC0_ref[:]

    u, v, ph, a = u_ref[0], v_ref[0], ph_ref[0], a_ref[0]
    Shin, A_in = Shin_ref[0], Ain_ref[0]

    # Recompute the forward intermediates of this step.
    S = _bi(ph) * Shin * _bj(ph)
    su = jnp.sum(S * _bj(u), axis=-2)
    d = a - jnp.sum(u * su, axis=-2, keepdims=True)
    w = (v - su) / d
    ut = ph * u
    uAc = jnp.sum(A_in * _bi(ut), axis=-3)

    hA_c, hJ_c, hSh_c = hA[:], hJ[:], hSh[:]
    hJsym_uAc = jnp.sum(
        (hJ_c + jnp.swapaxes(hJ_c, 0, 1)) * _bj(uAc), axis=-2
    )

    # F9: J_out = J_in - uAc (uAc/d)^T
    huAc = -hJsym_uAc / d
    hd = jnp.sum(
        hJ_c * _bi(uAc) * _bj(uAc), axis=(-3, -2)
    )[None, :] / (d * d)

    # F8: A_out = Phi A_in - w uAc^T
    hph = jnp.sum(hA_c * A_in, axis=-2)
    hA_in = _bi(ph) * hA_c
    hw = -jnp.sum(hA_c * _bj(uAc), axis=-2)
    huAc = huAc - jnp.sum(hA_c * _bi(w), axis=-3)

    # F7: uAc = A_in^T ut
    hut = jnp.sum(A_in * _bj(huAc), axis=-2)
    hA_in = hA_in + _bi(ut) * _bj(huAc)

    # F6: ut = ph * u
    hph = hph + hut * u
    hu = hut * ph

    # F5: C_out = S + d w w^T
    hS = hSh_c
    hd = hd + jnp.sum(hSh_c * _bi(w) * _bj(w), axis=(-3, -2))[None, :]
    hw = hw + d * jnp.sum(
        (hSh_c + jnp.swapaxes(hSh_c, 0, 1)) * _bj(w), axis=-2
    )

    # F4: w = (v - su)/d
    hv = hw / d
    hsu = -hw / d
    hd = hd - jnp.sum(hw * w, axis=-2, keepdims=True) / d

    # F3: d = a - u . su
    ha = hd
    hu = hu - hd * su
    hsu = hsu - hd * u

    # F2: su = S u
    hu = hu + jnp.sum(S * _bi(hsu), axis=-3)
    hS = hS + _bi(hsu) * _bj(u)

    # F1: S = Phi Shin Phi
    hph = hph + jnp.sum(
        (hS * Shin + jnp.swapaxes(hS * Shin, 0, 1)) * _bj(ph), axis=-2
    )
    hSh[:] = _bi(ph) * hS * _bj(ph)
    hA[:] = hA_in
    # hJ unchanged (J_in enters additively).

    hu_out[0] = hu
    hv_out[0] = hv
    hph_out[0] = hph
    ha_out[0] = ha


# ---------------------------------------------------------------------------
# Factor/statistics kernel: forward with saves + reversed backward
# ---------------------------------------------------------------------------


def _factor_fwd_kernel(sh0_ref, u_ref, v_ref, ph_ref, a_ref, y_ref,
                       M_out, m_out, Qm_out, qv_out, q0_out, ld_out,
                       mind_out, Shin_sv, Mprev_sv, mprev_sv,
                       Sh, cq0, cld):
    """Factor + affine solve map + quadratic-form stats, with saves."""
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
        M_out[:] = eye
        m_out[:] = jnp.zeros_like(m_out)
        Qm_out[:] = jnp.zeros_like(Qm_out)
        qv_out[:] = jnp.zeros_like(qv_out)
        q0_out[:] = jnp.zeros_like(q0_out)
        ld_out[:] = jnp.zeros_like(ld_out)
        mind_out[:] = jnp.full_like(mind_out, jnp.inf)
        cq0[:] = jnp.zeros_like(cq0)
        cld[:] = jnp.zeros_like(cld)

    u, v, ph, a, y = u_ref[0], v_ref[0], ph_ref[0], a_ref[0], y_ref[0]
    Sh_c, M_c, m_c = Sh[:], M_out[:], m_out[:]

    Shin_sv[0] = Sh_c
    Mprev_sv[0] = M_c
    mprev_sv[0] = m_c

    S = _bi(ph) * Sh_c * _bj(ph)
    su = jnp.sum(S * _bj(u), axis=-2)
    d = a - jnp.sum(u * su, axis=-2, keepdims=True)
    w = (v - su) / d
    Sh[:] = S + d[None, :, :] * _bi(w) * _bj(w)

    PhM = _bi(ph) * M_c
    g = jnp.sum(PhM * _bi(u), axis=-3)
    M_out[:] = PhM - _bi(w) * _bj(g)
    mh = ph * m_c
    z0 = y - jnp.sum(u * mh, axis=-2, keepdims=True)
    m_out[:] = mh + w * z0

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


def _factor_bwd_kernel(u_ref, v_ref, ph_ref, a_ref, y_ref,
                       Shin_ref, Mprev_ref, mprev_ref,
                       hM0_ref, hm0_ref, hQm_ref, hqv_ref, hq0_ref,
                       hld_ref,
                       hu_out, hv_out, hph_out, ha_out, hy_out, hsh0_out,
                       hSh, hM, hm):
    """Transpose of the factor/stats recursion, streamed in reverse."""
    i = pl.program_id(0)
    L = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        hSh[:] = jnp.zeros_like(hSh)
        hM[:] = hM0_ref[:]
        hm[:] = hm0_ref[:]

    u, v, ph, a, y = u_ref[0], v_ref[0], ph_ref[0], a_ref[0], y_ref[0]
    Shin, Mprev, mprev = Shin_ref[0], Mprev_ref[0], mprev_ref[0]
    hQm, hqv = hQm_ref[:], hqv_ref[:]
    hq0, hld = hq0_ref[:], hld_ref[:]

    # Recompute the forward intermediates of this step.
    S = _bi(ph) * Shin * _bj(ph)
    su = jnp.sum(S * _bj(u), axis=-2)
    d = a - jnp.sum(u * su, axis=-2, keepdims=True)
    w = (v - su) / d
    PhM = _bi(ph) * Mprev
    g = jnp.sum(PhM * _bi(u), axis=-3)
    mh = ph * mprev
    z0 = y - jnp.sum(u * mh, axis=-2, keepdims=True)

    hSh_c, hM_c, hm_c = hSh[:], hM[:], hm[:]

    # E12 stats (constant per-block cotangents, contribution each step):
    hqv_g = jnp.sum(hqv * g, axis=-2, keepdims=True)
    gQg = jnp.sum(hQm * _bi(g) * _bj(g), axis=(-3, -2))[None, :]
    hz0 = hq0 * (2.0 * z0 / d) + hqv_g / d
    hd = (
        -hq0 * z0 * z0 / (d * d)
        + hld / d
        - hqv_g * z0 / (d * d)
        - gQg / (d * d)
    )
    hQm_sym_g = jnp.sum(
        (hQm + jnp.swapaxes(hQm, 0, 1)) * _bj(g), axis=-2
    )
    hg = hqv * (z0 / d) + hQm_sym_g / d

    # E11: m_out = mh + w z0
    hmh = hm_c
    hw = hm_c * z0
    hz0 = hz0 + jnp.sum(hm_c * w, axis=-2, keepdims=True)

    # E10: z0 = y - u . mh
    hy = hz0
    hu = -hz0 * mh
    hmh = hmh - hz0 * u

    # E9: mh = ph * mprev
    hph = hmh * mprev
    hm[:] = hmh * ph

    # E8: M_out = PhM - w g^T
    hPhM = hM_c
    hw = hw - jnp.sum(hM_c * _bj(g), axis=-2)
    hg = hg - jnp.sum(hM_c * _bi(w), axis=-3)

    # E7: g = PhM^T u
    hu = hu + jnp.sum(PhM * _bj(hg), axis=-2)
    hPhM = hPhM + _bi(u) * _bj(hg)

    # E6: PhM = Phi Mprev (row scale)
    hph = hph + jnp.sum(hPhM * Mprev, axis=-2)
    hM[:] = _bi(ph) * hPhM

    # E5: Sh_out = S + d w w^T
    hS = hSh_c
    hd = hd + jnp.sum(hSh_c * _bi(w) * _bj(w), axis=(-3, -2))[None, :]
    hw = hw + d * jnp.sum(
        (hSh_c + jnp.swapaxes(hSh_c, 0, 1)) * _bj(w), axis=-2
    )

    # E4: w = (v - su)/d
    hv = hw / d
    hsu = -hw / d
    hd = hd - jnp.sum(hw * w, axis=-2, keepdims=True) / d

    # E3: d = a - u . su
    ha = hd
    hu = hu - hd * su
    hsu = hsu - hd * u

    # E2: su = S u
    hu = hu + jnp.sum(S * _bi(hsu), axis=-3)
    hS = hS + _bi(hsu) * _bj(u)

    # E1: S = Phi Shin Phi
    hph = hph + jnp.sum(
        (hS * Shin + jnp.swapaxes(hS * Shin, 0, 1)) * _bj(ph), axis=-2
    )
    hSh[:] = _bi(ph) * hS * _bj(ph)

    hu_out[0] = hu
    hv_out[0] = hv
    hph_out[0] = hph
    ha_out[0] = ha
    hy_out[0] = hy

    @pl.when(i == L - 1)
    def _():
        hsh0_out[:] = hSh[:]


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJPs
# ---------------------------------------------------------------------------


def _specs(p, b, tdim=None):
    step = pl.BlockSpec((1, p, b), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    step1 = pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    full_pp = pl.BlockSpec((p, p, b), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    full_p = pl.BlockSpec((p, b), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    full_1 = pl.BlockSpec((1, b), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    return step, step1, full_pp, full_p, full_1


def _rev_specs(p, b, L):
    rstep = pl.BlockSpec((1, p, b), lambda i: (L - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM)
    rstep1 = pl.BlockSpec((1, 1, b), lambda i: (L - 1 - i, 0, 0),
                          memory_space=pltpu.VMEM)
    rstep_pp = pl.BlockSpec((1, p, p, b), lambda i: (L - 1 - i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return rstep, rstep1, rstep_pp


@jax.custom_vjp
def _elements_op(u, v, ph, a):
    """(L, P, B) streams -> per-block Riccati elements (A, J, C)."""
    from .pallas_solver import _run_elements

    interpret = jax.default_backend() != "tpu"
    return tuple(_run_elements(u, v, ph, a, interpret))


def _cparams(p):
    """Mosaic params: raise the scoped-VMEM limit for wide models.

    The default 16 MB scoped limit fits P <= 8 at every default lane
    count; at P = 12 the reversed-stream backward kernels peak at
    ~18-25 MB of stack (measured: 18.4 MB at B = 2048) on a 128 MB-VMEM
    v5e core.
    """
    if p <= 8:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _elements_fwd(u, v, ph, a):
    L, p, b = u.shape
    dtype = u.dtype
    interpret = jax.default_backend() != "tpu"
    step, step1, full_pp, _, _ = _specs(p, b)
    step_pp = pl.BlockSpec((1, p, p, b), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    A, J, C, Shin_sv, Ain_sv = pl.pallas_call(
        _elements_fwd_kernel,
        grid=(L,),
        in_specs=[step, step, step, step1],
        out_specs=[full_pp, full_pp, full_pp, step_pp, step_pp],
        out_shape=[
            jax.ShapeDtypeStruct((p, p, b), dtype),
            jax.ShapeDtypeStruct((p, p, b), dtype),
            jax.ShapeDtypeStruct((p, p, b), dtype),
            jax.ShapeDtypeStruct((L, p, p, b), dtype),
            jax.ShapeDtypeStruct((L, p, p, b), dtype),
        ],
        compiler_params=_cparams(p),
        interpret=interpret,
    )(u, v, ph, a)
    return (A, J, C), (u, v, ph, a, Shin_sv, Ain_sv)


def _elements_bwd(res, cots):
    u, v, ph, a, Shin_sv, Ain_sv = res
    hA0, hJ0, hC0 = cots
    L, p, b = u.shape
    dtype = u.dtype
    interpret = jax.default_backend() != "tpu"
    _, _, full_pp, _, _ = _specs(p, b)
    rstep, rstep1, rstep_pp = _rev_specs(p, b, L)
    hu, hv, hph, ha = pl.pallas_call(
        _elements_bwd_kernel,
        grid=(L,),
        in_specs=[rstep, rstep, rstep, rstep1, rstep_pp, rstep_pp,
                  full_pp, full_pp, full_pp],
        out_specs=[rstep, rstep, rstep, rstep1],
        out_shape=[
            jax.ShapeDtypeStruct((L, p, b), dtype),
            jax.ShapeDtypeStruct((L, p, b), dtype),
            jax.ShapeDtypeStruct((L, p, b), dtype),
            jax.ShapeDtypeStruct((L, 1, b), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((p, p, b), dtype)] * 3,
        compiler_params=_cparams(p),
        interpret=interpret,
    )(u, v, ph, a, Shin_sv, Ain_sv, hA0, hJ0, hC0)
    return hu, hv, hph, ha


_elements_op.defvjp(_elements_fwd, _elements_bwd)


@jax.custom_vjp
def _factor_op(sh0, u, v, ph, a, y):
    """Seeded factor + solve statistics: (M, m, Qm, qv, q0, ld, mind)."""
    out, _ = _factor_fwd(sh0, u, v, ph, a, y)
    return out


def _factor_fwd(sh0, u, v, ph, a, y):
    L, p, b = u.shape
    dtype = u.dtype
    interpret = jax.default_backend() != "tpu"
    step, step1, full_pp, full_p, full_1 = _specs(p, b)
    step_pp = pl.BlockSpec((1, p, p, b), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _factor_fwd_kernel,
        grid=(L,),
        in_specs=[full_pp, step, step, step, step1, step1],
        out_specs=[full_pp, full_p, full_pp, full_p, full_1, full_1,
                   full_1, step_pp, step_pp, step],
        out_shape=[
            jax.ShapeDtypeStruct((p, p, b), dtype),   # M
            jax.ShapeDtypeStruct((p, b), dtype),      # m
            jax.ShapeDtypeStruct((p, p, b), dtype),   # Qm
            jax.ShapeDtypeStruct((p, b), dtype),      # qv
            jax.ShapeDtypeStruct((1, b), dtype),      # q0
            jax.ShapeDtypeStruct((1, b), dtype),      # ld
            jax.ShapeDtypeStruct((1, b), dtype),      # mind
            jax.ShapeDtypeStruct((L, p, p, b), dtype),  # Shin saves
            jax.ShapeDtypeStruct((L, p, p, b), dtype),  # Mprev saves
            jax.ShapeDtypeStruct((L, p, b), dtype),   # mprev saves
        ],
        scratch_shapes=[
            pltpu.VMEM((p, p, b), dtype),
            pltpu.VMEM((1, b), dtype),
            pltpu.VMEM((1, b), dtype),
        ],
        compiler_params=_cparams(p),
        interpret=interpret,
    )(sh0, u, v, ph, a, y)
    M, m, Qm, qv, q0, ld, mind = outs[:7]
    saves = (u, v, ph, a, y) + tuple(outs[7:])
    return (M, m, Qm, qv, q0, ld, mind), saves


def _factor_bwd(res, cots):
    u, v, ph, a, y, Shin_sv, Mprev_sv, mprev_sv = res
    hM0, hm0, hQm, hqv, hq0, hld, _hmind = cots
    L, p, b = u.shape
    dtype = u.dtype
    interpret = jax.default_backend() != "tpu"
    _, _, full_pp, full_p, full_1 = _specs(p, b)
    rstep, rstep1, rstep_pp = _rev_specs(p, b, L)
    outs = pl.pallas_call(
        _factor_bwd_kernel,
        grid=(L,),
        in_specs=[rstep, rstep, rstep, rstep1, rstep1,
                  rstep_pp, rstep_pp, rstep,
                  full_pp, full_p, full_pp, full_p, full_1, full_1],
        out_specs=[rstep, rstep, rstep, rstep1, rstep1, full_pp],
        out_shape=[
            jax.ShapeDtypeStruct((L, p, b), dtype),
            jax.ShapeDtypeStruct((L, p, b), dtype),
            jax.ShapeDtypeStruct((L, p, b), dtype),
            jax.ShapeDtypeStruct((L, 1, b), dtype),
            jax.ShapeDtypeStruct((L, 1, b), dtype),
            jax.ShapeDtypeStruct((p, p, b), dtype),   # hsh0
        ],
        scratch_shapes=[
            pltpu.VMEM((p, p, b), dtype),
            pltpu.VMEM((p, p, b), dtype),
            pltpu.VMEM((p, b), dtype),
        ],
        compiler_params=_cparams(p),
        interpret=interpret,
    )(u, v, ph, a, y, Shin_sv, Mprev_sv, mprev_sv,
      hM0, hm0, hQm, hqv, hq0, hld)
    hu, hv, hph, ha, hy, hsh0 = outs
    return hsh0, hu, hv, hph, ha, hy


_factor_op.defvjp(_factor_fwd, _factor_bwd)


# ---------------------------------------------------------------------------
# End-to-end differentiable log-likelihood on laned inputs
# ---------------------------------------------------------------------------


def default_adjoint_blocks(n, p):
    """Largest power-of-two lane count for the adjoint kernel pair.

    VMEM per lane is ~10 (P, P) f32 slots (carried cotangents + streamed
    save/input double-buffers) — no tangent axis, so even wide models run
    at full lane counts.
    """
    from .fused import default_num_blocks

    per_lane = 40.0 * p * max(p, 8)
    b = 4096
    while b > 128 and b * per_lane > 12e6:
        b //= 2
    return min(b, default_num_blocks(n))


def run_kernel(u, v, ph, a, y, n):
    """(ll, ok) from pre-laned (L, P, B) inputs; reverse-differentiable.

    ``jax.grad`` through this composes the hand-written kernel VJPs with
    XLA's automatic differentiation of the prefix glue and assembly.
    ``ok`` is non-differentiable (stop_gradient on the pivot minimum).
    """
    L, p, b = u.shape
    dtype = u.dtype

    A_el, J_el, C_el = _elements_op(u, v, ph, a)
    elems = tuple(x.transpose(2, 0, 1) for x in (A_el, J_el, C_el))
    pref = blocked._exclusive_prefix_elements(elems)
    sh0 = pref[2].transpose(1, 2, 0)

    M, m, Qm, qv, q0, ld, mind = _factor_op(sh0, u, v, ph, a, y)

    Mb = M.transpose(2, 0, 1)
    mb = m.transpose(1, 0)
    _, mp = blocked._exclusive_prefix_affine(Mb, mb)
    h = mp.transpose(1, 0)

    Qh = jnp.sum(Qm * h[None, :, :], axis=1)
    quad = jnp.sum(
        q0[0]
        - 2.0 * jnp.sum(qv * h, axis=0)
        + jnp.sum(h * Qh, axis=0)
    )
    logdet = jnp.sum(ld)
    ll = -0.5 * (
        quad + logdet + n * jnp.log(2.0 * jnp.pi).astype(dtype)
    )
    ok = (jax.lax.stop_gradient(jnp.min(mind)) > 0) & jnp.isfinite(
        jax.lax.stop_gradient(ll)
    )
    return jnp.where(ok, ll, -jnp.inf), ok


def gp_log_likelihood(ssm, resid, num_blocks=None):
    """(ll, ok) for an SSM via the adjoint-capable split pipeline."""
    from .fused import _to_lanes, default_num_blocks

    n, p = ssm.U.shape
    b = num_blocks or default_num_blocks(n)
    u, v, ph, a, y, L = _to_lanes(ssm, resid, b)
    return run_kernel(u, v, ph, a, y, n)


def value_and_grad_fn(make_inputs, n):
    """Build ``theta -> (ll, ok, grad)`` with the adjoint backward.

    ``make_inputs(theta) -> (u, v, ph, a, y)`` in lane layout (the
    ops/lanes.py builder).  The whole chain — lowering, kernels, glue —
    reverse-differentiates in one pass; cost is independent of the
    parameter count.
    """

    def ll_fn(theta):
        u, v, ph, a, y = make_inputs(theta)
        ll, ok = run_kernel(u, v, ph, a, y, n)
        return ll, ok

    vag = jax.value_and_grad(ll_fn, has_aux=True)

    def fn(theta):
        (ll, ok), grad = vag(theta)
        return ll, ok, grad

    return fn
