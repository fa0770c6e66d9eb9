"""One-pass Pallas solver: the whole GP log-likelihood from a single
streaming sweep.

The two-phase designs (ops/fused.py, ops/pallas_solver.py) stream the
time axis twice: once to build per-block Riccati elements (so the
cross-block prefix can seed each block's true incoming state), and once
to run the seeded factorization + solve.  This module removes the
second sweep: the zero-seeded block summaries determine the seeded
quantities *in closed form*.

With zero-seed per-block summaries (all accumulated in one sweep)

  d0_n, w0_n           zero-seed pivots / factor vectors
  C                    zero-seed end state of the S-hat recursion
  M0, m0               cumulated affine solve map (I - w0 u^T) Phi ...
  Qm = sum g g^T / d0  information matrix, g_n = M0_cum^T Phi u_n
  qv = sum (z0/d0) g   cross statistic
  q0, ld0              zero-seed quadratic form / log-determinant

the exact seeded block quantities are (verified to machine precision in
tests/test_onepass.py; K := (I - S Qm)^{-1} S, r := qv - Qm h):

  sum_n log d_n(S)  = ld0 + log det(I - S Qm)
  quad(S, h)        = q0 - 2 qv.h + h^T Qm h + r^T K r
  S_out             = C + M0 K M0^T
  h_out             = M0 h + m0 - M0 K r

The identities are the information-filter (Schur-complement) form of
the block's likelihood message: the celerite factor element's A
component coincides with the affine solve map (A == M0) and its J
component with the negative information matrix (J == -Qm), so one sweep
produces everything.  The cross-block prefix is the usual associative
element composition on (M0, -Qm, C); the per-block corrections are
O(B P^3) XLA ops.

**Numerical caveat — why this is NOT the default path.**  The
identities are exact but intrinsically ill-conditioned in float32:
det(I - S Qm) = prod_n d_n(S)/d0_n, and the zero seed "forgets" the
covariance explained upstream, so each block's first pivots are too
large by ~signal/noise and the determinant is ~(noise/signal)^P per
block (measured 1e-5 on the N=1e6 bench grid, max eig(Qm S) = 0.99986).
The correction inverse amplifies rounding by 1/det, which breaks f32 on
chip (flagged not-ok) while f64 passes at 1e-9.  The two-phase kernels
(ops/fused.py) are the numerically self-stabilizing factorization of
the same algebra — re-running the recursion with the true seed instead
of correcting the zero-seed summaries — and remain the production
path.  This module documents the alternative concretely (it is also
~2x less per-step arithmetic, so it would win if the conditioning
problem had a cure; see ROADMAP).

The gradient reuses the adjoint machinery of ops/adjoint.py: the
backward of the one sweep is the transpose of its step (the
ops/adjoint._factor_bwd_kernel rules with the C-output cotangent
seeding the carried S-hat cotangent), and the XLA assembly
reverse-differentiates automatically.

Reference hot path being replaced: cholesky.h:126-179 + 343-398 of
/root/reference, redesigned block-parallel; see SURVEY.md section 7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blocked
from .adjoint import _factor_bwd_kernel  # noqa: F401 (rule source, docs)
from .lower import SSM
from .precision import f32_matmuls

__all__ = ["gp_log_likelihood", "run_kernel"]


def _bi(x):
    return x[..., :, None, :]


def _bj(x):
    return x[..., None, :, :]


# ---------------------------------------------------------------------------
# The single streaming sweep (primal, and a save-emitting variant)
# ---------------------------------------------------------------------------


def _sweep_body(u, v, ph, a, y, Sh_c, M_c, m_c):
    """One step of the zero-seeded factor + solve-summary recursion.

    Returns the new (Sh, M, m) state plus the per-step statistics
    (d, w, g, z) needed by the accumulators.
    """
    S = _bi(ph) * Sh_c * _bj(ph)
    su = jnp.sum(S * _bj(u), axis=-2)
    d = a - jnp.sum(u * su, axis=-2, keepdims=True)
    w = (v - su) / d
    Sh = S + d[None, :, :] * _bi(w) * _bj(w)

    PhM = _bi(ph) * M_c
    g = jnp.sum(PhM * _bi(u), axis=-3)
    M = PhM - _bi(w) * _bj(g)

    mh = ph * m_c
    z = y - jnp.sum(u * mh, axis=-2, keepdims=True)
    m = mh + w * z
    return Sh, M, m, d, g, z


def _onepass_kernel(u_ref, v_ref, ph_ref, a_ref, y_ref,
                    C_out, M_out, m_out, Qm_out, qv_out, q0_out, ld_out,
                    mind_out, cq0, cld):
    i = pl.program_id(0)
    L = pl.num_programs(0)
    p = u_ref.shape[1]
    b = u_ref.shape[2]
    dtype = C_out.dtype

    @pl.when(i == 0)
    def _():
        eye = jnp.broadcast_to(
            jnp.eye(p, dtype=dtype)[:, :, None], (p, p, b)
        )
        C_out[:] = jnp.zeros_like(C_out)
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
    Sh, M, m, d, g, z = _sweep_body(
        u, v, ph, a, y, C_out[:], M_out[:], m_out[:]
    )
    C_out[:] = Sh
    M_out[:] = M
    m_out[:] = m

    x1 = z * z / d - cq0[:]
    t1 = q0_out[:] + x1
    cq0[:] = (t1 - q0_out[:]) - x1
    q0_out[:] = t1
    x2 = jnp.log(d) - cld[:]
    t2 = ld_out[:] + x2
    cld[:] = (t2 - ld_out[:]) - x2
    ld_out[:] = t2
    qv_out[:] = qv_out[:] + (z / d) * g
    Qm_out[:] = Qm_out[:] + _bi(g) * _bj(g / d)
    mind_out[:] = jnp.minimum(mind_out[:], d)

    @pl.when(i == L - 1)
    def _():
        q0_out[:] = q0_out[:] + cq0[:]
        ld_out[:] = ld_out[:] + cld[:]


def _onepass_fwd_kernel(u_ref, v_ref, ph_ref, a_ref, y_ref,
                        C_out, M_out, m_out, Qm_out, qv_out, q0_out,
                        ld_out, mind_out,
                        Shin_sv, Mprev_sv, mprev_sv,
                        cq0, cld):
    """The sweep plus per-step state saves for the adjoint backward."""
    i = pl.program_id(0)
    L = pl.num_programs(0)
    p = u_ref.shape[1]
    b = u_ref.shape[2]
    dtype = C_out.dtype

    @pl.when(i == 0)
    def _():
        eye = jnp.broadcast_to(
            jnp.eye(p, dtype=dtype)[:, :, None], (p, p, b)
        )
        C_out[:] = jnp.zeros_like(C_out)
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
    Sh_c, M_c, m_c = C_out[:], M_out[:], m_out[:]
    Shin_sv[0] = Sh_c
    Mprev_sv[0] = M_c
    mprev_sv[0] = m_c

    Sh, M, m, d, g, z = _sweep_body(u, v, ph, a, y, Sh_c, M_c, m_c)
    C_out[:] = Sh
    M_out[:] = M
    m_out[:] = m

    x1 = z * z / d - cq0[:]
    t1 = q0_out[:] + x1
    cq0[:] = (t1 - q0_out[:]) - x1
    q0_out[:] = t1
    x2 = jnp.log(d) - cld[:]
    t2 = ld_out[:] + x2
    cld[:] = (t2 - ld_out[:]) - x2
    ld_out[:] = t2
    qv_out[:] = qv_out[:] + (z / d) * g
    Qm_out[:] = Qm_out[:] + _bi(g) * _bj(g / d)
    mind_out[:] = jnp.minimum(mind_out[:], d)

    @pl.when(i == L - 1)
    def _():
        q0_out[:] = q0_out[:] + cq0[:]
        ld_out[:] = ld_out[:] + cld[:]


def _onepass_bwd_kernel(u_ref, v_ref, ph_ref, a_ref, y_ref,
                        Shin_ref, Mprev_ref, mprev_ref,
                        hC0_ref, hM0_ref, hm0_ref, hQm_ref, hqv_ref,
                        hq0_ref, hld_ref,
                        hu_out, hv_out, hph_out, ha_out, hy_out,
                        hSh, hM, hm):
    """Transpose of the sweep, streamed in reverse.

    Identical update rules to ops/adjoint._factor_bwd_kernel, with the
    carried S-hat cotangent seeded from the C-output cotangent (the
    sweep's end state is an output here) and no incoming-seed cotangent
    to emit (the sweep is zero-seeded).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hSh[:] = hC0_ref[:]
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

    hmh = hm_c
    hw = hm_c * z0
    hz0 = hz0 + jnp.sum(hm_c * w, axis=-2, keepdims=True)

    hy = hz0
    hu = -hz0 * mh
    hmh = hmh - hz0 * u

    hph = hmh * mprev
    hm[:] = hmh * ph

    hPhM = hM_c
    hw = hw - jnp.sum(hM_c * _bj(g), axis=-2)
    hg = hg - jnp.sum(hM_c * _bi(w), axis=-3)

    hu = hu + jnp.sum(PhM * _bj(hg), axis=-2)
    hPhM = hPhM + _bi(u) * _bj(hg)

    hph = hph + jnp.sum(hPhM * Mprev, axis=-2)
    hM[:] = _bi(ph) * hPhM

    hS = hSh_c
    hd = hd + jnp.sum(hSh_c * _bi(w) * _bj(w), axis=(-3, -2))[None, :]
    hw = hw + d * jnp.sum(
        (hSh_c + jnp.swapaxes(hSh_c, 0, 1)) * _bj(w), axis=-2
    )

    hv = hw / d
    hsu = -hw / d
    hd = hd - jnp.sum(hw * w, axis=-2, keepdims=True) / d

    ha = hd
    hu = hu - hd * su
    hsu = hsu - hd * u

    hu = hu + jnp.sum(S * _bi(hsu), axis=-3)
    hS = hS + _bi(hsu) * _bj(u)

    hph = hph + jnp.sum(
        (hS * Shin + jnp.swapaxes(hS * Shin, 0, 1)) * _bj(ph), axis=-2
    )
    hSh[:] = _bi(ph) * hS * _bj(ph)

    hu_out[0] = hu
    hv_out[0] = hv
    hph_out[0] = hph
    ha_out[0] = ha
    hy_out[0] = hy


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP on the sweep
# ---------------------------------------------------------------------------


def _sweep_specs(p, b):
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


_SUMMARY_SHAPES = lambda p, b, dtype: [
    jax.ShapeDtypeStruct((p, p, b), dtype),   # C
    jax.ShapeDtypeStruct((p, p, b), dtype),   # M0
    jax.ShapeDtypeStruct((p, b), dtype),      # m0
    jax.ShapeDtypeStruct((p, p, b), dtype),   # Qm
    jax.ShapeDtypeStruct((p, b), dtype),      # qv
    jax.ShapeDtypeStruct((1, b), dtype),      # q0
    jax.ShapeDtypeStruct((1, b), dtype),      # ld0
    jax.ShapeDtypeStruct((1, b), dtype),      # mind0
]


@jax.custom_vjp
def _sweep_op(u, v, ph, a, y):
    """(L, P, B) streams -> the 8 zero-seed block summaries."""
    L, p, b = u.shape
    dtype = u.dtype
    interpret = jax.default_backend() != "tpu"
    step, step1, full_pp, full_p, full_1 = _sweep_specs(p, b)
    return tuple(pl.pallas_call(
        _onepass_kernel,
        grid=(L,),
        in_specs=[step, step, step, step1, step1],
        out_specs=[full_pp, full_pp, full_p, full_pp, full_p, full_1,
                   full_1, full_1],
        out_shape=_SUMMARY_SHAPES(p, b, dtype),
        scratch_shapes=[pltpu.VMEM((1, b), dtype)] * 2,
        interpret=interpret,
    )(u, v, ph, a, y))


def _sweep_fwd(u, v, ph, a, y):
    L, p, b = u.shape
    dtype = u.dtype
    interpret = jax.default_backend() != "tpu"
    step, step1, full_pp, full_p, full_1 = _sweep_specs(p, b)
    step_pp = pl.BlockSpec((1, p, p, b), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _onepass_fwd_kernel,
        grid=(L,),
        in_specs=[step, step, step, step1, step1],
        out_specs=[full_pp, full_pp, full_p, full_pp, full_p, full_1,
                   full_1, full_1, step_pp, step_pp, step],
        out_shape=_SUMMARY_SHAPES(p, b, dtype) + [
            jax.ShapeDtypeStruct((L, p, p, b), dtype),  # Shin saves
            jax.ShapeDtypeStruct((L, p, p, b), dtype),  # Mprev saves
            jax.ShapeDtypeStruct((L, p, b), dtype),     # mprev saves
        ],
        scratch_shapes=[pltpu.VMEM((1, b), dtype)] * 2,
        interpret=interpret,
    )(u, v, ph, a, y)
    summaries = tuple(outs[:8])
    saves = (u, v, ph, a, y) + tuple(outs[8:])
    return summaries, saves


def _sweep_bwd(res, cots):
    u, v, ph, a, y, Shin_sv, Mprev_sv, mprev_sv = res
    hC, hM0, hm0, hQm, hqv, hq0, hld, _hmind = cots
    L, p, b = u.shape
    dtype = u.dtype
    interpret = jax.default_backend() != "tpu"
    _, _, full_pp, full_p, full_1 = _sweep_specs(p, b)
    rstep = pl.BlockSpec((1, p, b), lambda i: (L - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM)
    rstep1 = pl.BlockSpec((1, 1, b), lambda i: (L - 1 - i, 0, 0),
                          memory_space=pltpu.VMEM)
    rstep_pp = pl.BlockSpec((1, p, p, b), lambda i: (L - 1 - i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _onepass_bwd_kernel,
        grid=(L,),
        in_specs=[rstep, rstep, rstep, rstep1, rstep1,
                  rstep_pp, rstep_pp, rstep,
                  full_pp, full_pp, full_p, full_pp, full_p, full_1,
                  full_1],
        out_specs=[rstep, rstep, rstep, rstep1, rstep1],
        out_shape=[
            jax.ShapeDtypeStruct((L, p, b), dtype),
            jax.ShapeDtypeStruct((L, p, b), dtype),
            jax.ShapeDtypeStruct((L, p, b), dtype),
            jax.ShapeDtypeStruct((L, 1, b), dtype),
            jax.ShapeDtypeStruct((L, 1, b), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((p, p, b), dtype),
            pltpu.VMEM((p, p, b), dtype),
            pltpu.VMEM((p, b), dtype),
        ],
        interpret=interpret,
    )(u, v, ph, a, y, Shin_sv, Mprev_sv, mprev_sv,
      hC, hM0, hm0, hQm, hqv, hq0, hld)
    return tuple(outs)


_sweep_op.defvjp(_sweep_fwd, _sweep_bwd)


# ---------------------------------------------------------------------------
# XLA assembly: prefix + closed-form seed corrections
# ---------------------------------------------------------------------------


def _small_det(M):
    """Batched determinant of small (..., p, p) matrices.

    Gaussian elimination without pivoting, tracking the pivot product —
    same rationale as blocked._small_inv (batched LAPACK det lowers
    pathologically on TPU; these matrices are I - S Qm with O(1)
    pivots).
    """
    p = M.shape[-1]
    det = jnp.ones(M.shape[:-2], M.dtype)
    A = M
    for k in range(p):
        piv = A[..., k, k]
        det = det * piv
        row = A[..., k, :] / piv[..., None]
        A = A - A[..., :, k:k + 1] * row[..., None, :]
        A = A.at[..., k, :].set(row)
    return det


@f32_matmuls
def run_kernel(u, v, ph, a, y, n):
    """(ll, ok) from pre-laned (L, P, B) inputs in ONE streaming sweep.

    Reverse-differentiable end to end (the sweep carries a hand-written
    VJP; the assembly below is plain JAX).
    """
    L, p, b = u.shape
    dtype = u.dtype
    eye = jnp.eye(p, dtype=dtype)

    C, M0, m0, Qm, qv, q0, ld0, mind0 = _sweep_op(u, v, ph, a, y)

    # Lane layout -> batch-of-small-matrices layout.
    Cb = C.transpose(2, 0, 1)
    M0b = M0.transpose(2, 0, 1)
    Qmb = Qm.transpose(2, 0, 1)
    m0b = m0.transpose(1, 0)
    qvb = qv.transpose(1, 0)

    # Cross-block prefix: the factor element is (A, J, C) = (M0, -Qm, C).
    pref = blocked._exclusive_prefix_elements((M0b, -Qmb, Cb))
    S = pref[2]                                   # (B, P, P) seeds

    # Closed-form seed corrections (module docstring; K = (I-S Qm)^-1 S).
    X = eye - S @ Qmb
    K = blocked._small_inv(X) @ S
    det = _small_det(X)

    # Effective affine boundary map, then the usual affine prefix.
    M_eff = M0b @ (eye + K @ Qmb)
    m_eff = m0b - (M0b @ (K @ qvb[..., None]))[..., 0]
    _, hp = blocked._exclusive_prefix_affine(M_eff, m_eff)

    r = qvb - (Qmb @ hp[..., None])[..., 0]       # (B, P)
    Kr = (K @ r[..., None])[..., 0]
    quad = jnp.sum(
        q0[0]
        - 2.0 * jnp.sum(qvb * hp, axis=-1)
        + jnp.sum(hp * (Qmb @ hp[..., None])[..., 0], axis=-1)
        + jnp.sum(r * Kr, axis=-1)
    )
    logdet = jnp.sum(ld0) + jnp.sum(jnp.log(det))

    ll = -0.5 * (
        quad + logdet + n * jnp.log(2.0 * jnp.pi).astype(dtype)
    )
    ok = (
        (jax.lax.stop_gradient(jnp.min(mind0)) > 0)
        & (jax.lax.stop_gradient(jnp.min(det)) > 0)
        & jnp.isfinite(jax.lax.stop_gradient(ll))
    )
    return jnp.where(ok, ll, -jnp.inf), ok


def gp_log_likelihood(ssm: SSM, resid, num_blocks=None):
    """(ll, ok) for an SSM through the one-pass solver.

    Validity semantics: ``ok`` requires positive zero-seed pivots,
    positive per-block correction determinants, and a finite result —
    equivalent to the two-phase per-step pivot check for exact PSD
    seeds, and agreeing with it in practice on the non-PD test fixtures
    (an indefinite kernel fails the zero-seed or determinant check).
    """
    from .fused import _to_lanes, default_num_blocks

    n, p = ssm.U.shape
    b = num_blocks or default_num_blocks(n)
    u, v, ph, a, y, L = _to_lanes(ssm, resid, b)
    return run_kernel(u, v, ph, a, y, n)
