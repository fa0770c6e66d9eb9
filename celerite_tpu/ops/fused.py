"""Single fused Pallas TPU kernel for the GP log-likelihood.

Replaces the three-kernel pipeline of :mod:`ops.pallas_solver` with ONE
``pallas_call`` that keeps every carried state in VMEM for the whole
computation (reference hot path: cholesky.h:126-179 + 343-398, redesigned
as a two-phase block-parallel program):

- grid = (2, L): phase 0 streams the time axis once and accumulates each
  block's Riccati (A, J, C) element (the stable trajectory formulation of
  ops/blocked._block_elements); phase 1 streams it again running the
  factorization + forward-substitution statistics.
- The cross-block *prefix compositions* — the only sequential coupling
  between blocks — run **inside the kernel** as Hillis-Steele scans along
  the lane (block) axis at the two phase boundaries, so nothing round-trips
  to HBM between passes.
- Pass 3 of the old pipeline is gone: the forward substitution's dependence
  on the incoming block state h_in is affine, z_n = z0_n - g_n . h_in, so
  phase 1 accumulates the quadratic-form statistics
  (q0 = sum z0^2/d, qv = sum z0 g / d, Qm = sum g g^T / d) and the exact
  quadratic term is assembled per block at the end:
  quad_b = q0_b - 2 qv_b . h_b + h_b^T Qm_b h_b.

Layout: time-major ``(L, P, B)`` with the block axis B on lanes (B a power
of two, ideally >= 512).  HBM traffic is exactly two streams of the input
arrays; outputs are three scalars.

Exact same math as ops/blocked.gp_log_likelihood — agreement is tested in
tests/test_fused.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blocked
from .lower import SSM

__all__ = ["gp_log_likelihood", "default_num_blocks"]


def default_num_blocks(n, p=None):
    """Pick the lane-block count B (power of two).

    More blocks = shorter sequential depth per phase but more VMEM and
    longer in-kernel prefix scans.  Sweep-validated on v5e at N=1e6.

    The in-kernel Hillis-Steele prefix scans' unrolled stack grows
    ~log2(B) * P^2, so the cap is P-aware: B <= 4096 at P <= 4 (B=8192
    exceeds scoped VMEM on v5e), B <= 2048 at P <= 8 (17.4 MB reported
    at B=4096, P=8).  P > 8 dispatches to the split pipeline anyway.
    """
    cap = 4096 if (p is None or p <= 4) else 2048
    b = 256
    while b * 2 * 64 <= n and b < cap:
        b *= 2
    return b


# -- lane-batched small-matrix helpers (all arrays (P, P, B), lanes last) ----


def _mm(x, y):
    """(P,P,B) lane-batched matmul: out[i,j,b] = sum_k x[i,k,b] y[k,j,b].

    Slice-based indexing only — integer indexing on 3-D values lowers to
    gathers that Mosaic does not support.
    """
    p = x.shape[-3]
    acc = x[..., :, 0:1, :] * y[..., 0:1, :, :]
    for k in range(1, p):
        acc = acc + x[..., :, k:k + 1, :] * y[..., k:k + 1, :, :]
    return acc


def _tr(x):
    """Transpose the two small dims of (P, P, B)."""
    return jnp.swapaxes(x, 0, 1)


def _inv(m):
    """Unrolled Gauss-Jordan inverse of (P, P, B) along the small dims.

    Same rationale as ops/blocked._small_inv: the matrices are
    I + C J products with O(1) pivots; batched LU lowers pathologically
    on TPU while this is pure VPU arithmetic.
    """
    p = m.shape[0]
    b = m.shape[2]
    eye = jnp.broadcast_to(
        jnp.eye(p, dtype=m.dtype)[:, :, None], (p, p, b)
    )
    aug = jnp.concatenate([m, eye], axis=1)  # (P, 2P, B)
    row_ids = lax.broadcasted_iota(jnp.int32, (p, 2 * p, b), 0)
    for k in range(p):
        row = aug[k:k + 1, :, :] / aug[k:k + 1, k:k + 1, :]
        elim = aug - aug[:, k:k + 1, :] * row
        aug = jnp.where(row_ids == k, row, elim)
    return aug[:, p:, :]


def _shift_lanes(x, ident):
    """Shift one position along the lane axis; lane 0 becomes ``ident``."""
    b = x.shape[-1]
    rolled = jnp.concatenate([x[..., -1:], x[..., :-1]], axis=-1)
    lane = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane == 0, ident, rolled)


def _rolled(x, s):
    """Value at lane b comes from lane b - s (static s), circularly."""
    return jnp.concatenate([x[..., -s:], x[..., :-s]], axis=-1)


def _compose_elem(a1, j1, c1, a2, j2, c2, eye):
    """Riccati (A, J, C) composition, e1 first (ops/blocked._compose_full)."""
    e = _inv(eye + _mm(c1, j2))
    j2e = _mm(j2, e)
    a12 = _mm(a2, _mm(e, a1))
    c12 = _mm(_mm(a2, e), _mm(c1, _tr(a2))) + c2
    j12 = j1 + _mm(_tr(a1), _mm(j2e, a1))
    return a12, j12, c12


def _kernel(u_ref, v_ref, ph_ref, a_ref, y_ref,
            quad_out, ld_out, mind_out,
            Sh, Ac, Jc, Mc, mc, Qm, qv, q0, cq0, ld, cld, mind):
    """Two-phase fused kernel body.  See module docstring."""
    phase = pl.program_id(0)
    i = pl.program_id(1)
    L = pl.num_programs(1)
    p = u_ref.shape[1]
    b = u_ref.shape[2]
    dtype = Sh.dtype
    eye = jnp.broadcast_to(jnp.eye(p, dtype=dtype)[:, :, None], (p, p, b))

    # ---- phase 0: per-block Riccati elements ------------------------------
    @pl.when((phase == 0) & (i == 0))
    def _():
        Ac[:] = eye
        Jc[:] = jnp.zeros_like(Jc)
        Sh[:] = jnp.zeros_like(Sh)

    @pl.when(phase == 0)
    def _():
        u = u_ref[0]
        v = v_ref[0]
        ph = ph_ref[0]
        a = a_ref[0]

        A_c = Ac[:]

        # Zero-seeded factor recursion carries the element's C (stable).
        S = ph[:, None, :] * Sh[:] * ph[None, :, :]
        su = jnp.sum(S * u[None, :, :], axis=1)
        d = a - jnp.sum(u * su, axis=0, keepdims=True)
        w = (v - su) / d
        Sh[:] = S + d[None, :, :] * w[:, None, :] * w[None, :, :]

        # Closed-loop transition applied to A in rank-1 form; J as stable
        # rank-1 information sums (ops/blocked._block_elements docstring).
        # The transition simplifies exactly to (I - w u^T) Phi — the same
        # map that propagates the forward-substitution state: with
        # uG = Phi u (1 + u.su/d) = (a/d) Phi u, the v-correction column
        # becomes v (uAc/d) and Phi Ac + (su - v)(uAc/d)^T = Phi Ac
        # - w uAc^T since w = (v - su)/d.
        uAc = jnp.sum(A_c * (ph * u)[:, None, :], axis=0)
        Ac[:] = ph[:, None, :] * A_c - w[:, None, :] * uAc[None, :, :]
        Jc[:] = Jc[:] - uAc[:, None, :] * (uAc / d)[None, :, :]

    # ---- phase boundary: cross-block prefix, seed phase 1 -----------------
    @pl.when((phase == 1) & (i == 0))
    def _():
        # Inclusive Hillis-Steele scan of the (A, J, C) composition along
        # the lane/block axis, then exclusive shift: block b's seed is the
        # composition of blocks 0..b-1 applied to S-hat = 0, i.e. prefix C.
        A_s, J_s, C_s = Ac[:], Jc[:], Sh[:]
        s = 1
        while s < b:
            lane = lax.broadcasted_iota(jnp.int32, (p, p, b), 2)
            a2, j2, c2 = A_s, J_s, C_s
            a1, j1, c1 = _rolled(A_s, s), _rolled(J_s, s), _rolled(C_s, s)
            ca, cj, cc = _compose_elem(a1, j1, c1, a2, j2, c2, eye)
            keep = lane < s
            A_s = jnp.where(keep, A_s, ca)
            J_s = jnp.where(keep, J_s, cj)
            C_s = jnp.where(keep, C_s, cc)
            s *= 2
        Sh[:] = _shift_lanes(C_s, jnp.zeros_like(C_s))

        Mc[:] = eye
        mc[:] = jnp.zeros_like(mc)
        Qm[:] = jnp.zeros_like(Qm)
        qv[:] = jnp.zeros_like(qv)
        q0[:] = jnp.zeros_like(q0)
        cq0[:] = jnp.zeros_like(cq0)
        ld[:] = jnp.zeros_like(ld)
        cld[:] = jnp.zeros_like(cld)
        mind[:] = jnp.full_like(mind, jnp.inf)

    # ---- phase 1: factor + affine solve map + quadratic-form stats --------
    @pl.when(phase == 1)
    def _():
        u = u_ref[0]
        v = v_ref[0]
        ph = ph_ref[0]
        a = a_ref[0]
        y = y_ref[0]

        S = ph[:, None, :] * Sh[:] * ph[None, :, :]
        su = jnp.sum(S * u[None, :, :], axis=1)
        d = a - jnp.sum(u * su, axis=0, keepdims=True)
        w = (v - su) / d
        Sh[:] = S + d[None, :, :] * w[:, None, :] * w[None, :, :]

        # Affine solve map: h_n = M_n h_{n-1} + m_n with
        # M_n = (I - w u^T) Phi; g_n = (Phi u)^T M_cum is the sensitivity
        # of z_n to the block's incoming state.
        PhM = ph[:, None, :] * Mc[:]
        g = jnp.sum(u[:, None, :] * PhM, axis=0)  # (P, B)
        Mc[:] = PhM - w[:, None, :] * g[None, :, :]
        mh = ph * mc[:]
        z0 = y - jnp.sum(u * mh, axis=0, keepdims=True)  # (1, B)
        mc[:] = mh + w * z0

        # Quadratic-form statistics (Kahan-compensated scalars; the
        # (P,)-vector and (P,P)-matrix stats accumulate plainly — their
        # contributions enter once per block, not once per step).
        x1 = z0 * z0 / d - cq0[:]
        t1 = q0[:] + x1
        cq0[:] = (t1 - q0[:]) - x1
        q0[:] = t1
        x2 = jnp.log(d) - cld[:]
        t2 = ld[:] + x2
        cld[:] = (t2 - ld[:]) - x2
        ld[:] = t2
        qv[:] = qv[:] + (z0 / d) * g
        Qm[:] = Qm[:] + g[:, None, :] * (g / d)[None, :, :]
        mind[:] = jnp.minimum(mind[:], d)

    # ---- final: affine prefix -> h_in, assemble block quads, reduce -------
    @pl.when((phase == 1) & (i == L - 1))
    def _():
        M_s, m_s = Mc[:], mc[:]
        s = 1
        while s < b:
            lane_m = lax.broadcasted_iota(jnp.int32, (p, p, b), 2)
            lane_v = lax.broadcasted_iota(jnp.int32, (p, b), 1)
            m1, v1 = _rolled(M_s, s), _rolled(m_s, s)
            cm = _mm(M_s, m1)
            cv = jnp.sum(M_s * v1[None, :, :], axis=1) + m_s
            M_s = jnp.where(lane_m < s, M_s, cm)
            m_s = jnp.where(lane_v < s, m_s, cv)
            s *= 2
        h = _shift_lanes(m_s, jnp.zeros_like(m_s))  # (P, B) exclusive

        Qh = jnp.sum(Qm[:] * h[None, :, :], axis=1)  # (P, B)
        quad_b = (
            q0[:] + cq0[:]
            - 2.0 * jnp.sum(qv[:] * h, axis=0, keepdims=True)
            + jnp.sum(h * Qh, axis=0, keepdims=True)
        )
        quad_out[:] = jnp.sum(quad_b).reshape(1, 1)
        ld_out[:] = jnp.sum(ld[:] + cld[:]).reshape(1, 1)
        mind_out[:] = jnp.min(mind[:]).reshape(1, 1)


def _to_lanes(ssm: SSM, resid, num_blocks):
    """Pad to B * L and lay out time-major (L, P, B), lanes = blocks."""
    n, p = ssm.U.shape
    b = num_blocks
    L = -(-n // b)
    pad = b * L - n
    U, V, phi, A = ssm.U, ssm.V, ssm.phi, ssm.A
    if pad:
        zU = jnp.zeros((pad, p), U.dtype)
        U = jnp.concatenate([U, zU])
        V = jnp.concatenate([V, zU])
        phi = jnp.concatenate([phi, jnp.ones((pad, p), U.dtype)])
        A = jnp.concatenate([A, jnp.ones((pad,), A.dtype)])
        resid = jnp.concatenate([resid, jnp.zeros((pad,), resid.dtype)])

    def tm(x):  # (B*L, p) -> (L, p, B)
        return x.reshape(b, L, p).transpose(1, 2, 0)

    def tm1(x):  # (B*L,) -> (L, 1, B)
        return x.reshape(b, L).transpose(1, 0)[:, None, :]

    return tm(U), tm(V), tm(phi), tm1(A), tm1(resid), L


def run_kernel(u, v, ph, a, y, n, interpret=False):
    """Invoke the fused kernel on pre-laned (L, P, B) inputs.

    Returns (ll, ok).  ``n`` is the unpadded point count (for the 2 pi
    normalization).  No AD rule — wrap via gp_log_likelihood or supply
    your own (ops/lanes.py, ops/tangent.py).

    Wide models (P > 8) route to the split two-kernel pipeline
    (ops/adjoint.run_kernel): the in-kernel prefix scans below exceed
    scoped VMEM at large P (their unrolled composition temporaries grow
    ~P^2 per scan step).
    """
    L, p, b = u.shape
    dtype = u.dtype

    if p > 8 and not interpret:
        from . import pallas_solver

        return pallas_solver.run_from_lanes(u, v, ph, a, y, n)

    step = pl.BlockSpec((1, p, b), lambda ph_, i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    step1 = pl.BlockSpec((1, 1, b), lambda ph_, i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((1, 1), lambda ph_, i: (0, 0),
                        memory_space=pltpu.VMEM)

    quad, ld, mind = pl.pallas_call(
        _kernel,
        grid=(2, L),
        in_specs=[step, step, step, step1, step1],
        out_specs=[scal, scal, scal],
        out_shape=[jax.ShapeDtypeStruct((1, 1), dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((p, p, b), dtype),  # Sh
            pltpu.VMEM((p, p, b), dtype),  # Ac
            pltpu.VMEM((p, p, b), dtype),  # Jc
            pltpu.VMEM((p, p, b), dtype),  # Mc
            pltpu.VMEM((p, b), dtype),     # mc
            pltpu.VMEM((p, p, b), dtype),  # Qm
            pltpu.VMEM((p, b), dtype),     # qv
            pltpu.VMEM((1, b), dtype),     # q0
            pltpu.VMEM((1, b), dtype),     # cq0
            pltpu.VMEM((1, b), dtype),     # ld
            pltpu.VMEM((1, b), dtype),     # cld
            pltpu.VMEM((1, b), dtype),     # mind
        ],
        interpret=interpret,
    )(u, v, ph, a, y)

    ll = -0.5 * (
        quad[0, 0]
        + ld[0, 0]
        + n * jnp.log(2.0 * jnp.pi).astype(dtype)
    )
    ok = (mind[0, 0] > 0) & jnp.isfinite(ll)
    return jnp.where(ok, ll, -jnp.inf), ok


def _gp_log_likelihood_impl(ssm: SSM, resid, num_blocks=None,
                            interpret=False):
    n, p = ssm.U.shape
    b = num_blocks or default_num_blocks(n, p)
    if b & (b - 1):
        raise ValueError("num_blocks must be a power of two")
    u, v, ph, a, y, L = _to_lanes(ssm, resid, b)
    return run_kernel(u, v, ph, a, y, n, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gp_log_likelihood(ssm: SSM, resid, num_blocks=None, interpret=False):
    """Differentiable fused-Pallas GP log-likelihood: (ll, ok).

    Forward: the single fused kernel.  Backward: reverse-mode through the
    mathematically identical lax blocked implementation (exact, block-
    parallel); use :mod:`ops.tangent` for the fast forward-mode gradient.
    """
    return _gp_log_likelihood_impl(
        ssm, resid, num_blocks=num_blocks, interpret=interpret
    )


def _ll_fwd(ssm, resid, num_blocks, interpret):
    out = _gp_log_likelihood_impl(
        ssm, resid, num_blocks=num_blocks, interpret=interpret
    )
    return out, (ssm, resid)


def _ll_bwd(num_blocks, interpret, res, g):
    ssm, resid = res
    g_ll, _ = g

    def ll_only(ssm, resid):
        ll, _ = blocked.gp_log_likelihood(ssm, resid)
        return ll

    _, vjp = jax.vjp(ll_only, ssm, resid)
    d_ssm, d_resid = vjp(g_ll)
    return d_ssm, d_resid


gp_log_likelihood.defvjp(_ll_fwd, _ll_bwd)
