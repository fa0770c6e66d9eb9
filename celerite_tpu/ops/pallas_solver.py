"""Pallas TPU kernels for the block-parallel semiseparable solver.

Same three-pass algorithm as ops/blocked.py, but each pass is a single
Pallas kernel: the per-step state (the (P, P) Riccati element / factor
carry, replicated across all B blocks) lives in VMEM scratch for the whole
kernel, inputs stream from HBM one time-step at a time through the
automatic grid pipeline, and the lane dimension is the block axis B so
every VPU op is (P, P, B)-wide.  This removes the per-step XLA loop
overhead and HBM carry round-trips that dominate the lax.scan version.

Layout: time-step-major ``(L, P, B)`` (lanes = B), produced by
``_to_blocked_layout``.  The tiny cross-block prefix compositions (B
elements) stay in plain JAX between kernels.

Exact same math as ops/blocked.py — agreement is tested in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
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

__all__ = ["gp_log_likelihood", "available"]


def available():
    return True


def _to_blocked_layout(ssm: SSM, resid, L):
    """Pad to B*L and reshape to time-major (L, ..., B) layout."""
    n, p = ssm.U.shape
    b = -(-n // L)
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

    return tm(U), tm(V), tm(phi), tm1(A), tm1(resid), b, pad


def _elements_kernel(u_ref, v_ref, ph_ref, a_ref, A_out, J_out, C_out,
                     Ac, Jc, Sh):
    """Pass 1: per-block Riccati elements, trajectory formulation.

    Same stable formulation as ops/blocked._block_elements: C carried by
    the zero-seeded factor recursion, A as a product of closed-loop
    transitions, J as stable rank-1 sums (see that docstring for why the
    naive composition chain is unstable in f32).
    """
    i = pl.program_id(0)
    p = u_ref.shape[1]

    @pl.when(i == 0)
    def _():
        eye = jnp.eye(p, dtype=Ac.dtype)[:, :, None]
        Ac[:] = jnp.broadcast_to(eye, Ac.shape)
        Jc[:] = jnp.zeros_like(Jc)
        Sh[:] = jnp.zeros_like(Sh)

    u = u_ref[0]  # (P, B)
    v = v_ref[0]
    ph = ph_ref[0]
    a = a_ref[0]  # (1, B)

    A_c, J_c = Ac[:], Jc[:]

    # Zero-seeded factor recursion (stable C carry).
    S = ph[:, None, :] * Sh[:] * ph[None, :, :]
    su = jnp.sum(S * u[None, :, :], axis=1)  # (P, B)
    d = a - jnp.sum(u * su, axis=0, keepdims=True)  # (1, B)
    w = (v - su) / d
    Sh[:] = S + d[None, :, :] * w[:, None, :] * w[None, :, :]

    # Closed-loop transition F = (I - v u^T/a)(diag(ph) + su ut^T/d),
    # which simplifies exactly to (I - w u^T) Phi (see ops/blocked).
    ut = ph * u
    uAc = jnp.sum(A_c * ut[:, None, :], axis=0)  # ut^T A_c, (P, B)
    A_new = ph[:, None, :] * A_c - w[:, None, :] * uAc[None, :, :]

    # Information accumulation.
    J_new = J_c - uAc[:, None, :] * (uAc / d)[None, :, :]

    Ac[:] = A_new
    Jc[:] = J_new

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        A_out[:] = A_new
        J_out[:] = J_new
        C_out[:] = Sh[:]


def _factor_kernel(sh0_ref, u_ref, v_ref, ph_ref, a_ref, y_ref,
                   d_out, w_out, M_out, m_out, Sh, Mc, mc):
    """Pass 2: factor + affine solve maps, seeded by S_hat_in per block."""
    i = pl.program_id(0)
    p = u_ref.shape[1]

    @pl.when(i == 0)
    def _():
        Sh[:] = sh0_ref[:]
        eye = jnp.eye(p, dtype=Mc.dtype)[:, :, None]
        Mc[:] = jnp.broadcast_to(eye, Mc.shape)
        mc[:] = jnp.zeros_like(mc)

    u = u_ref[0]
    v = v_ref[0]
    ph = ph_ref[0]
    a = a_ref[0]
    y = y_ref[0]

    S = ph[:, None, :] * Sh[:] * ph[None, :, :]
    su = jnp.sum(S * u[None, :, :], axis=1)  # (P, B)
    d = a - jnp.sum(u * su, axis=0, keepdims=True)  # (1, B)
    w = (v - su) / d
    Sh[:] = S + d[None, :, :] * w[:, None, :] * w[None, :, :]

    PhM = ph[:, None, :] * Mc[:]
    uPhM = jnp.sum(u[:, None, :] * PhM, axis=0)  # (P, B)
    Mc[:] = PhM - w[:, None, :] * uPhM[None, :, :]
    mh = ph * mc[:]
    mc[:] = mh - w * jnp.sum(u * mh, axis=0, keepdims=True) + w * y

    d_out[0] = d
    w_out[0] = w

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        M_out[:] = Mc[:]
        m_out[:] = mc[:]


def _subst_kernel(h0_ref, u_ref, ph_ref, w_ref, y_ref, d_ref,
                  quad_out, logdet_out, mind_out, h, quad, cq, logdet, cl,
                  mind):
    """Pass 3: forward substitution + per-block Kahan reductions."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h[:] = h0_ref[:]
        quad[:] = jnp.zeros_like(quad)
        cq[:] = jnp.zeros_like(cq)
        logdet[:] = jnp.zeros_like(logdet)
        cl[:] = jnp.zeros_like(cl)
        mind[:] = jnp.full_like(mind, jnp.inf)

    u = u_ref[0]
    ph = ph_ref[0]
    w = w_ref[0]
    y = y_ref[0]
    d = d_ref[0]

    f = ph * h[:]
    z = y - jnp.sum(u * f, axis=0, keepdims=True)
    h[:] = f + w * z

    # Compensated accumulation (see ops/blocked.py pass 3).
    x1 = z * z / d - cq[:]
    t1 = quad[:] + x1
    cq[:] = (t1 - quad[:]) - x1
    quad[:] = t1
    x2 = jnp.log(d) - cl[:]
    t2 = logdet[:] + x2
    cl[:] = (t2 - logdet[:]) - x2
    logdet[:] = t2

    mind[:] = jnp.minimum(mind[:], d)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        quad_out[:] = quad[:] + cq[:]
        logdet_out[:] = logdet[:] + cl[:]
        mind_out[:] = mind[:]


def _run_elements(u, v, ph, a, interpret):
    L, p, b = u.shape
    dtype = u.dtype
    step = lambda name: pl.BlockSpec(
        (1, p, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    step1 = pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec((p, p, b), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((p, p, b), dtype)] * 3
    return pl.pallas_call(
        _elements_kernel,
        grid=(L,),
        in_specs=[step("u"), step("v"), step("ph"), step1],
        out_specs=[full, full, full],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((p, p, b), dtype)] * 3,
        interpret=interpret,
    )(u, v, ph, a)


def _run_factor(sh0, u, v, ph, a, y, interpret):
    L, p, b = u.shape
    dtype = u.dtype
    step = pl.BlockSpec((1, p, b), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    step1 = pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    full_pp = pl.BlockSpec((p, p, b), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    full_p = pl.BlockSpec((p, b), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _factor_kernel,
        grid=(L,),
        in_specs=[full_pp, step, step, step, step1, step1],
        out_specs=[step1, step, full_pp, full_p],
        out_shape=[
            jax.ShapeDtypeStruct((L, 1, b), dtype),
            jax.ShapeDtypeStruct((L, p, b), dtype),
            jax.ShapeDtypeStruct((p, p, b), dtype),
            jax.ShapeDtypeStruct((p, b), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((p, p, b), dtype),
            pltpu.VMEM((p, p, b), dtype),
            pltpu.VMEM((p, b), dtype),
        ],
        interpret=interpret,
    )(sh0, u, v, ph, a, y)


def _run_subst(h0, u, ph, w, y, d, interpret):
    L, p, b = u.shape
    dtype = u.dtype
    step = pl.BlockSpec((1, p, b), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    step1 = pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    full_p = pl.BlockSpec((p, b), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    full_1 = pl.BlockSpec((1, b), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _subst_kernel,
        grid=(L,),
        in_specs=[full_p, step, step, step, step1, step1],
        out_specs=[full_1, full_1, full_1],
        out_shape=[jax.ShapeDtypeStruct((1, b), dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((p, b), dtype),
            pltpu.VMEM((1, b), dtype),
            pltpu.VMEM((1, b), dtype),
            pltpu.VMEM((1, b), dtype),
            pltpu.VMEM((1, b), dtype),
            pltpu.VMEM((1, b), dtype),
        ],
        interpret=interpret,
    )(h0, u, ph, w, y, d)


def run_from_lanes(u, v, ph, a, y, n, interpret=False):
    """Three-pass pipeline on pre-laned (L, P, B) inputs -> (ll, ok).

    The save-free primal for models too wide for the single fused
    kernel's in-VMEM prefix scans (ops/fused.run_kernel dispatches here
    at P > 8); ops/adjoint.py provides the differentiable variant.
    """
    dtype = u.dtype
    Ab, Jb, Cb = _run_elements(u, v, ph, a, interpret)
    elems = tuple(x.transpose(2, 0, 1) for x in (Ab, Jb, Cb))
    pref = blocked._exclusive_prefix_elements(elems)
    sh0 = pref[2].transpose(1, 2, 0)

    d, w, Mb, mb = _run_factor(sh0, u, v, ph, a, y, interpret)
    M = Mb.transpose(2, 0, 1)
    m = mb.transpose(1, 0)
    Mp, mp = blocked._exclusive_prefix_affine(M, m)
    h0 = mp.transpose(1, 0)

    quad, logdet, mind = _run_subst(h0, u, ph, w, y, d, interpret)

    ll = -0.5 * (
        jnp.sum(quad)
        + jnp.sum(logdet)
        + n * jnp.log(2.0 * jnp.pi).astype(dtype)
    )
    ok = (jnp.min(mind) > 0) & jnp.isfinite(ll)
    return jnp.where(ok, ll, -jnp.inf), ok


def _gp_log_likelihood_impl(ssm: SSM, resid, block_size=256,
                            interpret=False):
    """Fused Pallas GP log-likelihood; same semantics as blocked version.

    ``block_size`` is L (the sequential depth per kernel); B = ceil(N/L)
    blocks ride the lane dimension.
    """
    n, p = ssm.U.shape
    u, v, ph, a, y, b, pad = _to_blocked_layout(ssm, resid, block_size)
    dtype = u.dtype

    # Pass 1 + cross-block prefix.
    Ab, Jb, Cb = _run_elements(u, v, ph, a, interpret)
    elems = tuple(x.transpose(2, 0, 1) for x in (Ab, Jb, Cb))  # (B, P, P)
    pref = blocked._exclusive_prefix_elements(elems)
    sh0 = pref[2].transpose(1, 2, 0)  # C of prefix = S_hat_in, (P, P, B)

    # Pass 2 + cross-block affine prefix.
    d, w, Mb, mb = _run_factor(sh0, u, v, ph, a, y, interpret)
    M = Mb.transpose(2, 0, 1)  # (B, P, P)
    m = mb.transpose(1, 0)  # (B, P)
    Mp, mp = blocked._exclusive_prefix_affine(M, m)
    h0 = mp.transpose(1, 0)  # (P, B)

    # Pass 3 + reduction.
    quad, logdet, mind = _run_subst(h0, u, ph, w, y, d, interpret)

    ll = -0.5 * (
        jnp.sum(quad)
        + jnp.sum(logdet)
        + n * jnp.log(2.0 * jnp.pi).astype(dtype)
    )
    ok = (jnp.min(mind) > 0) & jnp.isfinite(ll)
    return jnp.where(ok, ll, -jnp.inf), ok


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gp_log_likelihood(ssm: SSM, resid, block_size=256, interpret=False):
    """Differentiable Pallas GP log-likelihood.

    Forward: the fused Pallas kernels.  Backward: reverse-mode through the
    mathematically identical lax blocked implementation (Pallas kernels
    have no automatic AD) — one recomputed forward plus the block-parallel
    backward sweep, so gradients stay exact and block-parallel.
    """
    return _gp_log_likelihood_impl(
        ssm, resid, block_size=block_size, interpret=interpret
    )


def _ll_fwd(ssm, resid, block_size, interpret):
    out = _gp_log_likelihood_impl(
        ssm, resid, block_size=block_size, interpret=interpret
    )
    return out, (ssm, resid)


def _ll_bwd(block_size, interpret, res, g):
    ssm, resid = res
    g_ll, _ = g

    def ll_only(ssm, resid):
        ll, ok = blocked.gp_log_likelihood(
            ssm, resid, block_size=block_size
        )
        return ll

    _, vjp = jax.vjp(ll_only, ssm, resid)
    d_ssm, d_resid = vjp(g_ll)
    return d_ssm, d_resid


gp_log_likelihood.defvjp(_ll_fwd, _ll_bwd)
