"""Block-parallel semiseparable solver with double-single arithmetic.

The ``precision="ds"`` backend of :meth:`GP.build_loglik`.  Identical
algorithm to :mod:`celerite_tpu.ops.blocked` (two-level Riccati-element
blocking; see that module's derivation), but BOTH the input streams and
every recursion carry — the S-hat state, the cumulative (A, J) element,
the affine solve maps (M, m), the forward-substitution state h, and the
quad/logdet accumulators — are double-single (f32+f32, ~48-bit) values
from :mod:`celerite_tpu.ops.dsa` / :mod:`celerite_tpu.ops.dslower`.

Why: round-3 measurements (ROADMAP "float32 accuracy") showed the f32
recursion + f32 lowering are the error floor — on adversarially
mis-fitted N=1e6 configs the f32 gradient deviates from f64 by 20-30%
of its norm on near-cancelling components, and ill-conditioned rank>=64
stacks (summed variance >> diag) flip pivots in f32 on *both* the
sequential and blocked backends.  A compose-only ds carry was refuted in
round 3; measurements this round showed a ds *carry* alone is also not
enough (the f32 lowering's per-point rounding incoherently perturbs the
represented matrix), hence ds end-to-end.

The reference bar is hardware float64
(/root/reference/cpp/include/celerite/solver/cholesky.h:41-210); on TPU
this double-single path is the native equivalent.  Gradients come from
jax AD straight through the ds arithmetic (the compensation chains are
bilinear, so AD is exact through them), with scan residual saves.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from . import dsa
from .dsa import DS
from .blocked import _small_inv, default_block_size
from .dslower import SSMDS, promote_ssm
from .lower import SSM

__all__ = ["gp_log_likelihood", "default_block_size"]


def _eye(p, dtype):
    return jnp.eye(p, dtype=dtype)


def _col(x: DS) -> DS:
    return DS(x.hi[..., :, None], x.lo[..., :, None])


def _row(x: DS) -> DS:
    return DS(x.hi[..., None, :], x.lo[..., None, :])


def _bcast(x: DS, shape) -> DS:
    return DS(jnp.broadcast_to(x.hi, shape), jnp.broadcast_to(x.lo, shape))


def _pad_blocks_ds(ssm: SSMDS, resid, L):
    """Pad to a multiple of L with inert rows (A=1, U=V=0, phi=1, y=0)."""
    n, p = ssm.U.hi.shape
    b = -(-n // L)
    pad = b * L - n
    dtype = ssm.U.hi.dtype

    def padf(x, const):
        z = jnp.full((pad,) + x.shape[1:], const, dtype)
        return jnp.concatenate([x, z], axis=0)

    if pad:
        ssm = SSMDS(
            U=DS(padf(ssm.U.hi, 0), padf(ssm.U.lo, 0)),
            V=DS(padf(ssm.V.hi, 0), padf(ssm.V.lo, 0)),
            phi=DS(padf(ssm.phi.hi, 1), padf(ssm.phi.lo, 0)),
            A=DS(padf(ssm.A.hi, 1), padf(ssm.A.lo, 0)),
        )
        if resid is not None:
            resid = jnp.concatenate(
                [resid, jnp.zeros((pad,), resid.dtype)]
            )

    def blkify(x: DS, *shape):
        return DS(x.hi.reshape(*shape), x.lo.reshape(*shape))

    blk = SSMDS(
        U=blkify(ssm.U, b, L, p),
        V=blkify(ssm.V, b, L, p),
        phi=blkify(ssm.phi, b, L, p),
        A=blkify(ssm.A, b, L),
    )
    if resid is not None:
        resid = resid.reshape(b, L)
    return blk, resid, b, pad


def _compose_full_ds(e1, e2):
    """ds Riccati (A, J, C) composition; e1 acts first.

    The (I + C1 J2) inverse is seeded by the f32 unrolled Gauss-Jordan
    and Newton-refined once in ds (dsa.refine_inv) — full ds accuracy at
    ~3 ds-matmuls instead of a ds elimination chain.
    """
    A1, J1, C1 = e1
    A2, J2, C2 = e2
    p = A1.hi.shape[-1]
    eyeb = jnp.broadcast_to(_eye(p, A1.hi.dtype), A1.hi.shape)
    M = dsa.add_f(dsa.matmul(C1, J2), eyeb)
    E = dsa.refine_inv(M, _small_inv(M.hi + M.lo))
    A12 = dsa.matmul(A2, dsa.matmul(E, A1))
    tr = lambda x: DS(
        jnp.swapaxes(x.hi, -1, -2), jnp.swapaxes(x.lo, -1, -2)
    )
    C12 = dsa.add(
        dsa.matmul(dsa.matmul(A2, E), dsa.matmul(C1, tr(A2))), C2
    )
    J12 = dsa.add(J1, dsa.matmul(tr(A1), dsa.matmul(dsa.matmul(J2, E), A1)))
    return (A12, J12, C12)


def _step_factor_ds(Sh: DS, u: DS, v: DS, ph: DS, a: DS):
    """One ds factor step: returns (Sh_new, S, su, d, w); all ds."""
    # S = Phi Sh Phi (diagonal Phi: row and column scale)
    S = dsa.mul(dsa.mul(Sh, _col(ph)), _row(ph))
    # su = S u
    su = dsa.sum_axis(dsa.mul(S, _row(u)), -1)
    # d = a - u . su
    d = dsa.add(dsa.neg(dsa.sum_axis(dsa.mul(su, u), -1)), a)
    # w = (v - su) / d
    w = dsa.div(dsa.add(dsa.neg(su), v), _bcast(d, su.hi.shape))
    # Sh' = S + d w w^T
    dww = dsa.mul(dsa.outer(w, w), _bcast(d, S.hi.shape))
    return dsa.add(S, dww), S, su, d, w


def _block_elements_ds(blk: SSMDS):
    """Per-block cumulative (A, J, C) ds elements (trajectory form).

    Mirrors blocked._block_elements: C is the zero-seeded S-hat carry,
    A accumulates closed-loop transitions (I - w u^T) Phi, J a sum of
    stable rank-1 terms — all in ds.
    """
    p = blk.U.hi.shape[-1]
    dtype = blk.U.hi.dtype

    def one_block(U, V, phi, A):
        def step(carry, inp):
            Ac, Jc, Sh = carry
            u, v, ph, a = inp
            Sh_new, S, su, d, w = _step_factor_ds(Sh, u, v, ph, a)

            ut = dsa.mul(ph, u)
            # uAc = Ac^T ut (sum over the row axis)
            uAc = dsa.sum_axis(dsa.mul(Ac, _col(ut)), 0)
            Anew = dsa.add(
                dsa.mul(Ac, _col(ph)), dsa.neg(dsa.outer(w, uAc))
            )
            Jnew = dsa.add(
                Jc,
                dsa.neg(
                    dsa.div(
                        dsa.outer(uAc, uAc),
                        _bcast(d, (p, p)),
                    )
                ),
            )
            return (Anew, Jnew, Sh_new), None

        zero = dsa.from_f32(jnp.zeros((p, p), dtype))
        init = (dsa.from_f32(_eye(p, dtype)), zero, zero)
        (Ab, Jb, Cb), _ = lax.scan(step, init, (U, V, phi, A))
        return Ab, Jb, Cb

    return jax.vmap(one_block)(blk.U, blk.V, blk.phi, blk.A)


def _exclusive_prefix_elements_ds(elems):
    A, J, C = elems
    p = A.hi.shape[-1]
    incl = lax.associative_scan(_compose_full_ds, (A, J, C), axis=0)
    eye = dsa.from_f32(
        jnp.broadcast_to(_eye(p, A.hi.dtype), (1, p, p))
    )
    zero = dsa.from_f32(jnp.zeros((1, p, p), A.hi.dtype))

    def shift(init, inc):
        return DS(
            jnp.concatenate([init.hi, inc.hi[:-1]], axis=0),
            jnp.concatenate([init.lo, inc.lo[:-1]], axis=0),
        )

    return tuple(
        shift(init, inc) for init, inc in zip((eye, zero, zero), incl)
    )


def _affine_compose_ds(e1, e2):
    M1, m1 = e1
    M2, m2 = e2
    return (
        dsa.matmul(M2, M1),
        dsa.add(dsa.matvec(M2, m1), m2),
    )


def _exclusive_prefix_affine_ds(M: DS, m: DS):
    p = M.hi.shape[-1]
    incl = lax.associative_scan(_affine_compose_ds, (M, m), axis=0)
    eye = dsa.from_f32(jnp.broadcast_to(_eye(p, M.hi.dtype), (1, p, p)))
    zero = dsa.from_f32(jnp.zeros((1, p), M.hi.dtype))
    Mi, mi = incl
    Mp = DS(
        jnp.concatenate([eye.hi, Mi.hi[:-1]], axis=0),
        jnp.concatenate([eye.lo, Mi.lo[:-1]], axis=0),
    )
    mp = DS(
        jnp.concatenate([zero.hi, mi.hi[:-1]], axis=0),
        jnp.concatenate([zero.lo, mi.lo[:-1]], axis=0),
    )
    return Mp, mp


def gp_log_likelihood(ssm, resid, block_size=None):
    """(ll, ok) with ds streams and carries; same semantics as blocked.

    ``ssm`` may be a plain f32 :class:`SSM` (promoted with zero lo
    parts) or an :class:`SSMDS` from :func:`dslower.lower_ds`.
    Differentiable by plain jax AD (scan residuals); the compensation
    chains are exact under AD, so the returned gradient is the exact
    gradient of the ds-computed value.
    """
    if isinstance(ssm, SSM):
        ssm = promote_ssm(ssm)
    n, p = ssm.U.hi.shape
    L = block_size or default_block_size(n)
    blk, y_blk, b, pad = _pad_blocks_ds(ssm, resid, L)
    dtype = ssm.U.hi.dtype

    # Pass 1: ds block elements + ds cross-block prefix -> incoming S-hat.
    elems = _block_elements_ds(blk)
    pref = _exclusive_prefix_elements_ds(elems)
    S_hat_in = pref[2]

    # Pass 2: factor + affine solve maps per block, all carries ds.
    def pass2(U, V, phi, A, y, Sh):
        def step(carry, inp):
            Sh, Mc, mc = carry
            u, v, ph, a, yn = inp
            Sh_new, S, su, d, w = _step_factor_ds(Sh, u, v, ph, a)
            # M' = (I - w u^T) Phi M ; m' = (I - w u^T) Phi m + w y
            PhM = dsa.mul(Mc, _col(ph))
            uPhM = dsa.sum_axis(dsa.mul(PhM, _col(u)), 0)
            Mc = dsa.add(PhM, dsa.neg(dsa.outer(w, uPhM)))
            mh = dsa.mul(mc, ph)
            umh = dsa.sum_axis(dsa.mul(mh, u), -1)
            z = dsa.add_f(dsa.neg(umh), yn)
            mc = dsa.add(mh, dsa.mul(w, z))  # scalar z broadcasts
            return (Sh_new, Mc, mc), (d, w)

        init = (
            Sh,
            dsa.from_f32(_eye(p, dtype)),
            dsa.from_f32(jnp.zeros((p,), dtype)),
        )
        (_, Mb, mb), (D, W) = lax.scan(step, init, (U, V, phi, A, y))
        return Mb, mb, D, W

    M, m, D, W = jax.vmap(pass2)(
        blk.U, blk.V, blk.phi, blk.A, y_blk, S_hat_in
    )

    # Cross-block ds prefix of the affine maps -> incoming h per block.
    _, h_in = _exclusive_prefix_affine_ds(M, m)

    # Pass 3: z + ds-compensated reductions.
    def pass3(U, phi, W, y, D, h):
        def step(carry, inp):
            h, quad, logdet, min_d = carry
            u, ph, w, yn, d = inp
            f = dsa.mul(h, ph)
            uf = dsa.sum_axis(dsa.mul(f, u), -1)
            z = dsa.add_f(dsa.neg(uf), yn)
            h = dsa.add(f, dsa.mul(w, z))  # scalar z broadcasts
            quad = dsa.add(quad, dsa.div(dsa.mul(z, z), d))
            logdet = dsa.add(logdet, dsa.log_ds(d))
            min_d = jnp.minimum(min_d, d.hi)
            return (h, quad, logdet, min_d), None

        zero = dsa.from_f32(jnp.zeros((), dtype))
        init = (h, zero, zero, jnp.asarray(jnp.inf, dtype))
        (h, quad, logdet, min_d), _ = lax.scan(
            step, init, (U, phi, W, y, D)
        )
        return quad, logdet, min_d

    quad_b, logdet_b, min_d = jax.vmap(pass3)(
        blk.U, blk.phi, W, y_blk, D, h_in
    )

    # Cross-block ds reduction of the scalars.
    total = dsa.add(
        dsa.sum_axis(quad_b, 0), dsa.sum_axis(logdet_b, 0)
    )
    const = n * math.log(2.0 * math.pi)
    ll = -0.5 * (dsa.to_f32(total) + jnp.asarray(const, dtype))
    ok = (jnp.min(min_d) > 0) & jnp.isfinite(lax.stop_gradient(ll))
    ll = jnp.where(ok, ll, -jnp.inf)
    return ll, ok
