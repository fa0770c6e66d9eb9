"""Full-tile (4-D) lane plan: statics shaped ``(L, 8, W)`` for in-kernel lowering.

Round-2 profiling on v5e showed the fused pipeline's time was dominated not
by the recursion kernels (~0.1-0.2 ms at N=1e6) but by the XLA-side
coefficient lowering (~1.7 ms): arrays shaped ``(L, 1, B)`` force XLA into
``T(1,128)`` tilings (1 of 8 sublanes used) for the transcendental-heavy
phase/decay math, and the column interleave into ``(L, P, B)`` costs several
strided-copy fusions on top.

This module is the fix: the *block* (virtual-lane) axis is laid out across
both sublanes and lanes as ``(8, W)`` with ``W = B/8``, every array carries
those as its minor dims (always full ``(8, 128)`` tiles), and the
coefficient lowering moves **inside** the Pallas kernels (ops/fused4.py) as
pure VPU math per streamed step — no XLA assembly, no strided interleaves,
no separate lowering pass over HBM.

Virtual-lane order: lane ``l = r * W + c`` (sublane-major), so block ``l``
owns the contiguous time chunk ``[l*L, (l+1)*L)`` exactly like
ops/fused._to_lanes.  The cross-block prefix scans roll along ``l`` with a
two-axis roll (lane shift + sublane borrow, ops/fused4._rolled).

The per-dataset statics (time grid incl. double-single lo parts, spacings,
mask, diag, data) are built host-side in float64 exactly as ops/lanes
(make_plan's padding/spacing contract is shared); only the layout differs.

Reference analog: cholesky.h:103-152 builds (U, V, phi, A) row by row
inside the factorization loop — the same fusion of lowering into the hot
loop, done here the TPU way.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .lower import Coefficients

__all__ = ["Plan4", "make_plan4", "pack_cf", "cf_len", "default_num_blocks4",
           "fold_lanes"]

SUB = 8  # sublane count of an f32 tile


class Plan4(NamedTuple):
    """Static per-dataset arrays in full-tile lane layout ``(L, 8, W)``."""

    t: jnp.ndarray      # f32 time grid (hi part)
    t_lo: jnp.ndarray   # double-single lo part of the f64 grid
    dt: jnp.ndarray     # exact spacings; 0 at the global start and on pad
    diag: jnp.ndarray   # per-point variance (yerr^2), 0 on pad
    y: jnp.ndarray      # data, 0 on pad
    mask: jnp.ndarray   # 1.0 on real rows, 0.0 on pad
    n: int              # unpadded point count (static)
    num_blocks: int     # B = 8 * W virtual lanes (static)


def default_num_blocks4(n, p=None):
    """Virtual-lane count for the 4-D kernels (power of two, >= 1024).

    The (8, W) minor dims need W = B/8 >= 128 for full-width vector
    tiles, so B >= 1024 always.  Beyond that: enough blocks to shorten
    the sequential depth, capped P-aware (VMEM; v5e sweep at N=1e6:
    the gradient pipeline peaks at B=8192 for P <= 4 — the primal alone
    keeps improving to 16384 — at 2048 for P = 8, and at 1024 for the
    wide P <= 12 models, whose unrolled (P, P) temporaries need the
    raised Mosaic VMEM limit, ops/fused4._cparams).
    """
    if p is None or p <= 4:
        cap = 8192
    elif p <= 8:
        cap = 2048
    else:
        cap = 1024
    b = 1024
    while b * 2 * 64 <= n and b < cap:
        b *= 2
    return b


def _lane4(x64, b, L, dtype=np.float32):
    """(B*L,) host array -> (L, 8, W) with virtual lane l = r*W + c."""
    w = b // SUB
    return np.ascontiguousarray(
        np.asarray(x64, dtype).reshape(SUB, w, L).transpose(2, 0, 1)
    )


def make_plan4(t, y, diag, num_blocks, dtype=np.float32,
               n_chain=1) -> Plan4:
    """Host-side plan construction from float64 inputs.

    Padding/spacing contract matches ops/lanes.make_plan: spacings are
    differenced in f64; every block's first row keeps its true spacing
    (blocks are seeded by the cross-block prefix, not by resetting the
    recursion); only the global first point and pad rows get dt = 0.

    ``n_chain > 1`` builds a *chain-folded* plan: the dataset's
    ``num_blocks``-lane layout is tiled ``n_chain`` times along the
    virtual-lane axis (total lanes = n_chain * num_blocks), so one
    kernel launch evaluates n_chain independent models of the same data
    — the batch axis for vmapped samplers lives on lanes instead of a
    serialized outer pallas grid.  The cross-block prefix scans segment
    at chain boundaries (ops/fused4).
    """
    b = int(num_blocks)
    nc = int(n_chain)
    if b & (b - 1) or b % SUB:
        raise ValueError("num_blocks must be a power of two >= 8")
    if nc & (nc - 1) or nc < 1:
        raise ValueError("n_chain must be a power of two")
    t = np.asarray(t, np.float64)
    y = np.asarray(y, np.float64)
    diag = np.asarray(diag, np.float64)
    n = t.shape[0]
    L = -(-n // b)
    pad = b * L - n

    def padded(x, fill):
        base = np.concatenate([x, np.full(pad, fill, np.float64)])
        return np.tile(base, nc) if nc > 1 else base

    t_pad = padded(t, t[-1] if n else 0.0)
    dt = np.concatenate([[0.0], np.diff(t)])
    dt_pad = padded(dt, 0.0)
    diag_pad = padded(diag, 0.0)
    y_pad = padded(y, 0.0)
    mask = padded(np.ones(n), 0.0)

    t_hi = np.asarray(t_pad, dtype)
    t_lo = np.asarray(t_pad - np.asarray(t_hi, np.float64), dtype)

    bt = b * nc
    return Plan4(
        t=jnp.asarray(_lane4(t_hi, bt, L, dtype)),
        t_lo=jnp.asarray(_lane4(t_lo, bt, L, dtype)),
        dt=jnp.asarray(_lane4(dt_pad, bt, L, dtype)),
        diag=jnp.asarray(_lane4(diag_pad, bt, L, dtype)),
        y=jnp.asarray(_lane4(y_pad, bt, L, dtype)),
        mask=jnp.asarray(_lane4(mask, bt, L, dtype)),
        n=n,
        num_blocks=bt,
    )


def fold_lanes(x, num_blocks, L, dtype=None):
    """Traced ``(n_chain, n)`` batch -> chain-folded ``(L, 8, W)`` lanes.

    The jnp counterpart of the host-side ``_lane4`` tiling used by
    ``make_plan4(..., n_chain=nc)``: chain ``c`` occupies virtual lanes
    ``[c*num_blocks, (c+1)*num_blocks)`` and the pad tail is zero-filled.
    Used to stream *per-chain* data (e.g. residuals under per-chain mean
    models) into a chain-folded kernel launch, so batched fits with
    active mean parameters still fold onto lanes instead of serializing.
    """
    nc, n = x.shape
    b = int(num_blocks)
    pad = b * L - n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    w = nc * b // SUB
    out = x.reshape(SUB, w, L).transpose(2, 0, 1)
    return out.astype(dtype) if dtype is not None else out


def make_plan4_curves(t, y, diag, lengths, n_chain=1,
                      dtype=np.float32) -> Plan4:
    """Fleet folding: one virtual lane per light curve.

    ``t, y, diag``: (n_curves, Lmax) padded per-curve arrays (pad tail
    arbitrary); ``lengths``: (n_curves,) valid counts.  Each curve
    occupies one lane (segment size 1 — no cross-lane prefix coupling),
    so a whole fleet's likelihoods evaluate in a single kernel launch
    with sequential depth Lmax; ragged curves are handled by the mask.

    ``n_chain > 1`` additionally tiles the fleet per chain/particle
    (lane block c*n_lanes..(c+1)*n_lanes is chain c's copy): with an
    ``(n_chain, C)`` coefficient batch and ``n_seg = n_chain``, the
    kernels return each chain's fleet-summed likelihood — the SMC /
    population-fit hot path (BASELINE configs[4]).

    ``Plan4.n`` holds the per-segment valid-point counts (per lane for
    n_chain == 1, summed per chain copy otherwise).
    """
    t = np.asarray(t, np.float64)
    y = np.asarray(y, np.float64)
    diag = np.asarray(diag, np.float64)
    lengths = np.asarray(lengths, np.int64)
    ncur, Lmax = t.shape
    nc = int(n_chain)
    if nc & (nc - 1) or nc < 1:
        raise ValueError("n_chain must be a power of two")

    # Pad the lane count so n_lanes * n_chain is a multiple of 8 (full
    # sublane tiles) — padded lanes are fully masked (0 contribution).
    lanes = ncur
    while (lanes * nc) % SUB:
        lanes += 1
    pad_l = lanes - ncur

    idx = np.arange(Lmax)[None, :]
    mask = (idx < lengths[:, None]).astype(np.float64)
    dt = np.zeros_like(t)
    dt[:, 1:] = np.diff(t, axis=1)
    dt *= mask[:, :] * np.concatenate(
        [np.zeros((ncur, 1)), mask[:, :-1]], axis=1
    )

    def padlanes(x, fill=0.0):
        if pad_l:
            x = np.concatenate(
                [x, np.full((pad_l, Lmax), fill, np.float64)], axis=0
            )
        return np.tile(x, (nc, 1)) if nc > 1 else x

    t2 = padlanes(t * mask)
    y2 = padlanes(y * mask)
    diag2 = padlanes(diag * mask)
    mask2 = padlanes(mask)
    dt2 = padlanes(dt)

    t_hi = np.asarray(t2, dtype)
    t_lo = np.asarray(t2 - np.asarray(t_hi, np.float64), dtype)

    bt = lanes * nc
    w = bt // SUB

    def lane(x, dt_=dtype):
        # (B_tot, Lmax) -> (Lmax, 8, W); lane l = r*W + c = curve row l.
        return np.ascontiguousarray(
            np.asarray(x, dt_).T.reshape(Lmax, SUB, w)
        )

    n_lane = np.concatenate([lengths, np.zeros(pad_l, np.int64)])
    if nc > 1:
        n_seg = np.full(nc, int(lengths.sum()), np.int64)
    else:
        n_seg = n_lane

    return Plan4(
        t=jnp.asarray(lane(t_hi)),
        t_lo=jnp.asarray(lane(t_lo)),
        dt=jnp.asarray(lane(dt2)),
        diag=jnp.asarray(lane(diag2)),
        y=jnp.asarray(lane(y2)),
        mask=jnp.asarray(lane(mask2)),
        n=n_seg,
        num_blocks=bt,
    )


def cf_len(jr, jc):
    """Length of the packed coefficient vector for (jr, jc) term counts."""
    return 2 * jr + 4 * jc + 1


def pack_cf(coeffs: Coefficients, dtype=jnp.float32):
    """Pack lowering coefficients into the kernels' flat SMEM vector.

    Layout: [a_real(jr), c_real(jr), a_c(jc), b_c(jc), c_c(jc), d_c(jc),
    total] with total = sum(a_real) + sum(a_comp) + jitter (the kernel's
    diagonal shift, ops/lanes.lower_lanes:145).  Differentiable: the
    backward kernels return a cotangent of the same layout and XLA
    chain-rules through this function to the term parameters.
    """
    a_real, c_real, a_comp, b_comp, c_comp, d_comp, jitter = coeffs
    total = (
        jnp.sum(a_real) + jnp.sum(a_comp) + jnp.asarray(jitter)
    ).reshape(1)
    parts = [a_real, c_real, a_comp, b_comp, c_comp, d_comp, total]
    return jnp.concatenate([jnp.asarray(p).reshape(-1) for p in parts]).astype(
        dtype
    )
