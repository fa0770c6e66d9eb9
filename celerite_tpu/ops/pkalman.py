"""Temporal-parallel Kalman filter + RTS smoother (associative scans).

The sequential smoother (ops/smoother.py) is exact but latency-bound on
TPU: two ``lax.scan`` sweeps of tiny (p, p) matrix algebra cost ~1 us of
launch-pipeline latency per step, i.e. seconds at N = 1e6.  Filtering
and smoothing are, however, *associative* over per-step elements
(Sarkka & Garcia-Fernandez 2020, "Temporal parallelization of Bayesian
smoothers"), so both sweeps become ``jax.lax.associative_scan`` —
log-depth, with every level a wide batched op XLA tiles onto the TPU's
vector units.  This is the same algebraic move the blocked
semiseparable solver makes for the factorization (ops/blocked.py
Riccati elements); here it is applied to the Gauss-Markov realization
powering ``GP.predict(return_var=True)`` (reference analog: the dense
O(N M) variance path, celerite.py:460-474).

Layout: every element array carries the time axis LAST — matrices are
``(p, p, n)``, vectors ``(p, n)`` — so each unrolled (p, p) index pair
is a full-width elementwise op over n lanes (the fused4 trick; a
``(n, p, p)`` layout puts the tiny (p, p) dims on the vector tile and
wastes ~96% of it — measured 475 ms vs the ~30 ms this layout gives at
N = 1e6, p = 3).

Compile-time note: the ~17 ``associative_scan`` levels each
instantiate the unrolled (p, p) composition, so the FIRST compile at
N >= 16384 is minutes-scale on remote-compile runtimes.  Steady state
is unaffected, and ``celerite_tpu.utils.enable_persistent_cache()``
makes it a once-per-machine cost (bench rig: cold 4-6 min, warm
seconds) — call it (or set ``JAX_COMPILATION_CACHE_DIR``) in any
program that touches ``GP.predict(return_var=True)`` at scale.

Filtering element per step k (model x_k = F_k x_{k-1} + q_k,
q_k ~ N(0, Q_k); observation y_k = H x_k + r_k, r_k ~ N(0, R_k)):

    S_k = H Q_k H^T + R_k          K_k = Q_k H^T / S_k
    A_k = (I - K_k H) F_k          b_k = K_k y_k
    C_k = (I - K_k H) Q_k
    eta_k = F_k^T H^T y_k / S_k    J_k = F_k^T H^T H F_k / S_k

(no-observation steps: A = F, b = 0, C = Q, eta = 0, J = 0), with the
prior as a leading element (A=0, b=m0, C=P0, eta=0, J=0).  Composition
of e_i followed by e_j:

    D = (I + C_i J_j)^-1
    A_ij = A_j D A_i               b_ij = A_j D (b_i + C_i eta_j) + b_j
    C_ij = A_j D C_i A_j^T + C_j
    eta_ij = A_i^T (I + J_j C_i)^-1 (eta_j - J_j b_i) + eta_i
    J_ij = A_i^T (I + J_j C_i)^-1 J_j A_i + J_i

An inclusive prefix scan then yields the filtered moments directly:
m_k = b, P_k = C of the k-th prefix.  Predicted moments (needed for the
smoother gains and the marginal likelihood) follow vectorized from the
shifted filtered moments, with no further scan.

Smoothing element (x_k | x_{k+1} ~ N(E_k x_{k+1} + g_k, L_k)):

    G_k = P_k F_{k+1}^T (P^-_{k+1})^-1
    E_k = G_k    g_k = m_k - G_k m^-_{k+1}    L_k = P_k - G_k P^-_{k+1} G_k^T

(last element: E = 0, g = m_n, L = P_n), composed right-to-left as

    (E_i, g_i, L_i) * (E_j, g_j, L_j)
        = (E_i E_j,  E_i g_j + g_i,  E_i L_j E_i^T + L_i)

so a reverse inclusive scan gives the smoothed moments m^s = g, P^s = L.

Exactness: both scans reproduce the sequential filter/smoother to
floating-point roundoff (validated against ops/smoother._filter_smoother
in float64, tests/test_pkalman.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .precision import f32_matmuls
from .smoother import realize

__all__ = ["parallel_filter_smoother", "predict_var_parallel"]


def _mm(x, y):
    """(p, p, n) matmul over the leading dims, unrolled (fused4._mm)."""
    p = x.shape[0]
    acc = x[:, 0:1] * y[0:1, :]
    for k in range(1, p):
        acc = acc + x[:, k : k + 1] * y[k : k + 1, :]
    return acc


def _mv(x, v):
    """(p, p, n) @ (p, n) -> (p, n)."""
    return jnp.sum(x * v[None, :, :], axis=1)


def _tr(x):
    return jnp.swapaxes(x, 0, 1)


def _solve(M, X):
    """(p, p, n)-batched M^-1 X via unrolled Gauss-Jordan.

    Same strategy as the Pallas kernels' in-VMEM inverse
    (ops/fused4._inv): no pivoting — M is I + (PSD)(PSD) or a
    regularized covariance, diagonally dominant enough in practice.
    """
    p = M.shape[0]
    aug = jnp.concatenate([M, X], axis=1)  # (p, p + q, n)
    rows = lax.broadcasted_iota(jnp.int32, aug.shape, 0)
    for k in range(p):
        piv = aug[k : k + 1] / aug[k : k + 1, k : k + 1]
        elim = aug - aug[:, k : k + 1] * piv
        aug = jnp.where(rows == k, piv, elim)
    return aug[:, p:]


def _eye_bcast(p, n, dtype):
    ii = lax.broadcasted_iota(jnp.int32, (p, p, n), 0)
    jj = lax.broadcasted_iota(jnp.int32, (p, p, n), 1)
    return jnp.where(ii == jj, jnp.ones((), dtype), jnp.zeros((), dtype))


def _compose(e1, e2):
    """Associative filtering composition: e1 earlier, e2 later.

    Vector members (b, eta) ride as (p, 1, n) so every pytree leaf has
    the same rank (associative_scan applies one axis index to all).
    """
    A1, b1, C1, n1, J1 = e1
    A2, b2, C2, n2, J2 = e2
    b1, n1 = b1[:, 0], n1[:, 0]
    b2, n2 = b2[:, 0], n2[:, 0]
    p, _, n = A1.shape
    eye = _eye_bcast(p, n, A1.dtype)
    # Left-apply D = (I + C1 J2)^-1 to [A1 | C1 | b1 + C1 eta2] in one
    # Gauss-Jordan pass.
    bn = b1 + _mv(C1, n2)
    sol = _solve(
        eye + _mm(C1, J2),
        jnp.concatenate([A1, C1, bn[:, None, :]], axis=1),
    )
    D_A1, D_C1, D_bn = sol[:, :p], sol[:, p : 2 * p], sol[:, 2 * p]
    A12 = _mm(A2, D_A1)
    b12 = _mv(A2, D_bn) + b2
    C12 = _mm(_mm(A2, D_C1), _tr(A2)) + C2
    # Right block: (I + J2 C1)^-1 applied to [J2 | eta2 - J2 b1].
    er = n2 - _mv(J2, b1)
    sol2 = _solve(
        eye + _mm(J2, C1),
        jnp.concatenate([J2, er[:, None, :]], axis=1),
    )
    E_J2, E_r = sol2[:, :p], sol2[:, p]
    A1T = _tr(A1)
    n12 = _mv(A1T, E_r) + n1
    J12 = _mm(_mm(A1T, E_J2), A1) + J1
    return A12, b12[:, None, :], C12, n12[:, None, :], J12


def _compose_smooth(e1, e2):
    """Associative smoothing composition: e1 earlier, e2 later.

    ``g`` rides as (p, 1, n) for rank uniformity (see _compose).
    """
    E1, g1, L1 = e1
    E2, g2, L2 = e2
    g = _mv(E1, g2[:, 0]) + g1[:, 0]
    return _mm(E1, E2), g[:, None, :], _mm(_mm(E1, L2), _tr(E1)) + L1


def _transitions_lanes(real_, dt):
    """Block-diagonal transitions A(dt) in (p, p, n) lane layout."""
    n = dt.shape[0]
    p = real_.p
    jr, jc = real_.jr, real_.jc
    rows = []
    for i in range(p):
        cols = []
        for j in range(p):
            if i < jr:
                cols.append(
                    jnp.exp(-real_.c_real[i] * dt)
                    if i == j
                    else jnp.zeros((n,), dt.dtype)
                )
            else:
                blk = (i - jr) // 2
                k = jr + 2 * blk
                if j not in (k, k + 1):
                    cols.append(jnp.zeros((n,), dt.dtype))
                else:
                    e = jnp.exp(-real_.c_comp[blk] * dt)
                    cs = jnp.cos(real_.d_comp[blk] * dt)
                    sn = jnp.sin(real_.d_comp[blk] * dt)
                    if (i - k, j - k) in ((0, 0), (1, 1)):
                        cols.append(e * cs)
                    elif (i - k, j - k) == (0, 1):
                        cols.append(-e * sn)
                    else:
                        cols.append(e * sn)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # (p, p, n)


@f32_matmuls
def parallel_filter_smoother(real_, dt, yv, rv, obs):
    """Associative-scan twin of ops/smoother._filter_smoother.

    Same contract: ``dt`` spacings (first 0), ``yv`` observed values
    (0 where missing), ``rv`` observation variances, ``obs`` 1/0
    flags.  Returns (smoothed latent mean, smoothed latent var, data
    log-likelihood over observed points).
    """
    dtype = yv.dtype
    n = dt.shape[0]
    p = real_.p
    Pinf = jnp.asarray(real_.Pinf, dtype)  # (p, p)
    H = jnp.asarray(real_.H, dtype)  # (p,)
    eye3 = _eye_bcast(p, n, dtype)
    Pinf3 = jnp.broadcast_to(Pinf[:, :, None], (p, p, n))

    F = _transitions_lanes(real_, jnp.asarray(dt, dtype))  # (p, p, n)
    Q = Pinf3 - _mm(_mm(F, Pinf3), _tr(F))

    # --- filtering elements (lane layout) ----------------------------------
    QH = _mv(Q, jnp.broadcast_to(H[:, None], (p, n)))  # (p, n) = Q H
    S = jnp.sum(QH * H[:, None], axis=0) + rv  # (n,)
    K = QH / S[None, :]
    ImKH = eye3 - K[:, None, :] * H[None, :, None]
    FTH = _mv(_tr(F), jnp.broadcast_to(H[:, None], (p, n)))  # F^T H

    o1 = obs[None, :]
    o2 = obs[None, None, :]
    A = jnp.where(o2 > 0, _mm(ImKH, F), F)
    b = jnp.where(o1 > 0, K * yv[None, :], jnp.zeros((p, n), dtype))
    C = jnp.where(o2 > 0, _mm(ImKH, Q), Q)
    eta = jnp.where(o1 > 0, FTH * (yv / S)[None, :], jnp.zeros_like(b))
    J = jnp.where(
        o2 > 0, FTH[:, None, :] * (FTH / S[None, :])[None, :, :],
        jnp.zeros((p, p, n), dtype),
    )

    # Prior element (A=0, b=0, C=Pinf) prepended so every data step uses
    # the generic formulas (the dt=0 first grid step has Q=0 and the
    # composition recovers the standard P^- = Pinf update).
    cat = lambda z, e: jnp.concatenate([z, e], axis=-1)
    elems = (
        cat(jnp.zeros((p, p, 1), dtype), A),
        cat(jnp.zeros((p, 1, 1), dtype), b[:, None, :]),
        cat(Pinf[:, :, None], C),
        cat(jnp.zeros((p, 1, 1), dtype), eta[:, None, :]),
        cat(jnp.zeros((p, p, 1), dtype), J),
    )
    pref = lax.associative_scan(_compose, elems, axis=2)
    mf = pref[1][:, 0, 1:]  # filtered means (p, n)
    Pf = pref[2][..., 1:]   # filtered covs (p, p, n)

    # --- predicted moments + marginal likelihood (vectorized) --------------
    m_prev = jnp.concatenate([jnp.zeros((p, 1), dtype), mf[:, :-1]],
                             axis=-1)
    P_prev = jnp.concatenate([Pinf[:, :, None], Pf[..., :-1]], axis=-1)
    mp = _mv(F, m_prev)
    Pp = _mm(_mm(F, P_prev), _tr(F)) + Q
    Sp = jnp.sum(_mv(Pp, jnp.broadcast_to(H[:, None], (p, n)))
                 * H[:, None], axis=0) + rv
    innov = yv - jnp.sum(mp * H[:, None], axis=0)
    lls = -0.5 * (
        innov**2 / Sp + jnp.log(Sp) + jnp.log(2 * jnp.pi).astype(dtype)
    )
    ll = jnp.sum(jnp.where(obs > 0, lls, 0.0))

    # --- smoothing elements -------------------------------------------------
    F_next = jnp.concatenate([F[..., 1:], eye3[..., :1]], axis=-1)
    mp_next = jnp.concatenate([mp[:, 1:], mp[:, -1:]], axis=-1)
    Pp_next = jnp.concatenate([Pp[..., 1:], Pp[..., -1:]], axis=-1)
    # Regularized gain solve, matching the sequential smoother.
    tr_pp = jnp.sum(
        jnp.where(
            lax.broadcasted_iota(jnp.int32, (p, p, n), 0)
            == lax.broadcasted_iota(jnp.int32, (p, p, n), 1),
            Pp_next,
            jnp.zeros((), dtype),
        ),
        axis=(0, 1),
    )
    Pp_r = Pp_next + 1e-12 * tr_pp[None, None, :] * eye3
    # G_k = Pf_k F_{k+1}^T Pp_r^-1  ->  G^T = Pp_r^-T (F Pf^T)^T.
    PfFT = _mm(Pf, _tr(F_next))
    G = _tr(_solve(_tr(Pp_r), _tr(PfFT)))
    g = mf - _mv(G, mp_next)
    L = Pf - _mm(_mm(G, Pp_next), _tr(G))
    last1 = jnp.zeros((1, n), dtype).at[:, -1].set(1.0)
    last2 = last1[None, :, :]
    E_s = jnp.where(last2 > 0, jnp.zeros_like(G), G)
    g_s = jnp.where(last1 > 0, mf, g)
    L_s = jnp.where(last2 > 0, Pf, L)

    # associative_scan(reverse=True) runs the forward algorithm on the
    # reversed sequence, so the callback's FIRST argument is the
    # later-index element; flip it back into "earlier-then-later".
    sm = lax.associative_scan(
        lambda x, y: _compose_smooth(y, x),
        (E_s, g_s[:, None, :], L_s),
        reverse=True, axis=2,
    )
    ms = sm[1][:, 0]
    Ps = sm[2]

    mean = jnp.sum(ms * H[:, None], axis=0)
    var = jnp.sum(Ps * H[:, None, None] * H[None, :, None], axis=(0, 1))
    return mean, var, ll


def predict_var_parallel(coeffs, t_train, diag, resid, t_test):
    """Parallel-scan twin of ops/smoother.predict_var (same contract)."""
    import numpy as np

    real_ = realize(coeffs)
    if real_ is None:
        raise ValueError("kernel is not independently realizable")

    t_train = np.asarray(t_train, float)
    t_test = np.asarray(t_test, float)
    n, m = len(t_train), len(t_test)

    t_all = np.concatenate([t_train, t_test])
    kind = np.concatenate([np.ones(n), np.zeros(m)])
    src = np.concatenate([np.arange(n), np.arange(m)])
    order = np.argsort(t_all, kind="stable")
    t_s = t_all[order]
    obs_np = kind[order]
    src_s = src[order]

    yv = np.zeros(n + m)
    rv = np.ones(n + m)
    resid = np.asarray(resid, float)
    diag = np.asarray(diag, float)
    jitter = float(np.asarray(coeffs.jitter))
    train_mask = obs_np == 1
    yv[train_mask] = resid[src_s[train_mask]]
    rv[train_mask] = diag[src_s[train_mask]] + jitter

    dt = np.concatenate([[0.0], np.diff(t_s)])
    mean_s, var_s, _ = parallel_filter_smoother(
        real_,
        jnp.asarray(dt),
        jnp.asarray(yv),
        jnp.asarray(rv),
        jnp.asarray(obs_np),
    )
    mean_s = np.asarray(mean_s)
    var_s = np.asarray(var_s)

    test_pos = np.flatnonzero(obs_np == 0)
    out_mean = np.empty(m)
    out_var = np.empty(m)
    out_mean[src_s[test_pos]] = mean_s[test_pos]
    out_var[src_s[test_pos]] = var_s[test_pos]
    return out_mean, out_var
