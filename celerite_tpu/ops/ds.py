"""Double-single (two-float) arithmetic helpers for accurate lowering.

The f32 error budget of the N=1e6 log-likelihood is dominated not by the
solver recursions (~2e-5 relative) but by the *lowering* of the kernel to
semiseparable form when ``t`` is stored in f32 (measured 8e-3 relative on
chip, benchmarks/sweep_fused.py):

1. ``dt = diff(f32(t))``: rounding t (~1e3) before differencing puts an
   absolute error ~eps32*|t| ~ 6e-5 on a spacing of ~1e-3 — up to percent-
   level relative error in every decay factor exp(-c dt).
2. ``cos(d * t)``: the f32 product d*t (~1e4 rad) carries an absolute
   argument error ~6e-4 rad, which becomes a phase error of the same size.

Both are fixed with a double-single representation of the *static* time
grid (t_hi, t_lo) computed once on the host: exact Dekker/Knuth two-float
products and sums reduce d*t modulo 2 pi to a small angle before the
hardware cos/sin, and dt is differenced in ds.  The theta-dependent extra
cost is ~40 elementwise flops per (n, j) — negligible next to the
transcendentals already present.

References: Dekker (1971), Knuth TAOCP 4.2.2.  (These are published
classical algorithms; no reference-repo analog exists — the reference
computes everything in f64 on CPU, cholesky.h:129-152.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "two_sum", "split", "two_prod", "host_ds", "reduced_angle",
    "ds_cos_sin",
]


def two_sum(a, b):
    """Exact addition: s + e == a + b with s = fl(a + b)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _split_factor(dtype):
    # 2^ceil(p/2) + 1 for p-bit significands.
    return jnp.asarray(
        4097.0 if jnp.dtype(dtype) == jnp.float32 else 134217729.0,
        dtype,
    )


def split(a):
    """Dekker split: a == hi + lo with hi, lo half-width significands."""
    c = _split_factor(a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Exact product: p + e == a * b with p = fl(a * b)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def host_ds(x64, dtype=np.float32):
    """Host-side split of a float64 array into (hi, lo) pairs."""
    hi = np.asarray(x64, dtype)
    lo = np.asarray(np.asarray(x64, np.float64) - hi, dtype)
    return hi, lo


def reduced_angle(d, t_hi, t_lo):
    """(d * t) mod 2 pi as a ds pair with |r_hi| <= ~pi.

    ``d`` broadcasts against ``t_hi``/``t_lo`` (typically (J,) x (N, 1)).
    Valid while the reduction integer k = round(d t / 2 pi) stays exactly
    representable (k < 2^23 in f32, i.e. d * t < ~5e7 rad).
    """
    dtype = np.dtype(t_hi.dtype)
    pi2 = 2.0 * np.pi
    pi2_hi_np = np.asarray(pi2, dtype)
    pi2_hi = jnp.asarray(pi2_hi_np)
    pi2_lo = jnp.asarray(np.asarray(pi2 - np.float64(pi2_hi_np), dtype))

    p_hi, p_lo = two_prod(d, t_hi)
    p_lo = p_lo + d * t_lo
    k = jnp.round(p_hi / pi2_hi)
    q_hi, q_lo = two_prod(k, pi2_hi)
    r_hi, r_e = two_sum(p_hi, -q_hi)
    r_lo = r_e + p_lo - q_lo - k * pi2_lo
    return two_sum(r_hi, r_lo)


def ds_cos_sin(r_hi, r_lo):
    """cos/sin of a ds angle: first-order correction on the lo part."""
    c = jnp.cos(r_hi)
    s = jnp.sin(r_hi)
    return c - r_lo * s, s + r_lo * c
