"""Plain HMC with jittered trajectory length.

Complement to NUTS for cheap mutation kernels (SMC) and as a baseline;
fixed leapfrog count keeps every chain in lockstep, which vectorizes better
than NUTS on wide chain batches (the tree depth of NUTS varies per chain
and the vmapped while_loop runs to the slowest chain).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["HMCInfo", "hmc_kernel"]


class HMCInfo(NamedTuple):
    accept_prob: jnp.ndarray
    accepted: jnp.ndarray
    energy: jnp.ndarray  # Hamiltonian H = -logp + kinetic at the new state
    logp: jnp.ndarray  # log probability at the new state


def hmc_kernel(
    logprob_fn,
    q,
    key,
    step_size,
    inv_mass,
    num_leapfrog=16,
    jitter=True,
):
    """One HMC transition; returns (q_new, HMCInfo).

    ``inv_mass`` may be a (dim,) diagonal or a dense (dim, dim) inverse
    mass matrix (same metric semantics as :mod:`.nuts`).
    """
    from .nuts import _sample_momentum, _velocity

    dim = q.shape[0]
    dtype = q.dtype
    inv_mass = jnp.asarray(inv_mass, dtype)
    if inv_mass.ndim < 2:
        inv_mass = jnp.broadcast_to(inv_mass, (dim,))
    k_mom, k_jit, k_acc = jax.random.split(key, 3)

    vag = getattr(
        logprob_fn, "value_and_grad", jax.value_and_grad(logprob_fn)
    )

    p0 = _sample_momentum(k_mom, dim, dtype, inv_mass)
    logp0, grad0 = vag(q)
    h0 = -logp0 + 0.5 * jnp.sum(p0 * _velocity(inv_mass, p0))

    n_steps = jnp.asarray(num_leapfrog, jnp.int32)
    if jitter:
        # Uniform jitter in [1, num_leapfrog] decorrelates trajectory
        # lengths (avoids resonances; Neal 2011).
        n_steps = jax.random.randint(k_jit, (), 1, num_leapfrog + 1)

    eps = jnp.asarray(step_size, dtype)

    def leap(i, carry):
        qq, pp, gg, lp = carry
        pp = pp + 0.5 * eps * gg  # gg = grad logp
        qq = qq + eps * _velocity(inv_mass, pp)
        lp, gg = vag(qq)
        pp = pp + 0.5 * eps * gg
        return (qq, pp, gg, lp)

    qn, pn, gn, logpn = lax.fori_loop(
        0, n_steps, leap, (q, p0, grad0, logp0)
    )
    h1 = -logpn + 0.5 * jnp.sum(pn * _velocity(inv_mass, pn))
    log_accept = jnp.minimum(0.0, h0 - h1)
    log_accept = jnp.where(jnp.isnan(log_accept), -jnp.inf, log_accept)
    accept = jnp.log(jax.random.uniform(k_acc, (), dtype)) < log_accept
    q_new = jnp.where(accept, qn, q)
    return q_new, HMCInfo(
        accept_prob=jnp.exp(log_accept),
        accepted=accept,
        energy=jnp.where(accept, h1, h0),
        logp=jnp.where(accept, logpn, logp0),
    )
