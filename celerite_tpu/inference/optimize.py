"""Maximum-a-posteriori fitting conveniences.

The reference tutorials fit by passing the negative log-likelihood and its
gradient to scipy.optimize (docs/tutorials/first.rst); here the same
workflow is one call: optimize the pure log-probability with Adam (or any
optax optimizer) under jit and write the result back into the GP.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

__all__ = ["map_fit", "minimize"]


def minimize(neg_logprob_fn, x0, num_steps=1000, optimizer=None):
    """Minimize a scalar function with optax; returns (x, trace).

    Honors a fused ``value_and_grad`` attribute on ``neg_logprob_fn``
    (convention: it returns the value and gradient of the *objective*)
    — the hand-written gradient kernels' entry point.
    """
    if optimizer is None:
        optimizer = optax.adam(1e-2)

    vag = getattr(neg_logprob_fn, "value_and_grad", None)

    def safe(v):
        return jnp.where(jnp.isfinite(v), v, 1e12)

    @jax.jit
    def step(carry, _):
        x, opt_state = carry
        if vag is None:
            loss, g = jax.value_and_grad(
                lambda q: safe(neg_logprob_fn(q))
            )(x)
        else:
            loss, g = vag(x)
            loss = safe(loss)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        updates, opt_state = optimizer.update(g, opt_state)
        x = optax.apply_updates(x, updates)
        return (x, opt_state), loss

    x0 = jnp.asarray(x0)
    (x, _), trace = jax.lax.scan(
        step, (x0, optimizer.init(x0)), None, length=num_steps
    )
    return x, trace


def map_fit(gp, t, y, yerr=1.123e-12, log_prior=None, num_steps=1000,
            optimizer=None, solver="auto", set_parameters=True):
    """MAP-fit a GP's active parameters to data.

    Builds the pure log-posterior via :meth:`GP.build_logprob`, optimizes,
    and (by default) writes the optimum back into ``gp``.  Returns
    (params, logprob_trace).
    """
    logprob = gp.build_logprob(
        t, y, yerr=yerr, log_prior=log_prior, solver=solver
    )
    x0 = jnp.asarray(gp.get_parameter_vector())
    neg = lambda q: -logprob(q)
    _vag = getattr(logprob, "value_and_grad", None)
    if _vag is not None:
        def _neg_vag(q):
            v, g = _vag(q)
            return -v, -g
        neg.value_and_grad = _neg_vag
    x, trace = minimize(
        neg, x0, num_steps=num_steps, optimizer=optimizer,
    )
    if set_parameters:
        gp.set_parameter_vector(np.asarray(x))
    return np.asarray(x), -np.asarray(trace)
