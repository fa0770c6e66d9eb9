"""Batch-aware value+ok+gradient primitive for sampler hot loops.

Samplers consume the GP log-likelihood through a fused
``theta -> (ll, ok, grad)`` entry point, called per chain under
``jax.vmap`` inside ``lax.while_loop`` tree builders.  Mapping a Pallas
call with vmap serializes the batch into an outer grid loop; the fast
path instead *chain-folds* the batch onto the kernels' virtual-lane axis
(ops/fused4 with ``n_chain > 1``) — one launch for every chain.

``jax.custom_batching.custom_vmap`` would be the natural hook, but it
trips a batching fixed-point assertion inside ``lax.while_loop`` (the
NUTS doubling loop) on current JAX.  A first-class primitive with an
explicit batching rule is the supported mechanism everywhere, including
while bodies, so that is what this module builds.

The primitive is value-only from AD's point of view (samplers never
differentiate through the returned gradient); differentiation rules are
deliberately absent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import core as jcore
from jax.extend import core as jexcore
from jax.interpreters import batching, mlir

__all__ = ["make_vog"]

_COUNTER = [0]


def make_vog(single_fn, batched_fn, dim, dtype, name="celerite_vog"):
    """Build ``theta -> (ll, ok, grad)`` with chain-folded batching.

    ``single_fn(theta)``: the unbatched implementation (traceable).
    ``batched_fn(thetas)``: the chain-folded implementation taking
    ``(n, dim)`` and returning ``(ll (n,), ok (n,), grad (n, dim))``;
    called by the batching rule for any leading vmap axes.
    """
    _COUNTER[0] += 1
    prim = jexcore.Primitive(f"{name}_{_COUNTER[0]}")
    prim.multiple_results = True

    def _abstract(theta_aval):
        return (
            jcore.ShapedArray((), theta_aval.dtype),
            jcore.ShapedArray((), jnp.dtype(bool)),
            jcore.ShapedArray((dim,), theta_aval.dtype),
        )

    prim.def_abstract_eval(_abstract)

    def _impl(theta):
        return tuple(single_fn(theta))

    prim.def_impl(_impl)
    mlir.register_lowering(
        prim, mlir.lower_fun(_impl, multiple_results=True)
    )

    def _batch(args, dims):
        (theta,) = args
        (bd,) = dims
        th = jnp.moveaxis(theta, bd, 0)
        lead = th.shape[:-1]
        th2 = th.reshape(-1, th.shape[-1])
        ll, ok, grad = batched_fn(th2)
        return (
            (
                ll.reshape(lead),
                ok.reshape(lead),
                grad.reshape(lead + (dim,)),
            ),
            (0, 0, 0),
        )

    batching.primitive_batchers[prim] = _batch

    def fn(theta):
        ll, ok, grad = prim.bind(theta)
        return ll, ok, grad

    return fn
