"""Training-step builders for the model family.

Functional, optax-based, and mesh-aware: ``make_train_step`` is the
single-chip jitted step; ``make_data_parallel_step`` is the same step as
one ``shard_map`` over a named mesh axis — batch sharded, parameters
replicated, gradients averaged with a single ``pmean`` that rides ICI.
The spectral transforms inside the model stay shard-local (each device
transforms only its own batch rows), so the only collective per step is
the gradient reduction — the canonical dp layout from the scaling-book
recipe, not a translation of any host-side loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

__all__ = ["mse", "make_train_step", "make_data_parallel_step", "fit"]


def mse(pred, target):
    """Mean-squared error over all axes."""
    return jnp.mean((pred - target) ** 2)


def make_train_step(apply_fn, optimizer, loss_fn=mse):
    """Jitted ``(params, opt_state, x, y) -> (params, opt_state, loss)``.

    ``apply_fn(params, x)`` is the model forward (e.g. a bound
    ``model.apply`` with variables as the first argument).
    """

    @jax.jit
    def step(params, opt_state, x, y):
        def loss(p):
            return loss_fn(apply_fn(p, x), y)

        value, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, value

    return step


def make_data_parallel_step(apply_fn, optimizer, mesh, axis="dp", loss_fn=mse):
    """Data-parallel train step over ``mesh``'s ``axis``.

    Batch rows shard over ``axis``; parameters and optimizer state are
    replicated.  Each device computes its local loss/grad (all spectral
    transforms batch-local — zero collectives in the forward/backward),
    then one ``pmean`` averages gradients and loss across the axis.
    Updates are computed post-reduction so every replica applies the
    identical step: parameters stay bitwise-replicated without any
    re-broadcast.
    """

    def local(params, opt_state, x, y):
        def loss(p):
            return loss_fn(apply_fn(p, x), y)

        value, grads = jax.value_and_grad(loss)(params)
        value = jax.lax.pmean(value, axis)
        grads = jax.lax.pmean(grads, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, value

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def fit(step, params, opt_state, data, steps):
    """Run ``steps`` updates cycling over ``data`` (a list of (x, y)).

    Returns ``(params, opt_state, losses)`` with per-step host floats —
    a convenience loop for examples/tests, not a production harness.
    """
    losses = []
    for i in range(steps):
        x, y = data[i % len(data)]
        params, opt_state, value = step(params, opt_state, x, y)
        losses.append(float(value))
    return params, opt_state, losses
