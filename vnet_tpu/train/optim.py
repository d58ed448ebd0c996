"""Optimizers + LR schedule via optax.

Parity with `/root/reference/model.py:641-658`: exponential decay
``lr = init * factor^(step/steps)`` (staircase=False, `model.py:642-643`)
feeding one of SGD / Adam / Momentum / NesterovMomentum.

``FusedAdam`` is the TPU-native extension: per-tensor optax updates cost
one tiny XLA kernel per parameter tensor (168 ops = ~13 ms/step measured
at the production config, dispatch-bound — BENCHMARKS.md "Roofline");
``fused_adam`` ravels the gradient pytree once and runs the whole Adam
update as a handful of fused element-wise ops over one flat vector.
Identical math to ``optax.adam`` (tests/test_optim.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from ..config import OptimizerConfig

OPTIMIZER_NAMES = ("SGD", "Adam", "Momentum", "NesterovMomentum",
                   "FusedAdam")


class FusedAdamState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    m: jnp.ndarray      # flat first moment
    v: jnp.ndarray      # flat second moment


def fused_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam over the raveled parameter vector (one fused update instead of
    one kernel per tensor). Drop-in ``optax.GradientTransformation``;
    bitwise-equal hyperparameter semantics to ``optax.adam``
    (m/v bias correction, eps after sqrt)."""

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        return FusedAdamState(count=jnp.zeros((), jnp.int32),
                              m=jnp.zeros_like(flat),
                              v=jnp.zeros_like(flat))

    def update_fn(updates, state, params=None):
        del params
        g, unravel = ravel_pytree(updates)
        count = state.count + 1
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * (g * g)
        t = count.astype(jnp.float32)
        mhat = m / (1.0 - jnp.power(b1, t))
        vhat = v / (1.0 - jnp.power(b2, t))
        # schedule is evaluated at the PRE-increment count: optax's
        # scale_by_schedule uses state.count before its own increment, so
        # the first step trains at schedule(0)
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        out = (-lr) * mhat / (jnp.sqrt(vhat) + eps)
        return unravel(out), FusedAdamState(count=count, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)


def learning_rate_schedule(cfg: OptimizerConfig):
    return optax.exponential_decay(
        init_value=cfg.initial_learning_rate,
        transition_steps=cfg.decay_steps,
        decay_rate=cfg.decay_factor,
        staircase=False,
    )


def build_optimizer(cfg: OptimizerConfig):
    """Returns ``(optax transform, schedule)``; raises on unknown names like
    `model.py:657-658`."""
    schedule = learning_rate_schedule(cfg)
    if cfg.name == "SGD":
        tx = optax.sgd(schedule)
    elif cfg.name == "Adam":
        tx = optax.adam(schedule)
    elif cfg.name == "FusedAdam":
        tx = fused_adam(schedule)
    elif cfg.name == "Momentum":
        tx = optax.sgd(schedule, momentum=cfg.momentum)
    elif cfg.name == "NesterovMomentum":
        tx = optax.sgd(schedule, momentum=cfg.momentum, nesterov=True)
    else:
        raise ValueError(f"Invalid optimizer: {cfg.name!r}")
    return tx, schedule
