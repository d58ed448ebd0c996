"""Optimizers + LR schedule via optax.

Parity with `/root/reference/model.py:641-658`: exponential decay
``lr = init * factor^(step/steps)`` (staircase=False, `model.py:642-643`)
feeding one of SGD / Adam / Momentum / NesterovMomentum.
"""

from __future__ import annotations

import optax

from ..config import OptimizerConfig

OPTIMIZER_NAMES = ("SGD", "Adam", "Momentum", "NesterovMomentum")


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
    elif cfg.name == "Momentum":
        tx = optax.sgd(schedule, momentum=cfg.momentum)
    elif cfg.name == "NesterovMomentum":
        tx = optax.sgd(schedule, momentum=cfg.momentum, nesterov=True)
    else:
        raise ValueError(f"Invalid optimizer: {cfg.name!r}")
    return tx, schedule
