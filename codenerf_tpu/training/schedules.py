"""Learning-rate schedules.

The reference's schedule is step-halving: ``lr * 2^-(niter // interval)``
(``src/trainer.py:126-131``), but it is applied by REBUILDING AdamW every
epoch, which zeroes the Adam moments (SURVEY §2.3 quirk 3). Here the same
decay curve drives a persistent optax optimizer — continuous moments, decay
applied every step.
"""

from __future__ import annotations

import jax.numpy as jnp


def step_halving(base_lr: float, interval: int):
    """optax schedule: base_lr * 2^-(count // interval)."""

    def schedule(count):
        halvings = jnp.asarray(count // interval, jnp.float32)
        return base_lr * jnp.asarray(2.0, jnp.float32) ** (-halvings)

    return schedule
