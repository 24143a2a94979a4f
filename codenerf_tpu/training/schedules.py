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


def window_frozen_step_halving(base_lr: float, interval: int, window: int):
    """Step-halving evaluated at the enclosing window's START — the decayed
    lr stays constant for ``window`` steps at a time. This is the
    reference's effective schedule under its per-epoch optimizer rebuild
    (quirk #3): the lr is computed once from the epoch-start ``niter`` and
    frozen until the next rebuild (``src/trainer.py:52,122-128``)."""

    def schedule(count):
        window_start = (count // window) * window
        halvings = jnp.asarray(window_start // interval, jnp.float32)
        return base_lr * jnp.asarray(2.0, jnp.float32) ** (-halvings)

    return schedule
