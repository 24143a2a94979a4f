"""Per-object shape/texture latent code tables.

The reference stores these as two ``nn.Embedding(n_objs, latent_dim)`` tables
initialized ``randn / sqrt(latent_dim / 2)`` (``src/trainer.py:136-144``).
Here they are plain ``(n_objs, latent_dim)`` float32 arrays; per-ray lookup
during training is a gather ``table[obj_idx]`` inside the jitted step, which
XLA lowers to an efficient dynamic-gather — this is what lets one step mix
rays from many objects (the reference is locked to one object per step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_codes(key: jax.Array, n_objs: int, latent_dim: int) -> jnp.ndarray:
    """N(0, 2/latent_dim) init, matching ``src/trainer.py:139-140``."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(latent_dim / 2.0, dtype=jnp.float32))
    return jax.random.normal(key, (n_objs, latent_dim), jnp.float32) * scale


def mean_code(table: jnp.ndarray) -> jnp.ndarray:
    """Mean over the trained embedding rows — the test-time initialization
    (``src/optimizer.py:215-216``). Returns (latent_dim,)."""
    return jnp.mean(table, axis=0)
