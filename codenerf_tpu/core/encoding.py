"""Sinusoidal positional encoding.

Semantics match the reference ``PE`` (``src/model.py:4-7``): for degree F the
output is ``[x, sin(x·2^0),…,sin(x·2^{F-1}), cos(x·2^0),…,cos(x·2^{F-1})]``
concatenated along the channel axis, frequency-major within the sin/cos
blocks (the reference builds ``y = cat([2^i·x for i],-1)`` then
``cat([x, sin(y), cos(y)],-1)``). Output channel count: ``D·(1+2F)``.

The encoding is computed in float32 regardless of the requested compute
dtype: at the top frequency 2^9·x the argument reaches ~1e3 radians, where
bfloat16 resolution (~8 ulp at 1e3) would destroy the phase entirely.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """Encode ``x[..., D] -> [..., D*(1+2*num_freqs)]``.

    Channel order matches the reference exactly so that weights converted
    from a reference checkpoint stay valid.
    """
    x = x.astype(jnp.float32)
    if num_freqs == 0:
        return x
    freqs = jnp.asarray(2.0, dtype=jnp.float32) ** jnp.arange(num_freqs)
    # (..., F, D): frequency-major, matching cat([2^i * x], -1) then reshape.
    scaled = x[..., None, :] * freqs[:, None]
    scaled = scaled.reshape(*x.shape[:-1], num_freqs * x.shape[-1])
    return jnp.concatenate([x, jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
