"""Volume rendering (alpha compositing along rays).

Reference math (``src/utils.py:34-47``): deltas from consecutive z-values
with a 1e10 terminal delta; ``alpha = 1 - exp(-sigma * delta)`` (no noise,
no extra ReLU — Softplus already applied in the model); exclusive-cumprod
transmittance with a 1e-10 floor; white-background completion
``rgb += 1 - sum(weights)``.

Differences from the reference by design:
- accepts per-ray z-values ``(R, S)`` as well as the reference's shared
  ``(S,)`` vector (broadcast),
- returns accumulated opacity and the per-sample weights (needed for
  hierarchical importance sampling),
- always computes in float32 (the cumprod chain underflows in bfloat16),
  regardless of the MLP compute dtype.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray      # (R, 3) composited color
    depth: jnp.ndarray    # (R,) expected termination depth
    acc: jnp.ndarray      # (R,) accumulated opacity sum(weights)
    weights: jnp.ndarray  # (R, S) compositing weights


def composite(
    sigmas: jnp.ndarray,
    rgbs: jnp.ndarray,
    z_vals: jnp.ndarray,
    white_bg: bool = True,
) -> RenderOutput:
    """Composite per-sample densities/colors into per-ray outputs.

    Args:
      sigmas: (R, S) or (R, S, 1) nonnegative densities.
      rgbs:   (R, S, 3) colors (raw linear — the reference has no sigmoid,
              ``src/model.py:34``), OR a tuple of three (R, S) channel
              planes. The plane form is the TPU-native layout: an (R, S, 3)
              array puts 3 values on the 128-lane axis (42x padding); the
              fused training kernels emit planes so compositing never
              touches a lanes-3 array.
      z_vals: (S,) shared or (R, S) per-ray depth samples, ascending.
      white_bg: add (1 - acc) to every channel (``src/utils.py:44-46``).
    """
    planes = isinstance(rgbs, (tuple, list))
    if not planes and sigmas.ndim == rgbs.ndim:  # (R, S, 1) -> (R, S)
        sigmas = sigmas[..., 0]
    sigmas = sigmas.astype(jnp.float32)
    if planes:
        rgbs = tuple(p.astype(jnp.float32) for p in rgbs)
    else:
        rgbs = rgbs.astype(jnp.float32)
    z_vals = jnp.broadcast_to(z_vals.astype(jnp.float32), sigmas.shape)

    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], 1e10)], axis=-1
    )
    alphas = 1.0 - jnp.exp(-sigmas * deltas)
    # Exclusive cumulative transmittance with leading 1.
    trans = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-10], axis=-1
    )
    accum_trans = jnp.cumprod(trans, axis=-1)[..., :-1]
    weights = alphas * accum_trans

    if planes:
        rgb = jnp.stack(
            [jnp.sum(weights * p, axis=-1) for p in rgbs], axis=-1
        )
    else:
        rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    if white_bg:
        rgb = rgb + (1.0 - acc)[..., None]
    return RenderOutput(rgb=rgb, depth=depth, acc=acc, weights=weights)


def composite_weights(sigmas: jnp.ndarray, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Compositing weights alone (same math as :func:`composite` — deltas
    with the 1e10 terminal, alpha, 1e-10-floored exclusive cumprod).

    Weights are a function of sigma and z only; the coarse pass of fused
    hierarchical training uses this on the sigma-only forward kernel's
    output to drive ``sample_pdf`` without evaluating the texture branch
    (ops/fused_train.py)."""
    sigmas = sigmas.astype(jnp.float32)
    z_vals = jnp.broadcast_to(z_vals.astype(jnp.float32), sigmas.shape)
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], 1e10)], axis=-1
    )
    alphas = 1.0 - jnp.exp(-sigmas * deltas)
    trans = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-10], axis=-1
    )
    return alphas * jnp.cumprod(trans, axis=-1)[..., :-1]
