"""The CodeNeRF MLP as a parameter pytree with functional init/apply.

Architecture parity with the reference (``src/model.py:10-53``):

- ``enc_xyz``: Linear(3+6F_xyz -> W) + ReLU
- per shape block j: ``shape_latent_j``: Linear(D_z -> W)+ReLU applied to the
  shape code, added to the trunk, then ``shape_j``: Linear(W -> W)+ReLU
- ``enc_shape``: Linear(W -> W), NO activation (``src/model.py:26,44``)
- ``sigma``: Linear(W -> 1) + Softplus
- ``enc_viewdir``: Linear(W + 3+6F_dir -> W) + ReLU on [trunk, PE(viewdir)]
- per texture block: same additive latent injection
- ``rgb``: Linear(W -> W/2) + ReLU + Linear(W/2 -> 3), NO sigmoid

TPU-native departures from the reference implementation:

- the latent projections are computed once per RAY (B, W) and broadcast over
  the sample axis, instead of the reference's per-point tiling — the codes
  are constant along a ray, so this removes a (B·S, D_z)·(D_z, W) matmul per
  block in favor of (B, D_z)·(D_z, W);
- viewdir positional encoding is computed per ray and broadcast, not tiled
  per sample (the reference materializes (B·S, 27));
- matmuls run in a configurable compute dtype (bfloat16 by default, hitting
  the MXU's fast path) with float32 accumulation via
  ``preferred_element_type``; sigma/rgb heads and all compositing stay f32.

Initialization matches ``torch.nn.Linear``'s default (U(-1/sqrt(fan_in),
1/sqrt(fan_in)) for both weight and bias) so training dynamics are
comparable to the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from codenerf_tpu.config import NetConfig
from codenerf_tpu.core.encoding import positional_encoding

Params = Dict[str, Any]


def _init_dense(key: jax.Array, d_in: int, d_out: int) -> Dict[str, jnp.ndarray]:
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(d_in)))
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound),
    }


def _dense(p: Dict[str, jnp.ndarray], x: jnp.ndarray,
           compute_dtype: jnp.dtype) -> jnp.ndarray:
    """x @ w + b: compute-dtype matmul with float32 MXU accumulation, output
    cast back to compute dtype.

    The output cast is load-bearing for the BACKWARD pass: JAX cotangents
    take the primal output's dtype, so an f32 layer output would make every
    backward dot_general an f32 matmul (~8x slower than bf16 on the MXU) and
    double the residual bytes. With bf16 outputs the whole backward runs on
    the fast path; the f32 accumulation inside each dot is preserved via
    ``preferred_element_type``.
    """
    y = jnp.dot(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        preferred_element_type=compute_dtype,
    )
    return y + p["b"].astype(compute_dtype)


def init_codenerf(key: jax.Array, cfg: NetConfig) -> Params:
    """Initialize the parameter pytree. Layer names are stable and form the
    checkpoint schema (see utils/checkpoint.py)."""
    n_layers = 4 + 2 * cfg.shape_blocks + 2 * cfg.texture_blocks + 2
    keys = iter(jax.random.split(key, n_layers))
    p: Params = {}
    p["enc_xyz"] = _init_dense(next(keys), cfg.d_xyz, cfg.W)
    for j in range(cfg.shape_blocks):
        p[f"shape_latent_{j}"] = _init_dense(next(keys), cfg.latent_dim, cfg.W)
        p[f"shape_{j}"] = _init_dense(next(keys), cfg.W, cfg.W)
    p["enc_shape"] = _init_dense(next(keys), cfg.W, cfg.W)
    p["sigma"] = _init_dense(next(keys), cfg.W, 1)
    p["enc_viewdir"] = _init_dense(next(keys), cfg.W + cfg.d_viewdir, cfg.W)
    for j in range(cfg.texture_blocks):
        p[f"texture_latent_{j}"] = _init_dense(next(keys), cfg.latent_dim, cfg.W)
        p[f"texture_{j}"] = _init_dense(next(keys), cfg.W, cfg.W)
    p["rgb_hidden"] = _init_dense(next(keys), cfg.W, cfg.W // 2)
    p["rgb_out"] = _init_dense(next(keys), cfg.W // 2, 3)
    return p


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def apply_codenerf(
    params: Params,
    cfg: NetConfig,
    xyz: jnp.ndarray,
    viewdir: jnp.ndarray,
    shape_code: jnp.ndarray,
    texture_code: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate density and color at sample points.

    Args:
      xyz:          (R, S, 3) sample positions.
      viewdir:      (R, 3) unit view directions (one per ray — broadcast over
                    samples internally) or (R, S, 3) per-point.
      shape_code:   (R, D_z) per-ray codes or (D_z,) a single object's code.
      texture_code: same shape rules as shape_code.

    Returns:
      sigmas (R, S) float32 nonnegative, rgbs (R, S, 3) float32 (unbounded —
      the reference has no output sigmoid).
    """
    R, S = xyz.shape[0], xyz.shape[1]
    cd = compute_dtype

    def act(x):
        return jax.nn.relu(x).astype(cd)

    if shape_code.ndim == 1:
        shape_code = jnp.broadcast_to(shape_code, (R, shape_code.shape[-1]))
    if texture_code.ndim == 1:
        texture_code = jnp.broadcast_to(texture_code, (R, texture_code.shape[-1]))

    x_pe = positional_encoding(xyz, cfg.num_xyz_freq)  # (R, S, d_xyz) f32
    y = act(_dense(params["enc_xyz"], x_pe, cd))       # (R, S, W)
    for j in range(cfg.shape_blocks):
        z = act(_dense(params[f"shape_latent_{j}"], shape_code, cd))  # (R, W)
        y = y + z[:, None, :]
        y = act(_dense(params[f"shape_{j}"], y, cd))
    y = _dense(params["enc_shape"], y, cd)  # no activation (model.py:26)
    sigmas = jax.nn.softplus(_dense(params["sigma"], y.astype(jnp.float32),
                                    jnp.float32))[..., 0]

    if viewdir.ndim == 2:
        vd_pe = positional_encoding(viewdir, cfg.num_dir_freq)  # (R, d_vd)
        vd_pe = jnp.broadcast_to(vd_pe[:, None, :], (R, S, vd_pe.shape[-1]))
    else:
        vd_pe = positional_encoding(viewdir, cfg.num_dir_freq)  # (R, S, d_vd)
    y = jnp.concatenate([y.astype(cd), vd_pe.astype(cd)], axis=-1)
    y = act(_dense(params["enc_viewdir"], y, cd))
    for j in range(cfg.texture_blocks):
        z = act(_dense(params[f"texture_latent_{j}"], texture_code, cd))
        y = y + z[:, None, :]
        y = act(_dense(params[f"texture_{j}"], y, cd))
    y = act(_dense(params["rgb_hidden"], y, cd))
    rgbs = _dense(params["rgb_out"], y.astype(jnp.float32), jnp.float32)
    return sigmas, rgbs
