"""Differentiable camera-pose parameterization (se(3) exponential map).

The reference declares "Pose Optimizing" in its feature catalog but ships no
code for it (``README.md:24-25``); this module provides the TPU-native
implementation used by :mod:`codenerf_tpu.optimization.pose_opt`: a pose
refinement is a 6-vector ``xi = (omega, t)`` applied as
``c2w' = exp(xi) @ c2w``, differentiable end-to-end through ray generation.

All math is closed-form (Rodrigues / left-Jacobian), jit- and vmap-safe.
Numerical stability at theta -> 0 uses the double-``where`` pattern: the
angle under the sqrt is clamped away from zero BEFORE the transcendental so
neither branch of the select produces NaN in the backward pass (a single
``where`` still back-propagates NaN from the unselected branch).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS2 = 1e-12


def _hat(omega: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) -> (..., 3, 3)."""
    ox, oy, oz = omega[..., 0], omega[..., 1], omega[..., 2]
    zeros = jnp.zeros_like(ox)
    return jnp.stack(
        [
            jnp.stack([zeros, -oz, oy], axis=-1),
            jnp.stack([oz, zeros, -ox], axis=-1),
            jnp.stack([-oy, ox, zeros], axis=-1),
        ],
        axis=-2,
    )


def _sincos_coeffs(omega: jnp.ndarray):
    """Returns (a, b, c) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3) with
    Taylor fallbacks, all NaN-free under differentiation at omega = 0."""
    t2_raw = jnp.sum(omega * omega, axis=-1, keepdims=True)[..., None]
    small = t2_raw < _EPS2
    t2 = jnp.where(small, 1.0, t2_raw)  # clamp BEFORE sqrt: safe gradients
    theta = jnp.sqrt(t2)
    a = jnp.where(small, 1.0 - t2_raw / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2_raw / 24.0, (1.0 - jnp.cos(theta)) / t2)
    c = jnp.where(small, 1.0 / 6.0 - t2_raw / 120.0,
                  (theta - jnp.sin(theta)) / (t2 * theta))
    return a, b, c


def exp_so3(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    a, b, _ = _sincos_coeffs(omega)
    K = _hat(omega)
    return jnp.eye(3, dtype=omega.dtype) + a * K + b * (K @ K)


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential: (..., 6) twist (omega, t) -> (..., 4, 4) transform."""
    omega, t = xi[..., :3], xi[..., 3:]
    a, b, c = _sincos_coeffs(omega)
    K = _hat(omega)
    K2 = K @ K
    eye = jnp.eye(3, dtype=xi.dtype)
    R = eye + a * K + b * K2
    V = eye + b * K + c * K2
    trans = jnp.einsum("...ij,...j->...i", V, t)
    top = jnp.concatenate([R, trans[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def refine_pose(xi: jnp.ndarray, c2w: jnp.ndarray) -> jnp.ndarray:
    """Apply a twist refinement to a base pose: ``exp(xi) @ c2w``.

    xi (..., 6); c2w (..., 4, 4). Returns (..., 4, 4).
    """
    return exp_se3(xi) @ c2w
