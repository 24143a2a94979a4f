"""Ray generation for pinhole cameras.

Matches the reference math (``src/utils.py:10-19``): camera-frame direction
for pixel (u, v) is ``[(u - W/2)/f, -(v - H/2)/f, -1]`` (OpenGL-style axes
after the SRN pose flip), rotated into world frame by ``c2w[:3,:3]``;
origins are the camera center ``c2w[:3, 3]``.

Two entry points:

- :func:`camera_rays` — all H×W rays of one pose (the reference's
  whole-image layout; used by eval/rendering paths).
- :func:`pixel_rays`  — rays for an arbitrary batch of (pixel, pose, focal)
  triples. This is the TPU-native training path: the host pipeline samples
  pixels globally across objects/views, and ray construction happens
  on-device inside the jitted step (only poses + pixel coords cross PCIe,
  not precomputed ray tensors).

Center-crop note: the reference crops images to the middle 64×64 and halves
H, W while keeping the focal length (``src/data.py:76-78``). Because the
crop preserves the principal point, a cropped-pixel ray equals the ray of
the same pixel in full-image coordinates; :func:`pixel_rays` therefore
always takes *full-image* pixel coordinates and dimensions, and crop mode is
purely a restriction of the sampled pixel range in the data pipeline.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _camera_dirs(u: jnp.ndarray, v: jnp.ndarray, focal: jnp.ndarray,
                 H: float, W: float) -> jnp.ndarray:
    """Camera-frame (unnormalized) direction per pixel. u, v broadcastable."""
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)
    focal = jnp.asarray(focal, dtype=jnp.float32)
    return jnp.stack(
        [
            (u - W * 0.5) / focal,
            -(v - H * 0.5) / focal,
            -jnp.ones_like(u),
        ],
        axis=-1,
    )


def camera_rays(H: int, W: int, focal, c2w: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All rays of an H×W image under pose ``c2w`` (4×4 or 3×4).

    Returns (origins (H·W, 3), unit viewdirs (H·W, 3)) in row-major pixel
    order, identical to the reference's flattening (``src/utils.py:17-18``).
    """
    c2w = jnp.asarray(c2w, dtype=jnp.float32)
    v, u = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dirs = _camera_dirs(u, v, focal, float(H), float(W))  # (H, W, 3)
    rays_d = dirs @ c2w[:3, :3].T
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), viewdirs.reshape(-1, 3)


def ray_sphere_bounds(
    ray_o: jnp.ndarray,
    viewdir: jnp.ndarray,
    near: float,
    far: float,
    radius: float,
    center: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray [t_near, t_far] from intersecting a bounding sphere.

    ShapeNet-SRN objects are origin-centered and unit-normalized, so a
    bounding sphere tightens the global [near, far] slab substantially —
    the fixed per-ray sample budget then lands on the object instead of
    empty space (sampling-efficiency idea from the NerfAcc line of work,
    arXiv 2305.04966, recast with static shapes: rays that miss the sphere
    keep a degenerate [near, near+eps] interval rather than being culled,
    so the batch shape never changes).

    Returns (t0 (R,), t1 (R,)), clipped to [near, far], t1 >= t0.
    """
    c = jnp.asarray(center, jnp.float32)
    oc = ray_o - c
    b = jnp.sum(oc * viewdir, axis=-1)
    disc = b * b - (jnp.sum(oc * oc, axis=-1) - radius * radius)
    hit = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = jnp.clip(-b - sq, near, far)
    t1 = jnp.clip(-b + sq, near, far)
    eps = 1e-3 * (far - near)
    t0 = jnp.where(hit, t0, near)
    t1 = jnp.where(hit, jnp.maximum(t1, t0 + eps), near + eps)
    return t0, t1


def pixel_rays(uv: jnp.ndarray, focal: jnp.ndarray, c2w: jnp.ndarray,
               H: float, W: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for a batch of pixels with per-ray pose and focal.

    Args:
      uv:    (..., 2) pixel coordinates, ``uv[..., 0]`` = u (column, along
             width), ``uv[..., 1]`` = v (row), in FULL-image coordinates.
      focal: (...,) focal lengths.
      c2w:   (..., 3, 4) or (..., 4, 4) camera-to-world poses.
      H, W:  full image dimensions (static).

    Returns (origins (..., 3), unit viewdirs (..., 3)).
    """
    c2w = jnp.asarray(c2w, dtype=jnp.float32)
    dirs = _camera_dirs(uv[..., 0], uv[..., 1], focal, float(H), float(W))
    rays_d = jnp.einsum("...rc,...c->...r", c2w[..., :3, :3], dirs)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    return rays_o, viewdirs
