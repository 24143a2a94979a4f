"""Shape/texture editing via latent-code interpolation.

Implements the "Editing Shapes/Textures" capability the reference catalogs
but never implemented (``README.md:24-25``; SURVEY §2.1 row 22): because
CodeNeRF disentangles shape and texture codes, edits are renders under
interpolated / swapped codes. Everything reuses the single rendering path;
grids render as one jitted ``lax.map`` over code pairs (device-resident,
no per-frame dispatch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from codenerf_tpu.config import Hparams, resolve_dtype
from codenerf_tpu.core.rays import camera_rays
from codenerf_tpu.renderer import chunk_plan, pad_rays, render_rays


def interpolate_codes(code_a: jnp.ndarray, code_b: jnp.ndarray,
                      n: int) -> jnp.ndarray:
    """Linear interpolation grid between two codes: (n, D) with endpoints
    included."""
    t = jnp.linspace(0.0, 1.0, n)[:, None]
    return (1.0 - t) * code_a[None, :] + t * code_b[None, :]


def render_code_grid(
    params,
    hp: Hparams,
    shape_codes: jnp.ndarray,    # (G, D)
    texture_codes: jnp.ndarray,  # (G, D)
    H: int,
    W: int,
    focal: float,
    c2w: jnp.ndarray,
    chunk: int = 4096,
    fine_params=None,
) -> jnp.ndarray:
    """Render one image per (shape, texture) code pair from a fixed camera.
    Returns (G, H, W, 3) float32. Deterministic z-sampling (midpoints)."""
    net_cfg, rcfg = hp.net, hp.render
    compute_dtype = resolve_dtype(hp.compute_dtype)
    n_rays = H * W
    chunk, n_chunks, n_padded = chunk_plan(n_rays, chunk)
    ro, vd = camera_rays(H, W, focal, c2w)
    ro_c = pad_rays(ro, n_padded).reshape(n_chunks, chunk, 3)
    vd_c = pad_rays(vd, n_padded).reshape(n_chunks, chunk, 3)

    @jax.jit
    def render_all(shape_codes, texture_codes):
        def render_one(codes):
            s, t = codes

            def render_chunk(xs):
                ro_i, vd_i = xs
                res = render_rays(
                    params, net_cfg, rcfg, ro_i, vd_i, s, t, key=None,
                    fine_params=fine_params, compute_dtype=compute_dtype,
                )
                return res.final.rgb

            return jax.lax.map(render_chunk, (ro_c, vd_c)).reshape(
                n_padded, 3)[:n_rays].reshape(H, W, 3)

        return jax.lax.map(render_one, (shape_codes, texture_codes))

    return render_all(shape_codes, texture_codes)


def render_shape_texture_matrix(
    params,
    hp: Hparams,
    shape_codes: jnp.ndarray,    # (Gs, D)
    texture_codes: jnp.ndarray,  # (Gt, D)
    H: int,
    W: int,
    focal: float,
    c2w: jnp.ndarray,
    chunk: int = 4096,
    fine_params=None,
) -> jnp.ndarray:
    """Full cross product: every shape code rendered with every texture code
    (the paper's disentanglement figure). Returns (Gs, Gt, H, W, 3)."""
    Gs, Gt = shape_codes.shape[0], texture_codes.shape[0]
    s_grid = jnp.repeat(shape_codes, Gt, axis=0)
    t_grid = jnp.tile(texture_codes, (Gs, 1))
    imgs = render_code_grid(
        params, hp, s_grid, t_grid, H, W, focal, c2w,
        chunk=chunk, fine_params=fine_params,
    )
    return imgs.reshape(Gs, Gt, H, W, 3)
