"""High-level ray/image rendering on top of the pure core.

This is the single rendering path shared by training, test-time code
optimization, evaluation, pose optimization and editing (the reference
duplicates its render loop in three places: ``src/trainer.py:65-84``,
``src/optimizer.py:75-94`` and ``src/optimizer.py:110-124``).

Coarse pass: stratified z-values (per-ray by default; the reference's
shared-jitter quirk behind ``RenderConfig.shared_jitter``), MLP evaluation,
alpha compositing. Optional fine pass (``RenderConfig.n_importance > 0``,
absent from the reference): inverse-CDF importance sampling from the coarse
weights, union-sorted re-evaluation — standard NeRF hierarchical sampling.

Everything is shape-static and jit-safe; image rendering runs a
``lax.map`` over fixed-size ray chunks so one compiled executable serves
any image whose pixel count is a multiple of the chunk.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from codenerf_tpu.config import NetConfig, RenderConfig
from codenerf_tpu.core.render import RenderOutput, composite
from codenerf_tpu.core.rays import camera_rays, ray_sphere_bounds
from codenerf_tpu.core.sampling import (
    fixed_zvals,
    merge_sorted_samples,
    sample_pdf,
    stratified_zvals,
    union_sorted_zvals,
)
from codenerf_tpu.models.codenerf import apply_codenerf


class RenderResult(NamedTuple):
    coarse: RenderOutput
    fine: Optional[RenderOutput]

    @property
    def final(self) -> RenderOutput:
        """The output to train against / display: fine if present."""
        return self.fine if self.fine is not None else self.coarse


def chunk_plan(n_rays: int, target: int = 4096) -> tuple:
    """Plan fixed-size ray chunking: returns ``(chunk, n_chunks, n_padded)``.

    Prefers an exact divisor of ``n_rays`` when a reasonable one exists
    (>= half the target — zero padding waste; 128x128 gives the natural
    4096, 96x96 gives 3072). Otherwise the ray axis is padded: the chunk is
    the per-chunk share rounded up to a 128-lane multiple, so waste stays
    under one lane row per chunk (a 65x65 render pads 4225 -> 4352, not to
    2 x 4096). Previously a prime ray count degraded to chunk=1 — a 127x127
    render would have issued 16,129 sequential ``lax.map`` steps."""
    if n_rays <= target:
        return n_rays, 1, n_rays
    for c in range(target, target // 2 - 1, -1):
        if n_rays % c == 0:
            return c, n_rays // c, n_rays
    n_chunks = -(-n_rays // target)            # ceil
    per_chunk = -(-n_rays // n_chunks)
    chunk = min(target, ((per_chunk + 127) // 128) * 128)
    n_chunks = -(-n_rays // chunk)
    return chunk, n_chunks, n_chunks * chunk


def pick_chunk(n_rays: int, target: int = 4096) -> int:
    """Chunk size from :func:`chunk_plan`. When it does not divide
    ``n_rays``, callers must pad the ray axis (see :func:`pad_rays`)."""
    return chunk_plan(n_rays, target)[0]


def pad_rays(x: jnp.ndarray, n_padded: int) -> jnp.ndarray:
    """Pad the leading (ray) axis to ``n_padded`` by edge-repeating the last
    row — pad rays stay geometrically valid, outputs are sliced away."""
    n = x.shape[0]
    if n == n_padded:
        return x
    return jnp.concatenate(
        [x, jnp.broadcast_to(x[-1:], (n_padded - n, *x.shape[1:]))], axis=0
    )


def coarse_zvals(
    rcfg: RenderConfig,
    ray_o: jnp.ndarray,
    viewdir: jnp.ndarray,
    key: Optional[jax.Array],
    occ_grid=None,
) -> tuple:
    """Coarse depth samples for a ray batch — the single z-generation path
    shared by :func:`render_rays` and the fused-loss training step.

    Returns ``(z_coarse (R, n_samples) f32, key_fine)`` where ``key_fine``
    is the split-off key for hierarchical sampling (``None`` when ``key``
    is None, i.e. deterministic midpoint rendering). Per-ray bounds
    tighten [near, far] to the bounding sphere and/or the occupancy grid
    (skipped under the reference's shared-jitter quirk, which is by
    definition one global slab)."""
    R = ray_o.shape[0]
    deterministic = key is None
    use_bounds = (
        rcfg.bound_sphere_radius is not None or occ_grid is not None
    ) and not rcfg.shared_jitter
    if use_bounds:
        if rcfg.bound_sphere_radius is not None:
            t0, t1 = ray_sphere_bounds(ray_o, viewdir, rcfg.near, rcfg.far,
                                       rcfg.bound_sphere_radius)
        else:
            t0 = jnp.full((R,), rcfg.near, jnp.float32)
            t1 = jnp.full((R,), rcfg.far, jnp.float32)
        if occ_grid is not None:
            from codenerf_tpu.core.occupancy import ray_grid_bounds

            t0, t1 = ray_grid_bounds(occ_grid, ray_o, viewdir, t0, t1,
                                     n_probes=rcfg.occ_probes)
    if deterministic:
        if use_bounds:
            t = jnp.linspace(0.0, 1.0, rcfg.n_samples, dtype=jnp.float32)
            z_coarse = t0[:, None] + t[None, :] * (t1 - t0)[:, None]
        else:
            z_coarse = jnp.broadcast_to(
                fixed_zvals(rcfg.near, rcfg.far, rcfg.n_samples),
                (R, rcfg.n_samples),
            )
        key_fine = None
    else:
        key_z, key_fine = jax.random.split(key)
        z_coarse = stratified_zvals(
            key_z,
            t0 if use_bounds else rcfg.near,
            t1 if use_bounds else rcfg.far,
            rcfg.n_samples,
            num_rays=R, shared=rcfg.shared_jitter,
        )
        if z_coarse.ndim == 1:
            z_coarse = jnp.broadcast_to(z_coarse, (R, rcfg.n_samples))
    return z_coarse, key_fine


def render_rays(
    params,
    net_cfg: NetConfig,
    rcfg: RenderConfig,
    ray_o: jnp.ndarray,
    viewdir: jnp.ndarray,
    shape_code: jnp.ndarray,
    texture_code: jnp.ndarray,
    key: Optional[jax.Array],
    fine_params=None,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    apply_fn=None,
    composite_fn=None,
    occ_grid=None,
) -> RenderResult:
    """Render a batch of rays.

    Args:
      ray_o, viewdir: (R, 3) origins and unit directions.
      shape_code, texture_code: (R, D) per-ray or (D,) single-object codes.
      key: PRNG key for stratified jitter; ``None`` renders deterministically
           (midpoint z-values + even CDF probes in the fine pass).
      fine_params: separate fine-network params when
           ``rcfg.share_fine_weights`` is False; ignored otherwise.
      apply_fn: optional ray-native MLP evaluation override with the
           signature ``fn(params, cfg, ray_o, viewdir, z_vals, s_code,
           t_code) -> (sigmas (R, S), rgbs)`` where rgbs is (R, S, 3) or a
           tuple of three (R, S) channel planes — used to swap in the
           fused Pallas kernels (which expand xyz and composite in the
           TPU-native plane layout); defaults to the XLA ``apply_codenerf``.
      composite_fn: optional FULLY-fused evaluation: same signature but
           returning a finished ``RenderOutput`` (MLP + volume rendering in
           one op, ``ops/fused_train.fused_render_train``). Its ``weights``
           may be None, so it is coarse-only — incompatible with
           ``rcfg.n_importance > 0``.
      occ_grid: optional :class:`core.occupancy.OccupancyGrid` — per-ray
           [t0, t1] tightens to the occupied span (empty-space skipping
           beyond the bounding sphere; ``rcfg.occ_probes`` probes/ray).
    """
    R = ray_o.shape[0]
    if composite_fn is not None and rcfg.n_importance > 0:
        raise ValueError(
            "composite_fn (fused in-kernel volume rendering) does not emit "
            "the weights plane hierarchical sampling needs; use apply_fn "
            "with n_importance > 0"
        )
    z_coarse, key_fine = coarse_zvals(rcfg, ray_o, viewdir, key,
                                      occ_grid=occ_grid)
    deterministic = key is None

    def eval_and_composite(p, z_vals):
        if composite_fn is not None:
            z2d = jnp.broadcast_to(z_vals, (R, z_vals.shape[-1]))
            return composite_fn(p, net_cfg, ray_o, viewdir, z2d,
                                shape_code, texture_code)
        if apply_fn is not None:
            z2d = jnp.broadcast_to(z_vals, (R, z_vals.shape[-1]))
            sigmas, rgbs = apply_fn(p, net_cfg, ray_o, viewdir, z2d,
                                    shape_code, texture_code)
            return composite(sigmas, rgbs, z2d, white_bg=rcfg.white_bg)
        xyz = ray_o[:, None, :] + viewdir[:, None, :] * z_vals[..., None]
        sigmas, rgbs = apply_codenerf(
            p, net_cfg, xyz, viewdir, shape_code, texture_code,
            compute_dtype=compute_dtype,
        )
        return composite(sigmas, rgbs, z_vals, white_bg=rcfg.white_bg)

    def eval_raw(p, z_vals):
        """Per-sample sigmas (R, S) + rgb channel planes at z_vals, no
        compositing — the raw form the shared-weight hierarchical merge
        caches."""
        z2d = jnp.broadcast_to(z_vals, (R, z_vals.shape[-1]))
        xyz = ray_o[:, None, :] + viewdir[:, None, :] * z2d[..., None]
        sigmas, rgbs = apply_codenerf(
            p, net_cfg, xyz, viewdir, shape_code, texture_code,
            compute_dtype=compute_dtype,
        )
        return z2d, sigmas, (rgbs[..., 0], rgbs[..., 1], rgbs[..., 2])

    # Shared-weight hierarchical sampling on the plain XLA path evaluates
    # the MLP only at the n_importance NEW samples: the fine pass's values
    # at the coarse z's are identical to the coarse pass's (same network,
    # same inputs), so they are cached and stable-merge-sorted into union
    # order instead of recomputed — 1/3 fewer point evaluations at the
    # default 64+64 config, on a forward that is HBM-roofline-bound
    # (docs/ARCHITECTURE.md). Exact: gradients of the reused formulation
    # are the gradients of `fine_loss(f(z_union)) + coarse_loss(f(z_c))`
    # with f evaluated once per distinct z, the same function autodiff
    # differentiates either way. The fused kernel paths (apply_fn /
    # composite_fn) keep the explicit union evaluation — their sample
    # counts are kernel-validated and their single-pass backward cannot
    # accept external cotangents.
    reuse_coarse = (
        rcfg.n_importance > 0
        and apply_fn is None and composite_fn is None
        and (rcfg.share_fine_weights or fine_params is None)
    )
    if reuse_coarse:
        z2d_c, sig_c, rgb_c = eval_raw(params, z_coarse)
        coarse = composite(sig_c, rgb_c, z2d_c, white_bg=rcfg.white_bg)
    else:
        coarse = eval_and_composite(params, z_coarse)
    if rcfg.n_importance <= 0:
        return RenderResult(coarse=coarse, fine=None)

    # Importance sampling between coarse midpoints, standard NeRF recipe:
    # interior weights drive a piecewise-constant pdf over mid-bins.
    z_mid = 0.5 * (z_coarse[..., 1:] + z_coarse[..., :-1])
    w_interior = jax.lax.stop_gradient(coarse.weights[..., 1:-1])
    z_fine = sample_pdf(
        key_fine if key_fine is not None else jax.random.PRNGKey(0),
        z_mid, w_interior, rcfg.n_importance,
        deterministic=deterministic,
    )
    if reuse_coarse:
        z2d_f, sig_f, rgb_f = eval_raw(params, z_fine)
        z_all, merged = merge_sorted_samples(
            z2d_c, z2d_f, (sig_c,) + rgb_c, (sig_f,) + rgb_f)
        fine = composite(merged[0], merged[1:], z_all,
                         white_bg=rcfg.white_bg)
        return RenderResult(coarse=coarse, fine=fine)
    z_all = union_sorted_zvals(z_coarse, z_fine)
    p_fine = params if (rcfg.share_fine_weights or fine_params is None) else fine_params
    fine = eval_and_composite(p_fine, z_all)
    return RenderResult(coarse=coarse, fine=fine)


def render_image(
    params,
    net_cfg: NetConfig,
    rcfg: RenderConfig,
    H: int,
    W: int,
    focal,
    c2w: jnp.ndarray,
    shape_code: jnp.ndarray,
    texture_code: jnp.ndarray,
    key: Optional[jax.Array] = None,
    chunk: int = 4096,
    fine_params=None,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    occ_grid=None,
) -> jnp.ndarray:
    """Render a full H×W image; returns (H, W, 3) float32.

    Ray chunking uses ``lax.map`` over a static chunk count, so memory stays
    bounded at ``chunk × samples`` while the whole render remains one jitted
    computation (the reference runs a python loop with per-chunk H2D copies,
    ``src/optimizer.py:79-85``).
    """
    n_rays = H * W
    chunk, n_chunks, n_padded = chunk_plan(n_rays, chunk)
    ray_o, viewdir = camera_rays(H, W, focal, c2w)
    ro = pad_rays(ray_o, n_padded).reshape(n_chunks, chunk, 3)
    vd = pad_rays(viewdir, n_padded).reshape(n_chunks, chunk, 3)
    keys = (
        jax.random.split(key, n_chunks) if key is not None else jnp.zeros((n_chunks,))
    )

    def render_chunk(args):
        ro_c, vd_c, k = args
        res = render_rays(
            params, net_cfg, rcfg, ro_c, vd_c, shape_code, texture_code,
            key=None if key is None else k,
            fine_params=fine_params, compute_dtype=compute_dtype,
            occ_grid=occ_grid,
        )
        return res.final.rgb

    rgb = jax.lax.map(render_chunk, (ro, vd, keys))
    return rgb.reshape(n_padded, 3)[:n_rays].reshape(H, W, 3)
