"""Joint camera-pose + latent-code optimization.

Implements the "Pose Optimizing" capability the reference catalogs but never
implemented (``README.md:24-25``; SURVEY §2.1 row 22): given an image of an
unseen object with an UNKNOWN/inaccurate pose, jointly optimize an se(3)
pose refinement (``core/poses.py``) together with the shape/texture codes by
gradient descent through ray generation and volume rendering — the paper's
recipe (CodeNeRF §4.3, arXiv 2109.01750).

The whole optimization is one jitted ``lax.scan``; every step re-derives the
rays from the current pose estimate and renders a fresh random subset of
pixels (static subset size -> no recompiles).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from codenerf_tpu.config import Hparams, resolve_dtype
from codenerf_tpu.core.poses import refine_pose
from codenerf_tpu.core.rays import pixel_rays
from codenerf_tpu.evaluation.metrics import psnr as psnr_fn
from codenerf_tpu.renderer import render_rays
from codenerf_tpu.training.schedules import step_halving


class PoseOptimizationResult(NamedTuple):
    c2w: jnp.ndarray           # (4, 4) refined pose
    xi: jnp.ndarray            # (6,) twist actually applied
    shape_code: jnp.ndarray    # (D,)
    texture_code: jnp.ndarray  # (D,)
    psnr_history: jnp.ndarray  # (num_opts,)


def optimize_pose_and_codes(
    params,
    hp: Hparams,
    image: jnp.ndarray,        # (H, W, 3) float [0,1]
    init_c2w: jnp.ndarray,     # (4, 4) initial pose guess
    focal: float,
    init_shape: jnp.ndarray,
    init_texture: jnp.ndarray,
    key: jax.Array,
    num_opts: int = 200,
    lr_codes: float = 1e-2,
    lr_pose: float = 1e-2,
    lr_half_interval: int = 50,
    rays_per_step: int = 2048,
    optimize_codes: bool = True,
    pose_only_steps: int = 0,
    fine_params=None,
    use_fused=None,
) -> PoseOptimizationResult:
    """Jointly refine (pose, codes) against one target image.

    ``optimize_codes=False`` freezes the codes (pure pose registration).
    ``pose_only_steps > 0`` freezes the codes for the first k steps — the
    pose/code ambiguity means free codes can absorb a pose error instead of
    the pose correcting, so registering the pose first is usually better.

    ``use_fused`` (default: ``hp.use_fused_train``) runs each step through
    the pose-variant fused Pallas kernels (frozen weights, ray/depth
    cotangents kept — the pose gradient flows through ray generation both
    in-kernel and through the per-ray prologue). When ``fused_composite``
    is also on, each step is a SINGLE-PASS frozen-model kernel call
    (forward + volume rendering + MSE cotangent + input-chain backward in
    one grid step, 2F of MLP FLOPs) whose exact ``(d_ro, d_vd, d_z)``
    cotangents chain through one ``jax.vjp`` over pose→ray→bounds→sample
    generation — the same structure as single-pass codes optimization.
    """
    from codenerf_tpu.optimization.codes_opt import (
        build_fused_codes_fns,
        safe_code_norm,
    )
    from codenerf_tpu.ops import fused_mlp
    from codenerf_tpu.ops import fused_train as ft_mod

    net_cfg, rcfg = hp.net, hp.render
    compute_dtype = resolve_dtype(hp.compute_dtype)
    H, W = image.shape[0], image.shape[1]
    flat_rgb = image.reshape(-1, 3).astype(jnp.float32)
    init_c2w = jnp.asarray(init_c2w, jnp.float32)
    rays_per_step = min(rays_per_step, H * W)
    fused = hp.use_fused_train if use_fused is None else use_fused
    hier = rcfg.n_importance > 0
    use_single_pass = (
        fused and hp.fused_composite
        and (not hier or rcfg.share_fine_weights)
        and ft_mod.single_pass_available(net_cfg, rays_per_step)
    )
    apply_fn = composite_fn = None
    if not use_single_pass:
        apply_fn, composite_fn = build_fused_codes_fns(
            hp, rays_per_step, use_fused=use_fused, input_grads=True)

    tx = optax.multi_transform(
        {
            "pose": optax.adam(step_halving(lr_pose, lr_half_interval)),
            "codes": optax.adamw(
                step_halving(lr_codes, lr_half_interval),
                weight_decay=hp.weight_decay,
            ),
        },
        {"xi": "pose", "shape": "codes", "texture": "codes"},
    )

    def loss_fn(variables, step_key):
        c2w = refine_pose(variables["xi"], init_c2w)
        pix = jax.random.randint(step_key, (rays_per_step,), 0, H * W)
        u = (pix % W).astype(jnp.float32)
        v = (pix // W).astype(jnp.float32)
        uv = jnp.stack([u, v], axis=-1)
        c2w_b = jnp.broadcast_to(c2w[:3, :], (rays_per_step, 3, 4))
        focal_b = jnp.full((rays_per_step,), focal, jnp.float32)
        ro, vd = pixel_rays(uv, focal_b, c2w_b, H, W)
        shape_code = variables["shape"] if optimize_codes else jax.lax.stop_gradient(variables["shape"])
        texture_code = variables["texture"] if optimize_codes else jax.lax.stop_gradient(variables["texture"])
        res = render_rays(
            params, net_cfg, rcfg, ro, vd, shape_code, texture_code,
            jax.random.fold_in(step_key, 1),
            fine_params=fine_params, compute_dtype=compute_dtype,
            apply_fn=apply_fn, composite_fn=composite_fn,
        )
        gt = flat_rgb[pix]
        mse = jnp.mean((res.final.rgb - gt) ** 2)
        loss = mse
        if res.fine is not None:
            loss = loss + jnp.mean((res.coarse.rgb - gt) ** 2)
        reg = safe_code_norm(shape_code) + safe_code_norm(texture_code)
        return loss + hp.loss_reg_coef * reg, mse

    # SINGLE-PASS pose backward: the frozen-model kernel variant with
    # input cotangents (weight_grads=False, input_grads=True). One
    # jax.vjp over the pose→ray→bounds→sample→projection prologue chains
    # the kernel's exact (d_ro8, d_vd8, d_z, d_sproj, d_tproj,
    # d_vcontrib) into the se(3)/code gradient; hierarchical adds a
    # second vjp over z→sample_pdf→union (z_mid is differentiable w.r.t.
    # the pose — matching renderer.render_rays, only the coarse WEIGHTS
    # are behind stop_gradient).
    if use_single_pass:
        from codenerf_tpu.renderer import coarse_zvals
        scale = 1.0 / (rays_per_step * 3.0)
        f32 = jnp.float32
        wflat_sp = [jax.lax.stop_gradient(w)
                    for w in ft_mod.flatten_params_f32(params, net_cfg)]

        def sp_value_and_grad(variables, step_key):
            pix = jax.random.randint(step_key, (rays_per_step,), 0, H * W)
            u = (pix % W).astype(f32)
            v = (pix // W).astype(f32)
            uv = jnp.stack([u, v], axis=-1)
            gt8 = fused_mlp._pad_lanes(flat_rgb[pix], 8)
            render_key = jax.random.fold_in(step_key, 1)
            key_fine = jax.random.split(render_key)[1]  # coarse_zvals split
            focal_b = jnp.full((rays_per_step,), focal, f32)

            def prologue(variables):
                c2w = refine_pose(variables["xi"], init_c2w)
                c2w_b = jnp.broadcast_to(c2w[:3, :], (rays_per_step, 3, 4))
                ro, vd = pixel_rays(uv, focal_b, c2w_b, H, W)
                sc, tc = variables["shape"], variables["texture"]
                if not optimize_codes:
                    sc = jax.lax.stop_gradient(sc)
                    tc = jax.lax.stop_gradient(tc)
                z2d, _ = coarse_zvals(rcfg, ro, vd, render_key)
                return fused_mlp.prep_ray_operands(
                    params, net_cfg, ro, vd, z2d, sc, tc)

            ops6, pvjp = jax.vjp(prologue, variables)
            ro8, vd8, z2d, sproj, tproj, vcontrib = ops6
            outs = ft_mod.invoke_train_fused(
                net_cfg, z2d.shape[1], rays_per_step, rcfg.white_bg, scale,
                ro8, vd8, z2d, sproj, tproj, vcontrib, gt8, wflat_sp,
                want_weights=hier, weight_grads=False, input_grads=True)
            se_c, d_sproj, d_tproj, d_vcontrib = outs[:4]
            idx = 4
            if hier:
                w_coarse = outs[idx]
                idx += 1
            d_ro8, d_vd8, d_z = outs[idx:idx + 3]
            if hier:
                # The pose gradient flows through the z-midpoints of the
                # importance sampler (the weights are stop_gradient'ed
                # inside the helper) — vjp over the shared recipe.
                # Pose keeps the TWO-CALL structure (unlike training /
                # codes-opt, which use the dual-composite union kernel):
                # input_grads needs the coarse composite's own d_z term
                # routed through the union permutation, which the
                # training-only dual mode deliberately does not emit.
                z_all, zvjp = jax.vjp(
                    lambda z_: ft_mod.hier_fine_zvals(
                        z_, w_coarse, key_fine, rcfg.n_importance), z2d)
                outs_f = ft_mod.invoke_train_fused(
                    net_cfg, z_all.shape[1], rays_per_step, rcfg.white_bg,
                    scale, ro8, vd8, z_all, sproj, tproj, vcontrib, gt8,
                    wflat_sp, weight_grads=False, input_grads=True)
                (se_f, d_sproj_f, d_tproj_f, d_vcontrib_f,
                 d_ro8_f, d_vd8_f, d_z_all) = outs_f
                d_sproj = ft_mod.add_cotangent(d_sproj, d_sproj_f)
                d_tproj = ft_mod.add_cotangent(d_tproj, d_tproj_f)
                d_vcontrib = ft_mod.add_cotangent(d_vcontrib, d_vcontrib_f)
                d_ro8 = d_ro8 + d_ro8_f
                d_vd8 = d_vd8 + d_vd8_f
                (d_z2d_extra,) = zvjp(d_z_all)
                d_z = d_z + d_z2d_extra
                mse = se_f * scale
                loss_se = (se_c + se_f) * scale
            else:
                mse = se_c * scale
                loss_se = mse
            (g_vars,) = pvjp((d_ro8, d_vd8, d_z, d_sproj, d_tproj,
                              d_vcontrib))

            def reg_fn(variables):
                sc, tc = variables["shape"], variables["texture"]
                if not optimize_codes:
                    sc = jax.lax.stop_gradient(sc)
                    tc = jax.lax.stop_gradient(tc)
                return safe_code_norm(sc) + safe_code_norm(tc)

            reg, g_reg = jax.value_and_grad(reg_fn)(variables)
            loss = loss_se + hp.loss_reg_coef * reg
            grads = jax.tree_util.tree_map(
                lambda a, b: a + hp.loss_reg_coef * b, g_vars, g_reg)
            return (loss, mse), grads

    @jax.jit
    def run(variables0, key):
        opt_state0 = tx.init(variables0)

        def step(carry, xs):
            step_idx, step_key = xs
            variables, opt_state = carry
            if use_single_pass:
                (_, mse), grads = sp_value_and_grad(variables, step_key)
            else:
                (_, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    variables, step_key
                )
            updates, opt_state = tx.update(grads, opt_state, variables)
            # Pose-only warmup: suppress code updates for the first k steps.
            code_gate = (step_idx >= pose_only_steps).astype(jnp.float32)
            updates = {
                "xi": updates["xi"],
                "shape": updates["shape"] * code_gate,
                "texture": updates["texture"] * code_gate,
            }
            variables = optax.apply_updates(variables, updates)
            return (variables, opt_state), psnr_fn(mse)

        keys = jax.random.split(key, num_opts)
        steps = jnp.arange(num_opts)
        (variables, _), history = jax.lax.scan(
            step, (variables0, opt_state0), (steps, keys)
        )
        return variables, history

    variables0 = {
        "xi": jnp.zeros(6, jnp.float32),
        "shape": init_shape.astype(jnp.float32),
        "texture": init_texture.astype(jnp.float32),
    }
    variables, history = run(variables0, key)
    return PoseOptimizationResult(
        c2w=refine_pose(variables["xi"], init_c2w),
        xi=variables["xi"],
        shape_code=variables["shape"],
        texture_code=variables["texture"],
        psnr_history=history,
    )
