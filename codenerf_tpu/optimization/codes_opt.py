"""Test-time latent-code optimization + evaluation (the ``optimize.py`` path).

Capability parity with the reference ``Optimizer`` (``src/optimizer.py:18-240``):
for each unseen object, initialize shape/texture codes at the MEAN of the
trained embeddings (``optimizer.py:215-216``), run ``num_opts`` AdamW steps
on the codes ONLY against the target view(s) — model frozen — with the lr
halved every ``lr_half_interval`` steps (``optimizer.py:200-207``), then
evaluate PSNR/SSIM on all remaining views (``optimizer.py:107-135``).

TPU-native design:
- the whole optimization is ONE jitted ``lax.scan`` over steps — no python
  loop, no per-chunk H2D traffic, no optimizer-rebuild resets (the decay is
  an optax schedule; the reference's moment-zeroing every 50 steps is a
  quirk, SURVEY §2.3 #3);
- the per-step loss over all target rays is computed by a rematerialized
  ``lax.scan`` over fixed-size ray chunks, bounding activation memory at
  ``chunk × samples`` regardless of how many target views are given;
- evaluation renders + scores each view entirely on device (SSIM in JAX).
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from codenerf_tpu.config import Hparams, resolve_dtype
from codenerf_tpu.core.rays import camera_rays
from codenerf_tpu.evaluation.metrics import psnr as psnr_fn
from codenerf_tpu.evaluation.metrics import reference_psnr_mse, ssim as ssim_fn
from codenerf_tpu.renderer import render_rays
from codenerf_tpu.training.schedules import step_halving


class OptimizationResult(NamedTuple):
    shape_code: jnp.ndarray    # (D,)
    texture_code: jnp.ndarray  # (D,)
    psnr_history: jnp.ndarray  # (num_opts,) training-view PSNR per step
    # (num_opts, progress_rays, 3) per-step renders of the leading target
    # rays (None unless requested) — the reference writes a progress PNG
    # every opt step (src/optimizer.py:101,149-166); these are its data,
    # collected as scan outputs so the optimization stays ONE dispatch.
    progress: Optional[jnp.ndarray] = None


def _as_unit_float(images: np.ndarray) -> np.ndarray:
    """uint8 (0..255) -> float32 [0,1]; float passes through.

    uint8 is the preferred transport dtype (1/4 the tunnel bytes). This
    HOST-side conversion (used for the small optimization-target slices)
    is the identical numpy op callers would have applied, so optimization
    trajectories are bitwise-unchanged; the eval path converts in-jit
    instead, where XLA's reciprocal-multiply /255 can sit 1 ulp off."""
    if images.dtype == np.uint8:
        return images.astype(np.float32) / 255.0
    return images


def _flat_target_rays(images: np.ndarray, poses: np.ndarray, focal: float,
                      view_idxs: Sequence[int], H: int, W: int):
    """Stack origins/dirs/gt pixels of the target views into flat arrays."""
    ros, vds, gts = [], [], []
    for v in view_idxs:
        ro, vd = camera_rays(H, W, focal, jnp.asarray(poses[v]))
        ros.append(ro)
        vds.append(vd)
        gts.append(jnp.asarray(_as_unit_float(images[v]).reshape(-1, 3),
                               dtype=jnp.float32))
    return jnp.concatenate(ros), jnp.concatenate(vds), jnp.concatenate(gts)


def _flat_target_rays_multi(images: np.ndarray, poses: np.ndarray,
                            focals: np.ndarray, view_idxs: Sequence[int],
                            H: int, W: int):
    """Vectorized :func:`_flat_target_rays` over G objects: one vmapped
    ray build instead of per-object/per-view device dispatches. Returns
    (ro (G, T·H·W, 3), vd (G, T·H·W, 3), gt (G, T·H·W, 3)) with rows in
    the same (view-major) order the per-object helper produces."""
    idxs = list(view_idxs)
    tgt_poses = jnp.asarray(poses[:, idxs])          # (G, T, 4, 4)
    focals = jnp.asarray(focals, dtype=jnp.float32)  # (G,)
    G, T = tgt_poses.shape[:2]

    def per_view(focal, c2w):
        return camera_rays(H, W, focal, c2w)

    per_obj = jax.vmap(per_view, in_axes=(None, 0))      # over views
    ro, vd = jax.vmap(per_obj)(focals, tgt_poses)        # (G, T, HW, 3)
    gt = jnp.asarray(_as_unit_float(images[:, idxs]), dtype=jnp.float32)
    return (ro.reshape(G, T * H * W, 3), vd.reshape(G, T * H * W, 3),
            gt.reshape(G, T * H * W, 3))


def _chunked(x: jnp.ndarray, chunk: int, n_padded: int):
    from codenerf_tpu.renderer import pad_rays

    return pad_rays(x, n_padded).reshape(-1, chunk, *x.shape[1:])


def build_fused_codes_fns(hp: Hparams, chunk: int, *,
                          use_fused: Optional[bool] = None,
                          input_grads: bool = False):
    """Resolve the fused-kernel configuration for frozen-model (test-time)
    optimization.

    Returns ``(apply_fn, composite_fn)`` for :func:`renderer.render_rays`
    — both ``None`` when the XLA path should run. ``use_fused=None``
    defers to ``hp.use_fused_train`` and quietly falls back to XLA when
    the architecture/chunk can't tile; ``use_fused=True`` raises instead.
    ``input_grads=False`` selects the CODES-ONLY op variants (backward
    skips the dW accumulation and input chains); ``input_grads=True``
    selects the POSE variants (ray/depth cotangents kept — pose
    optimization differentiates through ray generation)."""
    from codenerf_tpu.ops import fused_train as ft

    net_cfg, rcfg = hp.net, hp.render
    explicit = use_fused is True
    if use_fused is None:
        use_fused = hp.use_fused_train
    if not use_fused:
        return None, None
    sample_counts = [rcfg.n_samples]
    if rcfg.n_importance > 0:
        sample_counts.append(rcfg.n_samples + rcfg.n_importance)
    ok = all(ft.fused_train_available(net_cfg, chunk, s)
             for s in sample_counts)
    if not ok:
        if explicit:
            raise ValueError(
                "use_fused=True but the fused kernels can't tile this "
                f"problem (W={net_cfg.W}, chunk={chunk}, "
                f"samples={sample_counts})")
        return None, None

    make_plane = (ft.make_fused_pose_op if input_grads
                  else ft.make_fused_codes_op)
    # input_grads (pose) never takes the plane+composite route: pose_opt's
    # single-pass kernel covers every case that branch would, so only the
    # codes variant keeps a composite op (it still serves padded chunks).
    fuse_composite = (hp.fused_composite and rcfg.n_importance == 0
                      and not input_grads)
    if fuse_composite:
        _op = ft.make_fused_codes_composite_op(net_cfg,
                                               white_bg=rcfg.white_bg)

        def composite_fn(p, cfg, ray_o, viewdir, z_vals, s_code, t_code):
            return ft.fused_render_train(p, cfg, ray_o, viewdir, z_vals,
                                         s_code, t_code, op=_op,
                                         white_bg=rcfg.white_bg)

        return None, composite_fn

    _op = make_plane(net_cfg)

    def apply_fn(p, cfg, ray_o, viewdir, z_vals, s_code, t_code):
        return ft.fused_apply_train(p, cfg, ray_o, viewdir, z_vals,
                                    s_code, t_code, op=_op)

    return apply_fn, None


# Jitted run functions keyed on everything shape/config-static. The data
# (rays, pixels, params) are ARGUMENTS of the jitted function, so the
# reference protocol's per-object loop (src/optimizer.py:53-147 — hundreds
# of test objects) traces and compiles ONCE, not once per object. Bounded
# LRU: a long-lived process sweeping settings evicts the oldest compiled
# run instead of growing without limit.
_RUN_CACHE = collections.OrderedDict()
_RUN_CACHE_MAX = 16


def _normalize_rays_per_step(rays_per_step, n_rays: int):
    """Validate + tile-align the stochastic minibatch size.

    Returns ``None`` when the request covers the full ray set (the exact
    reference protocol). The single-pass kernel tiles the ray axis in
    ``_TRAIN_TILE_RAYS`` (16) rows, so a misaligned minibatch is rounded UP
    to the next tile — without this, an off-by-one ``rays_per_step`` would
    silently disqualify the fast kernel route the feature exists to use
    (or raise a tiling error phrased in kernel terms)."""
    if rays_per_step is None:
        return None
    r = int(rays_per_step)
    if r <= 0:
        raise ValueError(f"rays_per_step must be positive, got {r}")
    from codenerf_tpu.ops.fused_train import _TRAIN_TILE_RAYS

    r = -(-r // _TRAIN_TILE_RAYS) * _TRAIN_TILE_RAYS
    if r >= n_rays:
        return None  # full view — the exact (reference) protocol
    return r


def safe_code_norm(x: jnp.ndarray) -> jnp.ndarray:
    """``||x||`` with a finite gradient at ``x = 0``: the gradient of
    ``jnp.linalg.norm`` is ``x/||x|| = 0/0 = NaN`` there, and zero-init
    codes are a natural unknown-object start — one NaN reg gradient
    poisons the whole optimization. Value and gradient are identical to
    the plain norm for any ``||x|| > 1e-12`` (reference reg:
    ``src/optimizer.py:213``)."""
    sq = jnp.sum(x * x)
    return jnp.sqrt(jnp.maximum(sq, 1e-24))


def _build_run(hp: Hparams, n_rays: int, chunk: int, n_chunks: int,
               num_opts: int, lr: float, lr_half_interval: int,
               reference_resets: bool, use_fused: Optional[bool],
               progress_rays: int = 0,
               rays_per_step: Optional[int] = None):
    # ``occ`` rides every run as a jit ARGUMENT (None = empty pytree, no
    # leaves): a closed-over device-array grid would re-stage per call
    # (CLAUDE.md measurement trap c), and an argument lets one compiled
    # run serve any grid of the same shape.
    net_cfg, rcfg = hp.net, hp.render
    compute_dtype = resolve_dtype(hp.compute_dtype)

    # STOCHASTIC ray subsampling (late round 3): instead of scanning the
    # full target-ray set every step (the reference protocol renders the
    # whole view per step, ``src/optimizer.py:79,117``), draw
    # ``rays_per_step`` rays uniformly (with replacement) per step and take
    # one SGD step on that minibatch. The model is frozen and only two
    # code vectors move, so the minibatch gradient is an unbiased,
    # low-variance estimate — this cuts test-time-optimization FLOPs by
    # n_rays/rays_per_step. ``psnr_history`` then reports minibatch PSNR
    # (noisier than full-view PSNR; the final eval metric is unaffected).
    stochastic = rays_per_step is not None and rays_per_step < n_rays
    if stochastic:
        if progress_rays:
            raise ValueError(
                "progress renders need the full-view rays every step; "
                "rays_per_step subsampling and progress_rays are mutually "
                "exclusive")
        # The minibatch respects the same per-dispatch transport cap as the
        # full-view path: a rays_per_step larger than the planned chunk is
        # CHUNKED (scan), not run as one oversized dispatch — activation
        # memory stays bounded by chunk x samples regardless of the
        # user-supplied value. n_chunks == 1 reproduces the pre-chunking
        # behavior bitwise.
        mb = int(rays_per_step)
        chunk = min(mb, chunk)
        n_chunks = -(-mb // chunk)
    loss_rays = chunk * n_chunks if stochastic else n_rays

    # SINGLE-PASS route (late round 3): the frozen-model variant of the
    # training loss kernel. Gated on pad-free chunking (the in-kernel MSE
    # cotangent has no ray mask — real SRN views always chunk exactly)
    # and the single-pass tiling rule (rays % 16; looser than the
    # plane-op pair's % 32). When it holds, the plane ops are never
    # built.
    from codenerf_tpu.ops import fused_train as _ft

    want_fused = hp.use_fused_train if use_fused is None else use_fused
    use_single_pass = (
        want_fused and hp.fused_composite
        and (rcfg.n_importance == 0 or rcfg.share_fine_weights)
        and (stochastic or n_chunks * chunk == n_rays)
        and _ft.single_pass_available(net_cfg, chunk)
    )
    apply_fn = composite_fn = None
    if want_fused and not use_single_pass:
        apply_fn, composite_fn = build_fused_codes_fns(hp, chunk,
                                                       use_fused=use_fused)
    fused = (use_single_pass or apply_fn is not None
             or composite_fn is not None)

    # AdamW on the two code vectors only — the model is frozen exactly
    # like the reference (optimizer.py:195-198).
    tx = optax.adamw(step_halving(lr, lr_half_interval), b1=0.9, b2=0.999,
                     eps=1e-8, weight_decay=hp.weight_decay)

    def loss_fn(codes, step_key, params, fine_params, ro_c, vd_c, gt_c,
                mask_c, occ):
        shape_code, texture_code = codes

        def body(carry, xs):
            ro, vd, gt, m, k = xs
            res = render_rays(
                params, net_cfg, rcfg, ro, vd, shape_code, texture_code, k,
                fine_params=fine_params, compute_dtype=compute_dtype,
                apply_fn=apply_fn, composite_fn=composite_fn,
                occ_grid=occ,
            )
            # Final-pass SE (the reported metric) and the optimized SE
            # (adds the coarse head under hierarchical sampling) are
            # tracked separately: folding both into one sum would inflate
            # the reported "mse" -> psnr_history by ~2x when
            # n_importance > 0.
            fin_se, opt_se = carry
            se = jnp.sum(m[:, None] * (res.final.rgb - gt) ** 2)
            fin_se = fin_se + se
            if res.fine is not None:
                se = se + jnp.sum(m[:, None] * (res.coarse.rgb - gt) ** 2)
            out = res.final.rgb if progress_rays else None
            return (fin_se, opt_se + se), out

        keys = jax.random.split(step_key, n_chunks)
        # The XLA path needs remat to bound the saved (chunk, S, W)
        # activations; the fused op's residuals are the per-ray operands
        # only, so rematerializing it would just run the forward kernel
        # twice.
        (final_se, opt_se), rgb_chunks = jax.lax.scan(
            body if fused else jax.checkpoint(body),
            (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
            (ro_c, vd_c, gt_c, mask_c, keys),
        )
        scale = 1.0 / (loss_rays * 3.0)
        reg = safe_code_norm(shape_code) + safe_code_norm(texture_code)
        progress = (rgb_chunks.reshape(-1, 3)[:progress_rays]
                    if progress_rays else jnp.zeros((0, 3), jnp.float32))
        return opt_se * scale + hp.loss_reg_coef * reg, (final_se * scale,
                                                         progress)

    # SINGLE-PASS codes backward (late round 3): the frozen-model variant
    # of the training loss kernel (weight_grads=False — forward +
    # composite + MSE cotangent + dx chain in one grid step, 2F of MLP
    # FLOPs vs the fwd+recompute-bwd op pair's 3F). One jax.vjp over the
    # per-ray code projections chains the kernel cotangents into the
    # exact codes gradient; progress renders ride the kernel's rgb rows
    # (want_rgb). Hierarchical runs the same structure as training: a
    # sigma-only coarse forward (~0.6F) feeds sample_pdf, and the union
    # kernel's DUAL composite computes both losses from one evaluation.
    if use_single_pass:
        from codenerf_tpu.ops import fused_mlp
        from codenerf_tpu.ops import fused_train as ft_mod
        from codenerf_tpu.renderer import coarse_zvals

        hier = rcfg.n_importance > 0
        scale = 1.0 / (loss_rays * 3.0)
        f32 = jnp.float32

        def sp_value_and_grad(codes, step_key, params, ro_c, vd_c, gt_c,
                              occ):
            wflat = [jax.lax.stop_gradient(w)
                     for w in ft_mod.flatten_params_f32(params, net_cfg)]
            want_prog = bool(progress_rays)

            def chunk_body(carry, xs):
                fin_se, opt_se, g_acc = carry
                ro, vd, gt, k = xs
                z2d, key_fine = coarse_zvals(rcfg, ro, vd, k, occ_grid=occ)
                ro8 = fused_mlp._pad_lanes(ro.astype(f32), 8)
                vd8 = fused_mlp._pad_lanes(vd.astype(f32), 8)
                gt8 = fused_mlp._pad_lanes(gt.astype(f32), 8)

                def prologue(cds):
                    sc, tc = cds
                    _, _, _, sproj, tproj, vcontrib = \
                        fused_mlp.prep_ray_operands(
                            params, net_cfg, ro, vd, z2d, sc, tc)
                    return sproj, tproj, vcontrib

                (sproj, tproj, vcontrib), pvjp = jax.vjp(prologue, codes)
                rgb8 = None
                if hier:
                    # Coarse pass forward-only (sigma-only kernel: the
                    # importance weights need sigma and z alone); the
                    # coarse LOSS rides the union kernel's dual composite
                    # — same recipe as fused hierarchical training.
                    from codenerf_tpu.core.render import composite_weights

                    wb = [w.astype(jnp.bfloat16) if w.ndim == 2 else w
                          for w in wflat]
                    sigma_c = fused_mlp.invoke_fwd(
                        net_cfg, z2d.shape[1], chunk, ro8, vd8, z2d,
                        sproj, tproj, vcontrib, wb, sigma_only=True)
                    w_coarse = composite_weights(sigma_c, z2d)
                    z_all, cmask, cdelta = ft_mod.hier_fine_zvals_meta(
                        z2d, w_coarse, key_fine, rcfg.n_importance)
                    outs = ft_mod.invoke_train_fused(
                        net_cfg, z_all.shape[1], chunk, rcfg.white_bg,
                        scale, ro8, vd8, z_all, sproj, tproj, vcontrib,
                        gt8, wflat, want_rgb=want_prog, weight_grads=False,
                        coarse_mask=cmask, coarse_delta=cdelta)
                    se_f, se_c, d_sproj, d_tproj, d_vcontrib = outs[:5]
                    if want_prog:
                        rgb8 = outs[5]
                    fin, opt = se_f, se_f + se_c
                else:
                    outs = ft_mod.invoke_train_fused(
                        net_cfg, z2d.shape[1], chunk, rcfg.white_bg, scale,
                        ro8, vd8, z2d, sproj, tproj, vcontrib, gt8, wflat,
                        want_rgb=want_prog, weight_grads=False)
                    se_c, d_sproj, d_tproj, d_vcontrib = outs[:4]
                    if want_prog:
                        rgb8 = outs[4]
                    fin, opt = se_c, se_c
                (g_codes,) = pvjp((d_sproj, d_tproj, d_vcontrib))
                g_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b, g_acc, g_codes)
                out = (rgb8[:, :3] if want_prog
                       else jnp.zeros((0, 3), f32))
                return (fin_se + fin, opt_se + opt, g_acc), out

            keys = jax.random.split(step_key, n_chunks)
            zerog = jax.tree_util.tree_map(jnp.zeros_like, codes)
            (fin_se, opt_se, g_codes), rgb_chunks = jax.lax.scan(
                chunk_body,
                (jnp.zeros((), f32), jnp.zeros((), f32), zerog),
                (ro_c, vd_c, gt_c, keys))

            def reg_fn(cds):
                sc, tc = cds
                return safe_code_norm(sc) + safe_code_norm(tc)

            reg, g_reg = jax.value_and_grad(reg_fn)(codes)
            loss = opt_se * scale + hp.loss_reg_coef * reg
            grads = jax.tree_util.tree_map(
                lambda a, b: a + hp.loss_reg_coef * b, g_codes, g_reg)
            progress = (rgb_chunks.reshape(-1, 3)[:progress_rays]
                        if progress_rays else jnp.zeros((0, 3), f32))
            return (loss, (fin_se * scale, progress)), grads

    @jax.jit
    def run(params, fine_params, ro_c, vd_c, gt_c, mask_c, codes0, key,
            occ):
        opt_state0 = tx.init(codes0)
        if stochastic:
            # Flatten the (possibly padded) chunked transport layout back
            # to the real ray pool once; each step gathers its minibatch
            # from it (pad rows are excluded by the index range).
            ro_f = ro_c.reshape(-1, ro_c.shape[-1])[:n_rays]
            vd_f = vd_c.reshape(-1, vd_c.shape[-1])[:n_rays]
            gt_f = gt_c.reshape(-1, gt_c.shape[-1])[:n_rays]
            ones_mask = jnp.ones((n_chunks, chunk), jnp.float32)

        def step(carry, xs):
            step_idx, step_key = xs
            codes, opt_state = carry
            if reference_resets:
                from codenerf_tpu.training.train_step import reset_adam_state

                opt_state = jax.lax.cond(
                    step_idx % lr_half_interval == 0,
                    reset_adam_state, lambda s: s, opt_state,
                )
            if stochastic:
                k_sel, step_key = jax.random.split(step_key)
                idx = jax.random.randint(k_sel, (n_chunks * chunk,), 0,
                                         n_rays)
                ro_b = ro_f[idx].reshape(n_chunks, chunk, -1)
                vd_b = vd_f[idx].reshape(n_chunks, chunk, -1)
                gt_b = gt_f[idx].reshape(n_chunks, chunk, -1)
                mask_b = ones_mask
            else:
                ro_b, vd_b, gt_b, mask_b = ro_c, vd_c, gt_c, mask_c
            if use_single_pass:
                (_, (mse, progress)), grads = sp_value_and_grad(
                    codes, step_key, params, ro_b, vd_b, gt_b, occ)
            else:
                (_, (mse, progress)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                    codes, step_key, params, fine_params, ro_b, vd_b,
                    gt_b, mask_b, occ,
                )
            updates, opt_state = tx.update(grads, opt_state, codes)
            codes = optax.apply_updates(codes, updates)
            return (codes, opt_state), (psnr_fn(mse), progress)

        keys = jax.random.split(key, num_opts)
        (codes, _), (history, progress) = jax.lax.scan(
            step, (codes0, opt_state0),
            (jnp.arange(num_opts), keys),
        )
        return codes, history, progress

    return run


def optimize_codes(
    params,
    hp: Hparams,
    ray_o: jnp.ndarray,
    viewdir: jnp.ndarray,
    gt_rgb: jnp.ndarray,
    init_shape: jnp.ndarray,
    init_texture: jnp.ndarray,
    key: jax.Array,
    num_opts: int = 200,
    lr: float = 1e-2,
    lr_half_interval: int = 50,
    chunk: int = 4096,
    fine_params=None,
    reference_resets: bool = False,
    use_fused: Optional[bool] = None,
    progress_rays: int = 0,
    occ_grid=None,
    rays_per_step: Optional[int] = None,
) -> OptimizationResult:
    """Optimize one object's codes against flat target rays. Fully jitted;
    the compiled optimization is cached across calls (same ray count and
    settings → later objects reuse the executable).

    ``reference_resets=True`` reproduces the reference quirk of rebuilding
    the AdamW optimizer (zeroing its moments) at every lr halving
    (``src/optimizer.py:104-105``, SURVEY §2.3 #3); the lr curve itself is
    identical either way since halvings align with the reset windows.

    ``use_fused`` (default: ``hp.use_fused_train``) runs each step's
    forward+backward through the codes-only fused Pallas kernels.

    ``rays_per_step`` switches to STOCHASTIC optimization: each step draws
    that many rays uniformly from the target set instead of rendering all
    of them (the reference renders the full view every step) — an
    n_rays/rays_per_step FLOP cut on a frozen model where the minibatch
    gradient of two code vectors is plenty. ``psnr_history`` then reports
    minibatch PSNR. Mutually exclusive with ``progress_rays``."""
    from codenerf_tpu.renderer import chunk_plan

    n_rays = ray_o.shape[0]
    chunk, _, n_padded = chunk_plan(n_rays, chunk)
    n_chunks = n_padded // chunk
    rays_per_step = _normalize_rays_per_step(rays_per_step, n_rays)
    # hp.raw (the original JSON dict) is unhashable and irrelevant to the
    # compiled program — key on the typed config only.
    progress_rays = min(int(progress_rays), n_rays)
    cache_key = (dataclasses.replace(hp, raw=None), n_rays, chunk, n_chunks,
                 num_opts, lr, lr_half_interval, reference_resets,
                 use_fused, fine_params is None, progress_rays,
                 occ_grid is None, rays_per_step)
    if cache_key not in _RUN_CACHE:
        _RUN_CACHE[cache_key] = _build_run(
            hp, n_rays, chunk, n_chunks, num_opts, lr, lr_half_interval,
            reference_resets, use_fused, progress_rays, rays_per_step)
        while len(_RUN_CACHE) > _RUN_CACHE_MAX:
            _RUN_CACHE.popitem(last=False)
    else:
        _RUN_CACHE.move_to_end(cache_key)
    run = _RUN_CACHE[cache_key]

    ro_c = _chunked(ray_o, chunk, n_padded)
    vd_c = _chunked(viewdir, chunk, n_padded)
    gt_c = _chunked(gt_rgb, chunk, n_padded)
    # Pad rays (edge-repeats) must not contribute to the loss.
    mask = jnp.arange(n_padded, dtype=jnp.float32) < n_rays
    mask_c = mask.reshape(-1, chunk)

    (shape_code, texture_code), history, progress = run(
        params, fine_params, ro_c, vd_c, gt_c, mask_c,
        (init_shape.astype(jnp.float32), init_texture.astype(jnp.float32)),
        key, occ_grid,
    )
    return OptimizationResult(shape_code, texture_code, history,
                              progress if progress_rays else None)


class BatchedOptimizationResult(NamedTuple):
    shape_codes: jnp.ndarray    # (G, D)
    texture_codes: jnp.ndarray  # (G, D)
    psnr_history: jnp.ndarray   # (num_opts, G) per-object training-view PSNR


def _build_run_batch(hp: Hparams, n_objs: int, n_rays: int, chunk: int,
                     nc_obj: int, num_opts: int, lr: float,
                     lr_half_interval: int, reference_resets: bool,
                     use_fused: Optional[bool],
                     rays_per_step: Optional[int] = None,
                     mesh=None):
    """Multi-object variant of :func:`_build_run`: ``G`` objects' target
    rays ride ONE jitted optimization scan instead of ``G`` sequential
    dispatches (the reference protocol loops hundreds of test objects,
    ``src/optimizer.py:53-147``).

    Exactness by construction: every scan chunk holds ONE object's rays,
    each object keeps its own PRNG stream (the same per-step/per-chunk key
    splits the standalone run makes), the per-ray loss scale ``1/(R·3)``
    is object-count-independent, and AdamW is elementwise — so row ``g``
    of the batched (G, D) code tables follows the standalone trajectory of
    object ``g`` exactly (asserted by tests, not just argued).

    ``mesh``: the optimization is embarrassingly parallel over objects, so
    under a device mesh the object axis shards across the batch axes
    (replica x data) via ``shard_map`` — each device runs the SAME local
    scan on its own G/n_shards objects (frozen weights replicated, code
    rows + Adam moments sharded with their objects, zero collectives).
    Row ``g`` is therefore bitwise the single-device batched row, which is
    bitwise the standalone run. ``n_objs`` must divide by the shard count
    (:func:`optimize_codes_batch` pads). The reference being superseded is
    strictly single-device (``src/optimizer.py:34``)."""
    net_cfg, rcfg = hp.net, hp.render
    compute_dtype = resolve_dtype(hp.compute_dtype)
    n_shards = 1
    if mesh is not None:
        from codenerf_tpu.parallel.mesh import n_batch_shards

        n_shards = n_batch_shards(mesh)
        if n_objs % n_shards:
            raise ValueError(f"{n_objs} objects not divisible by the "
                             f"{n_shards}-way object sharding")
    G = n_objs // n_shards  # objects per shard (== n_objs when unsharded)

    # Stochastic minibatch variant — same semantics as in
    # :func:`_build_run`, per object: each step draws ``rays_per_step``
    # rays from each object's own pool with that object's own PRNG
    # stream, so row ``g`` still bitwise-follows the standalone
    # stochastic run. The minibatch is chunked under the same transport
    # cap as the full-view path (see :func:`_build_run`).
    stochastic = rays_per_step is not None and rays_per_step < n_rays
    if stochastic:
        mb = int(rays_per_step)
        chunk = min(mb, chunk)
        nc_obj = -(-mb // chunk)
    loss_rays = chunk * nc_obj if stochastic else n_rays

    from codenerf_tpu.ops import fused_train as _ft

    want_fused = hp.use_fused_train if use_fused is None else use_fused
    use_single_pass = (
        want_fused and hp.fused_composite
        and (rcfg.n_importance == 0 or rcfg.share_fine_weights)
        and (stochastic or nc_obj * chunk == n_rays)
        and _ft.single_pass_available(net_cfg, chunk)
    )
    apply_fn = composite_fn = None
    if want_fused and not use_single_pass:
        apply_fn, composite_fn = build_fused_codes_fns(hp, chunk,
                                                       use_fused=use_fused)
    fused = (use_single_pass or apply_fn is not None
             or composite_fn is not None)

    tx = optax.adamw(step_halving(lr, lr_half_interval), b1=0.9, b2=0.999,
                     eps=1e-8, weight_decay=hp.weight_decay)
    scale = 1.0 / (loss_rays * 3.0)

    def rows_reg(codes):
        sc_t, tc_t = codes
        norms = (jax.vmap(safe_code_norm)(sc_t)
                 + jax.vmap(safe_code_norm)(tc_t))
        return jnp.sum(norms)

    def loss_fn(codes, chunk_keys, params, fine_params, ro_c, vd_c, gt_c,
                mask_c, gi_c, occ):
        sc_t, tc_t = codes

        def body(carry, xs):
            ro, vd, gt, m, gi, k = xs
            shape_code = jnp.take(sc_t, gi, axis=0)
            tex_code = jnp.take(tc_t, gi, axis=0)
            res = render_rays(
                params, net_cfg, rcfg, ro, vd, shape_code, tex_code, k,
                fine_params=fine_params, compute_dtype=compute_dtype,
                apply_fn=apply_fn, composite_fn=composite_fn,
                occ_grid=occ,
            )
            fin_se_v, opt_se = carry
            se = jnp.sum(m[:, None] * (res.final.rgb - gt) ** 2)
            fin_se_v = fin_se_v.at[gi].add(se)
            if res.fine is not None:
                se = se + jnp.sum(m[:, None] * (res.coarse.rgb - gt) ** 2)
            return (fin_se_v, opt_se + se), None

        (fin_se_v, opt_se), _ = jax.lax.scan(
            body if fused else jax.checkpoint(body),
            (jnp.zeros((G,), jnp.float32), jnp.zeros((), jnp.float32)),
            (ro_c, vd_c, gt_c, mask_c, gi_c, chunk_keys),
        )
        loss = opt_se * scale + hp.loss_reg_coef * rows_reg(codes)
        return loss, fin_se_v * scale

    if use_single_pass:
        from codenerf_tpu.ops import fused_mlp
        from codenerf_tpu.ops import fused_train as ft_mod
        from codenerf_tpu.renderer import coarse_zvals

        hier = rcfg.n_importance > 0
        f32 = jnp.float32

        def sp_value_and_grad(codes, chunk_keys, params, ro_c, vd_c, gt_c,
                              gi_c, occ):
            sc_t, tc_t = codes
            wflat = [jax.lax.stop_gradient(w)
                     for w in ft_mod.flatten_params_f32(params, net_cfg)]

            def chunk_body(carry, xs):
                fin_se_v, g_acc = carry
                ro, vd, gt, gi, k = xs
                z2d, key_fine = coarse_zvals(rcfg, ro, vd, k, occ_grid=occ)
                ro8 = fused_mlp._pad_lanes(ro.astype(f32), 8)
                vd8 = fused_mlp._pad_lanes(vd.astype(f32), 8)
                gt8 = fused_mlp._pad_lanes(gt.astype(f32), 8)

                def prologue(cds):
                    s_t, t_t = cds
                    sc = jnp.take(s_t, gi, axis=0)
                    tc = jnp.take(t_t, gi, axis=0)
                    _, _, _, sproj, tproj, vcontrib = \
                        fused_mlp.prep_ray_operands(
                            params, net_cfg, ro, vd, z2d, sc, tc)
                    return sproj, tproj, vcontrib

                (sproj, tproj, vcontrib), pvjp = jax.vjp(prologue, codes)
                if hier:
                    from codenerf_tpu.core.render import composite_weights

                    wb = [w.astype(jnp.bfloat16) if w.ndim == 2 else w
                          for w in wflat]
                    sigma_c = fused_mlp.invoke_fwd(
                        net_cfg, z2d.shape[1], chunk, ro8, vd8, z2d,
                        sproj, tproj, vcontrib, wb, sigma_only=True)
                    w_coarse = composite_weights(sigma_c, z2d)
                    z_all, cmask, cdelta = ft_mod.hier_fine_zvals_meta(
                        z2d, w_coarse, key_fine, rcfg.n_importance)
                    outs = ft_mod.invoke_train_fused(
                        net_cfg, z_all.shape[1], chunk, rcfg.white_bg,
                        scale, ro8, vd8, z_all, sproj, tproj, vcontrib,
                        gt8, wflat, want_rgb=False, weight_grads=False,
                        coarse_mask=cmask, coarse_delta=cdelta)
                    se_f, _se_c, d_sproj, d_tproj, d_vcontrib = outs[:5]
                    fin = se_f
                else:
                    outs = ft_mod.invoke_train_fused(
                        net_cfg, z2d.shape[1], chunk, rcfg.white_bg, scale,
                        ro8, vd8, z2d, sproj, tproj, vcontrib, gt8, wflat,
                        want_rgb=False, weight_grads=False)
                    fin = outs[0]
                    d_sproj, d_tproj, d_vcontrib = outs[1:4]
                (g_codes,) = pvjp((d_sproj, d_tproj, d_vcontrib))
                g_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b, g_acc, g_codes)
                return (fin_se_v.at[gi].add(fin), g_acc), None

            zerog = jax.tree_util.tree_map(jnp.zeros_like, codes)
            (fin_se_v, g_codes), _ = jax.lax.scan(
                chunk_body, (jnp.zeros((G,), f32), zerog),
                (ro_c, vd_c, gt_c, gi_c, chunk_keys))

            _, g_reg = jax.value_and_grad(rows_reg)(codes)
            grads = jax.tree_util.tree_map(
                lambda a, b: a + hp.loss_reg_coef * b, g_codes, g_reg)
            return fin_se_v * scale, grads

    def run(params, fine_params, ro_c, vd_c, gt_c, mask_c, gi_c, codes0,
            keys_g, occ):
        opt_state0 = tx.init(codes0)
        # Per-object step keys reproduce the standalone runs bitwise:
        # object g's stream is split(key_g, num_opts), and each step key
        # splits into that object's per-chunk keys — identical to what
        # _build_run derives for a single object.
        step_keys = jax.vmap(
            lambda kg: jax.random.split(kg, num_opts))(keys_g)  # (G, T, 2)
        if stochastic:
            dim = ro_c.shape[-1]
            ro_f = ro_c.reshape(G, -1, dim)[:, :n_rays]
            vd_f = vd_c.reshape(G, -1, dim)[:, :n_rays]
            gt_f = gt_c.reshape(G, -1, gt_c.shape[-1])[:, :n_rays]
            gi_b = jnp.repeat(jnp.arange(G, dtype=jnp.int32), nc_obj)
            ones_mask = jnp.ones((G * nc_obj, chunk), jnp.float32)

        def step(carry, xs):
            step_idx, sk_g = xs
            codes, opt_state = carry
            if reference_resets:
                from codenerf_tpu.training.train_step import reset_adam_state

                opt_state = jax.lax.cond(
                    step_idx % lr_half_interval == 0,
                    reset_adam_state, lambda s: s, opt_state,
                )
            if stochastic:
                # Same two-level split as the standalone stochastic step:
                # (k_sel, rest) = split(step_key); chunk keys =
                # split(rest, nc_obj).
                ks2 = jax.vmap(jax.random.split)(sk_g)  # (G, 2, 2)
                idx_g = jax.vmap(
                    lambda k: jax.random.randint(k, (nc_obj * chunk,), 0,
                                                 n_rays)
                )(ks2[:, 0])
                resh = lambda a: a.reshape(G * nc_obj, chunk, a.shape[-1])
                ro_b = resh(jax.vmap(lambda a, i: a[i])(ro_f, idx_g))
                vd_b = resh(jax.vmap(lambda a, i: a[i])(vd_f, idx_g))
                gt_b = resh(jax.vmap(lambda a, i: a[i])(gt_f, idx_g))
                mask_b, gi_v = ones_mask, gi_b
                chunk_keys = jax.vmap(
                    lambda k: jax.random.split(k, nc_obj))(ks2[:, 1])
                chunk_keys = chunk_keys.reshape(G * nc_obj,
                                                *chunk_keys.shape[2:])
            else:
                ro_b, vd_b, gt_b = ro_c, vd_c, gt_c
                mask_b, gi_v = mask_c, gi_c
                chunk_keys = jax.vmap(
                    lambda k: jax.random.split(k, nc_obj))(sk_g)
                chunk_keys = chunk_keys.reshape(G * nc_obj,
                                                *chunk_keys.shape[2:])
            if use_single_pass:
                mse_v, grads = sp_value_and_grad(
                    codes, chunk_keys, params, ro_b, vd_b, gt_b, gi_v, occ)
            else:
                (_, mse_v), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                    codes, chunk_keys, params, fine_params, ro_b, vd_b,
                    gt_b, mask_b, gi_v, occ,
                )
            updates, opt_state = tx.update(grads, opt_state, codes)
            codes = optax.apply_updates(codes, updates)
            return (codes, opt_state), psnr_fn(mse_v)

        (codes, _), history = jax.lax.scan(
            step, (codes0, opt_state0),
            (jnp.arange(num_opts), jnp.swapaxes(step_keys, 0, 1)),
        )
        return codes, history

    if mesh is None:
        return jax.jit(run)

    # Object-sharded dispatch: chunk transport (object-major, so each
    # shard's slice is a contiguous block of whole objects), code rows,
    # and per-object keys shard over the batch axes; frozen params /
    # fine_params / occupancy grid replicate. No collectives: every
    # object's trajectory lives on exactly one device.
    from jax.sharding import PartitionSpec as P

    from codenerf_tpu.parallel.mesh import batch_axes, shard_map_compat

    ax = batch_axes(mesh)
    sh, rep = P(ax), P()
    run_sm = shard_map_compat(
        run, mesh,
        in_specs=(rep, rep, sh, sh, sh, sh, sh, sh, sh, rep),
        out_specs=(sh, P(None, ax)),
    )
    return jax.jit(run_sm)


def optimize_codes_batch(
    params,
    hp: Hparams,
    ray_o: jnp.ndarray,      # (G, N, 3)
    viewdir: jnp.ndarray,    # (G, N, 3)
    gt_rgb: jnp.ndarray,     # (G, N, 3)
    init_shape: jnp.ndarray,    # (D,) or (G, D)
    init_texture: jnp.ndarray,  # (D,) or (G, D)
    keys: jax.Array,         # (G,) stacked PRNG keys — one stream per object
    num_opts: int = 200,
    lr: float = 1e-2,
    lr_half_interval: int = 50,
    chunk: int = 4096,
    fine_params=None,
    reference_resets: bool = False,
    use_fused: Optional[bool] = None,
    occ_grid=None,
    rays_per_step: Optional[int] = None,
    mesh=None,
) -> BatchedOptimizationResult:
    """Optimize G objects' codes in ONE jitted dispatch.

    Row ``g`` of the result equals :func:`optimize_codes` run on object
    ``g`` alone with ``key=keys[g]`` (same chunking): per-object math, RNG
    streams, and Adam state are independent by construction, so batching
    changes wall-clock only. Per-step progress renders are not supported
    here — use the per-object path for those. ``rays_per_step`` enables
    the same stochastic minibatch optimization as :func:`optimize_codes`
    (row ``g`` bitwise-follows the standalone stochastic run).

    ``mesh`` shards the OBJECT axis over the mesh's batch axes
    (replica x data): each device optimizes G/n_shards objects with the
    identical local program, frozen weights replicated — the test-time
    half of the workflow scales across chips exactly like training does
    (the reference's per-object loop is single-device,
    ``src/optimizer.py:34,53-147``). G is padded to the shard count by
    repeating the last object (pad rows computed then discarded); row
    ``g`` stays bitwise the unsharded result."""
    from codenerf_tpu.renderer import chunk_plan, pad_rays

    G, n_rays = ray_o.shape[:2]
    chunk, _, n_padded = chunk_plan(n_rays, chunk)
    nc_obj = n_padded // chunk
    rays_per_step = _normalize_rays_per_step(rays_per_step, n_rays)

    G_run, n_shards = G, 1
    if mesh is not None:
        from codenerf_tpu.parallel.mesh import n_batch_shards

        n_shards = n_batch_shards(mesh)
        G_run = -(-G // n_shards) * n_shards

    cache_key = ("batch", dataclasses.replace(hp, raw=None), G_run, n_rays,
                 chunk, nc_obj, num_opts, lr, lr_half_interval,
                 reference_resets, use_fused, fine_params is None,
                 occ_grid is None, rays_per_step, mesh)
    if cache_key not in _RUN_CACHE:
        _RUN_CACHE[cache_key] = _build_run_batch(
            hp, G_run, n_rays, chunk, nc_obj, num_opts, lr, lr_half_interval,
            reference_resets, use_fused, rays_per_step, mesh=mesh)
        while len(_RUN_CACHE) > _RUN_CACHE_MAX:
            _RUN_CACHE.popitem(last=False)
    else:
        _RUN_CACHE.move_to_end(cache_key)
    run = _RUN_CACHE[cache_key]

    def pad_objs(x):
        if G_run == G:
            return x
        reps = jnp.broadcast_to(x[-1:], (G_run - G, *x.shape[1:]))
        return jnp.concatenate([x, reps], axis=0)

    ray_o, viewdir = pad_objs(jnp.asarray(ray_o)), pad_objs(jnp.asarray(viewdir))
    gt_rgb = pad_objs(jnp.asarray(gt_rgb, dtype=jnp.float32))
    keys = pad_objs(jnp.asarray(keys))

    def chunk_all(x):
        padded = jax.vmap(lambda a: pad_rays(a, n_padded))(x)
        return padded.reshape(G_run * nc_obj, chunk, *x.shape[2:])

    ro_c = chunk_all(ray_o)
    vd_c = chunk_all(viewdir)
    gt_c = chunk_all(gt_rgb)
    mask = jnp.arange(n_padded, dtype=jnp.float32) < n_rays
    mask_c = jnp.tile(mask.reshape(nc_obj, chunk), (G_run, 1))
    # Chunk -> object indices are LOCAL to each shard: shards own
    # contiguous object blocks of size G_run/n_shards, so the local index
    # is the global one modulo the block size (identity when unsharded).
    gi_c = jnp.repeat(
        jnp.arange(G_run, dtype=jnp.int32) % (G_run // n_shards), nc_obj)

    D_s = init_shape.shape[-1]
    D_t = init_texture.shape[-1]
    codes0 = (
        jnp.broadcast_to(init_shape.astype(jnp.float32), (G_run, D_s)),
        jnp.broadcast_to(init_texture.astype(jnp.float32), (G_run, D_t)),
    )
    (shape_codes, texture_codes), history = run(
        params, fine_params, ro_c, vd_c, gt_c, mask_c, gi_c, codes0, keys,
        occ_grid)
    if G_run != G:
        shape_codes, texture_codes = shape_codes[:G], texture_codes[:G]
        history = history[:, :G]
    return BatchedOptimizationResult(shape_codes, texture_codes, history)


@dataclasses.dataclass
class CodeOptimizer:
    """Driver mirroring the reference ``Optimizer``: per-object code
    optimization followed by held-out-view evaluation.

    Feed it the frozen trained ``params`` and the mean codes (from a
    checkpointed train state), then call :meth:`optimize_object` /
    :meth:`evaluate_object` per test object, or :meth:`run` for the full
    reference protocol over a test split.
    """

    params: Dict
    hp: Hparams
    mean_shape: jnp.ndarray
    mean_texture: jnp.ndarray
    fine_params: Optional[Dict] = None
    chunk: int = 4096
    reference_resets: bool = False
    # None defers to hp.use_fused_train (with automatic XLA fallback when
    # the architecture/chunk can't tile); True forces, False disables.
    use_fused: Optional[bool] = None
    # Optional category OccupancyGrid (e.g. Trainer.occupancy_grid): the
    # trained category's max-union occupancy is a conservative bound for
    # unseen same-category objects, so test-time optimization gets the
    # same empty-space skipping training had. Rides every jitted call as
    # an argument (never a closed-over constant).
    occ_grid: Optional[object] = None
    # Stochastic minibatch optimization: rays drawn per opt step instead
    # of rendering the full target view(s) every step (None = the exact
    # reference protocol). Cuts opt FLOPs by n_target_rays/opt_rays; the
    # eval protocol is unaffected.
    opt_rays: Optional[int] = None
    # Device mesh: shards the OBJECT axis of optimize_objects /
    # evaluate_objects over the batch axes (replica x data) — each chip
    # handles its share of the test split with the identical local
    # program (frozen weights replicated). Per-object results are
    # unchanged. The per-object methods stay single-dispatch.
    mesh: Optional[object] = None
    # Eval-time overrides. The production recipe optimizes with a reduced
    # sample budget (``--opt_samples``) and/or the category occupancy grid
    # (``--opt_occ``) but scores held-out views with the jsonfile's FULL
    # budget and no grid, so metrics stay comparable across settings.
    # ``eval_hp`` (default: ``hp``) is the config the eval renderers are
    # built from; ``eval_occ=False`` drops the grid at eval. One instance
    # then serves both loops — one eval compile per config instead of a
    # second CodeOptimizer.
    eval_hp: Optional[Hparams] = None
    eval_occ: bool = True

    def __post_init__(self):
        if self.occ_grid is not None and self.hp.render.shared_jitter:
            raise ValueError(
                "occ_grid requires per-ray sampling: shared_jitter is one "
                "global [near, far] slab and would silently ignore the "
                "grid")
        self._eval_fn = None
        self._eval_key = None  # (H, W, chunk) the cached eval fn was built for
        self._eval_multi_fn = None
        self._eval_multi_key = None

    def optimize_object(
        self,
        images: np.ndarray,   # (V, H, W, 3) float [0,1]
        poses: np.ndarray,    # (V, 4, 4)
        focal: float,
        tgt_views: Sequence[int],
        key: jax.Array,
        num_opts: int = 200,
        lr: float = 1e-2,
        lr_half_interval: int = 50,
        progress_images: bool = False,
    ) -> OptimizationResult:
        """``progress_images=True`` additionally returns every step's render
        of the FIRST target view, reshaped to (num_opts, H, W, 3) in
        ``result.progress`` — the data behind the reference's per-opt-step
        progress PNGs (``src/optimizer.py:101,149-166``), collected inside
        the single jitted scan (the loss renders those rays anyway)."""
        if progress_images and self.opt_rays is not None:
            raise ValueError(
                "progress_images=True renders the full first target view "
                "every step, but this CodeOptimizer was built with "
                f"opt_rays={self.opt_rays} (stochastic ray minibatches). "
                "Pass opt_rays=None or progress_images=False.")
        H, W = images.shape[1:3]
        ro, vd, gt = _flat_target_rays(images, poses, focal, tgt_views, H, W)
        res = optimize_codes(
            self.params, self.hp, ro, vd, gt,
            self.mean_shape, self.mean_texture, key,
            num_opts=num_opts, lr=lr, lr_half_interval=lr_half_interval,
            chunk=self.chunk, fine_params=self.fine_params,
            reference_resets=self.reference_resets,
            use_fused=self.use_fused,
            progress_rays=H * W if progress_images else 0,
            occ_grid=self.occ_grid,
            rays_per_step=self.opt_rays,
        )
        if progress_images:
            res = res._replace(
                progress=res.progress.reshape(num_opts, H, W, 3))
        return res

    def _make_eval_view(self, H: int, W: int, chunk: int,
                        deterministic: bool, gt_render=None):
        """Shared per-view render+score closure for the single- and
        multi-object eval builders.

        ``gt_render`` (optional) turns the ``gt`` argument from a pixel
        array into a per-object GT parameter pytree: the view's ground
        truth is rendered ON DEVICE by ``gt_render(c2w, focal, gt)``
        instead of crossing the tunnel (synthetic protocols only — see
        :func:`codenerf_tpu.data.synthetic.make_gt_view_renderer`)."""
        ehp = self.eval_hp or self.hp
        net_cfg, rcfg = ehp.net, ehp.render
        compute_dtype = resolve_dtype(ehp.compute_dtype)
        from codenerf_tpu.renderer import chunk_plan, pad_rays

        chunk, n_chunks, n_padded = chunk_plan(H * W, chunk)

        def eval_view(c2w, focal, gt, shape_code, texture_code, key, occ):
            if gt_render is not None:
                gt = gt_render(c2w, focal, gt)
            elif gt.dtype == jnp.uint8:
                # GT crossed the tunnel as uint8 (4x fewer bytes). XLA
                # strength-reduces the constant /255 into a reciprocal
                # multiply, so pixels can sit 1 ulp off the host-converted
                # float path (measured: ≤6e-8 on 9% of pixels) — metric
                # shifts are last-ulp, the same class as compact training
                # batches' fusion rounding.
                gt = gt.astype(jnp.float32) / 255.0
            ro, vd = camera_rays(H, W, focal, c2w)
            ro_c = pad_rays(ro, n_padded).reshape(n_chunks, chunk, 3)
            vd_c = pad_rays(vd, n_padded).reshape(n_chunks, chunk, 3)
            keys = jax.random.split(key, n_chunks)

            def render_chunk(xs):
                ro_i, vd_i, k = xs
                res = render_rays(
                    self.params, net_cfg, rcfg, ro_i, vd_i,
                    shape_code, texture_code,
                    None if deterministic else k,
                    fine_params=self.fine_params, compute_dtype=compute_dtype,
                    occ_grid=occ,
                )
                return res.final.rgb

            rgb = jax.lax.map(render_chunk, (ro_c, vd_c, keys)).reshape(
                n_padded, 3)[:H * W].reshape(H, W, 3)
            mse = reference_psnr_mse(rgb, gt)
            return rgb, psnr_fn(mse), ssim_fn(rgb, gt)

        return eval_view

    def _build_eval(self, H: int, W: int, chunk: int, deterministic: bool,
                    with_images: bool = True):
        eval_view = self._make_eval_view(H, W, chunk, deterministic)

        # The whole eval sweep (the reference loops 249 views with one GPU
        # dispatch each, src/optimizer.py:110-130) is ONE jitted call: a
        # lax.map over views. On a remote-tunneled device this removes
        # per-view round-trips. ``with_images=False`` drops the stacked
        # per-view rgb from the jit OUTPUTS entirely so XLA never
        # materializes it (at the real SRN protocol — 249 views x 128px —
        # that buffer is 783 MB/group of HBM for frames nobody reads).
        @jax.jit
        def eval_views(c2ws, focal, gts, shape_code, texture_code, key,
                       occ):
            V = c2ws.shape[0]
            keys = jax.random.split(key, V)

            def one(xs):
                c2w, gt, k = xs
                rgb, p, s = eval_view(c2w, focal, gt, shape_code,
                                      texture_code, k, occ)
                return (rgb, p, s) if with_images else (p, s)

            return jax.lax.map(one, (c2ws, gts, keys))

        if with_images:
            return eval_views
        return lambda *a: (None, *eval_views(*a))

    def _build_eval_multi(self, H: int, W: int, chunk: int,
                          deterministic: bool, with_images: bool = True,
                          gt_render=None):
        eval_view = self._make_eval_view(H, W, chunk, deterministic,
                                         gt_render=gt_render)

        # G objects × V views in ONE dispatch. Each object keeps its own
        # PRNG stream (split(key_g, V)) so per-view z-jitter matches the
        # sequential evaluate_object calls exactly. ``with_images`` as in
        # :meth:`_build_eval`. With ``gt_render``, ``gts`` is a per-object
        # parameter pytree ((G, ...) leaves, view-independent) instead of
        # a (G, V, H, W, 3) pixel array — GT renders on device, so the
        # sweep's only H2D inputs are poses/codes/params (KBs, not GBs).
        def eval_views_multi(c2ws, focals, gts, scs, tcs, keys_g, occ):
            G, V = c2ws.shape[:2]
            keys = jax.vmap(lambda kg: jax.random.split(kg, V))(keys_g)

            def one(xs):
                c2w, f, gt, sc, tc, k = xs
                rgb, p, s = eval_view(c2w, f, gt, sc, tc, k, occ)
                return (rgb, p, s) if with_images else (p, s)

            if gt_render is None:
                gts_flat = gts.reshape(G * V, *gts.shape[2:])
            else:
                gts_flat = jax.tree.map(
                    lambda x: jnp.repeat(x, V, axis=0), gts)
            out = jax.lax.map(one, (
                c2ws.reshape(G * V, *c2ws.shape[2:]),
                jnp.repeat(focals, V),
                gts_flat,
                jnp.repeat(scs, V, axis=0),
                jnp.repeat(tcs, V, axis=0),
                keys.reshape(G * V, *keys.shape[2:]),
            ))
            if with_images:
                rgb, p, s = out
                return (rgb.reshape(G, V, *rgb.shape[1:]),
                        p.reshape(G, V), s.reshape(G, V))
            p, s = out
            return p.reshape(G, V), s.reshape(G, V)

        if self.mesh is None:
            fn = jax.jit(eval_views_multi)
        else:
            # Object-sharded eval sweep: each device scores its own block
            # of objects' held-out views; only the (G, V') metric shards
            # travel. The body derives G from its LOCAL shapes, so
            # sharding it is pure wrapping (frozen params are closure
            # constants -> replicated).
            from jax.sharding import PartitionSpec as P

            from codenerf_tpu.parallel.mesh import batch_axes, \
                shard_map_compat

            ax = batch_axes(self.mesh)
            sh = P(ax)
            fn = jax.jit(shard_map_compat(
                eval_views_multi, self.mesh,
                in_specs=(sh, sh, sh, sh, sh, sh, P()),
                out_specs=(sh, sh, sh) if with_images else (sh, sh)))
        if with_images:
            return fn
        return lambda *a: (None, *fn(*a))

    def optimize_objects(
        self,
        images: np.ndarray,   # (G, V, H, W, 3) float [0,1] or uint8
        poses: np.ndarray,    # (G, V, 4, 4)
        focals: np.ndarray,   # (G,)
        tgt_views: Sequence[int],
        keys: jax.Array,      # (G,) stacked PRNG keys, one per object
        num_opts: int = 200,
        lr: float = 1e-2,
        lr_half_interval: int = 50,
    ) -> BatchedOptimizationResult:
        """Optimize G test objects' codes in ONE jitted dispatch.

        Row ``g`` follows the trajectory :meth:`optimize_object` would
        produce for object ``g`` with ``key=keys[g]`` — batching is a
        wall-clock optimization, not a semantics change (the reference
        protocol's per-object loop, ``src/optimizer.py:53-147``, pays
        per-object dispatch/transfer overhead instead)."""
        H, W = images.shape[2:4]
        ro, vd, gt = _flat_target_rays_multi(images, poses, focals,
                                             tgt_views, H, W)
        return optimize_codes_batch(
            self.params, self.hp, ro, vd, gt,
            self.mean_shape, self.mean_texture, keys,
            num_opts=num_opts, lr=lr, lr_half_interval=lr_half_interval,
            chunk=self.chunk, fine_params=self.fine_params,
            reference_resets=self.reference_resets,
            use_fused=self.use_fused,
            occ_grid=self.occ_grid,
            rays_per_step=self.opt_rays,
            mesh=self.mesh,
        )

    def evaluate_objects(
        self,
        images: Optional[np.ndarray],   # (G, V, H, W, 3) float/uint8
        poses: np.ndarray,    # (G, V, 4, 4)
        focals: np.ndarray,   # (G,)
        exclude_views: Sequence[int],
        shape_codes: jnp.ndarray,    # (G, D)
        texture_codes: jnp.ndarray,  # (G, D)
        keys: jax.Array,      # (G,) stacked PRNG keys, one per object
        return_images: bool = False,
        deterministic: bool = False,
        gt_params: Optional[Dict] = None,
    ) -> Dict[str, np.ndarray]:
        """Reference eval protocol over G objects in ONE dispatch: PSNR/
        SSIM per (object, view) for every view not in ``exclude_views``
        (the same exclusion applies to all G objects). With
        ``return_images=False`` the rendered frames stay device-side —
        only the (G, V') metric arrays cross the tunnel.

        ``gt_params`` (synthetic protocols) renders the ground truth ON
        DEVICE instead of shipping pixels: a dict with static ``geometry``
        / ``pattern`` / ``hw`` plus per-object leaves ``albedo`` (G, 3)
        and ``radius`` (G,) or ``boxes`` (G, B, 2, 3) + ``yaw`` (G,) —
        the fields :func:`codenerf_tpu.data.synthetic.synthetic_scene`
        returns (``params_only=True``). ``images`` may then be ``None``;
        at the full-scale 128px protocol this removes the ~200 MB/group
        uint8 GT H2D that was half the eval wall on the tunneled device.
        Device-rendered GT is uint8-quantized like the stored images, so
        metrics match the pixel path within the last-ulp float noise the
        uint8-H2D path already carries."""
        if gt_params is not None:
            H, W = gt_params["hw"]
            n_views = poses.shape[1]
        else:
            H, W = images.shape[2:4]
            n_views = images.shape[1]
        gt_mode = (None if gt_params is None
                   else (gt_params["geometry"], bool(gt_params["pattern"])))
        cache_key = (H, W, self.chunk, deterministic, return_images,
                     gt_mode)
        if self._eval_multi_fn is None or self._eval_multi_key != cache_key:
            gt_render = None
            if gt_params is not None:
                from codenerf_tpu.data.synthetic import make_gt_view_renderer
                gt_render = make_gt_view_renderer(
                    H, W, bool(gt_params["pattern"]), gt_params["geometry"])
            self._eval_multi_fn = self._build_eval_multi(
                H, W, self.chunk, deterministic,
                with_images=return_images, gt_render=gt_render)
            self._eval_multi_key = cache_key
        excl = set(int(i) for i in exclude_views)
        idxs = [v for v in range(n_views) if v not in excl]

        G = poses.shape[0]
        G_run = G
        if self.mesh is not None:
            from codenerf_tpu.parallel.mesh import n_batch_shards

            n_shards = n_batch_shards(self.mesh)
            G_run = -(-G // n_shards) * n_shards

        def pad_objs(x):
            if G_run == G:
                return x
            reps = jnp.broadcast_to(x[-1:], (G_run - G, *x.shape[1:]))
            return jnp.concatenate([x, reps], axis=0)

        if gt_params is not None:
            leaves = {k: jnp.asarray(gt_params[k], dtype=jnp.float32)
                      for k in ("albedo", "radius", "boxes", "yaw")
                      if k in gt_params}
            gts_arg = jax.tree.map(pad_objs, leaves)
        else:
            gts = images[:, idxs]
            gts_arg = pad_objs(
                jnp.asarray(gts) if gts.dtype == np.uint8
                else jnp.asarray(gts, dtype=jnp.float32))
        rgb, p, s = self._eval_multi_fn(
            pad_objs(jnp.asarray(poses[:, idxs])),
            pad_objs(jnp.asarray(focals, dtype=jnp.float32)),
            gts_arg,
            pad_objs(jnp.asarray(shape_codes)),
            pad_objs(jnp.asarray(texture_codes)),
            pad_objs(jnp.asarray(keys)),
            self.occ_grid if self.eval_occ else None,
        )
        out = {
            "views": np.asarray(idxs),
            "psnr": np.asarray(p)[:G],    # (G, V')
            "ssim": np.asarray(s)[:G],    # (G, V')
        }
        if return_images:
            out["images"] = np.asarray(rgb)[:G]  # (G, V', H, W, 3)
        return out

    def evaluate_object(
        self,
        images: np.ndarray,
        poses: np.ndarray,
        focal: float,
        exclude_views: Sequence[int],
        shape_code: jnp.ndarray,
        texture_code: jnp.ndarray,
        key: jax.Array,
        return_images: bool = False,
        deterministic: bool = False,
    ) -> Dict[str, np.ndarray]:
        """PSNR/SSIM on every view not in ``exclude_views`` — the reference
        eval protocol (``src/optimizer.py:107-135``), which uses JITTERED
        z-sampling at eval time (callers never pass z_fixed; SURVEY §2.3
        quirk 2). ``deterministic=True`` renders midpoint z-values instead
        (the z_fixed analog the reference never exercises)."""
        H, W = images.shape[1:3]
        cache_key = (H, W, self.chunk, deterministic, return_images)
        if self._eval_fn is None or self._eval_key != cache_key:
            self._eval_fn = self._build_eval(H, W, self.chunk,
                                             deterministic,
                                             with_images=return_images)
            self._eval_key = cache_key
        excl = set(int(i) for i in exclude_views)
        idxs = [v for v in range(images.shape[0]) if v not in excl]
        gts = images[idxs]
        rgb, p, s = self._eval_fn(
            jnp.asarray(poses[idxs]), jnp.asarray(focal),
            jnp.asarray(gts) if gts.dtype == np.uint8
            else jnp.asarray(gts, dtype=jnp.float32),
            shape_code, texture_code, key,
            self.occ_grid if self.eval_occ else None,
        )
        out = {
            "views": np.asarray(idxs),
            "psnr": np.asarray(p),
            "ssim": np.asarray(s),
        }
        if return_images:
            out["images"] = np.asarray(rgb)
        return out
