"""The jitted training step.

One step = one globally-sampled ray batch (all objects/views/pixels mixed),
rendered and optimized in a single compiled computation. This replaces the
reference's nested python loops — per-object, per-image, per-2048-ray-chunk
with gradient accumulation and per-chunk H2D copies
(``src/trainer.py:57-99``) — with one device program whose only host
interaction is the batch transfer.

Loss parity (``src/trainer.py:75-83``): mean-squared error on composited
RGB plus ``loss_reg_coef * mean(||z_s|| + ||z_t||)`` on the (gathered)
codes. With hierarchical sampling the coarse MSE is added as in standard
NeRF. The reference's per-image ``zero_grad`` bug and first-chunk-only reg
scaling (SURVEY §2.3 quirks 1, 4) are deliberately not reproduced — a batch
contributes exactly once, and the reg term is applied once per step.

Optimizer parity (``src/trainer.py:117-131``): AdamW (torch defaults:
betas 0.9/0.999, eps 1e-8, weight_decay 0.01) with the model on
``lr_schedule[0]`` and both code tables on ``lr_schedule[1]``, each decayed
by step-halving. Moments persist across the whole run (the reference resets
them every epoch — quirk, not feature).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from codenerf_tpu.config import Hparams, resolve_dtype
from codenerf_tpu.core.rays import pixel_rays
from codenerf_tpu.renderer import render_rays
from codenerf_tpu.training.schedules import (
    step_halving,
    window_frozen_step_halving,
)
from codenerf_tpu.training.state import TrainState

Batch = Dict[str, jnp.ndarray]


def expand_compact_batch(batch: Batch, tables: Batch) -> Batch:
    """Expand a compact index batch (obj i32, view i32, uv i16, rgb u8 — see
    ``RayBatchPipeline.sample(compact=True)``) into the per-ray layout the
    loss consumes, gathering pose/focal from the device-resident tables.

    This moves the batch's pose/rgb expansion from the host (76 B/ray over
    the H2D link — the per-ray (3,4) f32 pose dominated the transfer, and
    the tunnel link is both slow and flaky) to a few device gathers
    (15 B/ray shipped). ``rgb/255.0`` matches the host-side float conversion
    bit-for-bit (same f32 division)."""
    obj = batch["obj"]
    return {
        "obj": obj,
        "uv": batch["uv"].astype(jnp.float32),
        "c2w": tables["c2w"][obj, batch["view"]],
        "focal": tables["focal"][obj],
        "rgb": batch["rgb"].astype(jnp.float32) / 255.0,
    }


def reset_adam_state(opt_state):
    """Zero every ScaleByAdamState (count, mu, nu) inside an optax state
    pytree, leaving schedule counts and everything else untouched — the
    jit-safe equivalent of the reference rebuilding its AdamW from scratch
    (``src/trainer.py:52``, ``src/optimizer.py:104-105``)."""

    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
            return optax.ScaleByAdamState(
                count=jnp.zeros_like(s.count), mu=zeros(s.mu), nu=zeros(s.nu)
            )
        if isinstance(s, tuple) and hasattr(s, "_fields"):  # NamedTuple
            return type(s)(*(rec(x) for x in s))
        if isinstance(s, tuple):
            return tuple(rec(x) for x in s)
        if isinstance(s, list):
            return [rec(x) for x in s]
        if isinstance(s, dict):
            return {k: rec(v) for k, v in s.items()}
        return s

    return rec(opt_state)


def build_optimizer(hp: Hparams) -> optax.GradientTransformation:
    """AdamW with per-group step-halving lrs via optax.multi_transform.

    With ``hp.quirks.optimizer_reset_every`` the lr schedules freeze at
    their window-start values (the moments themselves are reset inside the
    train step, where the global step is known)."""
    adamw = lambda sched: optax.adamw(
        learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=hp.weight_decay,
    )
    window = hp.quirks.optimizer_reset_every
    if window > 0:
        sched = lambda s: window_frozen_step_halving(s.lr, s.interval, window)
    else:
        sched = lambda s: step_halving(s.lr, s.interval)
    transforms = {
        "model": adamw(sched(hp.lr_model)),
        "codes": adamw(sched(hp.lr_codes)),
    }

    def label_tree(trainables):
        return {
            k: jax.tree_util.tree_map(
                lambda _: "codes" if k in ("shape_codes", "texture_codes") else "model",
                v,
            )
            for k, v in trainables.items()
        }

    return optax.multi_transform(transforms, label_tree)


def build_train_step(
    hp: Hparams,
    H: int,
    W: int,
    tx: optax.GradientTransformation,
    microbatch_rays: int = 0,
    batch_size: int = 0,
    mesh=None,
    compact: bool = False,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Returns the un-jitted step function; callers jit it with the sharding
    constraints they want (see ``parallel/mesh.py`` and ``Trainer``).

    ``microbatch_rays > 0`` runs the loss/backward as a rematerialized
    ``lax.scan`` over fixed-size ray microbatches with f32 gradient
    accumulation — activation memory is bounded by the microbatch instead of
    the full batch, enabling arbitrarily large effective batches (the
    TPU-native analog of the reference's serial 2048-ray chunk loop with
    grad accumulation, ``src/trainer.py:69-84``, minus its per-image
    zero_grad bug).

    ``compact=True`` makes the returned step take a trailing ``tables``
    argument (the pipeline's device-resident pose/focal tables) and expect
    the compact index-batch layout, expanded on-device by
    :func:`expand_compact_batch` before the loss.

    ``mesh`` is required when ``hp.use_fused_train`` runs under a device
    mesh: XLA's SPMD partitioner cannot split a Pallas call on its own, so
    the fused op is shard_map-ed over the batch axes (each device runs the
    kernel on its ray shard; weight cotangents all-reduce automatically
    through shard_map's transpose). Weights must be replicated — fused + a
    'model' (TP) axis > 1 is rejected."""
    net_cfg, rcfg = hp.net, hp.render
    compute_dtype = resolve_dtype(hp.compute_dtype)

    apply_fn = None
    composite_fn = None
    if hp.use_fused_train:
        from codenerf_tpu.ops import fused_train as ft

        # Validate against the ACTUAL per-step MLP shapes when the caller
        # provides them (Trainer always passes batch_size): the kernel tiles
        # the ray axis, so the step's PER-DEVICE ray count must divide into
        # tiles, for every sample count the renderer will evaluate (coarse,
        # and coarse+fine with hierarchical sampling). Without a known size
        # only the architecture is validated here (the probe count is
        # tile-divisible by construction) and an indivisible batch fails at
        # kernel-call time instead.
        step_rays = microbatch_rays or batch_size or 32 * ft._TILE_RAYS
        if mesh is not None:
            if mesh.shape.get("model", 1) > 1:
                raise ValueError(
                    "use_fused_train requires replicated weights: the "
                    "fused kernels hold full weight matrices in VMEM, so "
                    "a 'model' (tensor-parallel) axis > 1 is unsupported. "
                    "Use data/replica parallelism or disable the flag."
                )
            n_shards = 1
            for ax in ("replica", "data"):
                n_shards *= mesh.shape.get(ax, 1)
            if step_rays % n_shards:
                raise ValueError(
                    f"batch {step_rays} not divisible by the "
                    f"{n_shards}-way batch sharding")
            step_rays //= n_shards
        sample_counts = [rcfg.n_samples]
        if rcfg.n_importance > 0:
            sample_counts.append(rcfg.n_samples + rcfg.n_importance)
        for s in sample_counts:
            if not ft.fused_train_available(net_cfg, step_rays, s):
                raise ValueError(
                    "use_fused_train requires W % 256 == 0 (the rgb-hidden "
                    "width W/2 must be a lane multiple), num_xyz_freq <= 10, "
                    ">= 1 shape/texture block and a tile-divisible ray count "
                    f"(got W={net_cfg.W}, d_xyz={net_cfg.d_xyz}, "
                    f"blocks={net_cfg.shape_blocks}/{net_cfg.texture_blocks}, "
                    f"rays/step(/device)={step_rays}, samples={s})"
                )

        # Training uses the SINGLE-PASS loss kernel (forward + volume
        # rendering + per-ray MSE cotangent + backward in one grid step:
        # activations never leave VMEM, no forward recompute — 3x forward
        # FLOPs total vs the two-kernel op's 4x; see
        # ops/fused_train._train_kernel). Hierarchical sampling runs TWO
        # single-pass calls — the coarse one also emits the compositing
        # weights plane that drives sample_pdf (want_weights=True), the
        # fine one runs at n_samples + n_importance on the union-sorted z
        # — with the cotangents summed into one prologue VJP (6F total vs
        # the plane-op autodiff path's 8F plus relayouts).
        # input_grads=False everywhere: a training step never
        # differentiates through rays or depths (rays come from batch
        # poses, z from the sampler RNG; hierarchical z is behind
        # stop_gradient). Separate fine weights
        # (share_fine_weights=False) fall back to the plane op under
        # autodiff — the fused path feeds ONE weight operand list to
        # both passes.
        fuse_composite = hp.fused_composite and (
            rcfg.n_importance == 0 or rcfg.share_fine_weights)
        if not fuse_composite:
            _op = ft.make_fused_train_op(net_cfg, input_grads=False)
            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                from jax import shard_map as _shard_map

                batch_axes = tuple(ax for ax in ("replica", "data")
                                   if ax in mesh.axis_names)
                n_w = 2 * len(ft._weight_shapes(net_cfg))
                kw = dict(mesh=mesh,
                          in_specs=(P(batch_axes),) * 6 + (P(),) * n_w,
                          out_specs=(P(batch_axes),) * 4)
                try:
                    _op = _shard_map(_op, check_vma=False, **kw)
                except TypeError:  # pre-0.9 jax spells it check_rep
                    _op = _shard_map(_op, check_rep=False, **kw)

            def apply_fn(p, cfg, ray_o, viewdir, z_vals, s_code, t_code):
                return ft.fused_apply_train(p, cfg, ray_o, viewdir, z_vals,
                                            s_code, t_code, op=_op)

    use_occ = hp.train_occupancy is not None
    if use_occ and rcfg.shared_jitter:
        raise ValueError(
            "train_occupancy requires per-ray sampling: shared_jitter is "
            "one global jitter vector and cannot carry per-ray bounds"
        )
    if use_occ and hp.train_occupancy.radius is None \
            and rcfg.bound_sphere_radius is None:
        raise ValueError(
            "train_occupancy needs a grid extent: set "
            "train_occupancy.radius or bound_sphere_radius"
        )

    def loss_fn(trainables, batch: Batch, key: jax.Array, occ_grid=None):
        shape_code = trainables["shape_codes"][batch["obj"]]
        texture_code = trainables["texture_codes"][batch["obj"]]
        ray_o, viewdir = pixel_rays(batch["uv"], batch["focal"], batch["c2w"], H, W)
        res = render_rays(
            trainables["params"], net_cfg, rcfg, ray_o, viewdir,
            shape_code, texture_code, key,
            fine_params=trainables.get("fine_params"),
            compute_dtype=compute_dtype,
            apply_fn=apply_fn,
            composite_fn=composite_fn,
            occ_grid=occ_grid,
        )
        mse = jnp.mean((res.final.rgb - batch["rgb"]) ** 2)
        loss = mse
        if res.fine is not None:
            loss = loss + jnp.mean((res.coarse.rgb - batch["rgb"]) ** 2)
        reg = jnp.mean(
            jnp.linalg.norm(shape_code, axis=-1)
            + jnp.linalg.norm(texture_code, axis=-1)
        )
        # quirks.reg_chunk_divisor > 1 reproduces the reference's
        # first-chunk-only reg (1/d of the full-image gradient).
        loss = loss + (hp.loss_reg_coef / hp.quirks.reg_chunk_divisor) * reg
        metrics = {
            "loss": loss,
            "mse": mse,
            "psnr": -10.0 * jnp.log(mse) / jnp.log(10.0),
            "reg": reg,
        }
        return loss, metrics

    use_fused_loss = hp.use_fused_train and hp.fused_composite and (
        rcfg.n_importance == 0 or rcfg.share_fine_weights)
    if use_fused_loss:
        from codenerf_tpu.ops import fused_mlp
        from codenerf_tpu.ops import fused_train as ft
        from codenerf_tpu.renderer import coarse_zvals

        reg_coef = hp.loss_reg_coef / hp.quirks.reg_chunk_divisor
        hier = rcfg.n_importance > 0

        def grad_fn(trainables, batch: Batch, key: jax.Array, occ_grid=None):
            """Single-pass fused loss+gradients: the kernel returns the
            squared-error sum plus cotangents for the per-ray code
            projections and every MLP weight; ONE jax.vjp over the XLA
            prologue (code gather, latent projections, weight
            flattening/padding, reg term) chains them into the exact
            trainables gradient — bitwise the same chaining autodiff
            would emit, without a second forward.

            Hierarchical (n_importance > 0): the coarse pass is
            FORWARD-ONLY — the sigma-only kernel (texture branch skipped,
            ~0.6F) feeds XLA compositing weights into sample_pdf + the
            union merge-sort (non-differentiated — the z chain is cut by
            design) — and the single union-count kernel call computes
            BOTH losses via its dual composite (fine over the union,
            coarse over the cmask/cdelta subset of the same evaluation),
            returning cotangents already summed. The prologue is
            z-independent, so ONE prologue/VJP chains them — exactly the
            gradient of `fine_mse + coarse_mse + reg` at ~0.6F@coarse +
            3F@union total (the former two-call recipe paid 3F@coarse +
            3F@union)."""
            ray_o, viewdir = pixel_rays(batch["uv"], batch["focal"],
                                        batch["c2w"], H, W)
            z2d, key_fine = coarse_zvals(rcfg, ray_o, viewdir, key,
                                         occ_grid=occ_grid)
            R_total = batch["rgb"].shape[0]
            scale = 1.0 / (R_total * 3.0)
            f32 = jnp.float32
            ro8 = fused_mlp._pad_lanes(ray_o.astype(f32), 8)
            vd8 = fused_mlp._pad_lanes(viewdir.astype(f32), 8)
            gt8 = fused_mlp._pad_lanes(batch["rgb"].astype(f32), 8)

            def prologue(tr):
                sc = tr["shape_codes"][batch["obj"]]
                tc = tr["texture_codes"][batch["obj"]]
                _, _, _, sproj, tproj, vcontrib = fused_mlp.prep_ray_operands(
                    tr["params"], net_cfg, ray_o, viewdir, z2d, sc, tc)
                wflat = ft.flatten_params_f32(tr["params"], net_cfg)
                reg = jnp.mean(jnp.linalg.norm(sc, axis=-1)
                               + jnp.linalg.norm(tc, axis=-1))
                return sproj, tproj, vcontrib, wflat, reg

            (sproj, tproj, vcontrib, wflat, reg), pro_vjp = jax.vjp(
                prologue, trainables)

            def _shard_wrap(fn, n_ray_ins, out_specs_fn):
                """shard_map a kernel-call closure over the batch axes."""
                from jax.sharding import PartitionSpec as P

                from jax import shard_map as _shard_map

                batch_axes = tuple(ax for ax in ("replica", "data")
                                   if ax in mesh.axis_names)
                n_w = len(wflat)
                kw = dict(
                    mesh=mesh,
                    in_specs=(P(batch_axes),) * n_ray_ins + (P(),) * n_w,
                    out_specs=out_specs_fn(P(batch_axes)),
                )
                try:
                    return _shard_map(fn, check_vma=False, **kw)
                except TypeError:
                    return _shard_map(fn, check_rep=False, **kw)

            def make_kernel_call(dual):
                """The single-pass loss kernel; ``dual`` adds the
                cmask/cdelta operands and the coarse-SE scalar output
                (hierarchical union call)."""
                n_scalars = 2 if dual else 1
                n_ray_ins = 9 if dual else 7
                n_ray_outs = 3  # d_sproj, d_tproj, d_vcontrib

                def kernel_call(*args):
                    ray_args, wflat_args = args[:n_ray_ins], args[n_ray_ins:]
                    cmask = cdelta = None
                    if dual:
                        cmask, cdelta = ray_args[7:9]
                    ro8, vd8, zz, sproj, tproj, vcontrib, gt8 = ray_args[:7]
                    outs = ft.invoke_train_fused(
                        net_cfg, zz.shape[1], zz.shape[0], rcfg.white_bg,
                        scale, ro8, vd8, zz, sproj, tproj, vcontrib, gt8,
                        list(wflat_args), coarse_mask=cmask,
                        coarse_delta=cdelta)
                    if mesh is not None:
                        axes = tuple(ax for ax in ("replica", "data")
                                     if ax in mesh.axis_names)
                        ses = tuple(jax.lax.psum(s, axes)
                                    for s in outs[:n_scalars])
                        dwb = [jax.lax.psum(x, axes)
                               for x in outs[n_scalars + n_ray_outs:]]
                        return (ses
                                + tuple(outs[n_scalars:
                                             n_scalars + n_ray_outs])
                                + tuple(dwb))
                    return tuple(outs)

                if mesh is not None:
                    n_w = len(wflat)
                    kernel_call = _shard_wrap(
                        kernel_call, n_ray_ins,
                        lambda pb: ((jax.sharding.PartitionSpec(),)
                                    * n_scalars
                                    + (pb,) * n_ray_outs
                                    + (jax.sharding.PartitionSpec(),) * n_w))
                return kernel_call

            def make_sigma_call():
                """Coarse FORWARD-ONLY pass: the sigma-only kernel (the
                texture branch never runs — importance weights are a
                function of sigma and z alone). No gradient work here:
                the coarse LOSS is computed by the union kernel's dual
                composite."""
                def sigma_call(ro8, vd8, zz, sproj, tproj, vcontrib,
                               *wflat_args):
                    wb = [x.astype(jnp.bfloat16) if x.ndim == 2 else x
                          for x in wflat_args]
                    return fused_mlp.invoke_fwd(
                        net_cfg, zz.shape[1], zz.shape[0], ro8, vd8, zz,
                        sproj, tproj, vcontrib, wb, sigma_only=True)

                if mesh is not None:
                    sigma_call = _shard_wrap(sigma_call, 6, lambda pb: pb)
                return sigma_call

            if not hier:
                outs = make_kernel_call(False)(ro8, vd8, z2d, sproj, tproj,
                                               vcontrib, gt8, *wflat)
                se, d_sproj, d_tproj, d_vcontrib = outs[:4]
                dwb = list(outs[4:])
                mse = se * scale
                coarse_mse = None
            else:
                from codenerf_tpu.core.render import composite_weights

                sigma_c = make_sigma_call()(ro8, vd8, z2d, sproj, tproj,
                                            vcontrib, *wflat)
                w_coarse = composite_weights(sigma_c, z2d)
                z_all, cmask, cdelta = ft.hier_fine_zvals_meta(
                    z2d, w_coarse, key_fine, rcfg.n_importance)
                outs = make_kernel_call(True)(
                    ro8, vd8, z_all, sproj, tproj, vcontrib, gt8,
                    cmask, cdelta, *wflat)
                se_f, se_c, d_sproj, d_tproj, d_vcontrib = outs[:5]
                dwb = list(outs[5:])
                mse = se_f * scale
                coarse_mse = se_c * scale
            (grads,) = pro_vjp((d_sproj, d_tproj, d_vcontrib, dwb,
                                jnp.asarray(reg_coef, f32)))
            loss = mse + reg_coef * reg
            if coarse_mse is not None:
                loss = loss + coarse_mse
            metrics = {
                "loss": loss,
                "mse": mse,
                "psnr": -10.0 * jnp.log(mse) / jnp.log(10.0),
                "reg": reg,
            }
            return grads, metrics
    else:
        grad_fn = jax.grad(loss_fn, has_aux=True)

    def full_grads(trainables, batch: Batch, key: jax.Array, occ_grid=None):
        if not microbatch_rays:
            return grad_fn(trainables, batch, key, occ_grid)
        B = batch["rgb"].shape[0]
        if B % microbatch_rays != 0:
            raise ValueError(
                f"batch {B} not divisible by microbatch {microbatch_rays}")
        k = B // microbatch_rays
        mbs = {
            name: v.reshape(k, microbatch_rays, *v.shape[1:])
            for name, v in batch.items()
        }
        keys = jax.random.split(key, k)
        mb_grad = jax.checkpoint(grad_fn)

        def body(carry, xs):
            acc, m_acc = carry
            mb = {name: xs[i] for i, name in enumerate(sorted(mbs))}
            g, m = mb_grad(trainables, mb, xs[-1], occ_grid)
            acc = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(jnp.float32), acc, g)
            m_acc = {name: m_acc[name] + m[name] for name in m_acc}
            return (acc, m_acc), None

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), trainables)
        xs = tuple(mbs[name] for name in sorted(mbs)) + (keys,)
        zero_m = {"loss": jnp.zeros(()), "mse": jnp.zeros(()),
                  "psnr": jnp.zeros(()), "reg": jnp.zeros(())}
        (acc, m_sum), _ = jax.lax.scan(body, (zeros, zero_m), xs)
        grads = jax.tree_util.tree_map(lambda g: g / k, acc)
        # Full-batch metrics: mean over microbatches, with psnr recomputed
        # from the mean mse (a mean of per-microbatch psnrs is biased).
        metrics = {name: v / k for name, v in m_sum.items()}
        metrics["psnr"] = -10.0 * jnp.log(metrics["mse"]) / jnp.log(10.0)
        return grads, metrics

    reset_every = hp.quirks.optimizer_reset_every

    def _step(state: TrainState, batch: Batch, occ_grid, tables=None):
        if tables is not None:
            batch = expand_compact_batch(batch, tables)
        rng, key = jax.random.split(state.rng)
        grads, metrics = full_grads(state.trainables, batch, key, occ_grid)
        opt_state_in = state.opt_state
        if reset_every > 0:
            # Reference quirk #3: fresh Adam moments at each window start
            # (the lr freeze half of the quirk lives in build_optimizer).
            opt_state_in = jax.lax.cond(
                state.step % reset_every == 0,
                reset_adam_state,
                lambda s: s,
                state.opt_state,
            )
        updates, opt_state = tx.update(grads, opt_state_in, state.trainables)
        trainables = optax.apply_updates(state.trainables, updates)
        new_state = state.replace(
            step=state.step + 1,
            trainables=trainables,
            opt_state=opt_state,
            rng=rng,
        )
        return new_state, metrics

    if use_occ and compact:
        def train_step(state: TrainState, batch: Batch, occ_grid, tables):
            return _step(state, batch, occ_grid, tables)
    elif use_occ:
        # 3-arg step: the (traced) occupancy grid is per-step input so the
        # periodic density refresh never triggers a recompile.
        def train_step(state: TrainState, batch: Batch, occ_grid):
            return _step(state, batch, occ_grid)
    elif compact:
        def train_step(state: TrainState, batch: Batch, tables):
            return _step(state, batch, None, tables)
    else:
        def train_step(state: TrainState, batch: Batch):
            return _step(state, batch, None)

    return train_step
