#!/usr/bin/env python
"""Hier-train step roofline: account the fused dual-composite hierarchical
training step (bench lane ``hier_train``, ~54.9 ms at 16,384 rays x 64+64,
flagship net) into measured device-time components, so the lane's ceiling
is a statement, not a narrative (VERDICT r4 weak #5).

Components (the exact pieces ``training/train_step.py:296-453`` chains):

  A  coarse z generation            core/renderer.coarse_zvals
  B  prologue forward               fused_mlp.prep_ray_operands + flatten + reg
  C  coarse sigma-only forward      fused_mlp.invoke_fwd(sigma_only=True), S=64
  D  composite weights + sample_pdf render.composite_weights +
                                    fused_train.hier_fine_zvals_meta
  E  union dual-composite kernel    fused_train.invoke_train_fused(S=128,
                                    coarse_mask/cdelta) — fwd+composite+bwd
  F  prologue VJP backward          chains d_sproj/d_tproj/d_vcontrib/dW
  G  optimizer update               optax adamw apply

plus reference points: the union kernel WITHOUT the dual composite (what
the coarse-loss rows cost), the plain single-pass kernel at S=96 (the
non-hier production kernel, round-2's 41.0 ms), and the full jitted hier
step for the total the components must sum to.

Measurement rules (CLAUDE.md traps): K iterations inside ONE jit via
lax.scan; EVERY kernel output folded into the scan carry (summing one
output DCEs the rest); operands passed as jit ARGUMENTS; host-fetch sync;
12 warmup executions per executable; single-core host kept otherwise idle.

Usage:  python tools/hier_roofline.py [--rays 16384] [--coarse 64 --fine 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--coarse", type=int, default=64)
    ap.add_argument("--fine", type=int, default=64)
    ap.add_argument("--scan_k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if os.environ.get("CODENERF_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["CODENERF_PLATFORM"])
    from codenerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from codenerf_tpu.config import Hparams, NetConfig, RenderConfig
    from codenerf_tpu.core.render import composite_weights
    from codenerf_tpu.data.pipeline import RayBatchPipeline
    from codenerf_tpu.data.synthetic import synthetic_scene
    from codenerf_tpu.core.rays import pixel_rays
    from codenerf_tpu.ops import fused_mlp, fused_train as ft
    from codenerf_tpu.renderer import coarse_zvals
    from codenerf_tpu.training.state import create_train_state
    from codenerf_tpu.training.train_step import (build_optimizer,
                                                  build_train_step)

    R, Sc, Sf = args.rays, args.coarse, args.fine
    Su = Sc + Sf
    scene = synthetic_scene(n_objects=8, n_views=8, H=128, W=128, seed=0)
    hp = Hparams(
        net=NetConfig(),
        render=RenderConfig(n_samples=Sc, near=scene["near"],
                            far=scene["far"], n_importance=Sf),
        compute_dtype="bfloat16", use_fused_train=True,
    )
    net_cfg, rcfg = hp.net, hp.render
    pipe = RayBatchPipeline(scene["images"], scene["poses"], scene["focals"])
    tx = build_optimizer(hp)
    state = create_train_state(jax.random.PRNGKey(0), hp, pipe.n_objects, tx)
    batch = {k: jnp.asarray(v) for k, v in pipe.sample(R).items()}
    key = jax.random.PRNGKey(7)

    def sync(x):
        return np.asarray(x)

    # ---- staged operands (computed once; components get them as args)
    @jax.jit
    def stage(trainables, batch, key):
        ray_o, viewdir = pixel_rays(batch["uv"], batch["focal"],
                                    batch["c2w"], pipe.H, pipe.W)
        z2d, key_fine = coarse_zvals(rcfg, ray_o, viewdir, key)
        f32 = jnp.float32
        ro8 = fused_mlp._pad_lanes(ray_o.astype(f32), 8)
        vd8 = fused_mlp._pad_lanes(viewdir.astype(f32), 8)
        gt8 = fused_mlp._pad_lanes(batch["rgb"].astype(f32), 8)
        sc = trainables["shape_codes"][batch["obj"]]
        tc = trainables["texture_codes"][batch["obj"]]
        _, _, _, sproj, tproj, vcontrib = fused_mlp.prep_ray_operands(
            trainables["params"], net_cfg, ray_o, viewdir, z2d, sc, tc)
        wflat = ft.flatten_params_f32(trainables["params"], net_cfg)
        return (ray_o, viewdir, z2d, key_fine, ro8, vd8, gt8, sproj, tproj,
                vcontrib, wflat)

    (ray_o, viewdir, z2d, key_fine, ro8, vd8, gt8, sproj, tproj, vcontrib,
     wflat) = jax.tree.map(jnp.asarray, stage(state.trainables, batch, key))
    wb = [x.astype(jnp.bfloat16) if x.ndim == 2 else x for x in wflat]
    scale = 1.0 / (R * 3.0)

    @jax.jit
    def stage2(z2d, key_fine, sigma):
        w = composite_weights(sigma, z2d)
        return ft.hier_fine_zvals_meta(z2d, w, key_fine, Sf)

    sigma_c0 = jnp.asarray(
        jax.jit(lambda *a: fused_mlp.invoke_fwd(
            net_cfg, Sc, R, *a[:6], list(a[6:]), sigma_only=True))(
            ro8, vd8, z2d, sproj, tproj, vcontrib, *wb))
    z_all, cmask, cdelta = jax.tree.map(
        jnp.asarray, stage2(z2d, key_fine, sigma_c0))

    # ---- timing helper: K scan iterations inside one jit; fn returns a
    # pytree whose EVERY leaf is summed into the carry (no DCE); the loop
    # index perturbs one operand so iterations can't CSE into one.
    def timeit(name, fn, *op_args):
        @jax.jit
        def run(*a):
            def body(c, i):
                outs = fn(i, *a)
                tot = sum(jnp.sum(x.astype(jnp.float32))
                          for x in jax.tree.leaves(outs))
                return c + tot, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(args.scan_k))
            return c

        out = run(*op_args)
        sync(out)
        for _ in range(12):
            out = run(*op_args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = run(*op_args)
        sync(out)
        ms = (time.perf_counter() - t0) / (args.reps * args.scan_k) * 1e3
        print(f"  {name:<44s} {ms:8.2f} ms", flush=True)
        return ms

    eps = jnp.float32(1e-7)
    results = {}

    # A: coarse z generation (jitter RNG folded per iteration)
    def z_gen(i, ray_o, viewdir):
        z, kf = coarse_zvals(rcfg, ray_o, viewdir,
                             jax.random.fold_in(key, i))
        return (z, jax.random.key_data(kf))

    results["A_coarse_zvals"] = timeit("A  coarse z generation", z_gen,
                                       ray_o, viewdir)

    # B: prologue forward (+F: its VJP backward, timed as fwd+bwd - fwd)
    def prologue_fn(tr, z):
        sc = tr["shape_codes"][batch["obj"]]
        tc = tr["texture_codes"][batch["obj"]]
        _, _, _, sp, tp, vc = fused_mlp.prep_ray_operands(
            tr["params"], net_cfg, ray_o, viewdir, z, sc, tc)
        wf = ft.flatten_params_f32(tr["params"], net_cfg)
        reg = jnp.mean(jnp.linalg.norm(sc, axis=-1)
                       + jnp.linalg.norm(tc, axis=-1))
        return sp, tp, vc, wf, reg

    def pro_fwd(i, tr, z):
        return prologue_fn(tr, z + eps * i)[:3]

    results["B_prologue_fwd"] = timeit("B  prologue forward", pro_fwd,
                                       state.trainables, z2d)

    def pro_fwd_bwd(i, tr, z, dsp, dtp, dvc, dwf):
        outs, vjp = jax.vjp(lambda t: prologue_fn(t, z + eps * i), tr)
        (g,) = vjp((dsp, dtp, dvc, dwf, jnp.float32(hp.loss_reg_coef)))
        return (outs[:3], g)

    dwf = [jnp.ones_like(x) for x in wflat]
    fwd_bwd = timeit("B+F prologue forward+VJP", pro_fwd_bwd,
                     state.trainables, z2d, jnp.ones_like(sproj),
                     jnp.ones_like(tproj), jnp.ones_like(vcontrib), dwf)
    results["F_prologue_vjp"] = fwd_bwd - results["B_prologue_fwd"]
    print(f"  {'F  prologue VJP backward (derived)':<44s} "
          f"{results['F_prologue_vjp']:8.2f} ms", flush=True)

    # C: coarse sigma-only forward kernel
    def sigma_fwd(i, ro8, vd8, z, sp, tp, vc, *wb_args):
        return fused_mlp.invoke_fwd(net_cfg, Sc, R, ro8, vd8, z + eps * i,
                                    sp, tp, vc, list(wb_args),
                                    sigma_only=True)

    results["C_sigma_fwd_kernel"] = timeit(
        f"C  coarse sigma-only fwd kernel (S={Sc})", sigma_fwd,
        ro8, vd8, z2d, sproj, tproj, vcontrib, *wb)

    # D: composite weights + sample_pdf + union merge
    def pdf_fn(i, z, sigma):
        w = composite_weights(sigma + eps * i, z)
        za, cm, cd = ft.hier_fine_zvals_meta(
            z, w, jax.random.fold_in(key_fine, i), Sf)
        return (za, cm, cd)

    results["D_pdf_union"] = timeit(
        "D  composite_weights + sample_pdf + union", pdf_fn, z2d, sigma_c0)

    # E: union dual-composite kernel (fwd + both composites + bwd)
    def union_dual(i, ro8, vd8, za, sp, tp, vc, gt8, cm, cd, *wf_args):
        return ft.invoke_train_fused(
            net_cfg, Su, R, rcfg.white_bg, scale, ro8, vd8, za + eps * i,
            sp, tp, vc, gt8, list(wf_args), coarse_mask=cm, coarse_delta=cd)

    results["E_union_dual_kernel"] = timeit(
        f"E  union DUAL-composite kernel (S={Su})", union_dual,
        ro8, vd8, z_all, sproj, tproj, vcontrib, gt8, cmask, cdelta, *wflat)

    # reference: same union kernel WITHOUT the dual composite
    def union_plain(i, ro8, vd8, za, sp, tp, vc, gt8, *wf_args):
        return ft.invoke_train_fused(
            net_cfg, Su, R, rcfg.white_bg, scale, ro8, vd8, za + eps * i,
            sp, tp, vc, gt8, list(wf_args))

    results["E_union_plain_kernel"] = timeit(
        f"E' union kernel, single composite (S={Su})", union_plain,
        ro8, vd8, z_all, sproj, tproj, vcontrib, gt8, *wflat)

    # reference: the non-hier production kernel at S=96
    z96 = jnp.linspace(rcfg.near, rcfg.far, 96)[None, :].repeat(R, 0)

    def kernel96(i, ro8, vd8, z, sp, tp, vc, gt8, *wf_args):
        return ft.invoke_train_fused(
            net_cfg, 96, R, rcfg.white_bg, scale, ro8, vd8, z + eps * i,
            sp, tp, vc, gt8, list(wf_args))

    results["ref_kernel_96"] = timeit(
        "R  single-pass kernel (S=96, non-hier)", kernel96,
        ro8, vd8, z96, sproj, tproj, vcontrib, gt8, *wflat)

    # G: optimizer update alone (adamw apply on ready grads)
    import optax  # noqa: F401

    grads0 = jax.jit(jax.grad(
        lambda tr: sum(jnp.sum(x * x)
                       for x in jax.tree.leaves(tr))))(state.trainables)

    def opt_update(i, grads, opt_state, tr):
        g = jax.tree.map(lambda x: x + eps * i, grads)
        updates, new_os = tx.update(g, opt_state, tr)
        new_tr = optax.apply_updates(tr, updates)
        return (new_tr, jax.tree.leaves(new_os)[0])

    results["G_optimizer_update"] = timeit(
        "G  optax adamw update", opt_update, grads0, state.opt_state,
        state.trainables)

    # ---- the full jitted hier step (outer-loop timed like bench.py)
    step_fn = jax.jit(build_train_step(hp, pipe.H, pipe.W, tx,
                                       batch_size=R), donate_argnums=0)
    st = state
    st, m = step_fn(st, batch)
    sync(m["loss"])
    for _ in range(12):
        st, m = step_fn(st, batch)
    sync(m["loss"])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        st, m = step_fn(st, batch)
    sync(m["loss"])
    results["full_step"] = (time.perf_counter() - t0) / n * 1e3
    print(f"  {'FULL fused hier train step':<44s} "
          f"{results['full_step']:8.2f} ms", flush=True)

    comp_sum = sum(results[k] for k in (
        "A_coarse_zvals", "B_prologue_fwd", "C_sigma_fwd_kernel",
        "D_pdf_union", "E_union_dual_kernel", "F_prologue_vjp",
        "G_optimizer_update"))
    results["component_sum"] = comp_sum
    results["rays"] = R
    results["coarse"] = Sc
    results["fine"] = Sf
    print(f"  {'component sum A+B+C+D+E+F+G':<44s} {comp_sum:8.2f} ms",
          flush=True)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
