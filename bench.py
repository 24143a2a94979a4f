#!/usr/bin/env python
"""Throughput benchmark. Prints ONE JSON line.

Metric (BASELINE.json): rays/sec/chip, train + render combined, on the
flagship SRN-cars configuration (W=256, 3+1 blocks, 96 samples/ray,
128x128 images). North star: 2M rays/s aggregate on v5e-8 = 250K
rays/s/chip -> ``vs_baseline = value / 250_000``.

Protocol: synthetic in-memory scene (ShapeNet is not present on bench
hosts; ray/MLP/compositing work is identical), bfloat16 compute. Train =
full jitted train step (fwd+bwd+AdamW) on 16K-ray batches; render = jitted
eval-mode forward on 16K-ray batches (one 128x128 view per step). Combined
throughput = total rays / total wall time over both phases, after
compilation + warmup.
"""

import json
import time

import numpy as np


def _bench(n_train_steps: int = 30, n_render_steps: int = 30,
           batch: int = 16384) -> dict:
    import jax
    import jax.numpy as jnp

    from codenerf_tpu.config import Hparams, NetConfig, RenderConfig
    from codenerf_tpu.data.pipeline import RayBatchPipeline
    from codenerf_tpu.data.synthetic import synthetic_scene
    from codenerf_tpu.renderer import render_rays
    from codenerf_tpu.training.state import create_train_state
    from codenerf_tpu.training.train_step import build_optimizer, build_train_step

    scene = synthetic_scene(n_objects=8, n_views=8, H=128, W=128, seed=0)
    hp = Hparams(
        net=NetConfig(),  # flagship srncar dims: W=256, 3+1 blocks, D=256
        render=RenderConfig(n_samples=96, near=scene["near"], far=scene["far"]),
        compute_dtype="bfloat16",
    )
    pipe = RayBatchPipeline(scene["images"], scene["poses"], scene["focals"])
    tx = build_optimizer(hp)
    state = create_train_state(jax.random.PRNGKey(0), hp, pipe.n_objects, tx)
    step_fn = jax.jit(build_train_step(hp, pipe.H, pipe.W, tx),
                      donate_argnums=0)

    batches = [pipe.sample(batch) for _ in range(8)]
    batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]

    # ---- train phase
    # Measurement notes for the axon-tunneled runtime:
    # - synchronization must go through an actual host fetch
    #   (jax.block_until_ready returns before execution finishes, silently
    #   inflating throughput ~100x);
    # - the FIRST ~10 executions of any fresh executable run ~7x slower
    #   than steady state (measured: 117 ms -> 15.6 ms for an identical
    #   render), so each phase warms up with 12 untimed executions.
    def sync(x):
        return np.asarray(x)

    state, m = step_fn(state, batches[0])  # compile
    sync(m["loss"])
    for i in range(12):                    # warm to steady state
        state, m = step_fn(state, batches[i % len(batches)])
    sync(m["loss"])
    t0 = time.perf_counter()
    for i in range(n_train_steps):
        state, m = step_fn(state, batches[i % len(batches)])
    sync(m["loss"])
    train_xla_time = time.perf_counter() - t0
    train_xla_rays_per_sec = (n_train_steps * batch) / train_xla_time
    del state

    # ---- fused train phase: the production flagship path — the Pallas
    # fwd+bwd kernels with in-kernel xyz expansion + positional encoding
    # (ops/fused_train.py). Measured 1.4x the XLA step at identical loss.
    import dataclasses

    hp_f = dataclasses.replace(hp, use_fused_train=True)
    state = create_train_state(jax.random.PRNGKey(0), hp_f, pipe.n_objects, tx)
    step_f = jax.jit(build_train_step(hp_f, pipe.H, pipe.W, tx,
                                      batch_size=batch),
                     donate_argnums=0)
    state, m = step_f(state, batches[0])
    sync(m["loss"])
    for i in range(12):
        state, m = step_f(state, batches[i % len(batches)])
    sync(m["loss"])
    t0 = time.perf_counter()
    for i in range(n_train_steps):
        state, m = step_f(state, batches[i % len(batches)])
    sync(m["loss"])
    train_time = time.perf_counter() - t0
    train_rays = n_train_steps * batch

    # ---- render phase (eval-mode forward, jittered sampling like eval).
    # Rays per dispatch are batched (lax.map over image-sized chunks inside
    # one jit) so the tunneled runtime's per-dispatch latency doesn't
    # masquerade as device time; total rendered rays equal the train rays.
    params = state.trainables["params"]
    shape_code = state.trainables["shape_codes"][0]
    texture_code = state.trainables["texture_codes"][0]

    from codenerf_tpu.core.rays import camera_rays

    views = [camera_rays(pipe.H, pipe.W, float(pipe.focals[0]),
                         jnp.asarray(pipe.poses[0, v % pipe.n_views]))
             for v in range(8)]
    ro = jnp.concatenate([v[0] for v in views]).reshape(-1, batch, 3)
    vd = jnp.concatenate([v[1] for v in views]).reshape(-1, batch, 3)

    @jax.jit
    def render_views(ro, vd, key):
        def chunk(xs):
            ro_c, vd_c, k = xs
            res = render_rays(params, hp.net, hp.render, ro_c, vd_c,
                              shape_code, texture_code, k,
                              compute_dtype=jnp.bfloat16)
            return res.final.rgb

        keys = jax.random.split(key, ro.shape[0])
        return jax.lax.map(chunk, (ro, vd, keys))

    rays_per_dispatch = ro.shape[0] * ro.shape[1]
    n_render_dispatches = max(2, (n_train_steps * batch) // rays_per_dispatch)
    key = jax.random.PRNGKey(0)
    out = render_views(ro, vd, key)  # compile
    sync(out[0, 0, 0])
    for i in range(3):                 # warm to steady state (12+ chunk runs)
        out = render_views(ro, vd, jax.random.fold_in(key, 1000 + i))
    sync(out[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(n_render_dispatches):
        out = render_views(ro, vd, jax.random.fold_in(key, i))
    sync(out[0, 0, 0])
    render_time = time.perf_counter() - t0
    render_rays_total = n_render_dispatches * rays_per_dispatch

    # ---- efficient-train mode (informational): sphere-bounded sampling at
    # a 48-sample budget on the fused kernels (jsonfiles/srncar_occ.json
    # semantics — measured to BEAT unbounded-96 quality at this budget with
    # the training occupancy grid; the grid only changes z generation, so
    # its throughput equals this bounded-48 number).

    hp_b = dataclasses.replace(
        hp, use_fused_train=True,
        render=dataclasses.replace(hp.render, n_samples=48,
                                   bound_sphere_radius=1.4))
    state_b = create_train_state(jax.random.PRNGKey(0), hp_b,
                                 pipe.n_objects, tx)
    step_b = jax.jit(build_train_step(hp_b, pipe.H, pipe.W, tx,
                                      batch_size=batch),
                     donate_argnums=0)
    state_b, m = step_b(state_b, batches[0])
    sync(m["loss"])
    for i in range(12):
        state_b, m = step_b(state_b, batches[i % len(batches)])
    sync(m["loss"])
    t0 = time.perf_counter()
    for i in range(n_train_steps):
        state_b, m = step_b(state_b, batches[i % len(batches)])
    sync(m["loss"])
    train_bounded_rays_per_sec = (n_train_steps * batch) / (
        time.perf_counter() - t0)
    del state_b

    # ---- sustained production trainer (informational): the REAL training
    # loop — Trainer with host pipeline, compact index batches (15 B/ray),
    # prefetch-worker device staging, occupancy lookup + refreshes — at
    # srncar_occ.json (48-sample) and srncar_occ32.json (32-sample)
    # semantics. This is what a long run actually sustains (round-3
    # soaks: 642K / ~735K rays/s), vs the batch-resident step lane above.
    # Occupancy warmup is shortened so the post-warmup (grid-active)
    # regime is what gets timed.
    import tempfile

    from codenerf_tpu.config import TrainOccupancyConfig
    from codenerf_tpu.training.trainer import Trainer

    def sustained_lane(n_samples: int) -> float:
        # Warm EVERY executable the timed window will hit: the train step
        # (150 steps; also warms the Orbax checkpoint writer via the
        # end-of-training save), then both occupancy executables
        # explicitly — the first in-loop refresh only happens at step 500,
        # so without this their compiles would land INSIDE the timed
        # window (the scanned decay=1.0 rebuild and the incremental update
        # are separate jit specializations). The timed window is then 1000
        # steps (150->1150) containing the two incremental refreshes at
        # steps 500 and 1000 — the production update_every=500 duty cycle.
        # (A live in-process grid is not re-rebuilt at the window start:
        # trainer gates the resume rebuild on _occ_seeded.)
        hp_s = dataclasses.replace(
            hp_b,
            render=dataclasses.replace(hp_b.render, n_samples=n_samples),
            train_occupancy=TrainOccupancyConfig(warmup=50,
                                                 update_every=500))
        tr = Trainer(f"bench_sustained_{n_samples}", hp_s, batch_size=batch,
                     dataset=scene,
                     exps_root=tempfile.mkdtemp(prefix="bench_sustained_"),
                     check_iter=0)
        tr.training(iters_crop=0, iters_all=150, log_every=100_000)
        tr._rebuild_occupancy()
        tr._update_occupancy()
        sync(tr._occ.occ)
        t0 = time.perf_counter()
        tr.training(iters_crop=0, iters_all=1150, log_every=100_000)
        return (1000 * batch) / (time.perf_counter() - t0)

    # occ-48 = srncar_occ.json semantics (the conservative default; kept
    # for cross-round comparability); occ-32 = srncar_occ32.json, the
    # throughput-optimal production config — 3-seed quality identical to
    # occ-48 (27.26 vs 27.26 dB held-out, better SSIM) and 30K-step
    # soak-proven (docs/QUALITY_SYNTHETIC.md).
    train_sustained_rays_per_sec = sustained_lane(48)
    train_sustained32_rays_per_sec = sustained_lane(32)

    # ---- efficient-render mode (informational): sphere-bounded sampling at
    # a 32-sample budget — measured to match full-budget quality on
    # origin-normalized scenes (see core/rays.ray_sphere_bounds).

    rcfg_eff = dataclasses.replace(hp.render, n_samples=32,
                                   bound_sphere_radius=1.4)

    @jax.jit
    def render_views_eff(ro, vd, key):
        def chunk(xs):
            ro_c, vd_c, k = xs
            res = render_rays(params, hp.net, rcfg_eff, ro_c, vd_c,
                              shape_code, texture_code, k,
                              compute_dtype=jnp.bfloat16)
            return res.final.rgb

        keys = jax.random.split(key, ro.shape[0])
        return jax.lax.map(chunk, (ro, vd, keys))

    out = render_views_eff(ro, vd, key)
    sync(out[0, 0, 0])
    for i in range(3):
        out = render_views_eff(ro, vd, jax.random.fold_in(key, 2000 + i))
    sync(out[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(n_render_dispatches):
        out = render_views_eff(ro, vd, jax.random.fold_in(key, i))
    sync(out[0, 0, 0])
    eff_time = time.perf_counter() - t0
    eff_rays_per_sec = (n_render_dispatches * rays_per_dispatch) / eff_time

    # ---- test-time code optimization (informational): the reference
    # optimize.py protocol's per-step cost on the codes-only fused
    # backward (one 128x128 target view = 16K rays, flagship 96 samples).

    from codenerf_tpu.optimization.codes_opt import optimize_codes

    ro_flat = ro.reshape(-1, 3)[:16384]
    vd_flat = vd.reshape(-1, 3)[:16384]
    gt_flat = jnp.zeros((16384, 3), jnp.float32)
    init_code = jnp.zeros((hp.net.latent_dim,), jnp.float32)
    n_opts = 20

    def run_codes_opt():
        res = optimize_codes(params, hp, ro_flat, vd_flat, gt_flat,
                             init_code, init_code, jax.random.PRNGKey(0),
                             num_opts=n_opts, use_fused=True)
        sync(res.shape_code)

    for _ in range(8):  # compile + steady-state warmup (first ~10 runs of
        run_codes_opt()  # a fresh executable are ~7x slow on this runtime)
    t0 = time.perf_counter()
    for _ in range(2):
        run_codes_opt()
    codesopt_rays_per_sec = (2 * n_opts * 16384) / (time.perf_counter() - t0)

    # ---- hierarchical coarse+fine (BASELINE config #2:
    # srncar_hierarchical.json — 64 coarse + 64 fine, shared weights).
    # Train runs a sigma-only coarse FORWARD (~0.6F) to drive sample_pdf,
    # then ONE single-pass loss-kernel call at the union count whose
    # row-stacked dual composite computes BOTH losses from its one MLP
    # evaluation (fine over the union, coarse over the cmask/cdelta
    # subset); one shared prologue VJP chains the summed cotangents.
    # Eval renders coarse+fine through the XLA path, which evaluates the
    # MLP only at the 64 NEW fine samples and merge-sorts the cached
    # coarse outputs into the union (renderer.render_rays).
    rcfg_h = dataclasses.replace(hp.render, n_samples=64, n_importance=64)
    hp_h = dataclasses.replace(hp, render=rcfg_h, use_fused_train=True)
    state_h = create_train_state(jax.random.PRNGKey(0), hp_h,
                                 pipe.n_objects, tx)
    step_h = jax.jit(build_train_step(hp_h, pipe.H, pipe.W, tx,
                                      batch_size=batch),
                     donate_argnums=0)
    state_h, m = step_h(state_h, batches[0])
    sync(m["loss"])
    for i in range(12):
        state_h, m = step_h(state_h, batches[i % len(batches)])
    sync(m["loss"])
    t0 = time.perf_counter()
    n_hier_steps = max(10, n_train_steps // 2)
    for i in range(n_hier_steps):
        state_h, m = step_h(state_h, batches[i % len(batches)])
    sync(m["loss"])
    hier_train_rays_per_sec = (n_hier_steps * batch) / (
        time.perf_counter() - t0)
    del state_h

    @jax.jit
    def render_views_hier(ro, vd, key):
        def chunk(xs):
            ro_c, vd_c, k = xs
            res = render_rays(params, hp.net, rcfg_h, ro_c, vd_c,
                              shape_code, texture_code, k,
                              compute_dtype=jnp.bfloat16)
            return res.final.rgb

        keys = jax.random.split(key, ro.shape[0])
        return jax.lax.map(chunk, (ro, vd, keys))

    out = render_views_hier(ro, vd, key)
    sync(out[0, 0, 0])
    for i in range(3):
        out = render_views_hier(ro, vd, jax.random.fold_in(key, 3000 + i))
    sync(out[0, 0, 0])
    t0 = time.perf_counter()
    n_hier_disp = max(2, n_render_dispatches // 2)
    for i in range(n_hier_disp):
        out = render_views_hier(ro, vd, jax.random.fold_in(key, i))
    sync(out[0, 0, 0])
    hier_render_rays_per_sec = (n_hier_disp * rays_per_dispatch) / (
        time.perf_counter() - t0)

    # ---- hierarchical production recipe (srncar_hier_occ.json): 32 coarse
    # + 32 importance INSIDE the occupancy-tightened window, fused
    # dual-composite path. The grid concentrates the coarse budget where
    # density lives, sample_pdf concentrates the fine budget inside that —
    # measured 525K rays/s vs 298K for plain hier 64+64 at equal total
    # samples. Grid is a step INPUT (half-box occupancy stands in for a
    # trained grid; occupancy only changes z generation, not kernel cost).
    from codenerf_tpu.core.occupancy import OccupancyGrid

    rcfg_ho = dataclasses.replace(hp.render, n_samples=32, n_importance=32,
                                  bound_sphere_radius=1.4, occ_probes=32)
    hp_ho = dataclasses.replace(
        hp, render=rcfg_ho, use_fused_train=True,
        train_occupancy=TrainOccupancyConfig(grid_size=64))
    occ_np = np.zeros((64, 64, 64), bool)
    occ_np[:, :, :32] = True
    grid_ho = OccupancyGrid(occ=jnp.asarray(occ_np),
                            radius=jnp.asarray(1.4, jnp.float32))
    state_ho = create_train_state(jax.random.PRNGKey(0), hp_ho,
                                  pipe.n_objects, tx)
    step_ho = jax.jit(build_train_step(hp_ho, pipe.H, pipe.W, tx,
                                       batch_size=batch),
                      donate_argnums=0)
    state_ho, m = step_ho(state_ho, batches[0], grid_ho)
    sync(m["loss"])
    for i in range(12):
        state_ho, m = step_ho(state_ho, batches[i % len(batches)], grid_ho)
    sync(m["loss"])
    t0 = time.perf_counter()
    for i in range(n_hier_steps):
        state_ho, m = step_ho(state_ho, batches[i % len(batches)], grid_ho)
    sync(m["loss"])
    hier_occ_train_rays_per_sec = (n_hier_steps * batch) / (
        time.perf_counter() - t0)
    del state_ho

    combined = (train_rays + render_rays_total) / (train_time + render_time)
    # Production-config combined (informational): same train+render
    # arithmetic as the headline, but on the config a production user
    # would run — sustained Trainer at srncar_occ32.json semantics +
    # bounded-32 rendering, both measured above and both at
    # statistically-equal quality to the flagship 96-sample config
    # (3-seed matrix + 30K-step soak, docs/QUALITY_SYNTHETIC.md). Equal
    # ray counts per phase -> the combined rate is the harmonic mean.
    production_combined = 2.0 / (1.0 / train_sustained32_rays_per_sec
                                 + 1.0 / eff_rays_per_sec)
    return {
        "rays_per_sec_production_combined": production_combined,
        "rays_per_sec_combined": combined,
        "rays_per_sec_train": train_rays / train_time,
        "rays_per_sec_train_xla": train_xla_rays_per_sec,
        "rays_per_sec_render": render_rays_total / render_time,
        "rays_per_sec_render_bounded32": eff_rays_per_sec,
        "rays_per_sec_train_bounded48": train_bounded_rays_per_sec,
        "rays_per_sec_train_sustained": train_sustained_rays_per_sec,
        "rays_per_sec_train_sustained_occ32": train_sustained32_rays_per_sec,
        "rays_per_sec_codes_opt": codesopt_rays_per_sec,
        "rays_per_sec_train_hier": hier_train_rays_per_sec,
        "rays_per_sec_train_hier_occ": hier_occ_train_rays_per_sec,
        "rays_per_sec_render_hier": hier_render_rays_per_sec,
        "n_devices": len(jax.devices()),
    }


def main() -> None:
    import os
    import sys

    from codenerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    try:
        r = _bench()
    except Exception as e:  # noqa: BLE001 — transient-backend guard
        # The tunneled runtime occasionally throws transient errors
        # ("TPU backend error (Internal)", remote_compile HTTP 500) that
        # poison the in-process backend client. Retry ONCE in a fresh
        # process (exec keeps stdout, so the driver still sees exactly
        # one JSON line on success).
        if os.environ.get("CODENERF_BENCH_RETRY") == "1":
            raise
        print(f"bench attempt 1 failed ({e!r}); retrying in a fresh "
              "process", file=sys.stderr, flush=True)
        os.environ["CODENERF_BENCH_RETRY"] = "1"
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])
    print(json.dumps({
        "metric": "rays/sec/chip (train + render)",
        "value": round(r["rays_per_sec_combined"], 1),
        "unit": "rays/s",
        "vs_baseline": round(r["rays_per_sec_combined"] / 250_000.0, 4),
        "detail": {
            "train_rays_per_sec": round(r["rays_per_sec_train"], 1),
            "train_xla_rays_per_sec": round(r["rays_per_sec_train_xla"], 1),
            "render_rays_per_sec": round(r["rays_per_sec_render"], 1),
            "render_bounded32_rays_per_sec": round(
                r["rays_per_sec_render_bounded32"], 1),
            "train_bounded48_rays_per_sec": round(
                r["rays_per_sec_train_bounded48"], 1),
            "train_sustained_rays_per_sec": round(
                r["rays_per_sec_train_sustained"], 1),
            "train_sustained_occ32_rays_per_sec": round(
                r["rays_per_sec_train_sustained_occ32"], 1),
            "production_combined_rays_per_sec": round(
                r["rays_per_sec_production_combined"], 1),
            "codes_opt_rays_per_sec": round(
                r["rays_per_sec_codes_opt"], 1),
            "hier_train_rays_per_sec": round(
                r["rays_per_sec_train_hier"], 1),
            "hier_occ_train_rays_per_sec": round(
                r["rays_per_sec_train_hier_occ"], 1),
            "hier_render_rays_per_sec": round(
                r["rays_per_sec_render_hier"], 1),
            "n_devices": r["n_devices"],
        },
    }))


if __name__ == "__main__":
    main()
