#!/usr/bin/env python
"""End-to-end quality report on synthetic data.

Runs the FULL reference workflow (SURVEY §6 measurement protocol, adapted
to synthetic scenes since ShapeNet-SRN is not available on this machine):

  1. train a category model on N synthetic objects,
  2. for each HELD-OUT object: init codes at the training mean, optimize
     them on one view (the optimize.py protocol), evaluate PSNR/SSIM on all
     remaining views,
  3. write RESULTS.md with the numbers plus side-by-side renders.

``--seeds a,b,c`` repeats the whole pipeline per seed (seed varies BOTH the
synthetic category draw and the training RNG) and writes a SUMMARY.md with
mean ± std across seeds — single-seed numbers on 3-4 held-out objects carry
~2 dB of protocol noise (per-object spread is larger still), so quality
claims should quote the seed statistics.

The 16-train-object protocol (the default here since round 3) is the
standard: category-size scaling measurements (docs/QUALITY_SYNTHETIC.md)
show 8-object categories overfit their latent space and understate held-out
quality by ~4 dB vs 16 objects; real SRN-cars has 2,458.

Usage: python tools/quality_report.py [--steps 10000] [--seeds 0,1,2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_once(args, seed: int, out_dir: str) -> dict:
    import jax

    from codenerf_tpu.config import (
        Hparams,
        LrSchedule,
        NetConfig,
        RenderConfig,
        TrainOccupancyConfig,
    )
    from codenerf_tpu.data.synthetic import (
        synthetic_scene,
        synthetic_scene_cached,
    )
    from codenerf_tpu.models.codes import mean_code
    from codenerf_tpu.optimization.codes_opt import CodeOptimizer
    from codenerf_tpu.training.trainer import Trainer
    from codenerf_tpu.utils.images import save_png, side_by_side

    os.makedirs(out_dir, exist_ok=True)
    _synthetic_scene_raw = synthetic_scene
    if args.scene_cache:
        def synthetic_scene(**kw):  # noqa: F811 — cached drop-in
            # The default backend stays OUT of the cache key so entries
            # written before the backend option existed keep resolving.
            if kw.get("backend") == "numpy":
                kw.pop("backend")
            return synthetic_scene_cached(args.scene_cache, **kw)
    if args.n_test_views is None:
        # Standard protocol (rounds 2-3): one category draw, sliced into
        # train/held-out — kept bitwise reproducible.
        n_total = args.n_train_objects + args.n_test_objects
        scene = synthetic_scene(n_objects=n_total, n_views=args.n_views,
                                H=args.size, W=args.size,
                                seed=11 + 100 * seed, pattern=True,
                                geometry=args.geometry,
                                cam_distance=args.cam_distance,
                                backend=args.scene_backend)
        train_scene = {
            "images": scene["images"][: args.n_train_objects],
            "poses": scene["poses"][: args.n_train_objects],
            "focals": scene["focals"][: args.n_train_objects],
            "H": scene["H"], "W": scene["W"],
        }
        test_scene = scene
        test_base = args.n_train_objects
    else:
        # Real-SRN-geometry protocol: train and test splits carry DIFFERENT
        # view counts (ShapeNet-SRN: 50 train / 250 test views,
        # src/data.py:72 and src/optimizer.py:110), so they are separate
        # category draws — same statistics, disjoint objects/orbits.
        t0g = time.time()
        scene = synthetic_scene(
            n_objects=args.n_train_objects, n_views=args.n_views,
            H=args.size, W=args.size, seed=11 + 100 * seed, pattern=True,
            geometry=args.geometry, cam_distance=args.cam_distance,
            backend=args.scene_backend)
        train_scene = scene
        test_scene = synthetic_scene(
            n_objects=args.n_test_objects, n_views=args.n_test_views,
            H=args.size, W=args.size, seed=11 + 100 * seed + 57,
            pattern=True, geometry=args.geometry,
            cam_distance=args.cam_distance, backend=args.scene_backend)
        test_base = 0
        print(f"[seed {seed}] scene gen: {args.n_train_objects}x"
              f"{args.n_views} train + {args.n_test_objects}x"
              f"{args.n_test_views} test views at {args.size}px in "
              f"{time.time() - t0g:.0f}s "
              f"({(scene['images'].nbytes + test_scene['images'].nbytes) / 2**30:.1f}"
              " GiB host arrays)", flush=True)

    hp = Hparams(
        net=NetConfig(shape_blocks=3, texture_blocks=1, W=256,
                      num_xyz_freq=10, num_dir_freq=4, latent_dim=256),
        render=RenderConfig(n_samples=args.samples, near=scene["near"],
                            far=scene["far"],
                            n_importance=args.n_importance,
                            bound_sphere_radius=args.bound_radius),
        lr_model=LrSchedule(5e-4, 1_000_000),
        lr_codes=LrSchedule(5e-3, 1_000_000),
        check_points=0,
        seed=seed,
        use_fused_train=args.use_fused,
        train_occupancy=TrainOccupancyConfig(
            codes_per_update=args.codes_per_update) if args.occ else None,
    )
    t0 = time.time()
    trainer = Trainer(f"quality_s{seed}", hp, batch_size=8192,
                      dataset=train_scene, exps_root=out_dir, check_iter=0)
    if args.resume_train and trainer.resume():
        print(f"[seed {seed}] resumed training checkpoint at step "
              f"{int(trainer.state.step)}", flush=True)
    m = trainer.training(iters_crop=args.steps // 6, iters_all=args.steps,
                         log_every=max(100, args.steps // 10))
    train_time = time.time() - t0
    print(f"[seed {seed}] train: {args.steps} steps in {train_time:.0f}s, "
          f"final train psnr {m.get('psnr', float('nan')):.2f} dB",
          flush=True)

    tr = trainer.state.trainables
    if args.occ and trainer.occupancy_grid is not None:
        # Staleness diagnostic: a decayed grid drops rarely-refreshed
        # objects' cells; the occupied fraction (and the refresh width k)
        # make that visible next to the quality numbers.
        frac = float(np.asarray(trainer.occupancy_grid.occ).mean())
        print(f"[seed {seed}] occupancy grid: {frac:.3f} occupied "
              f"(k={trainer._occ_k}/{args.n_train_objects} per update)",
              flush=True)
    import dataclasses

    opt_hp = hp
    if args.opt_samples:
        opt_hp = dataclasses.replace(
            hp, render=dataclasses.replace(hp.render,
                                           n_samples=args.opt_samples))
    occ = trainer.occupancy_grid if args.opt_occ else None
    mk = dict(params=tr["params"],
              mean_shape=mean_code(tr["shape_codes"]),
              mean_texture=mean_code(tr["texture_codes"]),
              chunk=4096)
    # Held-out metrics stay comparable across rows: evaluation always
    # renders the full sample budget without the grid, whatever the
    # optimization loop used (eval_hp/eval_occ -> one optimizer, one
    # eval compile per config).
    optimizer = CodeOptimizer(hp=opt_hp, occ_grid=occ,
                              opt_rays=args.opt_rays,
                              eval_hp=hp, eval_occ=False, **mk)
    evaluator = optimizer

    rows = []
    t_test0 = time.time()
    key = jax.random.PRNGKey(seed)
    group = max(1, args.opt_group)
    # Conditioning views (the reference's --tgt_instances takes a list,
    # optimize.py:16 / src/optimizer.py:73); eval excludes all of them.
    tgt = [int(v) for v in str(args.tgt_views).split(",")]
    gt_leaves = None
    if args.device_gt:
        # Eval GT renders ON DEVICE from the generation parameters —
        # re-drawn here (params_only skips rendering, milliseconds) with
        # the test scene's exact kwargs, so they describe its images
        # bit-for-bit. Kills the (G, V', H, W, 3) uint8 GT H2D that is
        # ~half the eval wall at 250 views x 128px on the tunneled chip.
        if group == 1:
            raise SystemExit("--device_gt requires --opt_group > 1 "
                             "(the batched eval sweep)")
        tp = _synthetic_scene_raw(
            n_objects=test_scene["images"].shape[0],
            n_views=test_scene["images"].shape[1],
            H=args.size, W=args.size,
            seed=(11 + 100 * seed) if args.n_test_views is None
            else (11 + 100 * seed + 57),
            pattern=True, geometry=args.geometry,
            cam_distance=args.cam_distance, params_only=True)
        assert np.array_equal(tp["poses"], test_scene["poses"]), \
            "params-only draw diverged from the test scene"
        if args.geometry == "chair":
            gt_leaves = dict(albedo=tp["albedos"], boxes=tp["boxes"],
                             yaw=tp["yaws"])
        else:
            gt_leaves = dict(albedo=tp["albedos"], radius=tp["radii"])
    if group == 1:
        for i in range(args.n_test_objects):
            oi = test_base + i
            # uint8 through the whole path: the optimizer/evaluator convert
            # device-side (bitwise-identical, 1/4 the tunnel H2D bytes — at
            # 250 test views x 128px the f32 GT transfer dominated eval).
            imgs = test_scene["images"][oi]
            poses = test_scene["poses"][oi]
            focal = float(test_scene["focals"][oi])
            key, k_opt, k_eval = jax.random.split(key, 3)
            res = optimizer.optimize_object(
                imgs, poses, focal, tgt_views=tgt, key=k_opt,
                num_opts=args.num_opts, lr=1e-2, lr_half_interval=50,
            )
            want_img = i < args.save_images
            ev = evaluator.evaluate_object(
                imgs, poses, focal, exclude_views=tgt,
                shape_code=res.shape_code, texture_code=res.texture_code,
                key=k_eval, return_images=want_img,
            )
            rows.append((f"heldout_{i}", float(ev["psnr"].mean()),
                         float(ev["ssim"].mean()),
                         float(res.psnr_history[0]),
                         float(res.psnr_history[-1])))
            if want_img:
                strip = side_by_side(
                    ev["images"][:3],
                    imgs[ev["views"][:3]].astype(np.float32) / 255.0)
                save_png(os.path.join(out_dir, f"heldout_{i}.png"), strip)
            print(f"[seed {seed}] object {i}: eval psnr {rows[-1][1]:.2f} "
                  f"dB, ssim {rows[-1][2]:.4f}", flush=True)
    else:
        # Batched path: G objects per dispatch (one jitted optimization
        # scan + one jitted eval sweep per group); per-object keys follow
        # the same split pattern as the sequential loop, so results are
        # object-for-object comparable across --opt_group settings.
        for start in range(0, args.n_test_objects, group):
            idx = list(range(start, min(start + group,
                                        args.n_test_objects)))
            ois = [test_base + i for i in idx]
            imgs_g = test_scene["images"][ois]   # uint8: converted on device
            poses_g = test_scene["poses"][ois]
            focals_g = test_scene["focals"][ois]
            k_opts, k_evals = [], []
            for _ in idx:
                key, k_opt, k_eval = jax.random.split(key, 3)
                k_opts.append(k_opt)
                k_evals.append(k_eval)
            res = optimizer.optimize_objects(
                imgs_g, poses_g, focals_g, tgt_views=tgt,
                keys=jax.numpy.stack(k_opts),
                num_opts=args.num_opts, lr=1e-2, lr_half_interval=50,
            )
            want_img = idx[0] < args.save_images
            gt_params = None
            if gt_leaves is not None:
                gt_params = dict(geometry=args.geometry, pattern=True,
                                 hw=(args.size, args.size),
                                 **{k: v[ois] for k, v in gt_leaves.items()})
            ev = evaluator.evaluate_objects(
                None if gt_params is not None else imgs_g,
                poses_g, focals_g, exclude_views=tgt,
                shape_codes=res.shape_codes,
                texture_codes=res.texture_codes,
                keys=jax.numpy.stack(k_evals), return_images=want_img,
                gt_params=gt_params,
            )
            for j, i in enumerate(idx):
                rows.append((f"heldout_{i}", float(ev["psnr"][j].mean()),
                             float(ev["ssim"][j].mean()),
                             float(res.psnr_history[0, j]),
                             float(res.psnr_history[-1, j])))
                if i < args.save_images and want_img:
                    strip = side_by_side(
                        ev["images"][j][:3],
                        imgs_g[j][ev["views"][:3]].astype(np.float32) / 255.0)
                    save_png(os.path.join(out_dir, f"heldout_{i}.png"),
                             strip)
            done = rows[-len(idx):]
            print(f"[seed {seed}] objects {idx[0]}..{idx[-1]}: eval psnr "
                  f"{np.mean([r[1] for r in done]):.2f} dB, ssim "
                  f"{np.mean([r[2] for r in done]):.4f}", flush=True)

    test_time = time.time() - t_test0
    mean_psnr = float(np.mean([r[1] for r in rows]))
    mean_ssim = float(np.mean([r[2] for r in rows]))
    with open(os.path.join(out_dir, "RESULTS.md"), "w") as f:
        f.write(
            "# Quality report (synthetic, reference eval protocol)\n\n"
            f"- config: W={hp.net.W}, {hp.net.shape_blocks}+"
            f"{hp.net.texture_blocks} blocks, {args.samples} samples/ray, "
            f"{args.size}x{args.size} images, {args.n_train_objects} train / "
            f"{args.n_test_objects} held-out objects, {args.n_views} views"
            + (f" train / {args.n_test_views} views test"
               if args.n_test_views is not None else "")
            + f", seed {seed}\n"
            f"- geometry: {args.geometry}\n"
            f"- kernels/sampling: use_fused={args.use_fused}, "
            f"bound_radius={args.bound_radius}, occupancy={args.occ}, "
            f"n_importance={args.n_importance}, opt_occ={args.opt_occ}, "
            f"opt_samples={args.opt_samples or args.samples}, "
            f"opt_rays={args.opt_rays or 'full-view'}\n"
            f"- training: {args.steps} steps (crop->full), "
            f"{train_time:.0f}s wall; final train PSNR "
            f"{m.get('psnr', float('nan')):.2f} dB\n"
            f"- test-time optimization: mean-code init, {args.num_opts} "
            f"AdamW steps on view(s) {tgt}, lr 1e-2 halved/50 "
            "(src/optimizer.py:48-135 protocol); "
            f"{args.n_test_objects} objects optimized+evaluated in "
            f"{test_time:.0f}s wall "
            f"({test_time / max(1, args.n_test_objects):.2f}s/object "
            "incl. compile)\n\n"
            "| object | eval PSNR (dB) | eval SSIM | opt start -> end (dB) |\n"
            "|---|---|---|---|\n"
        )
        for name, p, s, h0, h1 in rows:
            f.write(f"| {name} | {p:.2f} | {s:.4f} | {h0:.1f} -> {h1:.1f} |\n")
        f.write(f"| **mean** | **{mean_psnr:.2f}** | **{mean_ssim:.4f}** | |\n")
    print(f"[seed {seed}] mean held-out PSNR {mean_psnr:.2f} dB, "
          f"SSIM {mean_ssim:.4f}", flush=True)
    return {"seed": seed, "psnr": mean_psnr, "ssim": mean_ssim,
            "train_psnr": float(m.get("psnr", float("nan"))),
            "train_s": train_time,
            "test_s": test_time,
            "per_object_psnr": [r[1] for r in rows]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--num_opts", type=int, default=200)
    ap.add_argument("--n_train_objects", type=int, default=16)
    ap.add_argument("--n_test_objects", type=int, default=4)
    ap.add_argument("--n_views", type=int, default=24)
    ap.add_argument("--n_test_views", type=int, default=None,
                    help="views per TEST object (default: same as "
                         "--n_views, single category draw — the rounds-2/3 "
                         "protocol). Set 250 with --n_views 50 for the real "
                         "ShapeNet-SRN view counts (src/data.py:72, "
                         "src/optimizer.py:110); test objects then come "
                         "from a separate same-statistics draw.")
    ap.add_argument("--cam_distance", type=float, default=4.0,
                    help="camera orbit radius of the synthetic scenes")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--n_importance", type=int, default=0,
                    help="hierarchical fine samples (BASELINE config #2: "
                         "coarse+fine importance sampling)")
    ap.add_argument("--out", type=str, default="/tmp/codenerf_quality")
    ap.add_argument("--seeds", type=str, default="0",
                    help="comma-separated seeds; each reruns the whole "
                         "pipeline (category draw + training RNG)")
    ap.add_argument("--use_fused", action="store_true",
                    help="single-pass fused training kernels + codes-only "
                         "fused test-time optimization")
    ap.add_argument("--bound_radius", type=float, default=None,
                    help="per-ray bounding-sphere sampling (synthetic "
                         "objects fit in 1.4)")
    ap.add_argument("--occ", action="store_true",
                    help="training-time occupancy-grid sampling "
                         "(requires --bound_radius)")
    ap.add_argument("--opt_occ", action="store_true",
                    help="reuse the trained category occupancy grid for "
                         "test-time code optimization (empty-space "
                         "skipping at opt time; requires --occ). Held-out "
                         "eval still renders without the grid.")
    ap.add_argument("--opt_samples", type=int, default=None,
                    help="sample budget for the optimization loop only "
                         "(eval keeps --samples); with --opt_occ the grid "
                         "concentrates a smaller budget on the object")
    ap.add_argument("--opt_rays", type=int, default=None,
                    help="stochastic code optimization: rays drawn per opt "
                         "step instead of rendering the full target view "
                         "every step (None = the exact reference protocol); "
                         "4096 measured quality-neutral at the 704-object "
                         "full-scale protocol (paired -0.02 +/- 0.10 dB) at "
                         "1.75x faster test splits; eval is unaffected")
    ap.add_argument("--geometry", type=str, default="sphere",
                    choices=["sphere", "chair"],
                    help="synthetic category: shaded spheres (cars-like "
                         "blob) or compound box chairs (thin legs + slabs "
                         "— the srnchair-style stress case)")
    ap.add_argument("--resume_train", action="store_true",
                    help="resume the training checkpoint under --out if "
                    "one exists (skips straight to the test split when it "
                    "is already at --steps) — lets several test-split "
                    "variants (--tgt_views, --opt_rays) share one trained "
                    "model")
    ap.add_argument("--tgt_views", type=str, default="1",
                    help="comma list of conditioning view indices for "
                    "test-time optimization (the reference's "
                    "--tgt_instances, optimize.py:16); eval excludes all "
                    "of them — e.g. '1,120' probes multi-view "
                    "conditioning")
    ap.add_argument("--opt_group", type=int, default=1,
                    help="test objects optimized+evaluated per dispatch "
                         "(batched multi-object code-opt; 1 = sequential "
                         "per-object path). Results are object-for-object "
                         "comparable across settings.")
    ap.add_argument("--save_images", type=int, default=8,
                    help="write side-by-side PNGs for the first N test "
                         "objects only (at 704 objects the per-object "
                         "image D2H + PNG encode dominates)")
    ap.add_argument("--scene_cache", type=str, default=None,
                    help="directory caching generated synthetic scenes "
                         "(full-scale splits cost 6-45 min of the single "
                         "host core to regenerate; cached images load back "
                         "memory-mapped)")
    ap.add_argument("--device_gt", action="store_true",
                    help="render eval ground truth ON DEVICE from the "
                         "synthetic generation params instead of shipping "
                         "uint8 GT pixels over the tunnel (~200 MB/group "
                         "at 250 views x 128px — about half the eval "
                         "wall); metrics match within last-ulp float "
                         "noise. Requires --opt_group > 1")
    ap.add_argument("--scene_backend", type=str, default="numpy",
                    choices=("numpy", "jax"),
                    help="synthetic render backend: 'jax' batches every "
                         "(object, view) pair on the default device "
                         "(TPU: 7.7 ms/view at 128px chair vs 29 numpy "
                         "— full-scale splits in minutes, not hours)")
    ap.add_argument("--codes_per_update", type=int, default=None,
                    help="objects refreshed per occupancy update "
                         "(default: auto — scales with the category so "
                         "decay^(n/k) never erases unrefreshed cells)")
    args = ap.parse_args()

    from codenerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(args.out, exist_ok=True)
    seeds = [int(s) for s in args.seeds.split(",") if s != ""]
    results = []
    for seed in seeds:
        results.append(run_once(args, seed,
                                os.path.join(args.out, f"seed{seed}")
                                if len(seeds) > 1 else args.out))

    if len(seeds) > 1:
        ps = np.array([r["psnr"] for r in results])
        ss = np.array([r["ssim"] for r in results])
        with open(os.path.join(args.out, "SUMMARY.md"), "w") as f:
            f.write(
                "# Multi-seed quality summary\n\n"
                f"- config: {args.samples} samples"
                + (f" + {args.n_importance} importance"
                   if args.n_importance else "") + ", "
                f"use_fused={args.use_fused}, "
                f"bound_radius={args.bound_radius}, occ={args.occ}, "
                f"{args.n_train_objects} train / {args.n_test_objects} "
                f"held-out objects, {args.n_views} views, {args.steps} "
                f"steps, seeds {seeds}\n\n"
                "| seed | held-out PSNR | held-out SSIM | train PSNR | train s |\n"
                "|---|---|---|---|---|\n")
            for r in results:
                f.write(f"| {r['seed']} | {r['psnr']:.2f} | {r['ssim']:.4f} "
                        f"| {r['train_psnr']:.2f} | {r['train_s']:.0f} |\n")
            f.write(
                f"| **mean ± std** | **{ps.mean():.2f} ± {ps.std(ddof=1):.2f}**"
                f" | **{ss.mean():.4f} ± {ss.std(ddof=1):.4f}** | | |\n")
        print(f"\nSUMMARY: psnr {ps.mean():.2f} ± {ps.std(ddof=1):.2f} dB, "
              f"ssim {ss.mean():.4f} ± {ss.std(ddof=1):.4f}")
        print(f"wrote {args.out}/SUMMARY.md")
    import json

    print(json.dumps({"psnr_by_seed": [r["psnr"] for r in results]}))


if __name__ == "__main__":
    main()
