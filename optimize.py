#!/usr/bin/env python
"""Test-time latent-code optimization + evaluation CLI.

Flag surface mirrors the reference ``optimize.py:13-23``. Protocol
(``src/optimizer.py:48-135``): per test object, initialize codes at the
mean of the trained embeddings, run ``--num_opts`` AdamW steps on the codes
only against the ``--tgt_instances`` views (lr halved every
``--lr_half_interval``), then report PSNR/SSIM over all remaining views.

Outputs under ``<exps_root>/<saved_dir>/test[_N]/`` (numbered like the
reference, ``src/optimizer.py:224-232``):
  codes.npz        optimized codes + per-view PSNR/SSIM per object
  codes.pth        the same payload in the reference's torch format
                   (``src/optimizer.py:137-147``) for downstream interop
  results.json     summary metrics
  <obj_id>/*.png   optional side-by-side renders (--save_img)

``--pose_opt`` dispatches to the joint pose+code optimization entry point
(tools/pose_opt.py) with the remaining flags.
"""

import argparse
import json
import os

import numpy as np

from codenerf_tpu.config import load_hparams
from codenerf_tpu.utils.images import str2bool


def _unique_test_dir(base: str) -> str:
    # test, test_2, test_3, ... (reference numbering, optimizer.py:224-232)
    path, num = base, 2
    while os.path.isdir(path):
        path = f"{base}_{num}"
        num += 1
    os.makedirs(path)
    return path


def main() -> None:
    import sys

    if "--pose_opt" in sys.argv:
        # Dispatch to the joint pose+code optimization entry point with the
        # remaining flags (tools/pose_opt.py owns that protocol's surface:
        # --tgt_instance, --perturb_rot/--perturb_trans, --rays_per_step...).
        import runpy

        sys.argv = [a for a in sys.argv if a != "--pose_opt"]
        runpy.run_path(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "pose_opt.py"),
            run_name="__main__")
        return

    parser = argparse.ArgumentParser(description="Optimize CodeNeRF codes")
    parser.add_argument("--pose_opt", action="store_true",
                        help="run joint camera-pose + code optimization "
                             "instead (delegates every other flag to "
                             "tools/pose_opt.py — see its --help)")
    parser.add_argument("--gpu", type=int, default=0,
                        help="ignored (reference compatibility)")
    parser.add_argument("--saved_dir", type=str, default="default")
    parser.add_argument("--tgt_instances", type=int, nargs="+", default=[1])
    parser.add_argument("--splits", type=str, default="test")
    parser.add_argument("--num_opts", type=int, default=200)
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--lr_half_interval", type=int, default=50)
    parser.add_argument("--save_img", type=str2bool, default=True)
    parser.add_argument("--save_progress", type=str2bool, default=True,
                        help="write a side-by-side PNG of the first target "
                             "view at EVERY optimization step (the "
                             "reference writes these unconditionally — its "
                             "save_img flag is dead, src/optimizer.py:101)")
    parser.add_argument("--jsonfile", type=str, default="srncar.json")
    parser.add_argument("--batchsize", type=int, default=4096)
    parser.add_argument("--exps_root", type=str, default="exps")
    parser.add_argument("--max_objects", type=int, default=None)
    parser.add_argument("--opt_group", type=int, default=1,
                        help="test objects optimized+evaluated per "
                             "dispatch (batched multi-object code-opt; "
                             "per-object results are identical to the "
                             "sequential path). Disables per-step "
                             "progress PNGs.")
    parser.add_argument("--deterministic_eval", type=str2bool, default=False,
                        help="midpoint z-values at eval (the reference "
                             "always evaluates with jittered sampling)")
    parser.add_argument("--opt_rays", type=int, default=None,
                        help="stochastic code optimization: rays drawn per "
                             "opt step instead of rendering the full target "
                             "view(s) every step (None = the exact reference "
                             "protocol). 4096 measured quality-neutral at "
                             "full 704-object scale (paired delta -0.02 dB, "
                             "docs/QUALITY_SYNTHETIC.md) at 1.75x faster "
                             "test splits — the production recipe. Disables "
                             "per-step progress PNGs; eval is unaffected.")
    parser.add_argument("--opt_occ", type=str2bool, default=False,
                        help="rebuild the trained category occupancy grid "
                             "from the checkpoint (one jitted scan over all "
                             "code rows) and use it for empty-space skipping "
                             "during code optimization. Requires a jsonfile "
                             "with train_occupancy (e.g. srncar_occ32.json). "
                             "Eval renders WITHOUT the grid so metrics stay "
                             "comparable across settings.")
    parser.add_argument("--opt_samples", type=int, default=None,
                        help="sample budget for the optimization loop only "
                             "(eval keeps the jsonfile's N_samples); with "
                             "--opt_occ the grid concentrates the smaller "
                             "budget inside occupied space")
    parser.add_argument("--data_axis", type=int, default=-1)
    parser.add_argument("--replica_axis", type=int, default=1,
                        help="with >1 devices, --opt_group objects shard "
                             "over a (replica, data) mesh: each chip "
                             "optimizes+evaluates its share of the group "
                             "with identical per-object results")
    args = parser.parse_args()

    if args.gpu != 0:
        print(
            f"WARNING: --gpu={args.gpu} is ignored: device selection is "
            "JAX's (set JAX_PLATFORMS)",
            file=sys.stderr,
        )

    import jax

    if os.environ.get("CODENERF_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CODENERF_PLATFORM"])

    from codenerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from codenerf_tpu.data.srn import SRNDataset
    from codenerf_tpu.models.codes import mean_code
    from codenerf_tpu.optimization.codes_opt import CodeOptimizer
    from codenerf_tpu.utils.checkpoint import (restore_raw,
                                               save_reference_codes)
    from codenerf_tpu.utils.images import save_png, side_by_side

    hp = load_hparams(args.jsonfile)
    run_dir = os.path.join(args.exps_root, args.saved_dir)
    raw = restore_raw(os.path.join(run_dir, "ckpt"))
    trainables = raw["trainables"]
    save_dir = _unique_test_dir(os.path.join(run_dir, "test"))
    print("we are going to save at", save_dir)

    # <cat prefix>_<splits> like the reference (optimizer.py:235-238)
    obj = hp.data.cat.split("_")[1]
    splits = f"{obj}_{args.splits}"
    ds = SRNDataset(cat=hp.data.cat, splits=splits, data_dir=hp.data.data_dir,
                    max_objects=args.max_objects)

    mesh = None
    if len(jax.devices()) > 1 or args.replica_axis > 1:
        from codenerf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.data_axis, model=1,
                         replica=args.replica_axis)
        if args.opt_group == 1:
            print("WARNING: multiple devices but --opt_group=1: the mesh "
                  "shards the object-group axis — raise --opt_group to use "
                  "all chips", file=sys.stderr)

    occ = None
    if args.opt_occ:
        # The density field is a pure function of the trainables and is
        # deliberately not checkpointed — reconstruct the production
        # category grid with the same one-dispatch scan the trainer's
        # post-warmup resume uses.
        if hp.train_occupancy is None:
            raise SystemExit(
                "--opt_occ needs a jsonfile with train_occupancy "
                "(e.g. srncar_occ32.json); "
                f"{args.jsonfile} has none")
        from codenerf_tpu.config import resolve_dtype
        from codenerf_tpu.core.occupancy import rebuild_category_grid

        oc = hp.train_occupancy
        radius = (oc.radius if oc.radius is not None
                  else hp.render.bound_sphere_radius)
        occ = rebuild_category_grid(
            trainables, hp.net, oc, radius,
            compute_dtype=resolve_dtype(hp.compute_dtype))

    opt_hp = hp
    if args.opt_samples:
        import dataclasses

        opt_hp = dataclasses.replace(
            hp, render=dataclasses.replace(hp.render,
                                           n_samples=args.opt_samples))

    # Held-out metrics stay comparable whatever the optimization loop used:
    # evaluation always renders the jsonfile's full sample budget without
    # the grid (same policy as tools/quality_report.py) — eval_hp/eval_occ
    # make ONE optimizer serve both loops, one eval compile per config.
    optimizer = CodeOptimizer(
        params=trainables["params"],
        mean_shape=mean_code(jnp.asarray(trainables["shape_codes"])),
        mean_texture=mean_code(jnp.asarray(trainables["texture_codes"])),
        fine_params=trainables.get("fine_params"),
        chunk=args.batchsize,
        mesh=mesh,
        hp=opt_hp, occ_grid=occ, opt_rays=args.opt_rays,
        eval_hp=hp, eval_occ=False,
    )

    with open(os.path.join(save_dir, "opt_hpams.json"), "w") as f:
        json.dump({"instance_ids": args.tgt_instances, "lr": args.lr,
                   "lr_half_interval": args.lr_half_interval,
                   "splits": args.splits, "num_opts": args.num_opts}, f,
                  indent=2)

    from codenerf_tpu.utils.logging import MetricsLogger

    # Reference TB scalar names: psnr_opt/<nviews>/<splits> etc.
    # (src/optimizer.py:185-191).
    logger = MetricsLogger(save_dir, use_tensorboard=True)
    nviews = str(len(args.tgt_instances))

    latent_dim = optimizer.mean_shape.shape[-1]
    n = ds.n_objects
    out = {
        "ids": np.asarray(ds.ids),
        "optimized_shapecodes": np.zeros((n, latent_dim), np.float32),
        "optimized_texturecodes": np.zeros((n, latent_dim), np.float32),
    }
    psnr_eval, ssim_eval, summary = {}, {}, []
    key = jax.random.PRNGKey(hp.seed)
    group = max(1, args.opt_group)
    if group > 1 and args.save_progress:
        print("WARNING: --opt_group disables per-step progress PNGs "
              "(batched optimization collects no per-step renders)",
              file=sys.stderr)
    if args.opt_rays is not None and args.save_progress:
        print("WARNING: --opt_rays disables per-step progress PNGs "
              "(a ray minibatch is not a full view)", file=sys.stderr)
        args.save_progress = False

    def emit(oi, imgs, shape_code, texture_code, hist, ev_psnr, ev_ssim,
             ev_views, ev_images):
        """Per-object artifacts — identical for both loop shapes."""
        if imgs.dtype == np.uint8:
            imgs = imgs.astype(np.float32) / 255.0
        for t, p in enumerate(np.asarray(hist)):
            logger.scalars(t + args.num_opts * oi,
                           {f"psnr_opt/{nviews}/{args.splits}": float(p)})
        out["optimized_shapecodes"][oi] = np.asarray(shape_code)
        out["optimized_texturecodes"][oi] = np.asarray(texture_code)
        psnr_eval[ds.ids[oi]] = np.asarray(ev_psnr).tolist()
        ssim_eval[ds.ids[oi]] = np.asarray(ev_ssim).tolist()
        summary.append({"id": ds.ids[oi],
                        "psnr": float(np.mean(ev_psnr)),
                        "ssim": float(np.mean(ev_ssim))})
        print(f"  psnr {np.mean(ev_psnr):.3f}  ssim {np.mean(ev_ssim):.4f}")
        if args.save_img and ev_images is not None:
            obj_dir = os.path.join(save_dir, ds.ids[oi])
            os.makedirs(obj_dir, exist_ok=True)
            for j, v in enumerate(ev_views):
                save_png(
                    os.path.join(obj_dir,
                                 f"{v}_{len(args.tgt_instances)}.png"),
                    side_by_side(ev_images[j], imgs[v]),
                )

    def flush(num_obj):
        """Write the artifact files: codes.npz + results.json (native
        formats) and the reference's torch ``codes.pth`` payload
        (``src/optimizer.py:137-147``) so both of the reference's output
        artifacts round-trip. Called once per object on the sequential
        path (the reference saves per object too) and once per GROUP on
        the batched path (not per object — O(n) file writes, not O(n²))."""
        np.savez(os.path.join(save_dir, "codes.npz"), **out)
        with open(os.path.join(save_dir, "results.json"), "w") as f:
            json.dump({"per_object": summary,
                       "psnr_eval": psnr_eval, "ssim_eval": ssim_eval,
                       "mean_psnr": float(np.mean([s["psnr"]
                                                   for s in summary])),
                       "mean_ssim": float(np.mean([s["ssim"]
                                                   for s in summary]))},
                      f, indent=2)
        save_reference_codes(
            os.path.join(save_dir, "codes.pth"),
            ids=out["ids"], num_obj=num_obj,
            shape_codes=out["optimized_shapecodes"],
            texture_codes=out["optimized_texturecodes"],
            # the reference keys these dicts by object INDEX
            # (src/optimizer.py:168-182); ours are keyed by id string
            psnr_eval={i: psnr_eval[d] for i, d in enumerate(ds.ids)
                       if d in psnr_eval},
            ssim_eval={i: ssim_eval[d] for i, d in enumerate(ds.ids)
                       if d in ssim_eval},
        )

    if group == 1:
        for oi in range(n):
            print(f"num obj: {oi}/{n}")
            # uint8 end-to-end: optimizer/evaluator convert device-side
            # (bitwise-identical metrics, 1/4 the tunnel H2D bytes).
            imgs = ds.images[oi]
            poses, focal = ds.poses[oi], float(ds.focals[oi])
            key, k_opt, k_eval = jax.random.split(key, 3)
            res = optimizer.optimize_object(
                imgs, poses, focal, args.tgt_instances, k_opt,
                num_opts=args.num_opts, lr=args.lr,
                lr_half_interval=args.lr_half_interval,
                progress_images=args.save_progress,
            )
            if args.save_progress:
                # Per-opt-step progress PNGs, reference layout
                # (src/optimizer.py:149-166): render | GT of the first
                # target view at every step.
                obj_dir = os.path.join(save_dir, ds.ids[oi])
                os.makedirs(obj_dir, exist_ok=True)
                v0 = args.tgt_instances[0]
                prog = np.asarray(res.progress)
                gt_v0 = imgs[v0].astype(np.float32) / 255.0
                for t in range(prog.shape[0]):
                    save_png(os.path.join(obj_dir, f"opt{t:03d}_{v0}.png"),
                             side_by_side(prog[t], gt_v0))
            ev = optimizer.evaluate_object(
                imgs, poses, focal, args.tgt_instances,
                res.shape_code, res.texture_code, k_eval,
                return_images=args.save_img,
                deterministic=args.deterministic_eval,
            )
            emit(oi, imgs, res.shape_code, res.texture_code,
                 res.psnr_history, ev["psnr"], ev["ssim"], ev["views"],
                 ev.get("images") if args.save_img else None)
            flush(oi)
    else:
        # Batched path: G objects per dispatch; per-object keys follow
        # the same split pattern as the sequential loop, so codes.npz /
        # results.json are object-for-object identical either way.
        for start in range(0, n, group):
            idx = list(range(start, min(start + group, n)))
            print(f"num obj: {idx[0]}..{idx[-1]}/{n}")
            imgs_g = np.stack([ds.images[i] for i in idx])  # uint8
            poses_g = np.stack([ds.poses[i] for i in idx])
            focals_g = np.asarray([ds.focals[i] for i in idx], np.float32)
            ks_opt, ks_eval = [], []
            for _ in idx:
                key, k_opt, k_eval = jax.random.split(key, 3)
                ks_opt.append(k_opt)
                ks_eval.append(k_eval)
            res = optimizer.optimize_objects(
                imgs_g, poses_g, focals_g, args.tgt_instances,
                jnp.stack(ks_opt), num_opts=args.num_opts, lr=args.lr,
                lr_half_interval=args.lr_half_interval,
            )
            ev = optimizer.evaluate_objects(
                imgs_g, poses_g, focals_g, args.tgt_instances,
                res.shape_codes, res.texture_codes, jnp.stack(ks_eval),
                return_images=args.save_img,
                deterministic=args.deterministic_eval,
            )
            for j, oi in enumerate(idx):
                emit(oi, imgs_g[j], res.shape_codes[j],
                     res.texture_codes[j], res.psnr_history[:, j],
                     ev["psnr"][j], ev["ssim"][j], ev["views"],
                     ev["images"][j] if args.save_img else None)
            flush(idx[-1])
    print("done:", json.dumps(summary[-1] if summary else {}))


if __name__ == "__main__":
    main()
