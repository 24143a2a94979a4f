#!/usr/bin/env python
"""Pose + latent-code optimization CLI — the shell entry point for the
"Pose Optimizing" capability the reference catalogs but never implemented
(``/root/reference/README.md:24-25``; paper §4.3, arXiv 2109.01750).

Protocol, per test object: take ONE view whose camera pose is treated as
unknown/inaccurate (the ground-truth pose perturbed by a seeded random
se(3) twist of ``--perturb_rot`` degrees / ``--perturb_trans`` units, or
another view's pose via ``--init_view``), initialize the codes at the mean
of the trained embeddings, and jointly recover (pose, codes) by gradient
descent through ray generation and volume rendering
(:func:`codenerf_tpu.optimization.pose_opt.optimize_pose_and_codes` — one
jitted ``lax.scan``, stochastic ray minibatches, registration-first
schedule). Reports rotation/translation error before/after against the
dataset's ground-truth pose.

Outputs under ``<exps_root>/<saved_dir>/pose_opt[_N]/``:
  results.json     per-object pose errors + PSNR trajectories
  <obj_id>.png     [initial-guess render | refined render | GT] strip

Usage:
  python tools/pose_opt.py --saved_dir run1 --jsonfile jsonfiles/srncar.json \
      --splits test --tgt_instance 1 --perturb_rot 6 --perturb_trans 0.1
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from codenerf_tpu.config import load_hparams  # noqa: E402
from codenerf_tpu.utils.images import str2bool  # noqa: E402


def rotation_error_deg(a: np.ndarray, b: np.ndarray) -> float:
    """Geodesic angle between two c2w rotations, degrees."""
    rel = np.asarray(a)[:3, :3].T @ np.asarray(b)[:3, :3]
    c = np.clip((np.trace(rel) - 1.0) / 2.0, -1.0, 1.0)
    return float(np.degrees(np.arccos(c)))


def translation_error(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(np.asarray(a)[:3, 3] - np.asarray(b)[:3, 3]))


def _unique_dir(base: str) -> str:
    path, num = base, 2
    while os.path.isdir(path):
        path = f"{base}_{num}"
        num += 1
    os.makedirs(path)
    return path


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Joint camera-pose + latent-code optimization")
    ap.add_argument("--saved_dir", type=str, default="default")
    ap.add_argument("--jsonfile", type=str, default="srncar.json")
    ap.add_argument("--splits", type=str, default="test")
    ap.add_argument("--exps_root", type=str, default="exps")
    ap.add_argument("--tgt_instance", type=int, default=1,
                    help="view index optimized against (its pose is the "
                    "unknown)")
    ap.add_argument("--perturb_rot", type=float, default=6.0,
                    help="rotation perturbation magnitude (degrees) applied "
                    "to the GT pose to form the initial guess")
    ap.add_argument("--perturb_trans", type=float, default=0.1,
                    help="translation perturbation magnitude")
    ap.add_argument("--init_view", type=int, default=None,
                    help="use THIS view's pose as the initial guess instead "
                    "of perturbing the target's (a natural wrong-pose "
                    "scenario); overrides --perturb_*")
    ap.add_argument("--num_opts", type=int, default=400)
    ap.add_argument("--lr_pose", type=float, default=1e-2)
    ap.add_argument("--lr_codes", type=float, default=1e-3)
    ap.add_argument("--lr_half_interval", type=int, default=100)
    ap.add_argument("--rays_per_step", type=int, default=2048,
                    help="stochastic ray minibatch per step (minibatch "
                    "noise escapes shallow pose minima — measured in "
                    "BASELINE.md)")
    ap.add_argument("--pose_only_steps", type=int, default=None,
                    help="codes frozen for the first k steps "
                    "(default 3/4 of --num_opts: register first, then "
                    "joint fine-tune)")
    ap.add_argument("--max_objects", type=int, default=None)
    ap.add_argument("--save_img", type=str2bool, default=True)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if os.environ.get("CODENERF_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CODENERF_PLATFORM"])

    from codenerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from codenerf_tpu.core.poses import exp_se3
    from codenerf_tpu.data.srn import SRNDataset
    from codenerf_tpu.models.codes import mean_code
    from codenerf_tpu.optimization.pose_opt import optimize_pose_and_codes
    from codenerf_tpu.renderer import render_image
    from codenerf_tpu.utils.checkpoint import restore_raw
    from codenerf_tpu.utils.images import image_float_to_uint8, save_png

    hp = load_hparams(args.jsonfile)
    run_dir = os.path.join(args.exps_root, args.saved_dir)
    raw = restore_raw(os.path.join(run_dir, "ckpt"))
    trainables = raw["trainables"]
    save_dir = _unique_dir(os.path.join(run_dir, "pose_opt"))
    print("we are going to save at", save_dir)

    obj = hp.data.cat.split("_")[1]
    ds = SRNDataset(cat=hp.data.cat, splits=f"{obj}_{args.splits}",
                    data_dir=hp.data.data_dir, max_objects=args.max_objects)

    params = trainables["params"]
    fine_params = trainables.get("fine_params")
    mean_shape = mean_code(jnp.asarray(trainables["shape_codes"]))
    mean_texture = mean_code(jnp.asarray(trainables["texture_codes"]))
    pose_only = (3 * args.num_opts // 4 if args.pose_only_steps is None
                 else args.pose_only_steps)

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    results = []
    for oi in range(ds.n_objects):
        print(f"num obj: {oi}/{ds.n_objects}")
        v = args.tgt_instance
        image = jnp.asarray(ds.images[oi, v], jnp.float32) / 255.0
        gt_pose = np.asarray(ds.poses[oi, v], np.float32)
        focal = float(ds.focals[oi])
        if args.init_view is not None:
            init_pose = np.asarray(ds.poses[oi, args.init_view], np.float32)
        else:
            # Seeded random twist of the requested magnitude: unit axis x
            # angle for rotation, unit direction x distance for translation.
            ax = rng.standard_normal(3)
            ax /= np.linalg.norm(ax)
            dxyz = rng.standard_normal(3)
            dxyz /= np.linalg.norm(dxyz)
            xi = np.concatenate([ax * np.radians(args.perturb_rot),
                                 dxyz * args.perturb_trans]).astype(np.float32)
            init_pose = np.asarray(exp_se3(jnp.asarray(xi)) @ gt_pose)
        key, k_opt = jax.random.split(key)
        res = optimize_pose_and_codes(
            params, hp, image, jnp.asarray(init_pose), focal,
            mean_shape, mean_texture, key=k_opt,
            num_opts=args.num_opts, lr_codes=args.lr_codes,
            lr_pose=args.lr_pose, lr_half_interval=args.lr_half_interval,
            rays_per_step=args.rays_per_step, pose_only_steps=pose_only,
            fine_params=fine_params,
        )
        refined = np.asarray(res.c2w)
        hist = np.asarray(res.psnr_history)
        row = {
            "id": ds.ids[oi],
            "rot_err_deg_before": rotation_error_deg(init_pose, gt_pose),
            "rot_err_deg_after": rotation_error_deg(refined, gt_pose),
            "trans_err_before": translation_error(init_pose, gt_pose),
            "trans_err_after": translation_error(refined, gt_pose),
            "psnr_first": float(hist[0]),
            "psnr_last": float(hist[-1]),
        }
        results.append(row)
        print(f"  rot {row['rot_err_deg_before']:.2f} -> "
              f"{row['rot_err_deg_after']:.2f} deg; trans "
              f"{row['trans_err_before']:.4f} -> {row['trans_err_after']:.4f}"
              f"; psnr {row['psnr_first']:.2f} -> {row['psnr_last']:.2f}")
        if args.save_img:
            H, W = image.shape[:2]
            chunk = min(4096, H * W)
            rend = lambda pose: np.asarray(render_image(
                params, hp.net, hp.render, H, W, focal, jnp.asarray(pose),
                res.shape_code, res.texture_code, chunk=chunk,
                fine_params=fine_params))
            strip = np.concatenate(
                [rend(init_pose), rend(refined), np.asarray(image)], axis=1)
            save_png(os.path.join(save_dir, f"{ds.ids[oi]}.png"),
                     image_float_to_uint8(strip))
        with open(os.path.join(save_dir, "results.json"), "w") as f:
            json.dump({
                "args": vars(args),
                "per_object": results,
                "mean_rot_err_deg_after": float(np.mean(
                    [r["rot_err_deg_after"] for r in results])),
                "mean_trans_err_after": float(np.mean(
                    [r["trans_err_after"] for r in results])),
            }, f, indent=2)
    print("done:", json.dumps(results[-1] if results else {}))


if __name__ == "__main__":
    main()
