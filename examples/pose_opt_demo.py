#!/usr/bin/env python
"""Joint pose + latent-code optimization demo (cataloged but unimplemented
in the reference, README.md:24-25).

Trains a small CodeNeRF, perturbs a camera pose with a known se(3) twist,
then recovers pose and codes by gradient descent through ray generation and
volume rendering. Prints the pose error before/after and writes a
[initial-guess render | refined render | ground truth] strip.

Convergence facts (measured on this scene, recorded in BASELINE.md):

- MODEL SHARPNESS GATES POSE IDENTIFIABILITY. At 600 train steps (22.5 dB
  train PSNR) the photometric optimum is NOT at the GT pose — every
  optimizer setting reaches >= train PSNR while rotation error stays at or
  above the 6.2 deg perturbation. At 2500 steps (27.5 dB) the same
  optimizer recovers the pose exactly (rot -> ~0 deg).
- A REGISTRATION PHASE FIRST (codes frozen, 3/4 of the steps), then joint
  fine-tuning, converges best: free codes absorb pose error otherwise.
- STOCHASTIC 2048-ray steps beat full-image steps (2.55 deg residual with
  full rays vs ~0 deg with minibatches) — minibatch noise escapes the
  shallow side minima of the pose landscape.

Usage: python examples/pose_opt_demo.py [--steps 2500] [--out DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--opt_steps", type=int, default=400)
    ap.add_argument("--out", type=str, default="/tmp/codenerf_pose_demo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from codenerf_tpu.config import Hparams, LrSchedule, NetConfig, RenderConfig
    from codenerf_tpu.core.poses import exp_se3
    from codenerf_tpu.data.synthetic import synthetic_scene
    from codenerf_tpu.optimization.pose_opt import optimize_pose_and_codes
    from codenerf_tpu.renderer import render_image
    from codenerf_tpu.training.trainer import Trainer
    from codenerf_tpu.utils.images import image_float_to_uint8, save_png

    os.makedirs(args.out, exist_ok=True)
    scene = synthetic_scene(n_objects=3, n_views=10, H=64, W=64, seed=4, pattern=True)
    hp = Hparams(
        net=NetConfig(shape_blocks=2, texture_blocks=1, W=128,
                      num_xyz_freq=8, num_dir_freq=3, latent_dim=64),
        render=RenderConfig(n_samples=48, near=scene["near"], far=scene["far"]),
        lr_model=LrSchedule(5e-4, 100_000),
        lr_codes=LrSchedule(5e-3, 100_000),
        check_points=0,
    )
    tr = Trainer("pose_demo", hp, batch_size=4096, dataset=scene,
                 exps_root=args.out, check_iter=0)
    print(f"training {args.steps} steps ...")
    m = tr.training(iters_crop=0, iters_all=args.steps, log_every=args.steps)
    print(f"train psnr: {m['psnr']:.2f} dB")

    obj, view = 0, 3
    gt_pose = jnp.asarray(scene["poses"][obj, view])
    xi_true = jnp.asarray([0.08, -0.05, 0.06, 0.10, -0.08, 0.06])
    bad_pose = exp_se3(xi_true) @ gt_pose
    image = jnp.asarray(scene["images"][obj, view], jnp.float32) / 255.0

    t = tr.state.trainables
    result = optimize_pose_and_codes(
        t["params"], hp, image, bad_pose, float(scene["focals"][obj]),
        t["shape_codes"][obj], t["texture_codes"][obj],
        key=jax.random.PRNGKey(0), num_opts=args.opt_steps,
        lr_pose=1e-2, lr_codes=1e-3, lr_half_interval=args.opt_steps // 4,
        rays_per_step=2048, pose_only_steps=3 * args.opt_steps // 4,
    )
    err_before = float(jnp.abs(bad_pose - gt_pose).mean())
    err_after = float(jnp.abs(result.c2w - gt_pose).mean())
    print(f"pose error: {err_before:.4f} -> {err_after:.4f}")

    def rot_deg(p):
        Rrel = np.asarray(p)[:3, :3].T @ np.asarray(gt_pose)[:3, :3]
        c = np.clip((np.trace(Rrel) - 1.0) / 2.0, -1.0, 1.0)
        return float(np.degrees(np.arccos(c)))

    def trans_err(p):
        return float(np.linalg.norm(np.asarray(p)[:3, 3]
                                    - np.asarray(gt_pose)[:3, 3]))

    print(f"rotation error: {rot_deg(bad_pose):.2f} -> "
          f"{rot_deg(result.c2w):.2f} deg; translation: "
          f"{trans_err(bad_pose):.4f} -> {trans_err(result.c2w):.4f}")
    print(f"psnr during optimization: {float(result.psnr_history[0]):.2f} -> "
          f"{float(result.psnr_history[-1]):.2f} dB")

    H, W = scene["H"], scene["W"]
    render = lambda pose: np.asarray(render_image(
        t["params"], hp.net, hp.render, H, W, float(scene["focals"][obj]),
        pose, result.shape_code, result.texture_code,
        chunk=min(4096, H * W)))
    strip = np.concatenate(
        [render(bad_pose), render(result.c2w), np.asarray(image)], axis=1)
    save_png(os.path.join(args.out, "pose_refinement.png"),
             image_float_to_uint8(strip))
    print(f"wrote {args.out}/pose_refinement.png  [guess | refined | GT]")


if __name__ == "__main__":
    main()
