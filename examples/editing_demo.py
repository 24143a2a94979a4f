#!/usr/bin/env python
"""Shape/texture editing demo (the reference catalogs this capability but
ships no code for it, README.md:24-25).

Trains a small CodeNeRF on a synthetic multi-object scene, then renders:
  1. a shape-interpolation strip (object A's shape morphing into B's,
     texture held fixed),
  2. a texture-interpolation strip,
  3. the full shape x texture swap matrix.

Outputs PNGs under --out (default /tmp/codenerf_editing_demo).

Usage: python examples/editing_demo.py [--steps 800] [--out DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--out", type=str, default="/tmp/codenerf_editing_demo")
    ap.add_argument("--grid", type=int, default=5)
    args = ap.parse_args()

    import numpy as np

    from codenerf_tpu.config import Hparams, LrSchedule, NetConfig, RenderConfig
    from codenerf_tpu.data.synthetic import synthetic_scene
    from codenerf_tpu.optimization.editing import (
        interpolate_codes,
        render_code_grid,
        render_shape_texture_matrix,
    )
    from codenerf_tpu.training.trainer import Trainer
    from codenerf_tpu.utils.images import image_float_to_uint8, save_png

    os.makedirs(args.out, exist_ok=True)
    scene = synthetic_scene(n_objects=4, n_views=10, H=64, W=64, seed=2)
    hp = Hparams(
        net=NetConfig(shape_blocks=2, texture_blocks=1, W=128,
                      num_xyz_freq=8, num_dir_freq=3, latent_dim=64),
        render=RenderConfig(n_samples=48, near=scene["near"], far=scene["far"]),
        lr_model=LrSchedule(5e-4, 100_000),
        lr_codes=LrSchedule(5e-3, 100_000),
        check_points=0,
    )
    tr = Trainer("editing_demo", hp, batch_size=4096, dataset=scene,
                 exps_root=args.out, check_iter=0)
    print(f"training {args.steps} steps ...")
    m = tr.training(iters_crop=0, iters_all=args.steps, log_every=args.steps)
    print(f"train psnr: {m['psnr']:.2f} dB")

    t = tr.state.trainables
    G = args.grid
    H, W = scene["H"], scene["W"]
    c2w = scene["poses"][0, 0]
    focal = float(scene["focals"][0])
    chunk = min(4096, H * W)

    s_interp = interpolate_codes(t["shape_codes"][0], t["shape_codes"][1], G)
    t_interp = interpolate_codes(t["texture_codes"][0], t["texture_codes"][1], G)
    t_fixed = np.broadcast_to(np.asarray(t["texture_codes"][0]), (G, t_interp.shape[1]))
    s_fixed = np.broadcast_to(np.asarray(t["shape_codes"][0]), (G, s_interp.shape[1]))

    import jax.numpy as jnp

    strip_shape = render_code_grid(t["params"], hp, s_interp,
                                   jnp.asarray(t_fixed), H, W, focal, c2w,
                                   chunk=chunk)
    strip_tex = render_code_grid(t["params"], hp, jnp.asarray(s_fixed),
                                 t_interp, H, W, focal, c2w, chunk=chunk)
    save_png(os.path.join(args.out, "shape_interp.png"),
             image_float_to_uint8(np.concatenate(np.asarray(strip_shape), axis=1)))
    save_png(os.path.join(args.out, "texture_interp.png"),
             image_float_to_uint8(np.concatenate(np.asarray(strip_tex), axis=1)))

    mat = render_shape_texture_matrix(
        t["params"], hp, t["shape_codes"][:3], t["texture_codes"][:3],
        H, W, focal, c2w, chunk=chunk,
    )
    mat = np.asarray(mat)
    rows = [np.concatenate(list(mat[i]), axis=1) for i in range(mat.shape[0])]
    save_png(os.path.join(args.out, "swap_matrix.png"),
             image_float_to_uint8(np.concatenate(rows, axis=0)))

    # Quantitative check: the swap matrix DIAGONAL (object i's shape with
    # its own texture) must reproduce the ground-truth view — edits are
    # only meaningful if the identity edit is faithful.
    diag_psnr = []
    for i in range(mat.shape[0]):
        gt = scene["images"][i, 0].astype(np.float32) / 255.0
        mse = float(np.mean((mat[i, i] - gt) ** 2))
        diag_psnr.append(-10.0 * np.log10(mse))
    print("swap-matrix diagonal vs GT: "
          + ", ".join(f"{p:.2f}" for p in diag_psnr)
          + f" dB (mean {np.mean(diag_psnr):.2f})")
    print(f"wrote {args.out}/shape_interp.png, texture_interp.png, swap_matrix.png")


if __name__ == "__main__":
    main()
