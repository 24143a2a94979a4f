#!/usr/bin/env python
"""Shape/texture editing CLI — the shell entry point for the "Editing
Shapes/Textures" capability the reference catalogs but never implemented
(``/root/reference/README.md:24-25``; the paper's disentanglement figures).

Operates on TRAINED latent codes from a checkpoint: because CodeNeRF
disentangles shape and texture, edits are renders under interpolated or
swapped codes (:mod:`codenerf_tpu.optimization.editing` — one jitted
``lax.map`` over code pairs, no per-frame dispatch). The dataset supplies
only the camera (pose/focal/H/W of ``--view`` of the first object).

Outputs under ``<exps_root>/<saved_dir>/edits[_N]/``:
  shape_interp.png    object A's shape morphing into B's, texture fixed
  texture_interp.png  texture morph, shape fixed
  swap_matrix.png     full shape x texture cross product over --objects
  results.json        swap-matrix diagonal PSNR vs dataset GT (the
                      identity edit must be faithful for edits to mean
                      anything)

Usage:
  python tools/edit.py --saved_dir run1 --jsonfile jsonfiles/srncar.json \
      --objects 0 1 2 --grid 5 --view 0
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


def _unique_dir(base: str) -> str:
    path, num = base, 2
    while os.path.isdir(path):
        path = f"{base}_{num}"
        num += 1
    os.makedirs(path)
    return path


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Latent-code editing: interpolation strips + swap matrix")
    ap.add_argument("--saved_dir", type=str, default="default")
    ap.add_argument("--jsonfile", type=str, default="srncar.json")
    ap.add_argument("--exps_root", type=str, default="exps")
    ap.add_argument("--objects", type=int, nargs="+", default=[0, 1],
                    help="TRAIN object indices whose checkpointed codes to "
                    "edit (first two define the interpolation endpoints; "
                    "all of them span the swap matrix)")
    ap.add_argument("--grid", type=int, default=5,
                    help="interpolation steps (endpoints included)")
    ap.add_argument("--view", type=int, default=0,
                    help="camera view (of the first object) to render from")
    ap.add_argument("--batchsize", type=int, default=4096)
    args = ap.parse_args()
    if len(args.objects) < 2:
        raise SystemExit("--objects needs at least two train object indices")

    import jax

    if os.environ.get("CODENERF_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CODENERF_PLATFORM"])

    from codenerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from codenerf_tpu.data.srn import SRNDataset
    from codenerf_tpu.optimization.editing import (
        interpolate_codes,
        render_code_grid,
        render_shape_texture_matrix,
    )
    from codenerf_tpu.utils.checkpoint import restore_raw
    from codenerf_tpu.utils.images import image_float_to_uint8, save_png

    hp = load_hparams(args.jsonfile)
    run_dir = os.path.join(args.exps_root, args.saved_dir)
    raw = restore_raw(os.path.join(run_dir, "ckpt"))
    trainables = raw["trainables"]
    save_dir = _unique_dir(os.path.join(run_dir, "edits"))
    print("we are going to save at", save_dir)

    # Codes were trained on the TRAIN split in dataset order.
    ds = SRNDataset(cat=hp.data.cat, splits=hp.data.splits,
                    data_dir=hp.data.data_dir,
                    max_objects=max(args.objects) + 1)
    shape_codes = jnp.asarray(trainables["shape_codes"])
    texture_codes = jnp.asarray(trainables["texture_codes"])
    n_codes = shape_codes.shape[0]
    bad = [i for i in args.objects if i >= n_codes]
    if bad:
        raise SystemExit(f"--objects {bad} out of range: the checkpoint "
                         f"holds {n_codes} trained code rows")

    a, b = args.objects[0], args.objects[1]
    H, W = ds.images.shape[2:4]
    c2w = jnp.asarray(ds.poses[a, args.view])
    focal = float(ds.focals[a])
    chunk = min(args.batchsize, H * W)
    params = trainables["params"]
    fine_params = trainables.get("fine_params")
    G = args.grid

    s_interp = interpolate_codes(shape_codes[a], shape_codes[b], G)
    t_interp = interpolate_codes(texture_codes[a], texture_codes[b], G)
    t_fixed = jnp.broadcast_to(texture_codes[a], (G, texture_codes.shape[1]))
    s_fixed = jnp.broadcast_to(shape_codes[a], (G, shape_codes.shape[1]))

    strip_shape = np.asarray(render_code_grid(
        params, hp, s_interp, t_fixed, H, W, focal, c2w, chunk=chunk,
        fine_params=fine_params))
    strip_tex = np.asarray(render_code_grid(
        params, hp, s_fixed, t_interp, H, W, focal, c2w, chunk=chunk,
        fine_params=fine_params))
    save_png(os.path.join(save_dir, "shape_interp.png"),
             image_float_to_uint8(np.concatenate(strip_shape, axis=1)))
    save_png(os.path.join(save_dir, "texture_interp.png"),
             image_float_to_uint8(np.concatenate(strip_tex, axis=1)))

    sel = jnp.asarray(args.objects)
    mat = np.asarray(render_shape_texture_matrix(
        params, hp, shape_codes[sel], texture_codes[sel], H, W, focal, c2w,
        chunk=chunk, fine_params=fine_params))
    rows = [np.concatenate(list(mat[i]), axis=1) for i in range(mat.shape[0])]
    save_png(os.path.join(save_dir, "swap_matrix.png"),
             image_float_to_uint8(np.concatenate(rows, axis=0)))

    # Identity-edit fidelity: the matrix diagonal (object i's shape with its
    # own texture) rendered from object a's camera is compared against each
    # object's own GT view — meaningful only when the camera is shared
    # across objects (true for SRN-layout categories, same orbit per split).
    diag_psnr = {}
    for j, oi in enumerate(args.objects):
        gt = ds.images[oi, args.view].astype(np.float32) / 255.0
        mse = float(np.mean((mat[j, j] - gt) ** 2))
        diag_psnr[ds.ids[oi]] = -10.0 * float(np.log10(max(mse, 1e-12)))
    with open(os.path.join(save_dir, "results.json"), "w") as f:
        json.dump({"args": vars(args), "diag_psnr": diag_psnr,
                   "mean_diag_psnr": float(np.mean(list(diag_psnr.values())))},
                  f, indent=2)
    print("swap-matrix diagonal vs GT: "
          + ", ".join(f"{k}: {v:.2f}" for k, v in diag_psnr.items())
          + f" dB (mean {np.mean(list(diag_psnr.values())):.2f})")
    print(f"wrote {save_dir}/shape_interp.png, texture_interp.png, "
          "swap_matrix.png")


if __name__ == "__main__":
    main()
