#!/usr/bin/env python
"""Render a turntable orbit of a trained object from a checkpoint.

Usage:
  python tools/render_orbit.py --saved_dir exp1 --jsonfile srncar.json \
      --obj 0 --n_frames 60 --out orbit_dir [--elevation 0.3 --radius 1.3]

Writes ``frame_%03d.png`` plus an ``orbit.gif`` (PIL). Codes come from the
training code tables (``--obj`` row) or from an optimize.py ``codes.npz``
(``--codes path --obj i``).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def orbit_pose(azimuth: float, elevation: float, radius: float) -> np.ndarray:
    """OpenGL-style c2w on a sphere looking at the origin (z-up)."""
    cam = radius * np.array([
        np.cos(azimuth) * np.cos(elevation),
        np.sin(azimuth) * np.cos(elevation),
        np.sin(elevation),
    ])
    backward = cam / np.linalg.norm(cam)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(up, backward)
    right /= np.linalg.norm(right)
    true_up = np.cross(backward, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, true_up, backward, cam
    return c2w.astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--saved_dir", type=str, required=True)
    ap.add_argument("--jsonfile", type=str, default="srncar.json")
    ap.add_argument("--exps_root", type=str, default="exps")
    ap.add_argument("--obj", type=int, default=0)
    ap.add_argument("--codes", type=str, default=None,
                    help="optional codes.npz from optimize.py")
    ap.add_argument("--n_frames", type=int, default=60)
    ap.add_argument("--H", type=int, default=128)
    ap.add_argument("--W", type=int, default=128)
    ap.add_argument("--focal", type=float, default=None)
    ap.add_argument("--radius", type=float, default=1.3)
    ap.add_argument("--elevation", type=float, default=0.3)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from codenerf_tpu.config import load_hparams, resolve_dtype
    from codenerf_tpu.renderer import render_image
    from codenerf_tpu.utils.cache import enable_compilation_cache
    from codenerf_tpu.utils.checkpoint import restore_raw
    from codenerf_tpu.utils.images import save_png

    enable_compilation_cache()
    hp = load_hparams(args.jsonfile)
    run_dir = os.path.join(args.exps_root, args.saved_dir)
    raw = restore_raw(os.path.join(run_dir, "ckpt"))
    tr = raw["trainables"]
    if args.codes:
        codes = np.load(args.codes)
        shape_code = jnp.asarray(codes["optimized_shapecodes"][args.obj])
        texture_code = jnp.asarray(codes["optimized_texturecodes"][args.obj])
    else:
        shape_code = jnp.asarray(tr["shape_codes"][args.obj])
        texture_code = jnp.asarray(tr["texture_codes"][args.obj])

    out_dir = args.out or os.path.join(run_dir, f"orbit_obj{args.obj}")
    os.makedirs(out_dir, exist_ok=True)
    focal = args.focal if args.focal else 1.1 * args.W
    chunk = min(4096, args.H * args.W)

    render = jax.jit(lambda c2w: render_image(
        tr["params"], hp.net, hp.render, args.H, args.W, focal, c2w,
        shape_code, texture_code, key=None, chunk=chunk,
        fine_params=tr.get("fine_params"),
        compute_dtype=resolve_dtype(hp.compute_dtype)))

    frames = []
    for i in range(args.n_frames):
        az = 2.0 * np.pi * i / args.n_frames
        img = np.asarray(render(jnp.asarray(orbit_pose(az, args.elevation,
                                                       args.radius))))
        u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        save_png(os.path.join(out_dir, f"frame_{i:03d}.png"), u8)
        frames.append(u8)
        print(f"frame {i + 1}/{args.n_frames}", end="\r", flush=True)

    from PIL import Image

    gif = [Image.fromarray(f) for f in frames]
    gif[0].save(os.path.join(out_dir, "orbit.gif"), save_all=True,
                append_images=gif[1:], duration=50, loop=0)
    print(f"\nwrote {args.n_frames} frames + orbit.gif -> {out_dir}")


if __name__ == "__main__":
    main()
