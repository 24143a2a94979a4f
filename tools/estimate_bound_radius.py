#!/usr/bin/env python
"""Estimate a bounding-sphere radius for ``bound_sphere_radius`` from a
trained checkpoint: render depth/opacity from several training views,
back-project the opaque ray terminations to 3D, and report a high quantile
of their distance from the origin (SRN objects are origin-normalized).

Usage:
  python tools/estimate_bound_radius.py --saved_dir exp1 --jsonfile srncar.json
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def estimate_radius(params, hp, poses, focal, H, W, codes,
                    n_views: int = 4, opacity_thresh: float = 0.5,
                    quantile: float = 0.995, margin: float = 1.1) -> float:
    import jax
    import jax.numpy as jnp

    from codenerf_tpu.config import resolve_dtype
    from codenerf_tpu.core.rays import camera_rays
    from codenerf_tpu.renderer import render_rays

    shape_code, texture_code = codes
    radii = []
    for v in range(min(n_views, poses.shape[0])):
        ro, vd = camera_rays(H, W, focal, jnp.asarray(poses[v]))
        res = render_rays(params, hp.net, hp.render, ro, vd,
                          shape_code, texture_code, key=None,
                          compute_dtype=resolve_dtype(hp.compute_dtype))
        acc = np.asarray(res.final.acc)
        depth = np.asarray(res.final.depth)
        hit = acc > opacity_thresh
        if not hit.any():
            continue
        pts = np.asarray(ro)[hit] + depth[hit, None] * np.asarray(vd)[hit]
        radii.append(np.quantile(np.linalg.norm(pts, axis=-1), quantile))
    if not radii:
        raise RuntimeError("no opaque rays found — model untrained?")
    return float(np.max(radii) * margin)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--saved_dir", type=str, required=True)
    ap.add_argument("--jsonfile", type=str, default="srncar.json")
    ap.add_argument("--exps_root", type=str, default="exps")
    ap.add_argument("--obj", type=int, default=0)
    ap.add_argument("--H", type=int, default=64)
    ap.add_argument("--W", type=int, default=64)
    ap.add_argument("--focal", type=float, default=None)
    ap.add_argument("--radius_cam", type=float, default=1.3,
                    help="camera orbit radius used for probe views")
    args = ap.parse_args()

    import jax.numpy as jnp

    from codenerf_tpu.config import load_hparams
    from codenerf_tpu.utils.cache import enable_compilation_cache
    from codenerf_tpu.utils.checkpoint import restore_raw
    from tools.render_orbit import orbit_pose

    enable_compilation_cache()
    hp = load_hparams(args.jsonfile)
    raw = restore_raw(os.path.join(args.exps_root, args.saved_dir, "ckpt"))
    tr = raw["trainables"]
    poses = np.stack([orbit_pose(a, 0.35, args.radius_cam)
                      for a in np.linspace(0, 2 * np.pi, 4, endpoint=False)])
    focal = args.focal or 1.1 * args.W
    r = estimate_radius(
        tr["params"], hp, poses, focal, args.H, args.W,
        (jnp.asarray(tr["shape_codes"][args.obj]),
         jnp.asarray(tr["texture_codes"][args.obj])),
    )
    print(f"estimated bound_sphere_radius: {r:.3f}")
    print(f'add to your jsonfile: "bound_sphere_radius": {r:.3f}')


if __name__ == "__main__":
    main()
