"""Synthetic multi-view datasets for tests and benchmarks.

The reference ships no tests and assumes the 100+ GB ShapeNet-SRN download.
This module generates small, multi-view-consistent scenes — one shaded
sphere per object, with per-object radius ("shape") and albedo ("texture")
— analytically, using the same pinhole camera model as the renderer, so a
NeRF trained on them must actually learn 3D structure. It can also write the
scene to disk in the exact SRN directory layout (``src/data.py:10-37``
parsing rules) to exercise the disk loader and the CLIs end to end.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

_SRN_FLIP = np.diag(np.array([1.0, -1.0, -1.0, 1.0]))


def _look_at(cam_pos: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """OpenGL-style c2w: camera -z looks at target. Columns [x, y, z | t]."""
    backward = cam_pos - target
    backward = backward / np.linalg.norm(backward)
    right = np.cross(up, backward)
    right = right / np.linalg.norm(right)
    true_up = np.cross(backward, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, true_up, backward, cam_pos
    return c2w


def _render_sphere(
    H: int, W: int, focal: float, c2w: np.ndarray,
    radius: float, albedo: np.ndarray,
    pattern: bool = False,
) -> np.ndarray:
    """Analytic render of a lambertian-shaded sphere at the origin on a
    white background, with the renderer's camera convention
    (``core/rays.py``). Returns (H, W, 3) float in [0, 1]."""
    v, u = np.meshgrid(np.arange(H, dtype=np.float64),
                       np.arange(W, dtype=np.float64), indexing="ij")
    dirs = np.stack(
        [(u - W * 0.5) / focal, -(v - H * 0.5) / focal, -np.ones_like(u)], -1
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = c2w[:3, 3]

    # |o + t d|^2 = r^2  ->  t^2 + 2 t (o.d) + (|o|^2 - r^2) = 0
    b = np.sum(rays_o * rays_d, axis=-1)
    c = np.dot(rays_o, rays_o) - radius * radius
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0

    point = rays_o + t[..., None] * rays_d
    normal = point / max(radius, 1e-8)
    # Head-on lambert term keeps shading pose-consistent (light at camera).
    shade = np.clip(np.sum(normal * -rays_d, axis=-1), 0.2, 1.0)
    if pattern:
        # Smooth world-anchored surface pattern. A plain shaded sphere is
        # rotation-invariant, which makes camera pose unobservable along the
        # orbit — pose-optimization scenes need surface texture to lock onto.
        p = point
        shade = shade * (0.75 + 0.25 * np.sin(5.0 * p[..., 0])
                         * np.sin(5.0 * p[..., 1]) * np.sin(5.0 * p[..., 2]))
    img = np.ones((H, W, 3))
    img[hit] = albedo[None, :] * shade[hit][..., None]
    return img.astype(np.float32)


def synthetic_scene(
    n_objects: int = 3,
    n_views: int = 8,
    H: int = 32,
    W: int = 32,
    focal: Optional[float] = None,
    cam_distance: float = 4.0,
    seed: int = 0,
    pattern: bool = False,
) -> Dict[str, np.ndarray]:
    """Build an in-memory multi-object scene.

    Returns a dict with the same fields :class:`SRNDataset` exposes:
    ``images`` (N,V,H,W,3) uint8, ``poses`` (N,V,4,4) f32, ``focals`` (N,) f32,
    plus suggested ``near``/``far`` bounds.
    """
    rng = np.random.default_rng(seed)
    focal = focal if focal is not None else 1.2 * W
    radii = rng.uniform(0.7, 1.3, size=n_objects)
    albedos = rng.uniform(0.1, 0.9, size=(n_objects, 3))

    # Views on a tilted circle around the origin.
    azimuths = np.linspace(0, 2 * np.pi, n_views, endpoint=False)
    elevations = rng.uniform(0.15, 0.55, size=n_views)

    images = np.zeros((n_objects, n_views, H, W, 3), dtype=np.uint8)
    poses = np.zeros((n_objects, n_views, 4, 4), dtype=np.float32)
    for vi, (az, el) in enumerate(zip(azimuths, elevations)):
        cam = cam_distance * np.array(
            [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)]
        )
        c2w = _look_at(cam, np.zeros(3), np.array([0.0, 0.0, 1.0]))
        for oi in range(n_objects):
            img = _render_sphere(H, W, focal, c2w, radii[oi], albedos[oi],
                                 pattern=pattern)
            images[oi, vi] = np.round(img * 255.0).astype(np.uint8)
            poses[oi, vi] = c2w.astype(np.float32)

    return {
        "images": images,
        "poses": poses,
        "focals": np.full((n_objects,), focal, dtype=np.float32),
        "H": H,
        "W": W,
        "near": float(cam_distance - 1.8),
        "far": float(cam_distance + 1.8),
        "radii": radii,
        "albedos": albedos,
    }


def write_srn_layout(root: str, scene: Dict[str, np.ndarray],
                     cat: str = "srn_cars", splits: str = "cars_train") -> str:
    """Write a scene to disk in the SRN directory layout so the disk loader
    and CLI paths can be tested without ShapeNet. Poses are stored with the
    inverse axis flip, which the loader will undo (``src/data.py:12-16``)."""
    from PIL import Image

    split_dir = os.path.join(root, cat, splits)
    n_objects, n_views, H, W = scene["images"].shape[:4]
    for oi in range(n_objects):
        obj_dir = os.path.join(split_dir, f"obj{oi:04d}")
        os.makedirs(os.path.join(obj_dir, "pose"), exist_ok=True)
        os.makedirs(os.path.join(obj_dir, "rgb"), exist_ok=True)
        with open(os.path.join(obj_dir, "intrinsics.txt"), "w") as f:
            focal = float(scene["focals"][oi])
            f.write(f"{focal} {W / 2.0} {H / 2.0} 0.\n0. 0. 0.\n1.\n{H} {W}\n")
        for vi in range(n_views):
            # loader computes disk_pose @ FLIP; FLIP is involutory.
            disk_pose = scene["poses"][oi, vi].astype(np.float64) @ _SRN_FLIP
            np.savetxt(
                os.path.join(obj_dir, "pose", f"{vi:06d}.txt"),
                disk_pose.reshape(1, 16),
            )
            Image.fromarray(scene["images"][oi, vi]).save(
                os.path.join(obj_dir, "rgb", f"{vi:06d}.png")
            )
    return split_dir
