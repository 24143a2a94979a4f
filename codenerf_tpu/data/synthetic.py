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


def _render_boxes(
    H: int, W: int, focal: float, c2w: np.ndarray,
    boxes: np.ndarray,   # (B, 2, 3): per box (center, half-extent)
    albedo: np.ndarray, yaw: float,
    pattern: bool = False,
) -> np.ndarray:
    """Analytic render of a union of axis-aligned boxes (rotated about z
    by ``yaw``) on a white background — the "chair-like" category's
    primitive. Slab-method ray/box intersection, vectorized over pixels
    and boxes; lambertian shading with the light at the camera, normal
    from the entering slab face. Thin legs and flat slabs produce the
    occlusion boundaries and skinny structures a sphere can't, which is
    what hierarchical / occupancy sampling exist for."""
    v, u = np.meshgrid(np.arange(H, dtype=np.float64),
                       np.arange(W, dtype=np.float64), indexing="ij")
    dirs = np.stack(
        [(u - W * 0.5) / focal, -(v - H * 0.5) / focal, -np.ones_like(u)], -1
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)

    # Rotate rays into the object frame (object yaw about +z).
    cz, sz = np.cos(-yaw), np.sin(-yaw)
    rot = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    ro = rays_o @ rot.T          # (H, W, 3)
    rd = rays_d @ rot.T

    inv = 1.0 / np.where(np.abs(rd) < 1e-12, np.copysign(1e-12, rd), rd)
    best_t = np.full((H, W), np.inf)
    best_axis = np.zeros((H, W), dtype=np.int64)
    best_sign = np.zeros((H, W))
    for center, half in boxes:
        lo = (center - half - ro) * inv   # (H, W, 3)
        hi = (center + half - ro) * inv
        tmin = np.minimum(lo, hi)
        tmax = np.maximum(lo, hi)
        t0 = tmin.max(axis=-1)
        t1 = tmax.min(axis=-1)
        axis = tmin.argmax(axis=-1)
        hit = (t1 >= t0) & (t1 > 0.0) & (t0 > 1e-6) & (t0 < best_t)
        best_t = np.where(hit, t0, best_t)
        best_axis = np.where(hit, axis, best_axis)
        ax_dir = np.take_along_axis(rd, axis[..., None], axis=-1)[..., 0]
        best_sign = np.where(hit, -np.sign(ax_dir), best_sign)

    hit = np.isfinite(best_t)
    normal_obj = np.zeros((H, W, 3))
    np.put_along_axis(normal_obj, best_axis[..., None],
                      best_sign[..., None], axis=-1)
    shade = np.clip(np.sum(normal_obj * -rd, axis=-1), 0.2, 1.0)
    if pattern:
        p = ro + best_t[..., None] * rd
        p = np.where(hit[..., None], p, 0.0)
        shade = shade * (0.75 + 0.25 * np.sin(5.0 * p[..., 0])
                         * np.sin(5.0 * p[..., 1]) * np.sin(5.0 * p[..., 2]))
    img = np.ones((H, W, 3))
    img[hit] = albedo[None, :] * shade[hit][..., None]
    return img.astype(np.float32)


def make_view_fn(H: int, W: int, pattern: bool, geometry: str):
    """Traceable single-view analytic renderer — the f32 transcription of
    :func:`_render_sphere` / :func:`_render_boxes`.

    Returns ``fn(c2w, focal, albedo, *geom) -> (H*W, 3) f32 in [0, 1]``
    (pre-quantization) where ``geom`` is ``(radius,)`` for spheres and
    ``(boxes, yaw)`` for chairs. Usable under jit/vmap/lax.map — it backs
    both the batched scene generator (:func:`_render_pairs_jax`) and
    device-rendered eval ground truth (:func:`make_gt_view_renderer`),
    so synthetic GT never has to cross the host↔device tunnel."""
    import jax
    import jax.numpy as jnp

    v, u = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    u = u.reshape(-1)
    v = v.reshape(-1)

    def shade_and_compose(hit, shade_raw, point, alb):
        shade = jnp.clip(shade_raw, 0.2, 1.0)
        if pattern:
            p = jnp.where(hit[..., None], point, 0.0)
            shade = shade * (0.75 + 0.25 * jnp.sin(5.0 * p[..., 0])
                             * jnp.sin(5.0 * p[..., 1])
                             * jnp.sin(5.0 * p[..., 2]))
        return jnp.where(hit[..., None], alb[None, :] * shade[..., None],
                         1.0)

    def rays(c2w, focal):
        dirs_cam = jnp.stack(
            [(u - W * 0.5) / focal, -(v - H * 0.5) / focal,
             -jnp.ones_like(u)], -1)                     # (HW, 3)
        rd = dirs_cam @ c2w[:3, :3].T
        return rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    if geometry == "sphere":
        def view_fn(c2w, focal, alb, rad):
            rd = rays(c2w, focal)
            ro = c2w[:3, 3]
            b = jnp.sum(ro * rd, axis=-1)
            c = jnp.dot(ro, ro) - rad * rad
            disc = b * b - c
            t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
            hit = (disc > 0) & (t > 0)
            point = ro + t[..., None] * rd
            normal = point / jnp.maximum(rad, 1e-8)
            return shade_and_compose(
                hit, jnp.sum(normal * -rd, axis=-1), point, alb)
    else:
        def view_fn(c2w, focal, alb, bxs, yw):
            rd_w = rays(c2w, focal)
            ro_w = jnp.broadcast_to(c2w[:3, 3], rd_w.shape)
            cz, sz = jnp.cos(-yw), jnp.sin(-yw)
            rot = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
            rot = rot.at[0, 0].set(cz).at[0, 1].set(-sz) \
                     .at[1, 0].set(sz).at[1, 1].set(cz)
            ro = ro_w @ rot.T                            # (HW, 3)
            rd = rd_w @ rot.T
            inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-12,
                                  jnp.copysign(1e-12, rd), rd)
            lo = (bxs[:, 0] - bxs[:, 1])                 # (B, 3)
            hi = (bxs[:, 0] + bxs[:, 1])
            a = (lo[None] - ro[:, None]) * inv[:, None]  # (HW, B, 3)
            b2 = (hi[None] - ro[:, None]) * inv[:, None]
            tmin = jnp.minimum(a, b2)
            tmax = jnp.maximum(a, b2)
            t0 = tmin.max(axis=-1)                       # (HW, B)
            t1 = tmax.min(axis=-1)
            valid = (t1 >= t0) & (t1 > 0.0) & (t0 > 1e-6)
            t0v = jnp.where(valid, t0, jnp.inf)
            bi = jnp.argmin(t0v, axis=-1)                # first min wins ties
            best_t = jnp.take_along_axis(t0v, bi[:, None], axis=-1)[:, 0]
            hit = jnp.isfinite(best_t)
            axis = jnp.take_along_axis(
                tmin.argmax(axis=-1), bi[:, None], axis=-1)[:, 0]
            normal = jax.nn.one_hot(axis, 3, dtype=rd.dtype)
            ax_dir = jnp.take_along_axis(rd, axis[:, None], axis=-1)[:, 0]
            normal = normal * -jnp.sign(ax_dir)[:, None]
            tb = jnp.where(hit, best_t, 0.0)
            point = ro + tb[..., None] * rd
            return shade_and_compose(
                hit, jnp.sum(normal * -rd, axis=-1), point, alb)

    return view_fn


def make_gt_view_renderer(H: int, W: int, pattern: bool, geometry: str):
    """Traceable ground-truth view renderer for synthetic eval sweeps.

    ``fn(c2w, focal, params) -> (H, W, 3) f32`` where ``params`` is a dict
    with ``albedo`` plus ``radius`` (sphere) or ``boxes``/``yaw`` (chair),
    all per-object leaves. The output is uint8-QUANTIZED then rescaled
    (``round(x*255)/255``) so it equals what the stored dataset image
    decodes to — eval metrics against device-rendered GT match eval
    against the host image within the float-associativity noise the
    uint8-H2D path already carries."""
    import jax.numpy as jnp

    view_fn = make_view_fn(H, W, pattern, geometry)

    def gt_view(c2w, focal, params):
        if geometry == "sphere":
            rgb = view_fn(c2w, focal, params["albedo"], params["radius"])
        else:
            rgb = view_fn(c2w, focal, params["albedo"], params["boxes"],
                          params["yaw"])
        return (jnp.round(rgb * 255.0) / 255.0).reshape(H, W, 3)

    return gt_view


def _render_pairs_jax(
    H: int, W: int, focal: float,
    c2w: np.ndarray,          # (P, 4, 4) one camera per (object, view) pair
    albedo: np.ndarray,       # (P, 3)
    pattern: bool,
    geometry: str,
    radius: Optional[np.ndarray] = None,   # (P,) sphere
    boxes: Optional[np.ndarray] = None,    # (P, B, 2, 3) chair
    yaw: Optional[np.ndarray] = None,      # (P,) chair
    chunk_pairs: int = 2048,
) -> np.ndarray:
    """Accelerator-batched analytic renderer (same math as the numpy path,
    f32): all (object, view) pairs ride ``lax.map`` over the default jax
    device. The per-pair python loop is what made full-scale scene
    generation cost tens of minutes to hours of the single host core
    (29 ms/view for the 6-box chair at 128px -> 4.5 h for the real
    SRN-chairs split); on device the whole split renders in seconds and
    the wall-clock is the D2H transfer. Values differ from the numpy
    backend only by f32-vs-f64 rounding at the uint8 quantization edge
    (tested <=1 gray level on >99% of pixels)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    view_fn = make_view_fn(H, W, pattern, geometry)
    focal_arr = jnp.float32(focal)

    def render_one(args):
        c2w_i, alb, *geom = args
        rgb = view_fn(c2w_i, focal_arr, alb, *geom)
        return jnp.round(rgb * 255.0).astype(jnp.uint8)

    operands = (jnp.asarray(c2w, jnp.float32),
                jnp.asarray(albedo, jnp.float32))
    if geometry == "sphere":
        operands += (jnp.asarray(radius, jnp.float32),)
    else:
        operands += (jnp.asarray(boxes, jnp.float32),
                     jnp.asarray(yaw, jnp.float32))

    # Inner lax.map bounds device memory (vmap over batch_size-pair
    # sub-batches inside one executable); the outer python loop bounds the
    # per-dispatch D2H transfer (the tunnel moves ~50-100 MB chunks far more
    # reliably than one multi-GiB fetch — CLAUDE.md transfer traps).
    inner = max(16, min(256, (1 << 22) // (H * W)))
    fn = jax.jit(partial(jax.lax.map, render_one, batch_size=inner))
    P = c2w.shape[0]
    out = np.empty((P, H, W, 3), dtype=np.uint8)
    for s in range(0, P, chunk_pairs):
        e = min(s + chunk_pairs, P)
        out[s:e] = np.asarray(
            fn(jax.tree.map(lambda x: x[s:e], operands))
        ).reshape(e - s, H, W, 3)
    return out


def _chair_boxes(rng: np.random.Generator) -> np.ndarray:
    """Randomized chair: seat slab + backrest slab + four thin legs.
    All inside a radius-~1.3 sphere around the origin (the same
    bounding-sphere radius used for the sphere category works)."""
    seat_h = rng.uniform(-0.15, 0.05)          # seat top z
    sx = rng.uniform(0.38, 0.55)               # seat half-width (x)
    sy = rng.uniform(0.38, 0.55)               # seat half-depth (y)
    seat_t = rng.uniform(0.04, 0.08)           # seat half-thickness
    back_h = rng.uniform(0.5, 0.85)            # backrest height above seat
    back_t = rng.uniform(0.04, 0.08)           # backrest half-thickness
    leg_t = rng.uniform(0.035, 0.06)           # leg half-thickness
    leg_len = rng.uniform(0.5, 0.75)           # leg length below seat
    boxes = [
        # seat
        ([0.0, 0.0, seat_h - seat_t], [sx, sy, seat_t]),
        # backrest at -y edge
        ([0.0, -sy + back_t, seat_h + back_h / 2.0],
         [sx, back_t, back_h / 2.0]),
    ]
    lx, ly = sx - leg_t, sy - leg_t
    for dx in (-lx, lx):
        for dy in (-ly, ly):
            boxes.append(([dx, dy, seat_h - 2 * seat_t - leg_len / 2.0],
                          [leg_t, leg_t, leg_len / 2.0]))
    return np.array([(np.asarray(c, np.float64), np.asarray(h, np.float64))
                     for c, h in boxes])


def synthetic_scene(
    n_objects: int = 3,
    n_views: int = 8,
    H: int = 32,
    W: int = 32,
    focal: Optional[float] = None,
    cam_distance: float = 4.0,
    seed: int = 0,
    pattern: bool = False,
    geometry: str = "sphere",
    backend: str = "numpy",
    params_only: bool = False,
) -> Dict[str, np.ndarray]:
    """Build an in-memory multi-object scene.

    Returns a dict with the same fields :class:`SRNDataset` exposes:
    ``images`` (N,V,H,W,3) uint8, ``poses`` (N,V,4,4) f32, ``focals`` (N,) f32,
    plus suggested ``near``/``far`` bounds.

    ``backend="jax"`` renders every (object, view) pair on the default jax
    device via :func:`_render_pairs_jax` — identical camera/shape/RNG draws,
    f32 math instead of f64 (pixel values can differ by ±1 uint8 gray level
    at quantization edges). Use it for full-scale splits where the numpy
    path's per-view python loop costs minutes-to-hours of the single host
    core; the default stays "numpy" so existing tests/caches are untouched.

    ``params_only=True`` skips rendering entirely and returns poses +
    per-object generation parameters (``radii``/``albedos``, plus
    ``boxes``/``yaws`` for chairs) — the inputs a device-side GT renderer
    (:func:`make_gt_view_renderer`) needs. The parameter draws are
    identical to the rendering path's (same RNG order), so a params-only
    scene describes exactly the images the full call would produce.
    """
    if geometry not in ("sphere", "chair"):
        raise ValueError(f"unknown geometry {geometry!r}")
    if backend not in ("numpy", "jax"):
        raise ValueError(f"unknown backend {backend!r}")
    rng = np.random.default_rng(seed)
    focal = focal if focal is not None else 1.2 * W
    radii = rng.uniform(0.7, 1.3, size=n_objects)
    albedos = rng.uniform(0.1, 0.9, size=(n_objects, 3))
    if geometry == "chair":
        chairs = [_chair_boxes(rng) for _ in range(n_objects)]
        yaws = rng.uniform(0.0, 2.0 * np.pi, size=n_objects)

    # Views on a tilted circle around the origin.
    azimuths = np.linspace(0, 2 * np.pi, n_views, endpoint=False)
    elevations = rng.uniform(0.15, 0.55, size=n_views)

    poses = np.zeros((n_objects, n_views, 4, 4), dtype=np.float32)
    c2ws = np.zeros((n_views, 4, 4), dtype=np.float64)
    for vi, (az, el) in enumerate(zip(azimuths, elevations)):
        cam = cam_distance * np.array(
            [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)]
        )
        c2ws[vi] = _look_at(cam, np.zeros(3), np.array([0.0, 0.0, 1.0]))
        poses[:, vi] = c2ws[vi].astype(np.float32)

    if params_only:
        images = None
    elif backend == "jax":
        # One flattened (object, view) pair axis; camera vi repeats per
        # object, per-object params repeat per view — matching the numpy
        # loop's (oi, vi) assignment exactly.
        pair_c2w = np.broadcast_to(
            c2ws[None], (n_objects, n_views, 4, 4)).reshape(-1, 4, 4)
        pair_alb = np.repeat(albedos, n_views, axis=0)
        if geometry == "chair":
            flat = _render_pairs_jax(
                H, W, focal, pair_c2w, pair_alb, pattern, geometry,
                boxes=np.repeat(np.stack(chairs), n_views, axis=0),
                yaw=np.repeat(yaws, n_views))
        else:
            flat = _render_pairs_jax(
                H, W, focal, pair_c2w, pair_alb, pattern, geometry,
                radius=np.repeat(radii, n_views))
        images = flat.reshape(n_objects, n_views, H, W, 3)
    else:
        images = np.zeros((n_objects, n_views, H, W, 3), dtype=np.uint8)
        for vi in range(n_views):
            c2w = c2ws[vi]
            for oi in range(n_objects):
                if geometry == "chair":
                    img = _render_boxes(H, W, focal, c2w, chairs[oi],
                                        albedos[oi], yaws[oi],
                                        pattern=pattern)
                else:
                    img = _render_sphere(H, W, focal, c2w, radii[oi],
                                         albedos[oi], pattern=pattern)
                images[oi, vi] = np.round(img * 255.0).astype(np.uint8)

    out = {
        "images": images,
        "poses": poses,
        "focals": np.full((n_objects,), focal, dtype=np.float32),
        "H": H,
        "W": W,
        "near": float(cam_distance - 1.8),
        "far": float(cam_distance + 1.8),
        "radii": radii,
        "albedos": albedos,
        "pattern": pattern,
        "geometry": geometry,
    }
    if geometry == "chair":
        out["boxes"] = np.stack(chairs).astype(np.float32)  # (N, B, 2, 3)
        out["yaws"] = yaws.astype(np.float32)
    if params_only:
        out.pop("images")
    return out


def synthetic_scene_cached(cache_dir: str, **kwargs) -> Dict[str, np.ndarray]:
    """:func:`synthetic_scene` with a disk cache.

    Full-scale protocols regenerate the same category every run — at real
    SRN sizes (2,458 objects x 50 views or 704 x 250 at 128px) the analytic
    render costs 6-45 min of the single host core per split. The cache key
    is the full generation parameter set; images load back memory-mapped
    (uint8, page-cache backed), so a cached full split is available in
    milliseconds and only the pages a run touches become resident."""
    sig = dict(kwargs)
    key = "_".join(f"{k}-{sig[k]}" for k in sorted(sig))
    path = os.path.join(cache_dir, key)
    meta_path = os.path.join(path, "meta.npz")
    if not os.path.exists(meta_path):
        scene = synthetic_scene(**kwargs)
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "images.npy"), scene["images"])
        # meta.npz is written LAST: its presence marks a complete entry
        # (a run interrupted mid-write never half-loads).
        np.savez(meta_path,
                 **{k: v for k, v in scene.items() if k != "images"})
        scene["images"] = np.load(os.path.join(path, "images.npy"),
                                  mmap_mode="r")
        return scene
    meta = np.load(meta_path)
    scene = {k: meta[k] for k in meta.files}
    for k in ("H", "W"):
        scene[k] = int(scene[k])
    for k in ("near", "far"):
        scene[k] = float(scene[k])
    if "geometry" in scene:   # newer entries carry generation params too
        scene["geometry"] = str(scene["geometry"])
        scene["pattern"] = bool(scene["pattern"])
    scene["images"] = np.load(os.path.join(path, "images.npy"), mmap_mode="r")
    return scene


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
