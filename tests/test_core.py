"""Unit tests for the pure rendering core, validated against independent
numpy implementations of the reference formulas (``src/utils.py:10-47``,
``src/model.py:4-7``) — golden math, not ported code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codenerf_tpu.core.encoding import positional_encoding
from codenerf_tpu.core.rays import camera_rays, pixel_rays
from codenerf_tpu.core.render import composite
from codenerf_tpu.core.sampling import (
    fixed_zvals,
    sample_pdf,
    stratified_zvals,
    union_sorted_zvals,
)
from codenerf_tpu.core.poses import exp_se3, refine_pose


# --------------------------------------------------------------- encoding
def test_pe_output_dim_and_values(rng):
    x = rng.standard_normal((5, 3)).astype(np.float32)
    out = np.asarray(positional_encoding(jnp.asarray(x), 10))
    assert out.shape == (5, 63)  # 3 + 6*10, SURVEY §2.2
    # channel order: [x | sin(2^0 x)..sin(2^9 x) | cos(...)], freq-major
    np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)
    expected_sin = np.concatenate(
        [np.sin((2.0 ** i) * x) for i in range(10)], axis=-1
    )
    expected_cos = np.concatenate(
        [np.cos((2.0 ** i) * x) for i in range(10)], axis=-1
    )
    np.testing.assert_allclose(out[:, 3:33], expected_sin, atol=1e-5)
    np.testing.assert_allclose(out[:, 33:], expected_cos, atol=1e-5)


def test_pe_degree_zero_identity(rng):
    x = rng.standard_normal((4, 3)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(positional_encoding(jnp.asarray(x), 0)), x)


# ------------------------------------------------------------------- rays
def _numpy_reference_rays(H, W, focal, c2w):
    """Independent numpy transcription of the documented ray math
    (pixel grid, OpenGL camera, src/utils.py:10-19 semantics)."""
    j, i = np.meshgrid(np.arange(H, dtype=np.float64),
                       np.arange(W, dtype=np.float64), indexing="ij")
    dirs = np.stack([(i - W * 0.5) / focal, -(j - H * 0.5) / focal,
                     -np.ones_like(i)], -1)
    rays_d = dirs @ np.asarray(c2w)[:3, :3].T
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(np.asarray(c2w)[:3, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), viewdirs.reshape(-1, 3)


def _random_pose(rng):
    # random rotation via QR + random translation
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    c2w = np.eye(4)
    c2w[:3, :3] = q
    c2w[:3, 3] = rng.standard_normal(3)
    return c2w.astype(np.float32)


def test_camera_rays_match_reference_math(rng):
    H, W, focal = 8, 6, 10.0
    c2w = _random_pose(rng)
    ro, vd = camera_rays(H, W, focal, jnp.asarray(c2w))
    ro_ref, vd_ref = _numpy_reference_rays(H, W, focal, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vd), vd_ref, atol=1e-5)


def test_pixel_rays_consistent_with_camera_rays(rng):
    H, W, focal = 8, 6, 10.0
    c2w = _random_pose(rng)
    ro_all, vd_all = camera_rays(H, W, focal, jnp.asarray(c2w))
    # pick pixels and check pixel_rays gives identical rays
    idx = rng.integers(0, H * W, 10)
    u = (idx % W).astype(np.float32)
    v = (idx // W).astype(np.float32)
    uv = jnp.asarray(np.stack([u, v], -1))
    c2w_b = jnp.broadcast_to(jnp.asarray(c2w)[:3, :], (10, 3, 4))
    focal_b = jnp.full((10,), focal)
    ro, vd = pixel_rays(uv, focal_b, c2w_b, H, W)
    np.testing.assert_allclose(np.asarray(ro), np.asarray(ro_all)[idx], atol=1e-5)
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vd_all)[idx], atol=1e-5)


def test_viewdirs_unit_norm(rng):
    c2w = _random_pose(rng)
    _, vd = camera_rays(5, 7, 9.0, jnp.asarray(c2w))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(vd), axis=-1), 1.0, atol=1e-5
    )


# --------------------------------------------------------------- sampling
def test_fixed_zvals_linspace():
    z = np.asarray(fixed_zvals(0.8, 1.8, 11))
    np.testing.assert_allclose(z, np.linspace(0.8, 1.8, 11), atol=1e-6)


def test_stratified_bounds_and_shapes():
    key = jax.random.PRNGKey(0)
    near, far, n = 0.8, 1.8, 96
    half = (far - near) / (2 * n)
    z_shared = stratified_zvals(key, near, far, n, shared=True)
    assert z_shared.shape == (n,)
    z = stratified_zvals(key, near, far, n, num_rays=32)
    assert z.shape == (32, n)
    for arr in (np.asarray(z_shared)[None], np.asarray(z)):
        assert arr.min() >= near + half - 1e-6
        assert arr.max() <= far + 1e-6
        assert (np.diff(arr, axis=-1) > 0).all()  # strictly increasing


def test_stratified_per_ray_jitter_differs():
    z = np.asarray(stratified_zvals(jax.random.PRNGKey(1), 0.0, 1.0, 16, num_rays=4))
    assert not np.allclose(z[0], z[1])


def test_sample_pdf_concentrates_mass():
    # all weight in one bin -> all samples inside that bin
    R, M = 4, 10
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, M + 1), (R, M + 1))
    weights = np.zeros((R, M), np.float32)
    weights[:, 3] = 1.0
    z = np.asarray(
        sample_pdf(jax.random.PRNGKey(2), bins, jnp.asarray(weights), 64)
    )
    assert z.shape == (R, 64)
    inside = (z >= 0.3 - 1e-3) & (z <= 0.4 + 1e-3)
    assert inside.mean() > 0.98


def test_sample_pdf_uniform_weights_cover_range():
    R, M = 2, 8
    bins = jnp.broadcast_to(jnp.linspace(2.0, 3.0, M + 1), (R, M + 1))
    weights = jnp.ones((R, M))
    z = np.asarray(sample_pdf(jax.random.PRNGKey(3), bins, weights, 256))
    assert z.min() >= 2.0 and z.max() <= 3.0
    # roughly uniform: mean near 2.5
    assert abs(z.mean() - 2.5) < 0.05


def test_sample_pdf_deterministic_sorted():
    R, M = 3, 6
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, M + 1), (R, M + 1))
    weights = jnp.ones((R, M))
    z = np.asarray(sample_pdf(jax.random.PRNGKey(0), bins, weights, 16,
                              deterministic=True))
    assert (np.diff(z, axis=-1) >= 0).all()


def test_union_sorted():
    zc = jnp.asarray([[0.1, 0.5, 0.9]])
    zf = jnp.asarray([[0.3, 0.7]])
    out = np.asarray(union_sorted_zvals(zc, zf))
    np.testing.assert_allclose(out, [[0.1, 0.3, 0.5, 0.7, 0.9]], atol=1e-7)


# -------------------------------------------------------------- composite
def _numpy_composite(sigmas, rgbs, z_vals, white_bg=True):
    """Independent transcription of the documented compositing math
    (src/utils.py:34-47)."""
    z = np.broadcast_to(z_vals, sigmas.shape)
    deltas = np.concatenate(
        [z[..., 1:] - z[..., :-1], np.full_like(z[..., :1], 1e10)], -1
    )
    alphas = 1 - np.exp(-sigmas * deltas)
    trans = np.concatenate(
        [np.ones_like(alphas[..., :1]), 1 - alphas + 1e-10], -1
    )
    accum = np.cumprod(trans, -1)[..., :-1]
    w = alphas * accum
    rgb = (w[..., None] * rgbs).sum(-2)
    depth = (w * z).sum(-1)
    if white_bg:
        rgb = rgb + (1 - w.sum(-1))[..., None]
    return rgb, depth, w


def test_composite_matches_reference_math(rng):
    R, S = 7, 12
    sigmas = rng.uniform(0, 5, (R, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (R, S, 3)).astype(np.float32)
    z = np.sort(rng.uniform(0.5, 2.0, (S,))).astype(np.float32)
    out = composite(jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(z))
    rgb_ref, depth_ref, w_ref = _numpy_composite(sigmas, rgbs, z)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), depth_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.weights), w_ref, atol=1e-5)


def test_composite_empty_ray_is_white():
    z = jnp.linspace(0.5, 1.5, 8)
    out = composite(jnp.zeros((2, 8)), jnp.zeros((2, 8, 3)), z, white_bg=True)
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), 0.0, atol=1e-6)


def test_composite_opaque_sample_dominates():
    # huge density at sample 3 -> rgb == that sample's color, depth == its z
    z = jnp.linspace(1.0, 2.0, 8)
    sigmas = np.zeros((1, 8), np.float32)
    sigmas[0, 3] = 1e8
    rgbs = np.zeros((1, 8, 3), np.float32)
    rgbs[0, 3] = [0.2, 0.5, 0.7]
    out = composite(jnp.asarray(sigmas), jnp.asarray(rgbs), z)
    np.testing.assert_allclose(np.asarray(out.rgb)[0], [0.2, 0.5, 0.7], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth)[0], float(z[3]), atol=1e-4)


def test_composite_per_ray_zvals(rng):
    R, S = 3, 10
    sigmas = rng.uniform(0, 3, (R, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (R, S, 3)).astype(np.float32)
    z = np.sort(rng.uniform(0.5, 2.0, (R, S)), axis=-1).astype(np.float32)
    out = composite(jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(z))
    rgb_ref, _, _ = _numpy_composite(sigmas, rgbs, z)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb_ref, atol=1e-5)


# ------------------------------------------------------------------ poses
def test_exp_se3_identity():
    T = np.asarray(exp_se3(jnp.zeros(6)))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-6)


def test_exp_se3_pure_translation():
    T = np.asarray(exp_se3(jnp.asarray([0.0, 0, 0, 1.0, 2.0, 3.0])))
    expected = np.eye(4)
    expected[:3, 3] = [1, 2, 3]
    np.testing.assert_allclose(T, expected, atol=1e-6)


def test_exp_se3_rotation_is_orthonormal(rng):
    xi = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    T = np.asarray(exp_se3(xi))
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R) - 1) < 1e-5


def test_refine_pose_gradient_flows():
    base = jnp.eye(4)

    def f(xi):
        return jnp.sum(refine_pose(xi, base)[:3, 3] ** 2)

    g = jax.grad(f)(jnp.asarray([0.0, 0, 0, 1.0, 0, 0]))
    assert np.isfinite(np.asarray(g)).all()
    assert abs(float(g[3]) - 2.0) < 1e-4


# ------------------------------------------------------- sphere bounds
def test_ray_sphere_bounds_hit_and_miss():
    from codenerf_tpu.core.rays import ray_sphere_bounds

    ro = jnp.asarray([[0.0, 0.0, 4.0], [0.0, 0.0, 4.0]])
    vd = jnp.asarray([[0.0, 0.0, -1.0],   # straight at the sphere
                      [1.0, 0.0, 0.0]])   # misses entirely
    t0, t1 = ray_sphere_bounds(ro, vd, near=1.0, far=8.0, radius=1.0)
    # hit: analytic [3, 5]
    np.testing.assert_allclose(float(t0[0]), 3.0, atol=1e-5)
    np.testing.assert_allclose(float(t1[0]), 5.0, atol=1e-5)
    # miss: degenerate sliver at near (shape-static, not culled)
    assert float(t0[1]) == 1.0
    assert float(t1[1]) > float(t0[1])
    assert float(t1[1]) < 1.1


def test_ray_sphere_bounds_clipped_to_slab():
    from codenerf_tpu.core.rays import ray_sphere_bounds

    ro = jnp.asarray([[0.0, 0.0, 4.0]])
    vd = jnp.asarray([[0.0, 0.0, -1.0]])
    t0, t1 = ray_sphere_bounds(ro, vd, near=3.5, far=4.5, radius=1.0)
    np.testing.assert_allclose(float(t0[0]), 3.5, atol=1e-5)
    np.testing.assert_allclose(float(t1[0]), 4.5, atol=1e-5)


def test_stratified_per_ray_bounds():
    key = jax.random.PRNGKey(0)
    near = jnp.asarray([1.0, 2.0, 3.0])
    far = jnp.asarray([2.0, 4.0, 3.5])
    z = np.asarray(stratified_zvals(key, near, far, 16, num_rays=3))
    assert z.shape == (3, 16)
    for i in range(3):
        assert z[i].min() >= float(near[i])
        assert z[i].max() <= float(far[i]) + 1e-6
        assert (np.diff(z[i]) > 0).all()
    # per-ray bounds reject shared mode
    import pytest

    with pytest.raises(ValueError):
        stratified_zvals(key, near, far, 16, num_rays=3, shared=True)
