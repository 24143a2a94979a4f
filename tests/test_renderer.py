"""Renderer-level tests: chunked image rendering consistency, hierarchical
fine pass behavior, white-background plumbing, determinism."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from codenerf_tpu.config import NetConfig, RenderConfig
from codenerf_tpu.core.rays import camera_rays
from codenerf_tpu.models.codenerf import init_codenerf
from codenerf_tpu.renderer import render_image, render_rays


def _setup():
    cfg = NetConfig(shape_blocks=1, texture_blocks=1, W=32,
                    num_xyz_freq=2, num_dir_freq=1, latent_dim=8)
    rcfg = RenderConfig(n_samples=12, near=2.0, far=6.0)
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    code = jax.random.normal(jax.random.PRNGKey(1), (8,)) * 0.1
    c2w = jnp.eye(4).at[2, 3].set(4.0)
    return cfg, rcfg, params, code, c2w


def test_render_image_equals_chunked_render_rays():
    cfg, rcfg, params, code, c2w = _setup()
    H = W = 8
    img = render_image(params, cfg, rcfg, H, W, 10.0, c2w, code, code,
                       key=None, chunk=16, compute_dtype=jnp.float32)
    ro, vd = camera_rays(H, W, 10.0, c2w)
    res = render_rays(params, cfg, rcfg, ro, vd, code, code, key=None,
                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(img).reshape(-1, 3),
                               np.asarray(res.final.rgb), atol=1e-5)


def test_deterministic_render_is_repeatable():
    cfg, rcfg, params, code, c2w = _setup()
    a = render_image(params, cfg, rcfg, 8, 8, 10.0, c2w, code, code,
                     key=None, chunk=64, compute_dtype=jnp.float32)
    b = render_image(params, cfg, rcfg, 8, 8, 10.0, c2w, code, code,
                     key=None, chunk=64, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stochastic_render_differs_by_key():
    cfg, rcfg, params, code, c2w = _setup()
    ro, vd = camera_rays(8, 8, 10.0, c2w)
    r1 = render_rays(params, cfg, rcfg, ro, vd, code, code,
                     key=jax.random.PRNGKey(0), compute_dtype=jnp.float32)
    r2 = render_rays(params, cfg, rcfg, ro, vd, code, code,
                     key=jax.random.PRNGKey(1), compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(r1.final.rgb), np.asarray(r2.final.rgb))


def test_hierarchical_returns_both_passes_with_more_samples():
    cfg, rcfg, params, code, c2w = _setup()
    rcfg = dataclasses.replace(rcfg, n_importance=8)
    ro, vd = camera_rays(4, 4, 10.0, c2w)
    res = render_rays(params, cfg, rcfg, ro, vd, code, code,
                      key=jax.random.PRNGKey(0), compute_dtype=jnp.float32)
    assert res.fine is not None
    assert res.coarse.weights.shape == (16, 12)
    assert res.fine.weights.shape == (16, 12 + 8)  # union of coarse+fine
    assert res.final is res.fine


def test_hierarchical_coarse_reuse_matches_explicit_union_eval():
    """The shared-weight fine pass caches the coarse pass's sigma/rgb and
    merge-sorts them with the new samples instead of re-evaluating the MLP
    at the coarse z's. That must equal the explicit union re-evaluation —
    forced here by share_fine_weights=False with fine_params=params (the
    same weights through the old full-re-eval route)."""
    cfg, rcfg, params, code, c2w = _setup()
    ro, vd = camera_rays(8, 8, 10.0, c2w)
    for key in (None, jax.random.PRNGKey(3)):
        rc = dataclasses.replace(rcfg, n_importance=8)
        reused = render_rays(params, cfg, rc, ro, vd, code, code, key=key,
                             compute_dtype=jnp.float32)
        rc_explicit = dataclasses.replace(rc, share_fine_weights=False)
        explicit = render_rays(params, cfg, rc_explicit, ro, vd, code, code,
                               key=key, fine_params=params,
                               compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(reused.coarse.rgb),
                                   np.asarray(explicit.coarse.rgb),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(reused.fine.rgb),
                                   np.asarray(explicit.fine.rgb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(reused.fine.depth),
                                   np.asarray(explicit.fine.depth),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(reused.fine.weights),
                                   np.asarray(explicit.fine.weights),
                                   atol=1e-5)


def test_hierarchical_coarse_reuse_gradients_match():
    """Gradients through the reused formulation equal the explicit
    re-evaluation's: same function, evaluated once per distinct z."""
    cfg, rcfg, params, code, c2w = _setup()
    ro, vd = camera_rays(4, 4, 10.0, c2w)
    rc = dataclasses.replace(rcfg, n_importance=8)
    rc_explicit = dataclasses.replace(rc, share_fine_weights=False)
    key = jax.random.PRNGKey(5)

    def loss_reused(p):
        res = render_rays(p, cfg, rc, ro, vd, code, code, key=key,
                          compute_dtype=jnp.float32)
        return (jnp.mean(res.fine.rgb ** 2) + jnp.mean(res.coarse.rgb ** 2))

    def loss_explicit(p):
        res = render_rays(p, cfg, rc_explicit, ro, vd, code, code, key=key,
                          fine_params=p, compute_dtype=jnp.float32)
        return (jnp.mean(res.fine.rgb ** 2) + jnp.mean(res.coarse.rgb ** 2))

    g1 = jax.grad(loss_reused)(params)
    g2 = jax.grad(loss_explicit)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_white_vs_black_background():
    cfg, rcfg, params, code, c2w = _setup()
    ro, vd = camera_rays(4, 4, 10.0, c2w)
    # Zero-density model region: push rays away from any learned density by
    # using a fresh model with near-zero sigma output.
    params = jax.tree_util.tree_map(lambda x: x * 0.0, params)
    res_w = render_rays(params, cfg, rcfg, ro, vd, code, code, key=None,
                        compute_dtype=jnp.float32)
    rcfg_b = dataclasses.replace(rcfg, white_bg=False)
    res_b = render_rays(params, cfg, rcfg_b, ro, vd, code, code, key=None,
                        compute_dtype=jnp.float32)
    # sigma = softplus(0) = log 2 > 0, so some density exists; white bg adds
    # (1 - acc) per channel
    diff = np.asarray(res_w.final.rgb - res_b.final.rgb)
    expected = (1.0 - np.asarray(res_w.final.acc))[:, None]
    np.testing.assert_allclose(diff, np.broadcast_to(expected, diff.shape),
                               atol=1e-5)


def test_fine_pass_sharpens_depth():
    """With hierarchical sampling, fine depth estimates should have no more
    variance across rays hitting the same surface than coarse ones (sanity:
    runs, finite, within near/far)."""
    cfg, rcfg, params, code, c2w = _setup()
    rcfg = dataclasses.replace(rcfg, n_importance=16)
    ro, vd = camera_rays(8, 8, 10.0, c2w)
    res = render_rays(params, cfg, rcfg, ro, vd, code, code,
                      key=jax.random.PRNGKey(0), compute_dtype=jnp.float32)
    d = np.asarray(res.fine.depth)
    assert np.isfinite(d).all()
    acc = np.asarray(res.fine.acc)
    hit = acc > 0.5
    if hit.any():
        assert d[hit].min() >= rcfg.near - 0.1
        assert d[hit].max() <= rcfg.far + 0.1


def test_sphere_bounded_sampling_improves_sample_placement():
    """With a bounding sphere configured, all samples must lie inside the
    per-ray sphere interval, and rendering still works end to end."""
    cfg, rcfg, params, code, c2w = _setup()
    rcfg_b = dataclasses.replace(rcfg, bound_sphere_radius=1.0)
    ro, vd = camera_rays(8, 8, 10.0, c2w)
    res = render_rays(params, cfg, rcfg_b, ro, vd, code, code,
                      key=jax.random.PRNGKey(0), compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(res.final.rgb)).all()

    from codenerf_tpu.core.rays import ray_sphere_bounds
    from codenerf_tpu.core.sampling import stratified_zvals

    t0, t1 = ray_sphere_bounds(ro, vd, rcfg.near, rcfg.far, 1.0)
    z = stratified_zvals(jax.random.PRNGKey(1), t0, t1, rcfg.n_samples,
                         num_rays=ro.shape[0])
    z = np.asarray(z)
    assert (z >= np.asarray(t0)[:, None] - 1e-5).all()
    assert (z <= np.asarray(t1)[:, None] + 1e-5).all()
    # central rays hit the sphere: their interval is much tighter than the slab
    hit_width = np.asarray(t1 - t0)
    assert hit_width.min() < 0.8 * (rcfg.far - rcfg.near)


def test_render_image_non_divisible_chunk_autopicks():
    """96x96-style sizes where the requested chunk doesn't divide H*W must
    still render (largest dividing chunk is chosen automatically)."""
    from codenerf_tpu.renderer import pick_chunk

    assert pick_chunk(16384, 4096) == 4096
    assert pick_chunk(9216, 4096) == 3072  # 96x96
    assert pick_chunk(576, 4096) == 576
    assert 2304 % pick_chunk(2304, 1000) == 0
    cfg, rcfg, params, code, c2w = _setup()
    img = render_image(params, cfg, rcfg, 6, 6, 10.0, c2w, code, code,
                       key=None, chunk=5,  # 5 does not divide 36
                       compute_dtype=jnp.float32)
    assert img.shape == (6, 6, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_prime_ray_counts_pad_instead_of_degrading():
    """A 127x127-style prime ray count must NOT degrade to chunk=1 (16K
    sequential lax.map steps); it pads the tail chunk and slices (ADVICE r1).
    The padded render must be numerically identical to the direct one."""
    from codenerf_tpu.renderer import chunk_plan, pick_chunk

    chunk, n_chunks, n_padded = chunk_plan(127 * 127, 4096)
    assert chunk == 4096 and n_chunks == 4 and n_padded == 16384
    assert pick_chunk(127 * 127, 4096) == 4096

    cfg, rcfg, params, code, c2w = _setup()
    H = W = 7  # 49 rays: divisors 7, 49 only; chunk 16 -> padded to 64
    assert chunk_plan(49, 16) == (16, 4, 64)
    img = render_image(params, cfg, rcfg, H, W, 10.0, c2w, code, code,
                       key=None, chunk=16, compute_dtype=jnp.float32)
    ro, vd = camera_rays(H, W, 10.0, c2w)
    res = render_rays(params, cfg, rcfg, ro, vd, code, code, key=None,
                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(img).reshape(-1, 3),
                               np.asarray(res.final.rgb), atol=1e-5)
