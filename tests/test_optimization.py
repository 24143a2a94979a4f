"""Tests for the test-time optimization subsystem: latent-code optimization
(the reference optimize.py protocol), joint pose+code refinement, and
shape/texture editing."""

import jax
import jax.numpy as jnp
import numpy as np

from codenerf_tpu.core.poses import exp_se3
from codenerf_tpu.models.codes import mean_code
from codenerf_tpu.optimization.codes_opt import CodeOptimizer
from codenerf_tpu.optimization.editing import (
    interpolate_codes,
    render_code_grid,
    render_shape_texture_matrix,
)
from codenerf_tpu.optimization.pose_opt import optimize_pose_and_codes


def _images_f32(scene, obj):
    return scene["images"][obj].astype(np.float32) / 255.0


def _make_optimizer(trained):
    tr, scene, hp = trained
    t = tr.state.trainables
    return (
        CodeOptimizer(
            params=t["params"],
            hp=hp,
            mean_shape=mean_code(t["shape_codes"]),
            mean_texture=mean_code(t["texture_codes"]),
            chunk=256,
        ),
        tr,
        scene,
        hp,
    )


def test_code_optimization_improves_psnr(trained):
    opt, tr, scene, hp = _make_optimizer(trained)
    obj = 1
    imgs, poses = _images_f32(scene, obj), scene["poses"][obj]
    result = opt.optimize_object(
        imgs, poses, float(scene["focals"][obj]), tgt_views=[0],
        key=jax.random.PRNGKey(0), num_opts=60, lr=1e-2, lr_half_interval=25,
    )
    hist = np.asarray(result.psnr_history)
    assert hist.shape == (60,)
    assert hist[-5:].mean() > hist[:5].mean() + 2.0, hist
    assert result.shape_code.shape == opt.mean_shape.shape


def test_code_opt_then_eval_on_heldout_views(trained):
    opt, tr, scene, hp = _make_optimizer(trained)
    obj = 0
    imgs, poses = _images_f32(scene, obj), scene["poses"][obj]
    focal = float(scene["focals"][obj])
    res = opt.optimize_object(
        imgs, poses, focal, tgt_views=[0], key=jax.random.PRNGKey(1),
        num_opts=80, lr=1e-2, lr_half_interval=40,
    )
    ev = opt.evaluate_object(
        imgs, poses, focal, exclude_views=[0],
        shape_code=res.shape_code, texture_code=res.texture_code,
        key=jax.random.PRNGKey(2),
    )
    assert list(ev["views"]) == list(range(1, imgs.shape[0]))
    assert ev["psnr"].shape == ev["ssim"].shape == (imgs.shape[0] - 1,)
    # optimized codes must beat the mean-code init on held-out views
    ev0 = opt.evaluate_object(
        imgs, poses, focal, exclude_views=[0],
        shape_code=opt.mean_shape, texture_code=opt.mean_texture,
        key=jax.random.PRNGKey(2),
    )
    assert ev["psnr"].mean() > ev0["psnr"].mean() + 1.0
    assert (ev["ssim"] <= 1.0 + 1e-6).all()


def test_batched_objects_match_sequential(trained):
    """optimize_objects/evaluate_objects (G objects, ONE dispatch each)
    must reproduce the per-object optimize_object/evaluate_object loop:
    same per-object RNG streams, same math — batching is wall-clock only."""
    opt, tr, scene, hp = _make_optimizer(trained)
    # Three entries from the two fixture objects (one repeated with its
    # own key) exercise G > n_distinct and per-object stream isolation.
    objs = [0, 1, 0]
    imgs = np.stack([_images_f32(scene, o) for o in objs])
    poses = np.stack([scene["poses"][o] for o in objs])
    focals = np.asarray([scene["focals"][o] for o in objs], np.float32)
    keys = jnp.stack([jax.random.PRNGKey(40 + g) for g in range(len(objs))])
    ekeys = jnp.stack([jax.random.PRNGKey(90 + g) for g in range(len(objs))])
    kwargs = dict(num_opts=12, lr=1e-2, lr_half_interval=6)

    batch = opt.optimize_objects(imgs, poses, focals, tgt_views=[0, 2],
                                 keys=keys, **kwargs)
    assert batch.psnr_history.shape == (12, len(objs))
    ev = opt.evaluate_objects(
        imgs, poses, focals, exclude_views=[0, 2],
        shape_codes=batch.shape_codes, texture_codes=batch.texture_codes,
        keys=ekeys)
    assert ev["psnr"].shape == (len(objs), imgs.shape[1] - 2)

    for g, o in enumerate(objs):
        seq = opt.optimize_object(
            imgs[g], poses[g], float(focals[g]), tgt_views=[0, 2],
            key=keys[g], **kwargs)
        np.testing.assert_allclose(np.asarray(batch.shape_codes[g]),
                                   np.asarray(seq.shape_code), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batch.psnr_history[:, g]),
                                   np.asarray(seq.psnr_history), atol=1e-3)
        sev = opt.evaluate_object(
            imgs[g], poses[g], float(focals[g]), exclude_views=[0, 2],
            shape_code=seq.shape_code, texture_code=seq.texture_code,
            key=ekeys[g])
        np.testing.assert_allclose(ev["psnr"][g], sev["psnr"], atol=1e-3)
        np.testing.assert_allclose(ev["ssim"][g], sev["ssim"], atol=1e-4)
    # the repeated object with a different key must still land on a
    # (slightly) different trajectory than its twin — streams are distinct
    assert not np.allclose(np.asarray(batch.shape_codes[0]),
                           np.asarray(batch.shape_codes[2]))


def test_batched_objects_padded_rays(trained):
    """Batched path with a ray count that does not divide the chunk: the
    XLA masked-pad route must keep per-object parity."""
    opt, tr, scene, hp = _make_optimizer(trained)
    from codenerf_tpu.optimization import codes_opt

    G, N = 2, 200  # chunk=256 -> padded single chunk per object
    rng = np.random.default_rng(5)
    imgs = np.stack([_images_f32(scene, o) for o in (0, 1)])
    ro, vd, gt = codes_opt._flat_target_rays_multi(
        imgs, np.stack([scene["poses"][o] for o in (0, 1)]),
        np.asarray([scene["focals"][0], scene["focals"][1]], np.float32),
        [1], 16, 16)
    sel = rng.choice(ro.shape[1], N, replace=False)
    ro, vd, gt = ro[:, sel], vd[:, sel], gt[:, sel]
    keys = jnp.stack([jax.random.PRNGKey(7), jax.random.PRNGKey(8)])
    kwargs = dict(num_opts=6, lr=1e-2, lr_half_interval=3, chunk=256)
    batch = codes_opt.optimize_codes_batch(
        opt.params, hp, ro, vd, gt, opt.mean_shape, opt.mean_texture,
        keys, **kwargs)
    for g in range(G):
        seq = codes_opt.optimize_codes(
            opt.params, hp, ro[g], vd[g], gt[g], opt.mean_shape,
            opt.mean_texture, keys[g], **kwargs)
        np.testing.assert_allclose(np.asarray(batch.shape_codes[g]),
                                   np.asarray(seq.shape_code), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batch.psnr_history[:, g]),
                                   np.asarray(seq.psnr_history), atol=1e-3)


def test_codes_opt_with_occupancy_grid(trained):
    """Codes-opt with a category occupancy grid: the grid must actually
    change sample placement (z-intervals tighten), the optimization must
    stay finite and effective, and the batched path must keep per-object
    parity with the sequential one under the grid."""
    import jax.numpy as jnp

    from codenerf_tpu.core.occupancy import OccupancyGrid, grid_cell_centers
    from codenerf_tpu.optimization import codes_opt

    opt, tr, scene, hp = _make_optimizer(trained)
    G = 12
    centers = grid_cell_centers(G, 1.4).reshape(G, G, G, 3)
    occ = jnp.linalg.norm(centers, axis=-1) < 1.1
    grid = OccupancyGrid(occ=occ, radius=jnp.asarray(1.4, jnp.float32))

    imgs = np.stack([_images_f32(scene, o) for o in (0, 1)])
    poses = np.stack([scene["poses"][o] for o in (0, 1)])
    focals = np.asarray([scene["focals"][0], scene["focals"][1]], np.float32)
    ro, vd, gt = codes_opt._flat_target_rays_multi(
        imgs, poses, focals, [0], 16, 16)
    keys = jnp.stack([jax.random.PRNGKey(3), jax.random.PRNGKey(4)])
    kwargs = dict(num_opts=8, lr=1e-2, lr_half_interval=4, chunk=256)

    batch = codes_opt.optimize_codes_batch(
        opt.params, hp, ro, vd, gt, opt.mean_shape, opt.mean_texture,
        keys, occ_grid=grid, **kwargs)
    assert np.isfinite(np.asarray(batch.psnr_history)).all()
    for g in range(2):
        seq = codes_opt.optimize_codes(
            opt.params, hp, ro[g], vd[g], gt[g], opt.mean_shape,
            opt.mean_texture, keys[g], occ_grid=grid, **kwargs)
        np.testing.assert_allclose(np.asarray(batch.shape_codes[g]),
                                   np.asarray(seq.shape_code), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batch.psnr_history[:, g]),
                                   np.asarray(seq.psnr_history), atol=1e-3)
    # the grid changes the trajectory vs no-grid (sample placement moved)
    no_grid = codes_opt.optimize_codes(
        opt.params, hp, ro[0], vd[0], gt[0], opt.mean_shape,
        opt.mean_texture, keys[0], **kwargs)
    assert not np.allclose(np.asarray(no_grid.shape_code),
                           np.asarray(batch.shape_codes[0]))
    # driver plumbing: a CodeOptimizer with the grid evaluates finitely
    opt_occ = CodeOptimizer(
        params=opt.params, hp=hp, mean_shape=opt.mean_shape,
        mean_texture=opt.mean_texture, chunk=256, occ_grid=grid)
    ev = opt_occ.evaluate_object(
        imgs[0], poses[0], float(focals[0]), exclude_views=[0],
        shape_code=batch.shape_codes[0], texture_code=batch.texture_codes[0],
        key=jax.random.PRNGKey(9))
    assert np.isfinite(ev["psnr"]).all()

    import dataclasses as dc
    import pytest

    with pytest.raises(ValueError):
        CodeOptimizer(
            params=opt.params,
            hp=dc.replace(hp, render=dc.replace(hp.render,
                                                shared_jitter=True)),
            mean_shape=opt.mean_shape, mean_texture=opt.mean_texture,
            occ_grid=grid)


def test_eval_overrides_single_optimizer(trained):
    """eval_hp/eval_occ: ONE CodeOptimizer built with opt-time overrides
    (reduced sample budget + occupancy grid) must evaluate bitwise like a
    dedicated full-budget no-grid evaluator — the production-recipe policy
    optimize.py/quality_report encode without a second instance."""
    import dataclasses as dc

    import jax.numpy as jnp

    from codenerf_tpu.core.occupancy import OccupancyGrid, grid_cell_centers

    opt, tr, scene, hp = _make_optimizer(trained)
    G = 8
    centers = grid_cell_centers(G, 1.4).reshape(G, G, G, 3)
    grid = OccupancyGrid(occ=jnp.linalg.norm(centers, axis=-1) < 1.1,
                         radius=jnp.asarray(1.4, jnp.float32))
    opt_hp = dc.replace(hp, render=dc.replace(hp.render, n_samples=6))

    combined = CodeOptimizer(
        params=opt.params, hp=opt_hp, mean_shape=opt.mean_shape,
        mean_texture=opt.mean_texture, chunk=256, occ_grid=grid,
        eval_hp=hp, eval_occ=False)
    plain = CodeOptimizer(
        params=opt.params, hp=hp, mean_shape=opt.mean_shape,
        mean_texture=opt.mean_texture, chunk=256)

    imgs = _images_f32(scene, 0)
    poses, focal = scene["poses"][0], float(scene["focals"][0])
    res = combined.optimize_object(imgs, poses, focal, tgt_views=[0],
                                   key=jax.random.PRNGKey(5), num_opts=6,
                                   lr=1e-2, lr_half_interval=3)
    kw = dict(exclude_views=[0], shape_code=res.shape_code,
              texture_code=res.texture_code, key=jax.random.PRNGKey(9))
    ev_a = combined.evaluate_object(imgs, poses, focal, **kw)
    ev_b = plain.evaluate_object(imgs, poses, focal, **kw)
    np.testing.assert_array_equal(ev_a["psnr"], ev_b["psnr"])
    np.testing.assert_array_equal(ev_a["ssim"], ev_b["ssim"])
    # and the batched sweep honors the same overrides
    ks = jnp.stack([jax.random.PRNGKey(9)])
    ev_ma = combined.evaluate_objects(
        imgs[None], poses[None], np.asarray([focal], np.float32), [0],
        res.shape_code[None], res.texture_code[None], ks)
    ev_mb = plain.evaluate_objects(
        imgs[None], poses[None], np.asarray([focal], np.float32), [0],
        res.shape_code[None], res.texture_code[None], ks)
    np.testing.assert_array_equal(ev_ma["psnr"], ev_mb["psnr"])


def test_pose_optimization_recovers_perturbation(trained):
    opt, tr, scene, hp = _make_optimizer(trained)
    obj, view = 0, 2
    gt_pose = jnp.asarray(scene["poses"][obj, view])
    # perturb: small rotation + translation
    xi_true = jnp.asarray([0.06, -0.04, 0.05, 0.08, -0.06, 0.05])
    bad_pose = exp_se3(xi_true) @ gt_pose
    image = jnp.asarray(_images_f32(scene, obj)[view])
    shape0 = tr.state.trainables["shape_codes"][obj]
    tex0 = tr.state.trainables["texture_codes"][obj]
    result = optimize_pose_and_codes(
        tr.state.trainables["params"], hp, image, bad_pose,
        float(scene["focals"][obj]), shape0, tex0,
        key=jax.random.PRNGKey(3), num_opts=80, lr_pose=5e-3,
        lr_codes=1e-3, lr_half_interval=40, rays_per_step=256,
    )
    hist = np.asarray(result.psnr_history)
    assert hist[-5:].mean() > hist[:5].mean() + 1.0, hist
    # refined pose closer to GT than the perturbed one
    err_before = np.abs(np.asarray(bad_pose - gt_pose)).mean()
    err_after = np.abs(np.asarray(result.c2w - gt_pose)).mean()
    assert err_after < err_before


def test_interpolate_codes_endpoints():
    a, b = jnp.zeros(8), jnp.ones(8)
    grid = interpolate_codes(a, b, 5)
    assert grid.shape == (5, 8)
    np.testing.assert_allclose(np.asarray(grid[0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(grid[-1]), 1.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(grid[2]), 0.5, atol=1e-7)


def test_render_code_grid_and_matrix(trained):
    opt, tr, scene, hp = _make_optimizer(trained)
    t = tr.state.trainables
    s_grid = interpolate_codes(t["shape_codes"][0], t["shape_codes"][1], 3)
    t_grid = interpolate_codes(t["texture_codes"][0], t["texture_codes"][1], 3)
    H, W = scene["H"], scene["W"]
    c2w = jnp.asarray(scene["poses"][0, 0])
    focal = float(scene["focals"][0])
    imgs = render_code_grid(t["params"], hp, s_grid, t_grid, H, W, focal, c2w,
                            chunk=256)
    assert imgs.shape == (3, H, W, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    # endpoint 0 must equal a direct render with object 0's codes
    single = render_code_grid(
        t["params"], hp, t["shape_codes"][:1], t["texture_codes"][:1],
        H, W, focal, c2w, chunk=256,
    )
    np.testing.assert_allclose(np.asarray(imgs[0]), np.asarray(single[0]),
                               atol=1e-5)
    mat = render_shape_texture_matrix(
        t["params"], hp, t["shape_codes"][:2], t["texture_codes"][:2],
        H, W, focal, c2w, chunk=256,
    )
    assert mat.shape == (2, 2, H, W, 3)
    # diagonal entries equal the per-object renders; off-diagonals are swaps
    np.testing.assert_allclose(np.asarray(mat[0, 0]), np.asarray(imgs[0]),
                               atol=1e-5)


def test_code_opt_with_hierarchical_and_bounds(trained):
    """Test-time optimization + eval must work with hierarchical sampling
    and sphere-bounded z-ranges configured (shared fine weights)."""
    import dataclasses

    opt, tr, scene, hp = _make_optimizer(trained)
    hp2 = dataclasses.replace(
        hp, render=dataclasses.replace(hp.render, n_importance=6,
                                       bound_sphere_radius=1.6),
    )
    opt2 = CodeOptimizer(params=opt.params, hp=hp2,
                         mean_shape=opt.mean_shape,
                         mean_texture=opt.mean_texture, chunk=256)
    imgs = _images_f32(scene, 0)
    res = opt2.optimize_object(
        imgs, scene["poses"][0], float(scene["focals"][0]), tgt_views=[0],
        key=jax.random.PRNGKey(7), num_opts=20, lr=1e-2, lr_half_interval=10,
    )
    assert np.isfinite(np.asarray(res.psnr_history)).all()
    ev = opt2.evaluate_object(
        imgs, scene["poses"][0], float(scene["focals"][0]), [0],
        res.shape_code, res.texture_code, jax.random.PRNGKey(8),
        deterministic=True,
    )
    assert np.isfinite(ev["psnr"]).all()


def test_pose_only_warmup_freezes_codes(trained):
    """During the pose-only warmup phase, code updates must be suppressed."""
    opt, tr, scene, hp = _make_optimizer(trained)
    obj, view = 0, 1
    image = jnp.asarray(_images_f32(scene, obj)[view])
    shape0 = tr.state.trainables["shape_codes"][obj]
    tex0 = tr.state.trainables["texture_codes"][obj]
    res = optimize_pose_and_codes(
        tr.state.trainables["params"], hp, image,
        jnp.asarray(scene["poses"][obj, view]), float(scene["focals"][obj]),
        shape0, tex0, key=jax.random.PRNGKey(5),
        num_opts=10, pose_only_steps=10,  # entire run is pose-only
        lr_codes=1e-2, lr_pose=1e-3, rays_per_step=128,
    )
    np.testing.assert_array_equal(np.asarray(res.shape_code),
                                  np.asarray(shape0))
    np.testing.assert_array_equal(np.asarray(res.texture_code),
                                  np.asarray(tex0))
    # ...and the pose DID move (some gradient was applied)
    assert float(jnp.abs(res.xi).max()) > 0.0


def test_code_optimization_with_raw_hparams(trained):
    """Regression: CLI-loaded Hparams carry the raw JSON dict (unhashable);
    the jitted-run cache must key on the typed config only."""
    import dataclasses

    opt, tr, scene, hp = _make_optimizer(trained)
    opt = dataclasses.replace(opt, hp=dataclasses.replace(hp, raw={"a": 1}))
    obj = 0
    result = opt.optimize_object(
        _images_f32(scene, obj), scene["poses"][obj],
        float(scene["focals"][obj]), tgt_views=[0],
        key=jax.random.PRNGKey(0), num_opts=3,
    )
    assert np.isfinite(np.asarray(result.psnr_history)).all()


def test_progress_images_collected_and_inert(trained):
    """progress_images=True returns (num_opts, H, W, 3) per-step renders of
    the first target view (the reference's per-opt-step progress PNG data,
    src/optimizer.py:149-166), improves over the run, and does NOT change
    the optimization itself (same key -> same codes either way)."""
    opt, tr, scene, hp = _make_optimizer(trained)
    obj = 0
    imgs, poses = _images_f32(scene, obj), scene["poses"][obj]
    H, W = imgs.shape[1:3]
    kw = dict(tgt_views=[0], key=jax.random.PRNGKey(3), num_opts=8)
    res_p = opt.optimize_object(imgs, poses, float(scene["focals"][obj]),
                                progress_images=True, **kw)
    res_n = opt.optimize_object(imgs, poses, float(scene["focals"][obj]),
                                **kw)
    assert res_n.progress is None
    assert res_p.progress.shape == (8, H, W, 3)
    np.testing.assert_array_equal(np.asarray(res_p.shape_code),
                                  np.asarray(res_n.shape_code))
    gt = imgs[0]
    mse = lambda t: float(np.mean((np.asarray(res_p.progress[t]) - gt) ** 2))
    assert mse(7) < mse(0)


def test_stochastic_opt_rays_converges(trained):
    """CodeOptimizer(opt_rays=...) runs stochastic minibatch optimization:
    each step renders a random ray subset instead of the full target view.
    The optimized codes must still beat the mean-code init on held-out
    views, and the batched path must follow the standalone runs."""
    import dataclasses

    opt, tr, scene, hp = _make_optimizer(trained)
    sopt = dataclasses.replace(opt, opt_rays=96)
    obj = 1
    imgs, poses = _images_f32(scene, obj), scene["poses"][obj]
    focal = float(scene["focals"][obj])
    res = sopt.optimize_object(
        imgs, poses, focal, tgt_views=[0], key=jax.random.PRNGKey(3),
        num_opts=80, lr=1e-2, lr_half_interval=40,
    )
    assert np.isfinite(np.asarray(res.psnr_history)).all()
    ev = sopt.evaluate_object(
        imgs, poses, focal, exclude_views=[0],
        shape_code=res.shape_code, texture_code=res.texture_code,
        key=jax.random.PRNGKey(4))
    ev0 = sopt.evaluate_object(
        imgs, poses, focal, exclude_views=[0],
        shape_code=sopt.mean_shape, texture_code=sopt.mean_texture,
        key=jax.random.PRNGKey(4))
    assert ev["psnr"].mean() > ev0["psnr"].mean() + 1.0

    # batched stochastic rows follow the standalone stochastic runs
    objs = [0, 1]
    imgs_g = np.stack([_images_f32(scene, o) for o in objs])
    poses_g = np.stack([scene["poses"][o] for o in objs])
    focals_g = np.asarray([scene["focals"][o] for o in objs], np.float32)
    keys = jnp.stack([jax.random.PRNGKey(60 + g) for g in range(len(objs))])
    kwargs = dict(num_opts=8, lr=1e-2, lr_half_interval=4)
    batch = sopt.optimize_objects(imgs_g, poses_g, focals_g, tgt_views=[0],
                                  keys=keys, **kwargs)
    for g, o in enumerate(objs):
        seq = sopt.optimize_object(
            imgs_g[g], poses_g[g], float(focals_g[g]), tgt_views=[0],
            key=keys[g], **kwargs)
        np.testing.assert_allclose(np.asarray(batch.shape_codes[g]),
                                   np.asarray(seq.shape_code), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batch.psnr_history[:, g]),
                                   np.asarray(seq.psnr_history), atol=1e-3)


def test_uint8_image_transport_bitwise(trained):
    """uint8 GT through optimize/evaluate matches the float path.

    The u8 transport (round 4) moves the /255 conversion after the H2D
    transfer. The optimization path converts on the HOST (tiny target
    slices), so trajectories/codes are bitwise equal. The eval path
    converts INSIDE the jit, where XLA strength-reduces the constant
    division to a reciprocal multiply: pixels sit ≤1 ulp off the host
    conversion (asserted below) and metrics shift by last-ulp only —
    the same fusion-rounding class as compact training batches."""
    opt, tr, scene, hp = _make_optimizer(trained)
    vals_u8 = np.asarray(jax.jit(
        lambda x: x.astype(jnp.float32) / 255.0)(scene["images"][1]))
    np.testing.assert_allclose(
        vals_u8, scene["images"][1].astype(np.float32) / 255.0,
        rtol=1.2e-7, atol=0)  # 1 ulp: XLA's reciprocal-multiply /255
    obj = 1
    imgs_u8 = scene["images"][obj]
    assert imgs_u8.dtype == np.uint8
    imgs_f32 = _images_f32(scene, obj)
    poses, focal = scene["poses"][obj], float(scene["focals"][obj])

    res_u8 = opt.optimize_object(
        imgs_u8, poses, focal, tgt_views=[0], key=jax.random.PRNGKey(3),
        num_opts=10, lr=1e-2, lr_half_interval=5)
    res_f32 = opt.optimize_object(
        imgs_f32, poses, focal, tgt_views=[0], key=jax.random.PRNGKey(3),
        num_opts=10, lr=1e-2, lr_half_interval=5)
    np.testing.assert_array_equal(np.asarray(res_u8.shape_code),
                                  np.asarray(res_f32.shape_code))
    np.testing.assert_array_equal(np.asarray(res_u8.psnr_history),
                                  np.asarray(res_f32.psnr_history))

    ev_u8 = opt.evaluate_object(
        imgs_u8, poses, focal, exclude_views=[0],
        shape_code=res_u8.shape_code, texture_code=res_u8.texture_code,
        key=jax.random.PRNGKey(4))
    ev_f32 = opt.evaluate_object(
        imgs_f32, poses, focal, exclude_views=[0],
        shape_code=res_f32.shape_code, texture_code=res_f32.texture_code,
        key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(ev_u8["psnr"], ev_f32["psnr"], atol=1e-4)
    np.testing.assert_allclose(ev_u8["ssim"], ev_f32["ssim"], atol=5e-6)

    # Batched multi-object sweep: same invariant.
    objs = [0, 1]
    imgs_g_u8 = scene["images"][objs]
    imgs_g_f32 = imgs_g_u8.astype(np.float32) / 255.0
    poses_g = scene["poses"][objs]
    focals_g = np.asarray(scene["focals"])[objs]
    keys = jnp.stack([jax.random.PRNGKey(5), jax.random.PRNGKey(6)])
    scs = jnp.stack([res_u8.shape_code, opt.mean_shape])
    tcs = jnp.stack([res_u8.texture_code, opt.mean_texture])
    evm_u8 = opt.evaluate_objects(
        imgs_g_u8, poses_g, focals_g, exclude_views=[0],
        shape_codes=scs, texture_codes=tcs, keys=keys)
    evm_f32 = opt.evaluate_objects(
        imgs_g_f32, poses_g, focals_g, exclude_views=[0],
        shape_codes=scs, texture_codes=tcs, keys=keys)
    np.testing.assert_allclose(evm_u8["psnr"], evm_f32["psnr"], atol=1e-4)
    np.testing.assert_allclose(evm_u8["ssim"], evm_f32["ssim"], atol=5e-6)


def test_device_gt_eval_matches_pixel_gt(trained):
    """evaluate_objects(gt_params=...) renders the ground truth ON DEVICE
    from the synthetic generation parameters instead of taking GT pixels —
    the (G, V', H, W, 3) uint8 H2D is ~half the full-scale eval wall on the
    tunneled chip. Device GT is uint8-quantized like the stored image, so
    the metrics must match the pixel path within last-ulp float noise
    (both geometries, pattern on)."""
    opt, tr, scene, hp = _make_optimizer(trained)
    from codenerf_tpu.data.synthetic import synthetic_scene

    for geometry in ("sphere", "chair"):
        sc = synthetic_scene(n_objects=2, n_views=4, H=16, W=16, seed=3,
                             pattern=True, geometry=geometry, backend="jax")
        keys = jnp.stack([jax.random.PRNGKey(7), jax.random.PRNGKey(8)])
        scs = jnp.stack([opt.mean_shape, 1.02 * opt.mean_shape])
        tcs = jnp.stack([opt.mean_texture, 0.98 * opt.mean_texture])
        common = dict(exclude_views=[0], shape_codes=scs,
                      texture_codes=tcs, keys=keys)
        ev_px = opt.evaluate_objects(sc["images"], sc["poses"],
                                     sc["focals"], **common)
        if geometry == "chair":
            leaves = dict(albedo=sc["albedos"], boxes=sc["boxes"],
                          yaw=sc["yaws"])
        else:
            leaves = dict(albedo=sc["albedos"], radius=sc["radii"])
        gt_params = dict(geometry=geometry, pattern=True, hw=(16, 16),
                         **leaves)
        ev_dev = opt.evaluate_objects(None, sc["poses"], sc["focals"],
                                      gt_params=gt_params, **common)
        np.testing.assert_array_equal(ev_px["views"], ev_dev["views"])
        np.testing.assert_allclose(ev_dev["psnr"], ev_px["psnr"], atol=0.02)
        np.testing.assert_allclose(ev_dev["ssim"], ev_px["ssim"], atol=1e-3)
