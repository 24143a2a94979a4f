"""Multi-device tests on the 8-way virtual CPU mesh: sharded training must
be numerically equivalent to single-device training, for pure data
parallelism and for data x model (tensor) parallelism."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codenerf_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    state_shardings,
)
from codenerf_tpu.training.state import create_train_state
from codenerf_tpu.training.train_step import build_optimizer, build_train_step


def _setup(tiny_scene, tiny_hparams, batch=512):
    from codenerf_tpu.data.pipeline import RayBatchPipeline

    pipe = RayBatchPipeline(
        tiny_scene["images"], tiny_scene["poses"], tiny_scene["focals"], seed=9
    )
    tx = build_optimizer(tiny_hparams)
    state = create_train_state(
        jax.random.PRNGKey(0), tiny_hparams, pipe.n_objects, tx
    )
    step_fn = build_train_step(tiny_hparams, pipe.H, pipe.W, tx)
    batches = [pipe.sample(batch) for _ in range(3)]
    return state, step_fn, batches


def _run_steps(step_fn, state, batches, mesh=None):
    if mesh is not None:
        st_sh = state_shardings(mesh, state)
        b_sh = batch_sharding(mesh)
        state = jax.device_put(state, st_sh)
        fn = jax.jit(
            step_fn,
            in_shardings=(st_sh, {k: b_sh for k in batches[0]}),
            out_shardings=(st_sh, None),
        )
        put = lambda b: jax.device_put(b, {k: b_sh for k in b})
    else:
        fn = jax.jit(step_fn)
        put = lambda b: b
    metrics = None
    for b in batches:
        state, metrics = fn(state, put(b))
    return state, metrics


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh_dp = make_mesh(model=1)
    assert mesh_dp.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_data_parallel_matches_single_device(tiny_scene, tiny_hparams):
    state, step_fn, batches = _setup(tiny_scene, tiny_hparams)
    s1, m1 = _run_steps(step_fn, state, batches, mesh=None)
    state2, _, _ = _setup(tiny_scene, tiny_hparams)[0], None, None
    # rebuild identical initial state (same PRNG seed)
    s2, m2 = _run_steps(step_fn, state2, batches, mesh=make_mesh(model=1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.trainables),
        jax.tree_util.tree_leaves(s2.trainables),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_tensor_parallel_matches_single_device(tiny_scene, tiny_hparams):
    # widen the MLP so the 128*model divisibility rule actually shards it
    hp = dataclasses.replace(
        tiny_hparams,
        net=dataclasses.replace(tiny_hparams.net, W=256),
    )
    state, step_fn, batches = _setup(tiny_scene, hp)
    s1, m1 = _run_steps(step_fn, state, batches, mesh=None)
    state2 = _setup(tiny_scene, hp)[0]
    mesh = make_mesh(data=4, model=2)
    # verify something actually got sharded over 'model'
    shardings = state_shardings(mesh, state2)
    specs = [
        s.spec for s in jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec")
        )
    ]
    assert any("model" in str(spec) for spec in specs)
    s2, m2 = _run_steps(step_fn, state2, batches, mesh=mesh)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.trainables),
        jax.tree_util.tree_leaves(s2.trainables),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_three_axis_replica_mesh_matches_single_device(tiny_scene, tiny_hparams):
    """(replica=2, data=2, model=2) multi-slice layout: gradient all-reduce
    over 'replica' (the DCN axis) + DP over 'data' + TP over 'model' must be
    numerically equivalent to single-device training."""
    hp = dataclasses.replace(
        tiny_hparams,
        net=dataclasses.replace(tiny_hparams.net, W=256),
    )
    state, step_fn, batches = _setup(tiny_scene, hp)
    s1, m1 = _run_steps(step_fn, state, batches, mesh=None)
    state2 = _setup(tiny_scene, hp)[0]
    mesh = make_mesh(data=2, model=2, replica=2)
    assert mesh.shape == {"replica": 2, "data": 2, "model": 2}
    # the batch must shard over replica x data (4-way), weights over model
    b_sh = batch_sharding(mesh)
    assert "replica" in str(b_sh.spec) and "data" in str(b_sh.spec)
    s2, m2 = _run_steps(step_fn, state2, batches, mesh=mesh)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.trainables),
        jax.tree_util.tree_leaves(s2.trainables),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_driver_dryrun_multichip_fresh_process():
    """The driver's verbatim multi-chip check, in a fresh process with the
    DEFAULT environment (no conftest platform forcing): dryrun_multichip must
    self-force the 8-virtual-CPU platform (MULTICHIP_r01 regression)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    res = subprocess.run(
        [sys.executable, "-c", code], cwd=repo, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, f"stderr:\n{res.stderr}\nstdout:\n{res.stdout}"
    assert "ok" in res.stdout


def test_trainer_with_mesh(tiny_scene, tiny_hparams, tmp_path):
    from codenerf_tpu.training.trainer import Trainer

    tr = Trainer("mesh", tiny_hparams, batch_size=512, dataset=tiny_scene,
                 exps_root=str(tmp_path), mesh=make_mesh(model=1),
                 check_iter=0)
    m = tr.training(iters_crop=0, iters_all=20, log_every=10)
    assert np.isfinite(m["loss"])


def test_occupancy_step_with_mesh_matches_single_device(tiny_scene,
                                                        tiny_hparams):
    """train_occupancy under a data-parallel mesh: the occ grid rides as a
    replicated third step input; sharded must equal single-device."""
    from codenerf_tpu.config import TrainOccupancyConfig
    from codenerf_tpu.core.occupancy import OccupancyGrid
    from codenerf_tpu.data.pipeline import RayBatchPipeline
    from jax.sharding import NamedSharding, PartitionSpec

    hp = dataclasses.replace(
        tiny_hparams,
        render=dataclasses.replace(tiny_hparams.render,
                                   bound_sphere_radius=1.3),
        train_occupancy=TrainOccupancyConfig(grid_size=8),
    )
    pipe = RayBatchPipeline(
        tiny_scene["images"], tiny_scene["poses"], tiny_scene["focals"],
        seed=9)
    tx = build_optimizer(hp)
    state = create_train_state(jax.random.PRNGKey(0), hp, pipe.n_objects, tx)
    step_fn = build_train_step(hp, pipe.H, pipe.W, tx)
    batch = pipe.sample(512)
    # a non-trivial grid: half the cells occupied
    occ = jnp.zeros((8, 8, 8), bool).at[:, :, :4].set(True)
    grid = OccupancyGrid(occ=occ, radius=jnp.asarray(1.3, jnp.float32))

    s1, m1 = jax.jit(step_fn)(state, batch, grid)

    mesh = make_mesh(model=1)
    st_sh = state_shardings(mesh, state)
    b_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, PartitionSpec())
    fn = jax.jit(step_fn,
                 in_shardings=(st_sh, {k: b_sh for k in batch},
                               OccupancyGrid(occ=rep, radius=rep)),
                 out_shardings=(st_sh, None))
    s8, m8 = fn(jax.device_put(state, st_sh),
                jax.device_put(batch, {k: b_sh for k in batch}),
                jax.device_put(grid, OccupancyGrid(occ=rep, radius=rep)))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    a = np.asarray(s1.trainables["params"]["enc_xyz"]["w"])
    b = np.asarray(s8.trainables["params"]["enc_xyz"]["w"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def _codes_opt_inputs(trained, objs=(0, 1, 0)):
    from codenerf_tpu.models.codes import mean_code
    from codenerf_tpu.optimization import codes_opt

    tr, scene, hp = trained
    t = tr.state.trainables
    imgs = np.stack([scene["images"][o].astype(np.float32) / 255.0
                     for o in objs])
    poses = np.stack([scene["poses"][o] for o in objs])
    focals = np.asarray([scene["focals"][o] for o in objs], np.float32)
    ro, vd, gt = codes_opt._flat_target_rays_multi(
        imgs, poses, focals, [0, 2], 16, 16)
    keys = jnp.stack([jax.random.PRNGKey(11 + g) for g in range(len(objs))])
    return (t["params"], hp, mean_code(t["shape_codes"]),
            mean_code(t["texture_codes"]), imgs, poses, focals, ro, vd, gt,
            keys)


@pytest.mark.parametrize("mesh_kw", [dict(model=1),
                                     dict(replica=2, data=4, model=1)])
def test_batched_codes_opt_mesh_matches_single_device(trained, mesh_kw):
    """The batched test-time optimization scan sharded over the mesh's
    batch axes (objects embarrassingly parallel, frozen weights
    replicated) must reproduce the single-device batched run per object —
    including when G does not divide the shard count (G=3 on 8 shards:
    object padding)."""
    from codenerf_tpu.optimization import codes_opt

    (params, hp, mean_s, mean_t, _imgs, _poses, _focals, ro, vd, gt,
     keys) = _codes_opt_inputs(trained)
    kwargs = dict(num_opts=8, lr=1e-2, lr_half_interval=4, chunk=256)

    base = codes_opt.optimize_codes_batch(
        params, hp, ro, vd, gt, mean_s, mean_t, keys, **kwargs)
    mesh = make_mesh(**mesh_kw)
    shard = codes_opt.optimize_codes_batch(
        params, hp, ro, vd, gt, mean_s, mean_t, keys, mesh=mesh, **kwargs)

    assert shard.shape_codes.shape == base.shape_codes.shape
    np.testing.assert_allclose(np.asarray(shard.shape_codes),
                               np.asarray(base.shape_codes), atol=1e-5)
    np.testing.assert_allclose(np.asarray(shard.texture_codes),
                               np.asarray(base.texture_codes), atol=1e-5)
    np.testing.assert_allclose(np.asarray(shard.psnr_history),
                               np.asarray(base.psnr_history), atol=1e-3)


def test_multi_object_eval_mesh_matches_single_device(trained):
    """evaluate_objects sharded over objects must score every (object,
    view) identically to the single-device sweep."""
    from codenerf_tpu.models.codes import mean_code
    from codenerf_tpu.optimization.codes_opt import CodeOptimizer

    (params, hp, mean_s, mean_t, imgs, poses, focals, _ro, _vd, _gt,
     keys) = _codes_opt_inputs(trained)
    G = imgs.shape[0]
    scs = jnp.stack([mean_s * (1 + 0.01 * g) for g in range(G)])
    tcs = jnp.stack([mean_t * (1 - 0.01 * g) for g in range(G)])
    ekeys = jnp.stack([jax.random.PRNGKey(70 + g) for g in range(G)])

    def build(mesh):
        return CodeOptimizer(params=params, hp=hp, mean_shape=mean_s,
                             mean_texture=mean_t, chunk=256, mesh=mesh)

    ev1 = build(None).evaluate_objects(
        imgs, poses, focals, exclude_views=[0, 2],
        shape_codes=scs, texture_codes=tcs, keys=ekeys, return_images=True)
    ev8 = build(make_mesh(model=1)).evaluate_objects(
        imgs, poses, focals, exclude_views=[0, 2],
        shape_codes=scs, texture_codes=tcs, keys=ekeys, return_images=True)

    np.testing.assert_array_equal(ev1["views"], ev8["views"])
    np.testing.assert_allclose(ev8["psnr"], ev1["psnr"], atol=1e-3)
    np.testing.assert_allclose(ev8["ssim"], ev1["ssim"], atol=1e-4)
    np.testing.assert_allclose(ev8["images"], ev1["images"], atol=1e-4)


def test_codes_opt_mesh_with_occupancy_and_stochastic(trained):
    """Mesh-sharded codes-opt composes with the production options: the
    category occupancy grid (replicated) and stochastic ray minibatches
    (per-object streams). Sharded == single-device per object."""
    import jax.numpy as jnp

    from codenerf_tpu.core.occupancy import OccupancyGrid, grid_cell_centers
    from codenerf_tpu.optimization import codes_opt

    (params, hp, mean_s, mean_t, _imgs, _poses, _focals, ro, vd, gt,
     keys) = _codes_opt_inputs(trained, objs=(0, 1))
    Gc = 8
    centers = grid_cell_centers(Gc, 1.4).reshape(Gc, Gc, Gc, 3)
    occ = jnp.linalg.norm(centers, axis=-1) < 1.1
    grid = OccupancyGrid(occ=occ, radius=jnp.asarray(1.4, jnp.float32))
    kwargs = dict(num_opts=6, lr=1e-2, lr_half_interval=3, chunk=256,
                  occ_grid=grid, rays_per_step=64)

    base = codes_opt.optimize_codes_batch(
        params, hp, ro, vd, gt, mean_s, mean_t, keys, **kwargs)
    shard = codes_opt.optimize_codes_batch(
        params, hp, ro, vd, gt, mean_s, mean_t, keys,
        mesh=make_mesh(model=1), **kwargs)
    np.testing.assert_allclose(np.asarray(shard.shape_codes),
                               np.asarray(base.shape_codes), atol=1e-5)
    np.testing.assert_allclose(np.asarray(shard.psnr_history),
                               np.asarray(base.psnr_history), atol=1e-3)


def test_multi_object_eval_mesh_with_device_gt(trained):
    """Object-sharded eval composes with device-rendered GT: the GT
    parameter pytree shards over the object axis like the pixel GT would
    (spec-prefix broadcast across its leaves), and every (object, view)
    score matches the single-device device-GT sweep."""
    from codenerf_tpu.data.synthetic import synthetic_scene
    from codenerf_tpu.optimization.codes_opt import CodeOptimizer

    (params, hp, mean_s, mean_t, _imgs, _poses, _focals, _ro, _vd, _gt,
     _keys) = _codes_opt_inputs(trained)
    sc = synthetic_scene(n_objects=4, n_views=3, H=16, W=16, seed=9,
                         pattern=True, geometry="chair", backend="jax")
    G = 4
    scs = jnp.stack([mean_s * (1 + 0.01 * g) for g in range(G)])
    tcs = jnp.stack([mean_t * (1 - 0.01 * g) for g in range(G)])
    ekeys = jnp.stack([jax.random.PRNGKey(130 + g) for g in range(G)])
    gt_params = dict(geometry="chair", pattern=True, hw=(16, 16),
                     albedo=sc["albedos"], boxes=sc["boxes"],
                     yaw=sc["yaws"])

    def build(mesh):
        return CodeOptimizer(params=params, hp=hp, mean_shape=mean_s,
                             mean_texture=mean_t, chunk=256, mesh=mesh)

    common = dict(exclude_views=[0], shape_codes=scs, texture_codes=tcs,
                  keys=ekeys, gt_params=gt_params)
    ev1 = build(None).evaluate_objects(None, sc["poses"], sc["focals"],
                                       **common)
    ev8 = build(make_mesh(model=1)).evaluate_objects(
        None, sc["poses"], sc["focals"], **common)

    np.testing.assert_array_equal(ev1["views"], ev8["views"])
    np.testing.assert_allclose(ev8["psnr"], ev1["psnr"], atol=1e-3)
    np.testing.assert_allclose(ev8["ssim"], ev1["ssim"], atol=1e-4)
