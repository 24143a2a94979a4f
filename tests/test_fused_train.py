"""Fused fwd+bwd training op vs jax.grad of the XLA path (interpret mode).

The acceptance bar is accuracy against the FLOAT32 reference gradient: the
fused backward must be at least as close to f32 truth as the XLA bfloat16
autodiff path is (in practice it is ~30x closer — it keeps inter-layer
cotangents in f32 and accumulates dW in f32 across tiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codenerf_tpu.config import NetConfig
from codenerf_tpu.models.codenerf import apply_codenerf, init_codenerf
from codenerf_tpu.ops.fused_train import (
    fused_apply_train,
    fused_train_available,
)


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched, raising=True)


def _setup(cfg, R, S, seed=1):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    ro = jax.random.uniform(ks[0], (R, 3), jnp.float32, -0.5, 0.5)
    vd = jax.random.normal(ks[1], (R, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(ks[6], (R, S), jnp.float32, 0.3, 2.2), -1)
    sc = jax.random.normal(ks[2], (R, cfg.latent_dim)) * 0.09
    tc = jax.random.normal(ks[3], (R, cfg.latent_dim)) * 0.09
    tgt_s = jax.random.uniform(ks[4], (R, S))
    tgt_r = jax.random.uniform(ks[5], (R, S, 3))
    return ro, vd, z, sc, tc, tgt_s, tgt_r


def _flat(tree):
    return jnp.concatenate([x.ravel().astype(jnp.float32)
                            for x in jax.tree_util.tree_leaves(tree)])


def test_fused_train_values_and_grads():
    cfg = NetConfig(shape_blocks=2, texture_blocks=1)
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    R, S = 32, 24
    ro, vd, z, sc, tc, tgt_s, tgt_r = _setup(cfg, R, S)

    def mk_loss(kind, dtype=None):
        def loss(p, sc, tc, ro, vd, z):
            if kind == "xla":
                xyz = ro[:, None, :] + vd[:, None, :] * z[..., None]
                s, r = apply_codenerf(p, cfg, xyz, vd, sc, tc,
                                      compute_dtype=dtype)
            else:
                s, planes = fused_apply_train(p, cfg, ro, vd, z, sc, tc)
                r = jnp.stack(planes, axis=-1)
            return jnp.mean((s - tgt_s) ** 2) + jnp.mean((r - tgt_r) ** 2)
        return loss

    args = (params, sc, tc, ro, vd, z)
    l_ref = float(mk_loss("xla", jnp.bfloat16)(*args))
    l_fused = float(mk_loss("fused")(*args))
    assert abs(l_ref - l_fused) < 1e-4

    argnums = (0, 1, 2, 3, 4, 5)
    g32 = jax.grad(mk_loss("xla", jnp.float32), argnums)(*args)
    g16 = jax.grad(mk_loss("xla", jnp.bfloat16), argnums)(*args)
    gfu = jax.grad(mk_loss("fused"), argnums)(*args)

    for name, a16, afu, a32 in zip(
        ["params", "shape_codes", "texture_codes", "ro", "vd", "z"],
        g16, gfu, g32
    ):
        v32, v16, vfu = _flat(a32), _flat(a16), _flat(afu)
        rel_xla = float(jnp.linalg.norm(v16 - v32) / (jnp.linalg.norm(v32) + 1e-12))
        rel_fused = float(jnp.linalg.norm(vfu - v32) / (jnp.linalg.norm(v32) + 1e-12))
        # fused must be no worse than the XLA bf16 path (small slack)
        assert rel_fused <= rel_xla * 1.5 + 1e-3, (name, rel_fused, rel_xla)
        cos = float(jnp.dot(vfu, v32)
                    / (jnp.linalg.norm(vfu) * jnp.linalg.norm(v32) + 1e-12))
        assert cos > 0.99, (name, cos)


def test_fused_train_flagship_architecture():
    cfg = NetConfig()  # 3+1 blocks, W=256
    params = init_codenerf(jax.random.PRNGKey(2), cfg)
    R, S = 32, 8
    ro, vd, z, sc, tc, tgt_s, tgt_r = _setup(cfg, R, S, seed=3)
    xyz = ro[:, None, :] + vd[:, None, :] * z[..., None]

    def loss(p):
        s, planes = fused_apply_train(p, cfg, ro, vd, z, sc, tc)
        r = jnp.stack(planes, axis=-1)
        return jnp.mean((s - tgt_s) ** 2) + jnp.mean((r - tgt_r) ** 2)

    def loss_ref(p):
        s, r = apply_codenerf(p, cfg, xyz, vd, sc, tc,
                              compute_dtype=jnp.bfloat16)
        return jnp.mean((s - tgt_s) ** 2) + jnp.mean((r - tgt_r) ** 2)

    gfu = jax.grad(loss)(params)
    gref = jax.grad(loss_ref)(params)
    v1, v2 = _flat(gfu), _flat(gref)
    cos = float(jnp.dot(v1, v2) / (jnp.linalg.norm(v1) * jnp.linalg.norm(v2)))
    assert cos > 0.99, cos


@pytest.mark.parametrize("white_bg", [True, False])
def test_pallas_composite_op_matches_xla(white_bg):
    """The fat-tile composite kernel vs core.render.composite: values and
    all five input cotangents, on its own (no MLP)."""
    from codenerf_tpu.core.render import composite
    from codenerf_tpu.ops.pallas_composite import make_composite_op

    R, S = 48, 24  # 48 exercises the non-power-of-two tile pick (16)
    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    sig = jax.random.uniform(ks[0], (R, S), jnp.float32, 0.0, 40.0)
    c0 = jax.random.uniform(ks[1], (R, S))
    c1 = jax.random.uniform(ks[2], (R, S))
    c2 = jax.random.uniform(ks[3], (R, S))
    z = jnp.sort(jax.random.uniform(ks[4], (R, S), jnp.float32, 0.5, 2.0), -1)
    g8 = jax.random.normal(ks[5], (R, 8))
    op = make_composite_op(white_bg=white_bg)

    def scalar_pallas(sig, c0, c1, c2, z):
        return jnp.sum(op(sig, c0, c1, c2, z)[:, :5] * g8[:, :5])

    def scalar_xla(sig, c0, c1, c2, z):
        out = composite(sig, (c0, c1, c2), z, white_bg=white_bg)
        packed = jnp.concatenate(
            [out.rgb, out.depth[:, None], out.acc[:, None]], axis=-1)
        return jnp.sum(packed * g8[:, :5])

    args = (sig, c0, c1, c2, z)
    np.testing.assert_allclose(float(scalar_pallas(*args)),
                               float(scalar_xla(*args)), rtol=1e-5)
    gp = jax.grad(scalar_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    gx = jax.grad(scalar_xla, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["sig", "c0", "c1", "c2", "z"], gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_composite_values_and_grads():
    """The FULLY-fused op (volume rendering in-kernel, per-ray boundary)
    against f32 XLA truth: values must match to f32-composite rounding and
    every gradient must be at least as close to f32 truth as the bf16 XLA
    path. Depth and acc outputs (and their cotangents) are exercised."""
    from codenerf_tpu.core.render import composite
    from codenerf_tpu.ops.fused_train import fused_render_train

    cfg = NetConfig(shape_blocks=2, texture_blocks=1)
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    R, S = 32, 24
    ro, vd, z, sc, tc, _, _ = _setup(cfg, R, S)
    tgt = jax.random.uniform(jax.random.PRNGKey(9), (R, 3))

    def mk_loss(kind, dtype=None):
        def loss(p, sc, tc, ro, vd, z):
            if kind == "fused":
                out = fused_render_train(p, cfg, ro, vd, z, sc, tc)
            else:
                xyz = ro[:, None, :] + vd[:, None, :] * z[..., None]
                s, r = apply_codenerf(p, cfg, xyz, vd, sc, tc,
                                      compute_dtype=dtype)
                out = composite(s, r, z, white_bg=True)
            return (jnp.mean((out.rgb - tgt) ** 2)
                    + 1e-3 * jnp.sum(out.depth) + 1e-3 * jnp.sum(out.acc))
        return loss

    args = (params, sc, tc, ro, vd, z)
    l32 = float(mk_loss("xla", jnp.float32)(*args))
    lfu = float(mk_loss("fused")(*args))
    assert abs(lfu - l32) < 1e-4 * max(1.0, abs(l32))

    argnums = (0, 1, 2, 3, 4, 5)
    g32 = jax.grad(mk_loss("xla", jnp.float32), argnums)(*args)
    g16 = jax.grad(mk_loss("xla", jnp.bfloat16), argnums)(*args)
    gfu = jax.grad(mk_loss("fused"), argnums)(*args)
    for name, a32, a16, afu in zip(
        ["params", "shape_codes", "texture_codes", "ro", "vd", "z"],
        g32, g16, gfu
    ):
        v32, v16, vfu = _flat(a32), _flat(a16), _flat(afu)
        nrm = float(jnp.linalg.norm(v32)) + 1e-12
        rel_xla = float(jnp.linalg.norm(v16 - v32)) / nrm
        rel_fused = float(jnp.linalg.norm(vfu - v32)) / nrm
        assert rel_fused <= rel_xla * 1.5 + 1e-5, (name, rel_fused, rel_xla)


def test_availability_rules():
    assert fused_train_available(NetConfig(), 4096, 96)
    assert not fused_train_available(NetConfig(W=192), 4096, 96)
    assert not fused_train_available(NetConfig(), 100, 96)  # not divisible


def _fused_hparams(n_samples=8, use_fused=True, near=0.5, far=2.0,
                   fused_composite=True):
    from codenerf_tpu.config import Hparams, LrSchedule, RenderConfig

    return Hparams(
        net=NetConfig(),  # flagship dims: the only fused-supported shape
        render=RenderConfig(n_samples=n_samples, near=near, far=far),
        lr_model=LrSchedule(lr=5e-4, interval=100_000),
        lr_codes=LrSchedule(lr=5e-3, interval=100_000),
        check_points=0,
        use_fused_train=use_fused,
        fused_composite=fused_composite,
    )


def _step_setup(hp, batch_rays, seed=0):
    import jax.random as jr

    from codenerf_tpu.data.synthetic import synthetic_scene
    from codenerf_tpu.data.pipeline import RayBatchPipeline
    from codenerf_tpu.training.state import create_train_state
    from codenerf_tpu.training.train_step import (
        build_optimizer,
        build_train_step,
    )

    scene = synthetic_scene(n_objects=2, n_views=2, H=8, W=8, seed=seed)
    pipe = RayBatchPipeline(scene["images"], scene["poses"], scene["focals"])
    tx = build_optimizer(hp)
    state = create_train_state(jr.PRNGKey(0), hp, pipe.n_objects, tx)
    step_fn = build_train_step(hp, pipe.H, pipe.W, tx, batch_size=batch_rays)
    return state, step_fn, pipe


@pytest.mark.parametrize("composite", [False, True])
def test_use_fused_train_flag_changes_program(monkeypatch, composite):
    """Regression for the round-1 dead-code bug: with use_fused_train the
    jitted step must actually trace through the fused op (the flag used to
    build apply_fn and then silently compile the plain XLA path). With
    fused_composite the step must route through the SINGLE-PASS loss
    kernel instead."""
    import codenerf_tpu.ops.fused_train as ft

    calls = {"planes": 0, "single": 0}

    def make_spy(orig, key):
        def spy(cfg, **kwargs):
            op = orig(cfg, **kwargs)

            def wrapped(*args):
                calls[key] += 1
                return op(*args)

            return wrapped
        return spy

    def invoke_spy(*args, **kwargs):
        calls["single"] += 1
        return _orig_invoke(*args, **kwargs)

    _orig_invoke = ft.invoke_train_fused
    monkeypatch.setattr(ft, "make_fused_train_op",
                        make_spy(ft.make_fused_train_op, "planes"))
    monkeypatch.setattr(ft, "invoke_train_fused", invoke_spy)
    hp = _fused_hparams(fused_composite=composite)
    state, step_fn, pipe = _step_setup(hp, batch_rays=32)
    batch = pipe.sample(32)
    jax.eval_shape(step_fn, state, batch)  # trace only — no Pallas execution
    if composite:
        assert calls["single"] >= 1, "single-pass loss kernel never traced"
        assert calls["planes"] == 0, "plane op unexpectedly traced"
    else:
        assert calls["planes"] >= 1, "plane op never traced by the step"
        assert calls["single"] == 0, "single-pass kernel unexpectedly traced"


def test_use_fused_train_validates_batch_at_build():
    hp = _fused_hparams()
    with pytest.raises(ValueError, match="tile-divisible|use_fused_train"):
        _step_setup(hp, batch_rays=100)  # 100 % 32 != 0


@pytest.mark.parametrize("composite", [False, True])
def test_fused_train_step_matches_xla_training(composite):
    """A short real training run (interpret-mode kernels): the fused step's
    loss trajectory must track the XLA bf16 step's — for both the
    plane-output op and the fully-fused composite op. Gradient closeness is
    proven at op level above; this proves the integrated optimizer loop."""
    hp_f = _fused_hparams(use_fused=True, fused_composite=composite)
    hp_x = _fused_hparams(use_fused=False)
    state_f, step_f, pipe = _step_setup(hp_f, batch_rays=32)
    state_x, step_x, _ = _step_setup(hp_x, batch_rays=32)
    jit_f = jax.jit(step_f)
    jit_x = jax.jit(step_x)
    losses_f, losses_x = [], []
    batch = pipe.sample(32)  # fixed batch => the loss must strictly improve
    for i in range(4):
        state_f, m_f = jit_f(state_f, batch)
        state_x, m_x = jit_x(state_x, batch)
        losses_f.append(float(m_f["loss"]))
        losses_x.append(float(m_x["loss"]))
    np.testing.assert_allclose(losses_f, losses_x, rtol=0.02)
    assert losses_f[-1] < losses_f[0]  # it is actually optimizing


def test_fused_train_with_mesh_matches_single_device():
    """use_fused_train under a data-parallel mesh: the op is shard_map-ed
    over the batch axes, so each device runs the kernel on its ray shard
    and weight gradients all-reduce. Must match single-device fused
    training numerically (round-2 capability: fused + mesh used to be
    rejected)."""
    import jax.numpy as jnp

    from codenerf_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        state_shardings,
    )
    from codenerf_tpu.training.state import create_train_state
    from codenerf_tpu.training.train_step import (
        build_optimizer,
        build_train_step,
    )
    from codenerf_tpu.data.synthetic import synthetic_scene
    from codenerf_tpu.data.pipeline import RayBatchPipeline

    hp = _fused_hparams()
    scene = synthetic_scene(n_objects=2, n_views=4, H=16, W=16, seed=2)
    pipe = RayBatchPipeline(scene["images"], scene["poses"], scene["focals"])
    tx = build_optimizer(hp)
    batch = {k: jnp.asarray(v) for k, v in pipe.sample(256).items()}

    state1 = create_train_state(jax.random.PRNGKey(0), hp, pipe.n_objects, tx)
    step1 = jax.jit(build_train_step(hp, pipe.H, pipe.W, tx, batch_size=256))
    s1, m1 = step1(state1, batch)

    mesh = make_mesh(model=1)  # 8-way DP: 32 rays/device = one bwd tile
    state2 = create_train_state(jax.random.PRNGKey(0), hp, pipe.n_objects, tx)
    st_sh = state_shardings(mesh, state2)
    b_sh = batch_sharding(mesh)
    step2 = jax.jit(
        build_train_step(hp, pipe.H, pipe.W, tx, batch_size=256, mesh=mesh),
        in_shardings=(st_sh, {k: b_sh for k in batch}),
        out_shardings=(st_sh, None),
    )
    state2 = jax.device_put(state2, st_sh)
    s2, m2 = step2(state2, jax.device_put(batch, {k: b_sh for k in batch}))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.trainables),
                    jax.tree_util.tree_leaves(s2.trainables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_fused_train_rejects_tensor_parallel_mesh():
    from codenerf_tpu.parallel.mesh import make_mesh
    from codenerf_tpu.training.train_step import (
        build_optimizer,
        build_train_step,
    )

    hp = _fused_hparams()
    tx = build_optimizer(hp)
    with pytest.raises(ValueError, match="replicated weights"):
        build_train_step(hp, 8, 8, tx, batch_size=256,
                         mesh=make_mesh(data=4, model=2))


def test_fused_codes_op_grads():
    """The codes-only op (backward skips dW accumulation and the input
    chain) must produce code gradients matching the full op and be at
    least as close to f32 truth as the XLA bf16 path."""
    from codenerf_tpu.ops.fused_train import make_fused_codes_op

    cfg = NetConfig(shape_blocks=2, texture_blocks=1)
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    R, S = 32, 24
    ro, vd, z, sc, tc, tgt_s, tgt_r = _setup(cfg, R, S)
    codes_op = make_fused_codes_op(cfg)

    def mk_loss(kind, dtype=None):
        def loss(sc, tc):
            if kind == "xla":
                xyz = ro[:, None, :] + vd[:, None, :] * z[..., None]
                s, r = apply_codenerf(params, cfg, xyz, vd, sc, tc,
                                      compute_dtype=dtype)
            else:
                s, planes = fused_apply_train(params, cfg, ro, vd, z, sc, tc,
                                              op=codes_op)
                r = jnp.stack(planes, axis=-1)
            return jnp.mean((s - tgt_s) ** 2) + jnp.mean((r - tgt_r) ** 2)
        return loss

    l_ref = float(mk_loss("xla", jnp.bfloat16)(sc, tc))
    l_fused = float(mk_loss("fused")(sc, tc))
    assert abs(l_ref - l_fused) < 1e-4

    g32 = jax.grad(mk_loss("xla", jnp.float32), (0, 1))(sc, tc)
    g16 = jax.grad(mk_loss("xla", jnp.bfloat16), (0, 1))(sc, tc)
    gfu = jax.grad(mk_loss("fused"), (0, 1))(sc, tc)
    for name, a16, afu, a32 in zip(["shape", "texture"], g16, gfu, g32):
        v32, v16, vfu = _flat(a32), _flat(a16), _flat(afu)
        rel_xla = float(jnp.linalg.norm(v16 - v32)
                        / (jnp.linalg.norm(v32) + 1e-12))
        rel_fused = float(jnp.linalg.norm(vfu - v32)
                          / (jnp.linalg.norm(v32) + 1e-12))
        assert rel_fused <= rel_xla * 1.5 + 1e-3, (name, rel_fused, rel_xla)


def test_single_pass_input_grads_vs_autodiff():
    """The single-pass kernel's input-cotangent variant (weight_grads=False,
    input_grads=True — the POSE path): the emitted (d_ro, d_vd, d_z)
    chained through one vjp over prep_ray_operands must be at least as
    close to the f32 autodiff gradient as the XLA bf16 path is. d_z in
    particular sums the in-kernel composite's own z term with the xyz/PE
    Jacobian chain."""
    from codenerf_tpu.core.render import composite as composite_xla
    from codenerf_tpu.ops import fused_mlp
    from codenerf_tpu.ops import fused_train as ft

    cfg = NetConfig(shape_blocks=2, texture_blocks=1)
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    R, S = 32, 16
    ro, vd, z, sc, tc, _, _ = _setup(cfg, R, S)
    sc, tc = sc[0], tc[0]
    gt = jax.random.uniform(jax.random.PRNGKey(9), (R, 3))
    gt8 = fused_mlp._pad_lanes(gt, 8)
    scale = 1.0 / (R * 3.0)
    wflat = [jax.lax.stop_gradient(w)
             for w in ft.flatten_params_f32(params, cfg)]

    def xla_loss(dtype):
        def loss(ro, vd, z):
            xyz = ro[:, None, :] + vd[:, None, :] * z[..., None]
            s, r = apply_codenerf(
                params, cfg, xyz, vd,
                jnp.broadcast_to(sc, (R, cfg.latent_dim)),
                jnp.broadcast_to(tc, (R, cfg.latent_dim)),
                compute_dtype=dtype)
            res = composite_xla(s, r, z, white_bg=True)
            return jnp.sum((res.rgb - gt) ** 2) * scale
        return loss

    def sp_grads(ro, vd, z):
        def prologue(ro, vd, z):
            return fused_mlp.prep_ray_operands(params, cfg, ro, vd, z,
                                               sc, tc)
        ops6, pvjp = jax.vjp(prologue, ro, vd, z)
        ro8, vd8, z2, sproj, tproj, vcontrib = ops6
        outs = ft.invoke_train_fused(
            cfg, S, R, True, scale, ro8, vd8, z2, sproj, tproj, vcontrib,
            gt8, wflat, weight_grads=False, input_grads=True)
        se, d_sproj, d_tproj, d_vcontrib, d_ro8, d_vd8, d_z = outs
        return se, pvjp((d_ro8, d_vd8, d_z, d_sproj, d_tproj, d_vcontrib))

    l32 = float(xla_loss(jnp.float32)(ro, vd, z))
    se, gfu = sp_grads(ro, vd, z)
    assert abs(float(se) * scale - l32) < 2e-3 * max(1.0, abs(l32))
    g32 = jax.grad(xla_loss(jnp.float32), (0, 1, 2))(ro, vd, z)
    g16 = jax.grad(xla_loss(jnp.bfloat16), (0, 1, 2))(ro, vd, z)
    for name, a32, a16, afu in zip(["ro", "vd", "z"], g32, g16, gfu):
        v32, v16, vfu = _flat(a32), _flat(a16), _flat(afu)
        rel_xla = float(jnp.linalg.norm(v16 - v32)
                        / (jnp.linalg.norm(v32) + 1e-12))
        rel_fused = float(jnp.linalg.norm(vfu - v32)
                          / (jnp.linalg.norm(v32) + 1e-12))
        assert rel_fused <= rel_xla * 1.5 + 1e-3, (name, rel_fused, rel_xla)


@pytest.mark.parametrize("composite", [False, True])
def test_optimize_codes_fused_matches_xla(monkeypatch, composite):
    """optimize_codes with the codes-only fused kernels, both routes —
    the plane op + pallas composite (fused_composite=False) and the
    SINGLE-PASS frozen-model kernel (weight_grads=False, late r3). The
    selected route must actually be traced into the program
    (program-identity guard) and the optimization trajectory must match
    the XLA path."""
    from codenerf_tpu.optimization import codes_opt
    from codenerf_tpu.ops import fused_train as ft

    hp = _fused_hparams(n_samples=8, fused_composite=composite)
    params = init_codenerf(jax.random.PRNGKey(1), hp.net)
    R = 64
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    ro = jax.random.uniform(ks[0], (R, 3), jnp.float32, -0.2, 0.2)
    vd = jax.random.normal(ks[1], (R, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    gt = jax.random.uniform(ks[2], (R, 3))
    init_s = jax.random.normal(ks[3], (hp.net.latent_dim,)) * 0.05
    init_t = jnp.zeros((hp.net.latent_dim,))

    calls = {"codes_op": 0, "single": 0}
    orig_plane = ft.make_fused_codes_op
    orig_single = ft.invoke_train_fused

    def spy_plane(*a, **kw):
        calls["codes_op"] += 1
        return orig_plane(*a, **kw)

    def spy_single(*a, **kw):
        calls["single"] += 1
        return orig_single(*a, **kw)

    monkeypatch.setattr(ft, "make_fused_codes_op", spy_plane)
    monkeypatch.setattr(ft, "invoke_train_fused", spy_single)

    kwargs = dict(num_opts=3, lr=1e-2, lr_half_interval=2, chunk=64)
    res_f = codes_opt.optimize_codes(
        params, hp, ro, vd, gt, init_s, init_t, jax.random.PRNGKey(0),
        use_fused=True, **kwargs)
    if composite:
        assert calls["single"] >= 1, "single-pass codes kernel never traced"
    else:
        assert calls["codes_op"] == 1, "plane codes op never built"
        assert calls["single"] == 0
    res_x = codes_opt.optimize_codes(
        params, hp, ro, vd, gt, init_s, init_t, jax.random.PRNGKey(0),
        use_fused=False, **kwargs)
    # Finiteness first: with zero-init texture codes a NaN reg gradient
    # (norm at 0) once poisoned BOTH trajectories, and assert_allclose
    # passes NaN==NaN — these asserts keep the comparison non-vacuous.
    assert np.isfinite(np.asarray(res_f.psnr_history)).all()
    assert np.isfinite(np.asarray(res_f.shape_code)).all()
    np.testing.assert_allclose(np.asarray(res_f.psnr_history),
                               np.asarray(res_x.psnr_history), atol=0.3)
    np.testing.assert_allclose(np.asarray(res_f.shape_code),
                               np.asarray(res_x.shape_code), atol=5e-2)


def test_optimize_codes_single_pass_hierarchical_and_progress():
    """Single-pass codes optimization under hierarchical sampling (two
    frozen-model kernel calls; coarse emits the weights plane) with
    per-step progress renders riding the kernel's rgb rows: trajectory,
    final codes and progress images must all match the XLA path."""
    import dataclasses

    from codenerf_tpu.optimization import codes_opt

    hp = _fused_hparams(n_samples=8)
    hp = dataclasses.replace(
        hp, render=dataclasses.replace(hp.render, n_importance=8))
    params = init_codenerf(jax.random.PRNGKey(1), hp.net)
    R = 64
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    ro = jax.random.uniform(ks[0], (R, 3), jnp.float32, -0.2, 0.2)
    vd = jax.random.normal(ks[1], (R, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    gt = jax.random.uniform(ks[2], (R, 3))
    init_s = jax.random.normal(ks[3], (hp.net.latent_dim,)) * 0.05
    init_t = jnp.zeros((hp.net.latent_dim,))

    kwargs = dict(num_opts=3, lr=1e-2, lr_half_interval=2, chunk=64,
                  progress_rays=16)
    res_f = codes_opt.optimize_codes(
        params, hp, ro, vd, gt, init_s, init_t, jax.random.PRNGKey(0),
        use_fused=True, **kwargs)
    res_x = codes_opt.optimize_codes(
        params, hp, ro, vd, gt, init_s, init_t, jax.random.PRNGKey(0),
        use_fused=False, **kwargs)
    assert np.isfinite(np.asarray(res_f.psnr_history)).all()
    np.testing.assert_allclose(np.asarray(res_f.psnr_history),
                               np.asarray(res_x.psnr_history), atol=0.3)
    np.testing.assert_allclose(np.asarray(res_f.shape_code),
                               np.asarray(res_x.shape_code), atol=5e-2)
    assert res_f.progress.shape == (3, 16, 3)
    np.testing.assert_allclose(np.asarray(res_f.progress),
                               np.asarray(res_x.progress), atol=2e-2)


@pytest.mark.parametrize("n_importance", [0, 8])
def test_optimize_codes_batch_matches_sequential(n_importance):
    """The batched multi-object run (one dispatch, G objects) must
    reproduce each object's standalone single-pass trajectory: per-object
    chunks, RNG streams and Adam rows are independent by construction, so
    row g of the (G, D) result equals optimize_codes on object g alone."""
    import dataclasses

    from codenerf_tpu.optimization import codes_opt

    hp = _fused_hparams(n_samples=8)
    if n_importance:
        hp = dataclasses.replace(
            hp, render=dataclasses.replace(hp.render,
                                           n_importance=n_importance))
    params = init_codenerf(jax.random.PRNGKey(1), hp.net)
    G, R = 2, 128  # chunk=64 -> 2 chunks per object
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    ro = jax.random.uniform(ks[0], (G, R, 3), jnp.float32, -0.2, 0.2)
    vd = jax.random.normal(ks[1], (G, R, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    gt = jax.random.uniform(ks[2], (G, R, 3))
    init_s = jax.random.normal(ks[3], (hp.net.latent_dim,)) * 0.05
    init_t = jnp.zeros((hp.net.latent_dim,))
    keys = jnp.stack([jax.random.PRNGKey(100 + g) for g in range(G)])

    kwargs = dict(num_opts=3, lr=1e-2, lr_half_interval=2, chunk=64,
                  use_fused=True)
    batch = codes_opt.optimize_codes_batch(
        params, hp, ro, vd, gt, init_s, init_t, keys, **kwargs)
    assert batch.shape_codes.shape == (G, hp.net.latent_dim)
    assert batch.psnr_history.shape == (3, G)
    assert np.isfinite(np.asarray(batch.psnr_history)).all()
    for g in range(G):
        seq = codes_opt.optimize_codes(
            params, hp, ro[g], vd[g], gt[g], init_s, init_t, keys[g],
            **kwargs)
        np.testing.assert_allclose(
            np.asarray(batch.shape_codes[g]), np.asarray(seq.shape_code),
            atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(batch.texture_codes[g]),
            np.asarray(seq.texture_code), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(batch.psnr_history[:, g]),
            np.asarray(seq.psnr_history), atol=1e-3)


def test_optimize_codes_fused_fallback_and_explicit_raise():
    """An un-tileable chunk quietly falls back when the flag comes from
    hparams, and raises when use_fused=True is explicit."""
    from codenerf_tpu.optimization.codes_opt import build_fused_codes_fns

    hp = _fused_hparams(n_samples=8)
    # chunk 48 is not divisible by the 32-ray forward tile
    apply_fn, composite_fn = build_fused_codes_fns(hp, 48, use_fused=None)
    assert apply_fn is None and composite_fn is None
    with pytest.raises(ValueError, match="can't tile"):
        build_fused_codes_fns(hp, 48, use_fused=True)
    # tileable + hierarchical sampling -> plane op (apply_fn), XLA composite
    import dataclasses
    hp2 = dataclasses.replace(
        hp, render=dataclasses.replace(hp.render, n_importance=8))
    apply_fn, composite_fn = build_fused_codes_fns(hp2, 64, use_fused=True)
    assert apply_fn is not None and composite_fn is None


def test_fused_train_with_occupancy_grid():
    """The production config combination (srncar_occ.json): single-pass
    fused kernel + training occupancy grid. The grid rides as the third
    step input and only changes z generation, so the fused step must (a)
    accept it and (b) agree with the plane-op fused path on the same
    grid."""
    import dataclasses

    from codenerf_tpu.config import TrainOccupancyConfig
    from codenerf_tpu.core.occupancy import OccupancyGrid

    def occ_hp(composite):
        hp = _fused_hparams(fused_composite=composite)
        return dataclasses.replace(
            hp,
            render=dataclasses.replace(hp.render, bound_sphere_radius=1.3),
            train_occupancy=TrainOccupancyConfig(grid_size=8),
        )

    occ = jnp.zeros((8, 8, 8), bool).at[:, :, :4].set(True)
    grid = OccupancyGrid(occ=occ, radius=jnp.asarray(1.3, jnp.float32))

    results = []
    for composite in (True, False):
        hp = occ_hp(composite)
        state, step_fn, pipe = _step_setup(hp, batch_rays=32)
        batch = pipe.sample(32)
        s, m = jax.jit(step_fn)(state, batch, grid)
        assert np.isfinite(float(m["loss"]))
        results.append((s, m))
    np.testing.assert_allclose(float(results[0][1]["loss"]),
                               float(results[1][1]["loss"]), rtol=1e-4)
    a = np.asarray(results[0][0].trainables["params"]["enc_xyz"]["w"],
                   np.float32)
    b = np.asarray(results[1][0].trainables["params"]["enc_xyz"]["w"],
                   np.float32)
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_fused_pose_op_grads():
    """The pose-variant op (frozen weights, input cotangents kept) must
    match the full train op's gradients for rays/depths/codes."""
    from codenerf_tpu.ops.fused_train import (
        make_fused_pose_op,
        make_fused_train_op,
    )

    cfg = NetConfig(shape_blocks=2, texture_blocks=1)
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    R, S = 32, 16
    ro, vd, z, sc, tc, tgt_s, tgt_r = _setup(cfg, R, S)
    pose_op = make_fused_pose_op(cfg)
    full_op = make_fused_train_op(cfg)

    def mk_loss(op):
        def loss(ro, vd, z, sc, tc):
            s, planes = fused_apply_train(params, cfg, ro, vd, z, sc, tc,
                                          op=op)
            r = jnp.stack(planes, axis=-1)
            return jnp.mean((s - tgt_s) ** 2) + jnp.mean((r - tgt_r) ** 2)
        return loss

    gp = jax.grad(mk_loss(pose_op), (0, 1, 2, 3, 4))(ro, vd, z, sc, tc)
    gf = jax.grad(mk_loss(full_op), (0, 1, 2, 3, 4))(ro, vd, z, sc, tc)
    for name, a, b in zip(["ro", "vd", "z", "sc", "tc"], gp, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7, err_msg=name)


@pytest.mark.parametrize("composite,n_importance", [
    (False, 0),   # plane pose op + XLA composite
    (True, 0),    # SINGLE-PASS frozen-model kernel (input_grads)
    (True, 8),    # single-pass hierarchical (two kernel calls, z-vjp)
])
def test_pose_opt_fused_matches_xla(monkeypatch, composite, n_importance):
    """optimize_pose_and_codes on the fused pose kernels — the plane-op
    route and the SINGLE-PASS frozen-model route (weight_grads=False,
    input_grads=True; late r3), incl. hierarchical where the pose
    gradient flows through sample_pdf's z-midpoints. The selected route
    must actually be traced (program-identity spies) and the trajectory
    must match the XLA path."""
    from codenerf_tpu.data.synthetic import synthetic_scene
    from codenerf_tpu.optimization.pose_opt import optimize_pose_and_codes
    from codenerf_tpu.ops import fused_train as ft

    hp = _fused_hparams(n_samples=8, fused_composite=composite)
    scene = synthetic_scene(n_objects=1, n_views=2, H=16, W=16, seed=4)
    import dataclasses
    hp = dataclasses.replace(
        hp, render=dataclasses.replace(hp.render, near=scene["near"],
                                       far=scene["far"],
                                       n_importance=n_importance))
    params = init_codenerf(jax.random.PRNGKey(1), hp.net)
    img = jnp.asarray(scene["images"][0, 0], jnp.float32) / 255.0
    c2w = jnp.asarray(scene["poses"][0, 0])
    init = jnp.zeros((hp.net.latent_dim,))

    calls = {"pose_op": 0, "single": 0}
    orig_plane = ft.make_fused_pose_op
    orig_single = ft.invoke_train_fused

    def spy_plane(*a, **kw):
        calls["pose_op"] += 1
        return orig_plane(*a, **kw)

    def spy_single(*a, **kw):
        calls["single"] += 1
        return orig_single(*a, **kw)

    monkeypatch.setattr(ft, "make_fused_pose_op", spy_plane)
    monkeypatch.setattr(ft, "invoke_train_fused", spy_single)

    kwargs = dict(num_opts=3, rays_per_step=64, lr_codes=1e-2,
                  lr_pose=1e-2, lr_half_interval=2)
    res_f = optimize_pose_and_codes(
        params, hp, img, c2w, float(scene["focals"][0]), init, init,
        jax.random.PRNGKey(0), use_fused=True, **kwargs)
    if composite:
        assert calls["single"] >= 1, "single-pass pose kernel never traced"
        assert calls["pose_op"] == 0
    else:
        assert calls["pose_op"] == 1, "plane pose op never built"
        assert calls["single"] == 0
    res_x = optimize_pose_and_codes(
        params, hp, img, c2w, float(scene["focals"][0]), init, init,
        jax.random.PRNGKey(0), use_fused=False, **kwargs)
    # Finiteness first: zero-init codes once NaN-poisoned both
    # trajectories after step 0 (norm gradient at 0) and assert_allclose
    # passes NaN==NaN — these keep the trajectory comparison real.
    assert np.isfinite(np.asarray(res_f.psnr_history)).all()
    assert np.isfinite(np.asarray(res_f.xi)).all()
    np.testing.assert_allclose(np.asarray(res_f.psnr_history),
                               np.asarray(res_x.psnr_history), atol=0.3)
    np.testing.assert_allclose(np.asarray(res_f.xi), np.asarray(res_x.xi),
                               atol=5e-2)


def test_fused_train_with_multislice_mesh():
    """Single-pass fused training under the 3-axis (replica, data, model)
    multi-slice mesh: the loss/dW psums span BOTH batch axes; must match
    single-device."""
    import jax.numpy as jnp

    from codenerf_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        state_shardings,
    )
    from codenerf_tpu.training.state import create_train_state
    from codenerf_tpu.training.train_step import (
        build_optimizer,
        build_train_step,
    )
    from codenerf_tpu.data.synthetic import synthetic_scene
    from codenerf_tpu.data.pipeline import RayBatchPipeline

    hp = _fused_hparams()
    scene = synthetic_scene(n_objects=2, n_views=4, H=16, W=16, seed=2)
    pipe = RayBatchPipeline(scene["images"], scene["poses"], scene["focals"])
    tx = build_optimizer(hp)
    batch = {k: jnp.asarray(v) for k, v in pipe.sample(256).items()}

    state1 = create_train_state(jax.random.PRNGKey(0), hp, pipe.n_objects, tx)
    s1, m1 = jax.jit(build_train_step(hp, pipe.H, pipe.W, tx,
                                      batch_size=256))(state1, batch)

    mesh = make_mesh(replica=2, data=4, model=1)
    state2 = create_train_state(jax.random.PRNGKey(0), hp, pipe.n_objects, tx)
    st_sh = state_shardings(mesh, state2)
    b_sh = batch_sharding(mesh)
    step2 = jax.jit(
        build_train_step(hp, pipe.H, pipe.W, tx, batch_size=256, mesh=mesh),
        in_shardings=(st_sh, {k: b_sh for k in batch}),
        out_shardings=(st_sh, None),
    )
    state2 = jax.device_put(state2, st_sh)
    s2, m2 = step2(state2, jax.device_put(batch, {k: b_sh for k in batch}))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.trainables),
                    jax.tree_util.tree_leaves(s2.trainables)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=1e-5)


def test_fused_train_step_production_sample_count():
    """S=48 — the production srncar_occ.json sample budget — through the
    single-pass kernel: must match the XLA step's loss trajectory."""
    hp_f = _fused_hparams(n_samples=48)
    hp_x = _fused_hparams(n_samples=48, use_fused=False)
    state_f, step_f, pipe = _step_setup(hp_f, batch_rays=32)
    state_x, step_x, _ = _step_setup(hp_x, batch_rays=32)
    jit_f, jit_x = jax.jit(step_f), jax.jit(step_x)
    batch = pipe.sample(32)
    losses_f, losses_x = [], []
    for _ in range(3):
        state_f, m_f = jit_f(state_f, batch)
        state_x, m_x = jit_x(state_x, batch)
        losses_f.append(float(m_f["loss"]))
        losses_x.append(float(m_x["loss"]))
    np.testing.assert_allclose(losses_f, losses_x, rtol=0.02)


@pytest.mark.parametrize("composite", [False, True])
def test_fused_hierarchical_training_step(composite):
    """n_importance > 0 with use_fused_train, both kernel routes: the
    plane op under autodiff (fused_composite=False), and the fused
    two-call single-pass path (coarse kernel emits the weights plane for
    the inverse CDF, fine kernel runs the union sample count, cotangents
    sum into one prologue VJP). Both must track the XLA hierarchical
    step's loss trajectory."""
    import dataclasses

    hp_f = _fused_hparams(n_samples=8, fused_composite=composite)
    hp_f = dataclasses.replace(
        hp_f, render=dataclasses.replace(hp_f.render, n_importance=8))
    hp_x = dataclasses.replace(hp_f, use_fused_train=False)
    state_f, step_f, pipe = _step_setup(hp_f, batch_rays=32)
    state_x, step_x, _ = _step_setup(hp_x, batch_rays=32)
    jit_f, jit_x = jax.jit(step_f), jax.jit(step_x)
    batch = pipe.sample(32)
    losses_f, losses_x = [], []
    for _ in range(3):
        state_f, m_f = jit_f(state_f, batch)
        state_x, m_x = jit_x(state_x, batch)
        losses_f.append(float(m_f["loss"]))
        losses_x.append(float(m_x["loss"]))
    np.testing.assert_allclose(losses_f, losses_x, rtol=0.02)
    assert losses_f[-1] < losses_f[0]


def test_fused_hierarchical_with_occupancy_grid():
    """Hierarchical sampling composed with the training occupancy grid
    (jsonfiles/srncar_hier_occ.json): the grid tightens the coarse
    window via coarse_zvals, sample_pdf then concentrates the fine
    samples inside it. All three kernel routes — the fused dual-composite
    single-pass path, the plane op under autodiff, and plain XLA — must
    accept the grid as the third step input and track the same loss
    trajectory on it."""
    import dataclasses

    from codenerf_tpu.config import TrainOccupancyConfig
    from codenerf_tpu.core.occupancy import OccupancyGrid

    def hp_for(use_fused, composite):
        hp = _fused_hparams(use_fused=use_fused, fused_composite=composite)
        return dataclasses.replace(
            hp,
            render=dataclasses.replace(hp.render, n_importance=8,
                                       bound_sphere_radius=1.3,
                                       occ_probes=16),
            train_occupancy=TrainOccupancyConfig(grid_size=8),
        )

    occ = jnp.zeros((8, 8, 8), bool).at[:, :, :4].set(True)
    grid = OccupancyGrid(occ=occ, radius=jnp.asarray(1.3, jnp.float32))

    trajectories = []
    for use_fused, composite in ((True, True), (True, False), (False, True)):
        hp = hp_for(use_fused, composite)
        state, step_fn, pipe = _step_setup(hp, batch_rays=32)
        jit_step = jax.jit(step_fn)
        batch = pipe.sample(32)
        losses = []
        for _ in range(3):
            state, m = jit_step(state, batch, grid)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        trajectories.append(losses)
    np.testing.assert_allclose(trajectories[0], trajectories[1], rtol=0.02)
    np.testing.assert_allclose(trajectories[0], trajectories[2], rtol=0.02)
    assert trajectories[0][-1] < trajectories[0][0]


def test_train_kernel_weights_plane_matches_composite():
    """want_weights=True on the single-pass kernel: the emitted (R, S)
    weights plane must match XLA compositing of the same bf16 forward
    (the plane op + core.render.composite), and must not perturb any of
    the existing outputs vs want_weights=False."""
    from codenerf_tpu.core.render import composite
    from codenerf_tpu.ops import fused_mlp
    from codenerf_tpu.ops import fused_train as ft

    cfg = NetConfig(shape_blocks=2, texture_blocks=1)
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    R, S = 32, 16
    ro, vd, z, sc, tc, _, _ = _setup(cfg, R, S)
    gt = jax.random.uniform(jax.random.PRNGKey(9), (R, 3), jnp.float32)
    ro8, vd8, z_f, sproj, tproj, vcontrib = fused_mlp.prep_ray_operands(
        params, cfg, ro, vd, z, sc, tc)
    gt8 = fused_mlp._pad_lanes(gt, 8)
    wflat = ft.flatten_params_f32(params, cfg)
    scale = 1.0 / (R * 3)

    outs_w = ft.invoke_train_fused(cfg, S, R, True, scale, ro8, vd8, z_f,
                                   sproj, tproj, vcontrib, gt8, wflat,
                                   want_weights=True)
    outs_0 = ft.invoke_train_fused(cfg, S, R, True, scale, ro8, vd8, z_f,
                                   sproj, tproj, vcontrib, gt8, wflat,
                                   want_weights=False)
    w_kernel = outs_w[4]
    assert w_kernel.shape == (R, S)

    sig, rgbs = fused_apply_train(params, cfg, ro, vd, z, sc, tc)
    res = composite(sig, rgbs, z, white_bg=True)
    np.testing.assert_allclose(np.asarray(w_kernel),
                               np.asarray(res.weights),
                               rtol=1e-4, atol=1e-6)

    for a, b in zip(list(outs_w[:4]) + list(outs_w[5:]), list(outs_0)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_fused_hierarchical_with_mesh_matches_single_device():
    """The fused two-call hierarchical step under a data-parallel mesh:
    both kernel calls shard over rays, sample_pdf/union-sort partition
    per-ray in XLA between them, and the summed cotangents' dW psums span
    the batch axes. Must match the single-device fused hierarchical step."""
    import dataclasses

    import jax.numpy as jnp

    from codenerf_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        state_shardings,
    )
    from codenerf_tpu.training.state import create_train_state
    from codenerf_tpu.training.train_step import (
        build_optimizer,
        build_train_step,
    )
    from codenerf_tpu.data.synthetic import synthetic_scene
    from codenerf_tpu.data.pipeline import RayBatchPipeline

    hp = _fused_hparams(n_samples=8)
    hp = dataclasses.replace(
        hp, render=dataclasses.replace(hp.render, n_importance=8))
    scene = synthetic_scene(n_objects=2, n_views=4, H=16, W=16, seed=2)
    pipe = RayBatchPipeline(scene["images"], scene["poses"], scene["focals"])
    tx = build_optimizer(hp)
    batch = {k: jnp.asarray(v) for k, v in pipe.sample(256).items()}

    state1 = create_train_state(jax.random.PRNGKey(0), hp, pipe.n_objects, tx)
    s1, m1 = jax.jit(build_train_step(hp, pipe.H, pipe.W, tx,
                                      batch_size=256))(state1, batch)

    mesh = make_mesh(model=1)  # 8-way DP: 32 rays/device = two ray tiles
    state2 = create_train_state(jax.random.PRNGKey(0), hp, pipe.n_objects, tx)
    st_sh = state_shardings(mesh, state2)
    b_sh = batch_sharding(mesh)
    step2 = jax.jit(
        build_train_step(hp, pipe.H, pipe.W, tx, batch_size=256, mesh=mesh),
        in_shardings=(st_sh, {k: b_sh for k in batch}),
        out_shardings=(st_sh, None),
    )
    state2 = jax.device_put(state2, st_sh)
    s2, m2 = step2(state2, jax.device_put(batch, {k: b_sh for k in batch}))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.trainables),
                    jax.tree_util.tree_leaves(s2.trainables)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=1e-5)


def test_dual_composite_matches_subset_and_plain():
    """The row-stacked dual composite's COARSE half (coarse subset of a
    union-sorted sample axis, externally supplied coarse deltas, masked
    1e-10 cumprod floor) must reproduce compositing the coarse samples
    ALONE — forward outputs and sigma/rgb cotangents both — with coarse
    cotangent contributions exactly zero at fine positions; its FINE half
    must be bitwise the plain composite over the union. Pure jnp helpers,
    no pallas needed."""
    from codenerf_tpu.core.render import composite
    from codenerf_tpu.ops import fused_mlp

    T, Sc, Sf = 4, 8, 5
    S = Sc + Sf
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    z_c = jnp.sort(jax.random.uniform(ks[0], (T, Sc), jnp.float32, 0.3, 2.0), -1)
    z_f = jax.random.uniform(ks[1], (T, Sf), jnp.float32, 0.3, 2.0)
    # union-sort with a coarse flag + coarse-delta payloads (the production
    # recipe in ops/fused_train.hier_fine_zvals_meta)
    cdelta_c = jnp.concatenate(
        [z_c[:, 1:] - z_c[:, :-1], jnp.full_like(z_c[:, :1], 1e10)], -1)
    from codenerf_tpu.core.sampling import merge_sorted_samples

    z_all, (cmask, cdelta) = merge_sorted_samples(
        z_c, z_f, [jnp.ones_like(z_c), cdelta_c],
        [jnp.zeros_like(z_f), jnp.zeros_like(z_f)])

    sig = jax.random.uniform(ks[2], (T, S), jnp.float32, 0.0, 3.0)
    c0 = jax.random.uniform(ks[3], (T, S))
    c1 = jax.random.uniform(ks[4], (T, S))
    c2 = jax.random.uniform(ks[5], (T, S))

    out8_f, out8_c, aux = fused_mlp.composite_fwd_dual_in_kernel(
        sig, c0, c1, c2, z_all, cdelta, cmask, True)

    # FINE half: bitwise the plain composite over the union.
    out8_plain, aux_plain = fused_mlp.composite_fwd_in_kernel(
        sig, c0, c1, c2, z_all, True)
    np.testing.assert_array_equal(np.asarray(out8_f), np.asarray(out8_plain))

    # COARSE half: composite the coarse subset alone. Recover the subset
    # by argsort of (1 - cmask) stable — coarse entries first, in order.
    order = jnp.asarray(
        np.argsort(1.0 - np.asarray(cmask), axis=-1, kind="stable")[:, :Sc])
    take = lambda p: jnp.take_along_axis(p, order, axis=-1)
    res = composite(take(sig), (take(c0), take(c1), take(c2)), take(z_all),
                    white_bg=True)
    np.testing.assert_allclose(np.asarray(out8_c[:, :3]), np.asarray(res.rgb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out8_c[:, 3]), np.asarray(res.depth),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out8_c[:, 4]), np.asarray(res.acc),
                               rtol=1e-5, atol=1e-6)

    # Coarse cotangents: zero the fine cotangent — the dual backward then
    # returns the coarse contributions alone; check against jax.grad of
    # the subset composite's MSE, and exact zeros at fine positions.
    gt = jax.random.uniform(jax.random.PRNGKey(9), (T, 3), jnp.float32)
    g8c = jnp.pad(2.0 * (out8_c[:, :3] - gt), ((0, 0), (0, 5)))
    gsig, gc0, gc1, gc2 = fused_mlp.composite_bwd_dual_in_kernel(
        c0, c1, c2, z_all, jnp.zeros_like(g8c), g8c, aux, True)
    assert np.all(np.asarray(gsig)[np.asarray(cmask) == 0.0] == 0.0)
    assert np.all(np.asarray(gc0)[np.asarray(cmask) == 0.0] == 0.0)

    def ref_loss(args):
        s, a, b, c = args
        r = composite(take(s), (take(a), take(b), take(c)), take(z_all),
                      white_bg=True)
        return jnp.sum((r.rgb - gt) ** 2)

    ref_g = jax.grad(ref_loss)((sig, c0, c1, c2))
    # ref grads live on union positions already (take() is a gather whose
    # vjp scatters back)
    for got, want in zip((gsig, gc0, gc1, gc2), ref_g):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-6)

    # Fine cotangents: zero the coarse cotangent — bitwise the plain
    # backward's sigma/rgb cotangents over the union.
    g8f = jnp.pad(2.0 * (out8_f[:, :3] - gt), ((0, 0), (0, 5)))
    got_f = fused_mlp.composite_bwd_dual_in_kernel(
        c0, c1, c2, z_all, g8f, jnp.zeros_like(g8f), aux, True)
    want_f = fused_mlp.composite_bwd_in_kernel(
        sig, c0, c1, c2, z_all, g8f, aux_plain, True)[:4]
    for got, want in zip(got_f, want_f):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # Both cotangents live: the dual backward is the SUM of the halves.
    got_sum = fused_mlp.composite_bwd_dual_in_kernel(
        c0, c1, c2, z_all, g8f, g8c, aux, True)
    for got, a, b in zip(got_sum, got_f, (gsig, gc0, gc1, gc2)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(a + b),
                                   rtol=1e-6, atol=1e-7)


def test_sigma_only_fwd_matches_full():
    """sigma_only=True on the forward kernel: bitwise the full kernel's
    sigma plane (same matmul chain up to the sigma head)."""
    from codenerf_tpu.ops import fused_mlp
    from codenerf_tpu.ops import fused_train as ft

    cfg = NetConfig(shape_blocks=2, texture_blocks=1)
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    R, S = 64, 8
    ro, vd, z, sc, tc, _, _ = _setup(cfg, R, S)
    ro8, vd8, z_f, sproj, tproj, vcontrib = fused_mlp.prep_ray_operands(
        params, cfg, ro, vd, z, sc, tc)
    wb = [x.astype(jnp.bfloat16) if x.ndim == 2 else x
          for x in ft.flatten_params_f32(params, cfg)]
    full = fused_mlp.invoke_fwd(cfg, S, R, ro8, vd8, z_f, sproj, tproj,
                                vcontrib, wb)
    sig_only = fused_mlp.invoke_fwd(cfg, S, R, ro8, vd8, z_f, sproj, tproj,
                                    vcontrib, wb, sigma_only=True)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(sig_only))


def test_dual_kernel_grads_match_two_call_recipe():
    """The dual-composite union kernel's cotangents equal the SUM of the
    former two-call recipe's (coarse single-pass at z_coarse + fine
    single-pass at the union) for the same loss fine_mse + coarse_mse —
    one MLP evaluation instead of two."""
    from codenerf_tpu.core.sampling import merge_sorted_samples
    from codenerf_tpu.ops import fused_mlp
    from codenerf_tpu.ops import fused_train as ft

    cfg = NetConfig(shape_blocks=2, texture_blocks=1)
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    R, Sc, Sf = 32, 8, 8
    ro, vd, z_c, sc, tc, _, _ = _setup(cfg, R, Sc)
    z_f = jax.random.uniform(jax.random.PRNGKey(11), (R, Sf), jnp.float32,
                             0.3, 2.2)
    cdelta_c = jnp.concatenate(
        [z_c[:, 1:] - z_c[:, :-1], jnp.full_like(z_c[:, :1], 1e10)], -1)
    z_all, (cmask, cdelta) = merge_sorted_samples(
        z_c, z_f, [jnp.ones_like(z_c), cdelta_c],
        [jnp.zeros_like(z_f), jnp.zeros_like(z_f)])

    gt = jax.random.uniform(jax.random.PRNGKey(9), (R, 3), jnp.float32)
    ro8, vd8, _, sproj, tproj, vcontrib = fused_mlp.prep_ray_operands(
        params, cfg, ro, vd, z_c, sc, tc)
    gt8 = fused_mlp._pad_lanes(gt, 8)
    wflat = ft.flatten_params_f32(params, cfg)
    scale = 1.0 / (R * 3)

    dual = ft.invoke_train_fused(cfg, Sc + Sf, R, True, scale, ro8, vd8,
                                 z_all, sproj, tproj, vcontrib, gt8, wflat,
                                 coarse_mask=cmask, coarse_delta=cdelta)
    se_f, se_c = dual[0], dual[1]

    coarse = ft.invoke_train_fused(cfg, Sc, R, True, scale, ro8, vd8, z_c,
                                   sproj, tproj, vcontrib, gt8, wflat)
    fine = ft.invoke_train_fused(cfg, Sc + Sf, R, True, scale, ro8, vd8,
                                 z_all, sproj, tproj, vcontrib, gt8, wflat)
    np.testing.assert_allclose(float(se_c), float(coarse[0]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(se_f), float(fine[0]),
                               rtol=1e-5, atol=1e-7)
    for got, a, b in zip(dual[2:], coarse[1:], fine[1:]):
        want = np.asarray(a, np.float32) + np.asarray(b, np.float32)
        scale_ref = max(1e-3, float(np.abs(want).max()))
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   rtol=5e-3, atol=2e-3 * scale_ref)


def test_optimize_codes_stochastic_rays_per_step():
    """STOCHASTIC code optimization (rays_per_step minibatches, late r3):
    (a) the minibatch selection happens before route dispatch, so the
    single-pass kernel route and the XLA route see identical minibatches
    and their trajectories must match like the full-view runs do; (b) the
    batched multi-object stochastic run bitwise-follows each standalone
    stochastic run; (c) rays_per_step >= n_rays falls back to the exact
    full-view protocol."""
    from codenerf_tpu.optimization import codes_opt

    hp = _fused_hparams(n_samples=8)
    params = init_codenerf(jax.random.PRNGKey(1), hp.net)
    G, R = 2, 128
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    ro = jax.random.uniform(ks[0], (G, R, 3), jnp.float32, -0.2, 0.2)
    vd = jax.random.normal(ks[1], (G, R, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    gt = jax.random.uniform(ks[2], (G, R, 3))
    init_s = jax.random.normal(ks[3], (hp.net.latent_dim,)) * 0.05
    init_t = jnp.zeros((hp.net.latent_dim,))
    keys = jnp.stack([jax.random.PRNGKey(100 + g) for g in range(G)])

    kwargs = dict(num_opts=4, lr=1e-2, lr_half_interval=2, chunk=64,
                  rays_per_step=32)
    # (a) fused single-pass vs XLA on the SAME minibatch stream
    res_f = codes_opt.optimize_codes(
        params, hp, ro[0], vd[0], gt[0], init_s, init_t, keys[0],
        use_fused=True, **kwargs)
    res_x = codes_opt.optimize_codes(
        params, hp, ro[0], vd[0], gt[0], init_s, init_t, keys[0],
        use_fused=False, **kwargs)
    assert np.isfinite(np.asarray(res_f.psnr_history)).all()
    np.testing.assert_allclose(np.asarray(res_f.psnr_history),
                               np.asarray(res_x.psnr_history), atol=0.3)
    np.testing.assert_allclose(np.asarray(res_f.shape_code),
                               np.asarray(res_x.shape_code), atol=5e-2)

    # (b) batched stochastic == standalone stochastic, per object
    batch = codes_opt.optimize_codes_batch(
        params, hp, ro, vd, gt, init_s, init_t, keys, use_fused=True,
        **kwargs)
    assert batch.psnr_history.shape == (4, G)
    for g in range(G):
        seq = codes_opt.optimize_codes(
            params, hp, ro[g], vd[g], gt[g], init_s, init_t, keys[g],
            use_fused=True, **kwargs)
        np.testing.assert_allclose(
            np.asarray(batch.shape_codes[g]), np.asarray(seq.shape_code),
            atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(batch.psnr_history[:, g]),
            np.asarray(seq.psnr_history), atol=1e-3)

    # (c) a full-pool budget is the exact protocol (identical cache entry)
    full = dict(kwargs, rays_per_step=R)
    res_full = codes_opt.optimize_codes(
        params, hp, ro[0], vd[0], gt[0], init_s, init_t, keys[0],
        use_fused=True, **full)
    res_none = codes_opt.optimize_codes(
        params, hp, ro[0], vd[0], gt[0], init_s, init_t, keys[0],
        use_fused=True, **dict(kwargs, rays_per_step=None))
    np.testing.assert_array_equal(np.asarray(res_full.shape_code),
                                  np.asarray(res_none.shape_code))

    # progress renders need the full view: the combination must raise
    with pytest.raises(ValueError, match="progress"):
        codes_opt.optimize_codes(
            params, hp, ro[0], vd[0], gt[0], init_s, init_t, keys[0],
            use_fused=True, progress_rays=16, **kwargs)
