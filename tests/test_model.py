"""Model tests: architecture parity (dims, param count — SURVEY §2.2),
numerical equivalence with an independent numpy forward pass, code
broadcasting, and dtype behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from codenerf_tpu.config import NetConfig
from codenerf_tpu.models.codenerf import apply_codenerf, init_codenerf, param_count
from codenerf_tpu.models.codes import init_codes, mean_code


def _numpy_forward(params, cfg, xyz, viewdir, shape_code, texture_code):
    """Independent numpy implementation of the documented architecture
    (src/model.py:36-53 semantics)."""

    def pe(x, F):
        scaled = np.concatenate([(2.0 ** i) * x for i in range(F)], -1)
        return np.concatenate([x, np.sin(scaled), np.cos(scaled)], -1)

    def dense(p, x):
        return x @ np.asarray(p["w"]) + np.asarray(p["b"])

    relu = lambda x: np.maximum(x, 0)
    softplus = lambda x: np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)

    R, S = xyz.shape[:2]
    y = relu(dense(params["enc_xyz"], pe(xyz, cfg.num_xyz_freq)))
    for j in range(cfg.shape_blocks):
        z = relu(dense(params[f"shape_latent_{j}"], shape_code))  # (R, W)
        y = y + z[:, None, :]
        y = relu(dense(params[f"shape_{j}"], y))
    y = dense(params["enc_shape"], y)  # no activation
    sigmas = softplus(dense(params["sigma"], y))[..., 0]
    vd = np.broadcast_to(pe(viewdir, cfg.num_dir_freq)[:, None, :], (R, S, cfg.d_viewdir))
    y = relu(dense(params["enc_viewdir"], np.concatenate([y, vd], -1)))
    for j in range(cfg.texture_blocks):
        z = relu(dense(params[f"texture_latent_{j}"], texture_code))
        y = y + z[:, None, :]
        y = relu(dense(params[f"texture_{j}"], y))
    y = relu(dense(params["rgb_hidden"], y))
    rgbs = dense(params["rgb_out"], y)
    return sigmas, rgbs


def test_param_count_matches_survey():
    # SURVEY §2.2: ~715K params at W=256, 3 shape + 1 texture block.
    cfg = NetConfig()
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    expected = (
        (63 * 256 + 256)                      # enc_xyz
        + 3 * 2 * (256 * 256 + 256)           # shape latent+main blocks
        + (256 * 256 + 256)                   # enc_shape
        + (256 * 1 + 1)                       # sigma
        + ((256 + 27) * 256 + 256)            # enc_viewdir
        + 1 * 2 * (256 * 256 + 256)           # texture blocks
        + (256 * 128 + 128)                   # rgb hidden
        + (128 * 3 + 3)                       # rgb out
    )
    assert param_count(params) == expected


def test_forward_shapes_and_ranges(rng):
    cfg = NetConfig(shape_blocks=2, texture_blocks=1, W=64,
                    num_xyz_freq=4, num_dir_freq=2, latent_dim=16)
    params = init_codenerf(jax.random.PRNGKey(1), cfg)
    R, S = 5, 7
    xyz = jnp.asarray(rng.standard_normal((R, S, 3)).astype(np.float32))
    vd = rng.standard_normal((R, 3)).astype(np.float32)
    vd = jnp.asarray(vd / np.linalg.norm(vd, axis=-1, keepdims=True))
    sc = jnp.asarray(rng.standard_normal((R, 16)).astype(np.float32))
    tc = jnp.asarray(rng.standard_normal((R, 16)).astype(np.float32))
    sigmas, rgbs = apply_codenerf(params, cfg, xyz, vd, sc, tc,
                                  compute_dtype=jnp.float32)
    assert sigmas.shape == (R, S) and rgbs.shape == (R, S, 3)
    assert (np.asarray(sigmas) >= 0).all()  # softplus head
    assert sigmas.dtype == jnp.float32 and rgbs.dtype == jnp.float32


def test_forward_matches_numpy_reference(rng):
    cfg = NetConfig(shape_blocks=3, texture_blocks=1, W=32,
                    num_xyz_freq=3, num_dir_freq=2, latent_dim=8)
    params = init_codenerf(jax.random.PRNGKey(2), cfg)
    R, S = 4, 6
    xyz = rng.standard_normal((R, S, 3)).astype(np.float32)
    vd = rng.standard_normal((R, 3)).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    sc = rng.standard_normal((R, 8)).astype(np.float32)
    tc = rng.standard_normal((R, 8)).astype(np.float32)
    sigmas, rgbs = apply_codenerf(
        params, cfg, jnp.asarray(xyz), jnp.asarray(vd),
        jnp.asarray(sc), jnp.asarray(tc), compute_dtype=jnp.float32,
    )
    np_params = jax.tree_util.tree_map(np.asarray, params)
    sig_ref, rgb_ref = _numpy_forward(np_params, cfg, xyz, vd, sc, tc)
    np.testing.assert_allclose(np.asarray(sigmas), sig_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rgbs), rgb_ref, atol=1e-4)


def test_single_code_broadcasts(rng):
    cfg = NetConfig(shape_blocks=1, texture_blocks=1, W=32,
                    num_xyz_freq=2, num_dir_freq=1, latent_dim=8)
    params = init_codenerf(jax.random.PRNGKey(3), cfg)
    R, S = 3, 4
    xyz = jnp.asarray(rng.standard_normal((R, S, 3)).astype(np.float32))
    vd = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    code = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    s1, r1 = apply_codenerf(params, cfg, xyz, vd, code, code,
                            compute_dtype=jnp.float32)
    codes = jnp.broadcast_to(code, (R, 8))
    s2, r2 = apply_codenerf(params, cfg, xyz, vd, codes, codes,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)


def test_bfloat16_close_to_float32(rng):
    cfg = NetConfig(shape_blocks=2, texture_blocks=1, W=64,
                    num_xyz_freq=4, num_dir_freq=2, latent_dim=16)
    params = init_codenerf(jax.random.PRNGKey(4), cfg)
    xyz = jnp.asarray(rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32))
    vd = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
    code = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    s32, r32 = apply_codenerf(params, cfg, xyz, vd, code, code,
                              compute_dtype=jnp.float32)
    s16, r16 = apply_codenerf(params, cfg, xyz, vd, code, code,
                              compute_dtype=jnp.bfloat16)
    assert s16.dtype == jnp.float32  # heads stay f32
    # bf16 matmuls with f32 accumulation: relative error small
    denom = np.abs(np.asarray(r32)).mean() + 1e-3
    assert np.abs(np.asarray(r16) - np.asarray(r32)).mean() / denom < 0.1


def test_codes_init_scale_and_mean():
    table = init_codes(jax.random.PRNGKey(5), 512, 256)
    assert table.shape == (512, 256)
    # std should be ~ sqrt(2/256) = 0.0884 (src/trainer.py:139-140)
    assert abs(float(jnp.std(table)) - np.sqrt(2.0 / 256.0)) < 0.005
    m = mean_code(table)
    assert m.shape == (256,)
    np.testing.assert_allclose(np.asarray(m), np.asarray(table).mean(0), atol=1e-6)
