"""Reference-checkpoint converter test: build a synthetic torch-style
state_dict (plain tensors — no reference code involved), convert, and check
the converted model computes the same function as a torch-semantics matmul
chain evaluated in numpy."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from codenerf_tpu.config import NetConfig  # noqa: E402
from codenerf_tpu.models.codenerf import apply_codenerf, init_codenerf  # noqa: E402
from tools.convert_reference_checkpoint import state_dict_to_params  # noqa: E402


def _fake_reference_state_dict(cfg, rng):
    """Random tensors shaped like the reference's state_dict
    (torch Linear: weight (out, in), bias (out,))."""
    sd = {}

    def lin(prefix, d_in, d_out):
        sd[f"{prefix}.weight"] = torch.tensor(
            rng.standard_normal((d_out, d_in)).astype(np.float32) * 0.05)
        sd[f"{prefix}.bias"] = torch.tensor(
            rng.standard_normal(d_out).astype(np.float32) * 0.05)

    lin("encoding_xyz.0", cfg.d_xyz, cfg.W)
    for j in range(cfg.shape_blocks):
        lin(f"shape_latent_layer_{j + 1}.0", cfg.latent_dim, cfg.W)
        lin(f"shape_layer_{j + 1}.0", cfg.W, cfg.W)
    lin("encoding_shape", cfg.W, cfg.W)
    lin("sigma.0", cfg.W, 1)
    lin("encoding_viewdir.0", cfg.W + cfg.d_viewdir, cfg.W)
    for j in range(cfg.texture_blocks):
        lin(f"texture_latent_layer_{j + 1}.0", cfg.latent_dim, cfg.W)
        lin(f"texture_layer_{j + 1}.0", cfg.W, cfg.W)
    lin("rgb.0", cfg.W, cfg.W // 2)
    lin("rgb.2", cfg.W // 2, 3)
    return sd


def test_converted_params_match_architecture(rng):
    cfg = NetConfig(shape_blocks=2, texture_blocks=1, W=32,
                    num_xyz_freq=2, num_dir_freq=1, latent_dim=8)
    sd = _fake_reference_state_dict(cfg, rng)
    params = state_dict_to_params(sd, cfg.shape_blocks, cfg.texture_blocks)
    # structure must match a freshly initialized pytree exactly
    ref = init_codenerf(jax.random.PRNGKey(0), cfg)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(ref)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(ref)):
        assert np.asarray(a).shape == np.asarray(b).shape
    # torch weight (out, in) transposed to (in, out)
    np.testing.assert_allclose(
        params["enc_xyz"]["w"],
        sd["encoding_xyz.0.weight"].numpy().T, atol=0)


def test_converted_forward_matches_torch_semantics(rng):
    """y = x @ W.T + b (torch Linear semantics) chained per the documented
    architecture must equal our apply() on converted params."""
    cfg = NetConfig(shape_blocks=1, texture_blocks=1, W=16,
                    num_xyz_freq=2, num_dir_freq=1, latent_dim=4)
    sd = _fake_reference_state_dict(cfg, rng)
    params = state_dict_to_params(sd, cfg.shape_blocks, cfg.texture_blocks)

    R, S = 3, 5
    xyz = rng.standard_normal((R, S, 3)).astype(np.float32)
    vd = rng.standard_normal((R, 3)).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    sc = rng.standard_normal((R, 4)).astype(np.float32)
    tc = rng.standard_normal((R, 4)).astype(np.float32)

    sig, rgb = apply_codenerf(params, cfg, jnp.asarray(xyz), jnp.asarray(vd),
                              jnp.asarray(sc), jnp.asarray(tc),
                              compute_dtype=jnp.float32)

    # independent numpy evaluation with torch Linear conventions
    def pe(x, F):
        sc_ = np.concatenate([(2.0 ** i) * x for i in range(F)], -1)
        return np.concatenate([x, np.sin(sc_), np.cos(sc_)], -1)

    def lin(prefix, x):
        w = sd[f"{prefix}.weight"].numpy()
        b = sd[f"{prefix}.bias"].numpy()
        return x @ w.T + b

    relu = lambda x: np.maximum(x, 0)
    y = relu(lin("encoding_xyz.0", pe(xyz, cfg.num_xyz_freq)))
    z = relu(lin("shape_latent_layer_1.0", sc))
    y = relu(lin("shape_layer_1.0", y + z[:, None, :]))
    y = lin("encoding_shape", y)
    sig_ref = np.log1p(np.exp(-np.abs(lin("sigma.0", y)))) + np.maximum(
        lin("sigma.0", y), 0)
    vdp = np.broadcast_to(pe(vd, cfg.num_dir_freq)[:, None, :],
                          (R, S, cfg.d_viewdir))
    y = relu(lin("encoding_viewdir.0", np.concatenate([y, vdp], -1)))
    z = relu(lin("texture_latent_layer_1.0", tc))
    y = relu(lin("texture_layer_1.0", y + z[:, None, :]))
    rgb_ref = lin("rgb.2", relu(lin("rgb.0", y)))

    np.testing.assert_allclose(np.asarray(sig), sig_ref[..., 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref, atol=1e-4)


def test_full_convert_roundtrip(tmp_path, rng):
    """models.pth -> convert() -> restore_raw()."""
    cfg = NetConfig(shape_blocks=2, texture_blocks=1, W=32,
                    num_xyz_freq=2, num_dir_freq=1, latent_dim=8)
    sd = _fake_reference_state_dict(cfg, rng)
    saved = {
        "model_params": sd,
        "shape_code_params": {
            "weight": torch.tensor(
                rng.standard_normal((5, 8)).astype(np.float32))},
        "texture_code_params": {
            "weight": torch.tensor(
                rng.standard_normal((5, 8)).astype(np.float32))},
        "niter": 1234,
        "nepoch": 7,
    }
    pth = tmp_path / "models.pth"
    torch.save(saved, pth)

    from tools.convert_reference_checkpoint import convert
    from codenerf_tpu.utils.checkpoint import restore_raw

    convert(str(pth), str(tmp_path / "run"),
            shape_blocks=2, texture_blocks=1)
    raw = restore_raw(str(tmp_path / "run" / "ckpt"))
    assert int(raw["step"]) == 1234
    assert np.asarray(raw["trainables"]["shape_codes"]).shape == (5, 8)
    np.testing.assert_allclose(
        np.asarray(raw["trainables"]["params"]["rgb_out"]["w"]),
        sd["rgb.2.weight"].numpy().T, atol=1e-6)


def test_export_import_roundtrip(rng):
    """Reverse converter (Orbax -> models.pth payload): exporting our
    params and re-importing through the forward converter must be
    bitwise — the two key/transposition maps are exact inverses."""
    import jax

    from tools.export_reference_checkpoint import trainables_to_reference

    cfg = NetConfig(shape_blocks=3, texture_blocks=1, W=32,
                    num_xyz_freq=2, num_dir_freq=1, latent_dim=8)
    params = init_codenerf(jax.random.PRNGKey(3), cfg)
    trainables = {
        "params": params,
        "shape_codes": jnp.asarray(
            rng.standard_normal((5, cfg.latent_dim)).astype(np.float32)),
        "texture_codes": jnp.asarray(
            rng.standard_normal((5, cfg.latent_dim)).astype(np.float32)),
    }
    payload = trainables_to_reference(trainables, niter=42, nepoch=2)
    assert payload["niter"] == 42 and payload["nepoch"] == 2
    np.testing.assert_array_equal(
        payload["shape_code_params"]["weight"].numpy(),
        np.asarray(trainables["shape_codes"]))

    back = state_dict_to_params(payload["model_params"], cfg.shape_blocks,
                                cfg.texture_blocks)
    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(params))
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
