"""Fused Pallas MLP kernel vs the XLA forward, run in interpreter mode on
CPU (the kernel itself targets TPU; interpret mode checks the math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import codenerf_tpu.ops.fused_mlp as fm
from codenerf_tpu.config import NetConfig
from codenerf_tpu.models.codenerf import apply_codenerf, init_codenerf


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    # fused_mlp imports `pallas as pl` inside the function, so patching the
    # module attribute is sufficient.
    monkeypatch.setattr(pl, "pallas_call", patched, raising=True)


def _inputs(cfg, R, S, seed=0):
    """Rays + per-ray ascending z (the fused op's native boundary) plus the
    expanded xyz for the XLA reference path."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    ro = jax.random.uniform(ks[0], (R, 3), jnp.float32, -0.5, 0.5)
    vd = jax.random.normal(ks[1], (R, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(ks[4], (R, S), jnp.float32, 0.3, 2.2), -1)
    xyz = ro[:, None, :] + vd[:, None, :] * z[..., None]
    sc = jax.random.normal(ks[2], (R, cfg.latent_dim)) * 0.09
    tc = jax.random.normal(ks[3], (R, cfg.latent_dim)) * 0.09
    return ro, vd, z, xyz, sc, tc


def test_fused_matches_xla_flagship():
    cfg = NetConfig()  # flagship: W=256, 3+1 blocks
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    R, S = 64, 96
    ro, vd, z, xyz, sc, tc = _inputs(cfg, R, S)
    s_ref, r_ref = apply_codenerf(params, cfg, xyz, vd, sc, tc,
                                  compute_dtype=jnp.bfloat16)
    s_f, planes = fm.fused_codenerf_apply(params, cfg, ro, vd, z, sc, tc)
    r_f = jnp.stack(planes, axis=-1)
    assert s_f.shape == (R, S) and r_f.shape == (R, S, 3)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_ref), atol=2e-3)


def test_fused_single_code_broadcast():
    cfg = NetConfig(shape_blocks=2, texture_blocks=1)
    params = init_codenerf(jax.random.PRNGKey(1), cfg)
    R, S = 32, 16
    ro, vd, z, xyz, sc, tc = _inputs(cfg, R, S, seed=1)
    s1, r1 = fm.fused_codenerf_apply(params, cfg, ro, vd, z, sc[0], tc[0])
    s2, r2 = fm.fused_codenerf_apply(
        params, cfg, ro, vd, z,
        jnp.broadcast_to(sc[0], sc.shape), jnp.broadcast_to(tc[0], tc.shape),
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_availability_rules():
    cfg = NetConfig()
    assert fm.fused_available(cfg, 4096, 96)
    assert not fm.fused_available(cfg, 100, 96)  # rays not tile-divisible
    assert not fm.fused_available(NetConfig(W=192), 4096, 96)  # W%128 != 0
    with pytest.raises(ValueError):
        fm.fused_codenerf_apply(
            init_codenerf(jax.random.PRNGKey(0), NetConfig(W=192)),
            NetConfig(W=192),
            jnp.zeros((32, 3)), jnp.zeros((32, 3)), jnp.zeros((32, 8)),
            jnp.zeros(256), jnp.zeros(256),
        )
