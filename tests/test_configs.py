"""Shipped config files: every jsonfile must parse, and the CPU-runnable
BASELINE config (chairs coarse-only, 64 samples) must build and execute a
train step on CPU."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from codenerf_tpu.config import load_hparams

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JSONDIR = os.path.join(REPO, "jsonfiles")


def test_all_shipped_configs_parse():
    files = glob.glob(os.path.join(JSONDIR, "*.json"))
    assert len(files) >= 4
    for f in files:
        hp = load_hparams(f)
        assert hp.render.far > hp.render.near
        assert hp.net.W % 2 == 0


def test_srncar_matches_reference_values():
    hp = load_hparams(os.path.join(JSONDIR, "srncar.json"))
    # values from the reference config (jsonfiles/srncar.json:1-24)
    assert hp.net.shape_blocks == 3 and hp.net.texture_blocks == 1
    assert hp.net.W == 256 and hp.net.latent_dim == 256
    assert hp.render.n_samples == 96
    assert (hp.render.near, hp.render.far) == (0.8, 1.8)
    assert hp.lr_model.lr == 1e-4 and hp.lr_model.interval == 250_000
    assert hp.lr_codes.lr == 1e-3 and hp.loss_reg_coef == 1e-4


def test_chairs_coarse64_cpu_train_step(tiny_scene):
    """BASELINE config 1: coarse-only 64 samples, CPU-runnable train step."""
    import dataclasses

    from codenerf_tpu.data.pipeline import RayBatchPipeline
    from codenerf_tpu.training.state import create_train_state
    from codenerf_tpu.training.train_step import build_optimizer, build_train_step

    hp = load_hparams(os.path.join(JSONDIR, "srnchair_coarse64.json"))
    assert hp.render.n_samples == 64 and hp.render.n_importance == 0
    assert (hp.render.near, hp.render.far) == (1.25, 2.75)
    # shrink the MLP so the CPU step is quick; sampling config stays
    hp = dataclasses.replace(
        hp,
        net=dataclasses.replace(hp.net, W=64, shape_blocks=1,
                                num_xyz_freq=4, num_dir_freq=2,
                                latent_dim=16),
        render=dataclasses.replace(hp.render, near=tiny_scene["near"],
                                   far=tiny_scene["far"]),
    )
    pipe = RayBatchPipeline(tiny_scene["images"], tiny_scene["poses"],
                            tiny_scene["focals"])
    tx = build_optimizer(hp)
    state = create_train_state(jax.random.PRNGKey(0), hp, pipe.n_objects, tx)
    step = jax.jit(build_train_step(hp, pipe.H, pipe.W, tx))
    batch = {k: jnp.asarray(v) for k, v in pipe.sample(256, crop=True).items()}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
