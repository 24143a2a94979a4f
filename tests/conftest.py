"""Test harness configuration.

The suite runs on CPU with 8 virtual devices so mesh-sharded code paths are
exercised without TPU hardware (the reference has NO tests at all —
SURVEY §4; this suite is designed from scratch). The axon TPU plugin forces
``JAX_PLATFORMS=axon`` via sitecustomize, so the platform must be overridden
through jax.config before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_scene():
    from codenerf_tpu.data.synthetic import synthetic_scene

    return synthetic_scene(n_objects=2, n_views=6, H=16, W=16, seed=0)


@pytest.fixture(scope="session")
def tiny_hparams(tiny_scene):
    from codenerf_tpu.config import Hparams, LrSchedule, NetConfig, RenderConfig

    return Hparams(
        net=NetConfig(
            shape_blocks=2, texture_blocks=1, W=64,
            num_xyz_freq=6, num_dir_freq=2, latent_dim=32,
        ),
        render=RenderConfig(
            n_samples=24, near=tiny_scene["near"], far=tiny_scene["far"]
        ),
        lr_model=LrSchedule(lr=5e-4, interval=100_000),
        lr_codes=LrSchedule(lr=5e-3, interval=100_000),
        check_points=0,
        compute_dtype="float32",
    )


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def trained(tiny_scene, tiny_hparams, tmp_path_factory):
    """A model trained 500 steps on objects 0..N-2 of the tiny scene; the
    last object is held out for test-time optimization tests."""
    from codenerf_tpu.training.trainer import Trainer

    # keep all objects in training for render-quality tests; optimization
    # tests re-derive codes from scratch (mean-code init) anyway.
    train_scene = dict(tiny_scene)
    tr = Trainer(
        "trained_fixture",
        tiny_hparams,
        batch_size=1024,
        dataset=train_scene,
        exps_root=str(tmp_path_factory.mktemp("exps")),
        check_iter=0,
    )
    tr.training(iters_crop=0, iters_all=500, log_every=250)
    return tr, tiny_scene, tiny_hparams
