"""Training state pytree.

One flat, jit-donatable container for everything that evolves during
training: the model parameter pytree(s), both latent-code tables, the optax
optimizer state, the step counter, and the PRNG key. The reference keeps all
of this in scattered torch module attributes and — notably — never
checkpoints the optimizer state or RNG (``src/trainer.py:168-180``); here
the whole state roundtrips through checkpoints, making resume exact.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp

from codenerf_tpu.config import Hparams
from codenerf_tpu.models.codenerf import init_codenerf
from codenerf_tpu.models.codes import init_codes


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array           # scalar int32
    trainables: Dict[str, Any]
    opt_state: Any
    rng: jax.Array


def make_trainables(key: jax.Array, hp: Hparams, n_objects: int) -> Dict[str, Any]:
    """Initialize the trainable pytree.

    Keys: ``params`` (MLP), ``shape_codes``/``texture_codes``
    ((n_objects, latent_dim) tables), and ``fine_params`` when a separate
    fine network is configured (hierarchical sampling with unshared weights).
    """
    k_model, k_fine, k_shape, k_texture = jax.random.split(key, 4)
    trainables: Dict[str, Any] = {
        "params": init_codenerf(k_model, hp.net),
        "shape_codes": init_codes(k_shape, n_objects, hp.net.latent_dim),
        "texture_codes": init_codes(k_texture, n_objects, hp.net.latent_dim),
    }
    if hp.render.n_importance > 0 and not hp.render.share_fine_weights:
        trainables["fine_params"] = init_codenerf(k_fine, hp.net)
    return trainables


def create_train_state(key: jax.Array, hp: Hparams, n_objects: int,
                       tx) -> TrainState:
    k_init, k_run = jax.random.split(key)
    trainables = make_trainables(k_init, hp, n_objects)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        trainables=trainables,
        opt_state=tx.init(trainables),
        rng=k_run,
    )
