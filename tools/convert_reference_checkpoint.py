#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (``models.pth``) into this
framework's parameter format.

The reference saves ``{model_params: <torch state_dict>, shape_code_params,
texture_code_params, niter, nepoch}`` (``src/trainer.py:168-180``). Torch
``nn.Linear`` stores weights as (out, in); our dense layers are (in, out),
so every weight transposes. Key mapping (reference module names from
``src/model.py:19-34``):

    encoding_xyz.0.{weight,bias}        -> enc_xyz
    shape_latent_layer_{j+1}.0.*        -> shape_latent_{j}
    shape_layer_{j+1}.0.*               -> shape_{j}
    encoding_shape.{weight,bias}        -> enc_shape
    sigma.0.*                           -> sigma
    encoding_viewdir.0.*                -> enc_viewdir
    texture_latent_layer_{j+1}.0.*      -> texture_latent_{j}
    texture_layer_{j+1}.0.*             -> texture_{j}
    rgb.0.* / rgb.2.*                   -> rgb_hidden / rgb_out
    shape_code_params.weight            -> shape_codes table
    texture_code_params.weight          -> texture_codes table

Because the rendering math here matches the reference formula-for-formula
(PE channel order included — ``core/encoding.py``), a converted model
renders the same images up to bf16 rounding.

Usage:
  python tools/convert_reference_checkpoint.py models.pth out_dir \
      [--shape_blocks 3 --texture_blocks 1]

Writes an Orbax checkpoint dir ``out_dir/ckpt/step_<niter>`` loadable by
``optimize.py --saved_dir`` (opt_state is freshly initialized — the
reference never saved one, SURVEY §5.4).
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import numpy as np


def state_dict_to_params(model_sd: Dict[str, Any], shape_blocks: int = 3,
                         texture_blocks: int = 1) -> Dict[str, Any]:
    """Map a reference model state_dict (tensors or numpy arrays) to our
    param pytree. Accepts anything with ``.numpy()`` or array-like values."""

    def arr(key):
        v = model_sd[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    def dense(prefix):
        return {"w": arr(f"{prefix}.weight").T.copy(),
                "b": arr(f"{prefix}.bias").copy()}

    params: Dict[str, Any] = {}
    params["enc_xyz"] = dense("encoding_xyz.0")
    for j in range(shape_blocks):
        params[f"shape_latent_{j}"] = dense(f"shape_latent_layer_{j + 1}.0")
        params[f"shape_{j}"] = dense(f"shape_layer_{j + 1}.0")
    params["enc_shape"] = dense("encoding_shape")
    params["sigma"] = dense("sigma.0")
    params["enc_viewdir"] = dense("encoding_viewdir.0")
    for j in range(texture_blocks):
        params[f"texture_latent_{j}"] = dense(f"texture_latent_layer_{j + 1}.0")
        params[f"texture_{j}"] = dense(f"texture_layer_{j + 1}.0")
    params["rgb_hidden"] = dense("rgb.0")
    params["rgb_out"] = dense("rgb.2")
    return params


def convert(pth_path: str, out_dir: str, shape_blocks: int = 3,
            texture_blocks: int = 1) -> str:
    import torch

    import jax
    import jax.numpy as jnp

    from codenerf_tpu.config import Hparams, NetConfig
    from codenerf_tpu.training.state import TrainState
    from codenerf_tpu.training.train_step import build_optimizer
    from codenerf_tpu.utils.checkpoint import save_checkpoint

    saved = torch.load(pth_path, map_location="cpu", weights_only=False)
    params = state_dict_to_params(saved["model_params"], shape_blocks,
                                  texture_blocks)
    shape_codes = np.asarray(
        saved["shape_code_params"]["weight"].detach().cpu().numpy(),
        dtype=np.float32)
    texture_codes = np.asarray(
        saved["texture_code_params"]["weight"].detach().cpu().numpy(),
        dtype=np.float32)
    niter = int(saved.get("niter", 0))

    latent_dim = shape_codes.shape[1]
    W = params["enc_shape"]["w"].shape[0]
    hp = Hparams(net=NetConfig(shape_blocks=shape_blocks,
                               texture_blocks=texture_blocks,
                               W=W, latent_dim=latent_dim))
    trainables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "shape_codes": jnp.asarray(shape_codes),
        "texture_codes": jnp.asarray(texture_codes),
    }
    tx = build_optimizer(hp)
    state = TrainState(
        step=jnp.asarray(niter, jnp.int32),
        trainables=trainables,
        opt_state=tx.init(trainables),
        rng=jax.random.PRNGKey(0),
    )
    import os

    path = save_checkpoint(os.path.join(out_dir, "ckpt"), state, niter)
    print(f"converted {pth_path} (niter={niter}, "
          f"{shape_codes.shape[0]} objects) -> {path}")
    return path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("pth", help="reference models.pth")
    ap.add_argument("out_dir", help="target run dir (gets ckpt/step_*)")
    ap.add_argument("--shape_blocks", type=int, default=3)
    ap.add_argument("--texture_blocks", type=int, default=1)
    args = ap.parse_args()
    convert(args.pth, args.out_dir, args.shape_blocks, args.texture_blocks)
