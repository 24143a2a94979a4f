#!/usr/bin/env python
"""Export a framework checkpoint to the reference's ``models.pth`` format.

The inverse of ``tools/convert_reference_checkpoint.py``: our param pytree
(dense ``{"w": (in, out), "b": (out,)}``) maps back to the reference's
torch ``state_dict`` names (``src/model.py:19-34``; torch ``nn.Linear``
stores weights (out, in), so every weight transposes back), and the code
tables become ``nn.Embedding`` state_dicts. The payload matches what the
reference trainer saves (``src/trainer.py:165-174``):

    {model_params, shape_code_params, texture_code_params, niter, nepoch}

Why this exists: the strongest possible parity proof is the reference's
OWN ``Optimizer`` eval loop (``src/optimizer.py:107-135``) scoring weights
TRAINED BY THIS FRAMEWORK — zero shared code on the scoring side.
``tools/reference_parity.py --cross_eval`` drives exactly that.

Usage:
  python tools/export_reference_checkpoint.py <run_dir>/ckpt out/models.pth \
      [--step N]
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict

import numpy as np


def params_to_state_dict(params: Dict[str, Any], shape_blocks: int,
                         texture_blocks: int) -> Dict[str, Any]:
    """Map our param pytree to a reference-named torch state_dict
    (float32 tensors, weights transposed to torch's (out, in))."""
    import torch

    sd: Dict[str, Any] = {}

    def put(prefix, layer):
        w = np.asarray(layer["w"], dtype=np.float32)
        b = np.asarray(layer["b"], dtype=np.float32)
        sd[f"{prefix}.weight"] = torch.from_numpy(w.T.copy())
        sd[f"{prefix}.bias"] = torch.from_numpy(b.copy())

    put("encoding_xyz.0", params["enc_xyz"])
    for j in range(shape_blocks):
        put(f"shape_latent_layer_{j + 1}.0", params[f"shape_latent_{j}"])
        put(f"shape_layer_{j + 1}.0", params[f"shape_{j}"])
    put("encoding_shape", params["enc_shape"])
    put("sigma.0", params["sigma"])
    put("encoding_viewdir.0", params["enc_viewdir"])
    for j in range(texture_blocks):
        put(f"texture_latent_layer_{j + 1}.0", params[f"texture_latent_{j}"])
        put(f"texture_layer_{j + 1}.0", params[f"texture_{j}"])
    put("rgb.0", params["rgb_hidden"])
    put("rgb.2", params["rgb_out"])
    return sd


def trainables_to_reference(trainables: Dict[str, Any], niter: int = 0,
                            nepoch: int = 0) -> Dict[str, Any]:
    """Build the full reference checkpoint dict from a trainables pytree.
    Block counts are inferred from the param keys (every block contributes
    a ``shape_{j}`` / ``texture_{j}`` entry)."""
    import torch

    params = trainables["params"]
    shape_blocks = sum(1 for k in params if k.startswith("shape_")
                       and not k.startswith("shape_latent"))
    texture_blocks = sum(1 for k in params if k.startswith("texture_")
                         and not k.startswith("texture_latent"))
    return {
        "model_params": params_to_state_dict(params, shape_blocks,
                                             texture_blocks),
        "shape_code_params": {
            "weight": torch.from_numpy(np.array(
                trainables["shape_codes"], dtype=np.float32, copy=True))},
        "texture_code_params": {
            "weight": torch.from_numpy(np.array(
                trainables["texture_codes"], dtype=np.float32, copy=True))},
        "niter": int(niter),
        "nepoch": int(nepoch),
    }


def export(ckpt_dir: str, out_pth: str, step=None) -> str:
    import torch

    from codenerf_tpu.utils.checkpoint import restore_raw

    raw = restore_raw(ckpt_dir, step)
    niter = int(np.asarray(raw.get("step", 0)))
    payload = trainables_to_reference(raw["trainables"], niter=niter)
    os.makedirs(os.path.dirname(os.path.abspath(out_pth)), exist_ok=True)
    torch.save(payload, out_pth)
    n = payload["shape_code_params"]["weight"].shape[0]
    print(f"exported {ckpt_dir} (step={niter}, {n} objects) -> {out_pth}")
    return out_pth


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir", help="framework run ckpt dir (run_dir/ckpt)")
    ap.add_argument("out_pth", help="target models.pth path")
    ap.add_argument("--step", type=int, default=None)
    args = ap.parse_args()
    export(args.ckpt_dir, args.out_pth, args.step)
