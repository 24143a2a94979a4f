"""Checkpointing via Orbax.

The reference saves ``{model_params, shape_code_params, texture_code_params,
niter, nepoch}`` and NOTHING else — no optimizer moments, no RNG — and has
no resume path at all (``src/trainer.py:168-180``; only the test-time
optimizer ever loads, ``src/optimizer.py:209-216``). Here a checkpoint is
the complete :class:`~codenerf_tpu.training.state.TrainState` (trainables,
optax state, step, PRNG key), so a resumed run is bit-identical to an
uninterrupted one given the same data stream.

Layout: ``<ckpt_dir>/step_<NNNNNNNN>/`` Orbax directories; logical-key
correspondence with the reference's ``models.pth``:

  trainables.params           <-> model_params
  trainables.shape_codes      <-> shape_code_params['weight']
  trainables.texture_codes    <-> texture_code_params['weight']
  step                        <-> niter
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^step_(\d{8})$")


def _step_dir(ckpt_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")


def save_checkpoint(ckpt_dir: str, state: Any, step: int) -> str:
    path = _step_dir(ckpt_dir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(ckpt_dir)
        if (m := _STEP_RE.match(name))
    ]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``target`` (an abstract or
    concrete TrainState). ``step=None`` restores the latest."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {ckpt_dir}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_step_dir(ckpt_dir, step), target)


def restore_raw(ckpt_dir: str, step: Optional[int] = None) -> Any:
    """Restore WITHOUT a target structure: returns nested dicts/arrays.

    This is the ``optimize.py`` load path — the consumer doesn't know the
    training-time object count, so it can't build an abstract TrainState
    (mirrors the reference loading ``models.pth`` blind,
    ``src/optimizer.py:209-216``)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {ckpt_dir}")
    return ocp.StandardCheckpointer().restore(_step_dir(ckpt_dir, step))


def save_reference_codes(path: str, ids, num_obj: int, shape_codes,
                         texture_codes, psnr_eval, ssim_eval) -> None:
    """Write the reference ``Optimizer``'s ``codes.pth`` payload.

    Field-for-field the dict ``src/optimizer.py:137-147`` torch-saves after
    every object: ``ids`` (the sorted object-id array, ``src/data.py:50``),
    ``num_obj`` (index of the last completed object), the ``(n, latent)``
    float tensors of optimized codes (zero rows for objects not yet
    reached), and the per-object-INDEX dicts of per-view PSNR/SSIM lists
    (``src/optimizer.py:168-182`` keys them by object index, not id). A
    downstream consumer of the reference's outputs can ``torch.load`` this
    file unchanged — the counterpart of
    ``tools/export_reference_checkpoint.py`` for the codes artifact.

    ``psnr_eval`` / ``ssim_eval`` map int object index -> sequence of
    per-view values.
    """
    import numpy as np
    import torch

    torch.save({
        "ids": np.asarray(ids),
        "num_obj": int(num_obj),
        "optimized_shapecodes": torch.from_numpy(
            np.asarray(shape_codes, dtype=np.float32)),
        "optimized_texturecodes": torch.from_numpy(
            np.asarray(texture_codes, dtype=np.float32)),
        "psnr_eval": {int(k): [float(x) for x in v]
                      for k, v in psnr_eval.items()},
        "ssim_eval": {int(k): [float(x) for x in v]
                      for k, v in ssim_eval.items()},
    }, path)
