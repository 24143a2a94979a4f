"""Image helpers.

``image_float_to_uint8`` reproduces the reference's min-max rescaling —
NOT clipping — so saved/TB images match the reference pixel-for-pixel
(``src/utils.py:49-60``; SURVEY §2.3 quirk 7). ``str2bool`` is the argparse
helper with the reference's missing-import bug fixed (``src/utils.py:63-71``
raises NameError on bad input because ``argparse`` isn't imported there).
"""

from __future__ import annotations

import argparse

import numpy as np


def image_float_to_uint8(img: np.ndarray) -> np.ndarray:
    """Min-max normalize a float image to uint8 [0, 255]."""
    img = np.asarray(img, dtype=np.float32)
    vmin, vmax = float(np.min(img)), float(np.max(img))
    if vmax - vmin < 1e-10:
        vmax += 1e-10
    out = (img - vmin) / (vmax - vmin) * 255.0
    return out.astype(np.uint8)


def side_by_side(generated: np.ndarray, ground_truth: np.ndarray) -> np.ndarray:
    """[generated | ground truth] uint8 grid, the reference's log format
    (``src/trainer.py:109-115``). Inputs (H, W, 3) float or stacked
    (N, H, W, 3); rows are concatenated vertically."""
    generated = np.asarray(generated)
    ground_truth = np.asarray(ground_truth)
    if generated.ndim == 3:
        generated = generated[None]
        ground_truth = ground_truth[None]
    rows = np.concatenate([generated, ground_truth], axis=2)  # (N, H, 2W, 3)
    grid = rows.reshape(-1, rows.shape[2], 3)
    return image_float_to_uint8(grid)


def save_png(path: str, img_u8: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(img_u8).save(path)


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "1"):
        return True
    if v.lower() in ("no", "false", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")
