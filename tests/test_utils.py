"""Utility tests: image normalization (reference min-max quirk), grids,
str2bool, metrics logging."""

import json
import os

import numpy as np
import pytest

from codenerf_tpu.utils.images import (
    image_float_to_uint8,
    save_png,
    side_by_side,
    str2bool,
)
from codenerf_tpu.utils.logging import MetricsLogger


def test_min_max_normalization_not_clipping():
    # The reference RESCALES by min/max (src/utils.py:49-60): a mid-gray
    # image stretches to full range rather than staying gray.
    img = np.full((4, 4, 3), 0.5, np.float32)
    img[0, 0] = 0.4
    out = image_float_to_uint8(img)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255


def test_constant_image_no_divide_by_zero():
    out = image_float_to_uint8(np.full((4, 4, 3), 0.7, np.float32))
    assert out.dtype == np.uint8  # epsilon path (utils.py:55-56 semantics)


def test_side_by_side_layout():
    gen = np.zeros((4, 6, 3), np.float32)
    gt = np.ones((4, 6, 3), np.float32)
    grid = side_by_side(gen, gt)
    assert grid.shape == (4, 12, 3)
    assert grid[:, :6].max() == 0 and grid[:, 6:].min() == 255
    stacked = side_by_side(np.stack([gen, gen]), np.stack([gt, gt]))
    assert stacked.shape == (8, 12, 3)


def test_save_png_roundtrip(tmp_path):
    from PIL import Image

    img = (np.random.default_rng(0).uniform(0, 255, (5, 7, 3))).astype(np.uint8)
    p = str(tmp_path / "x.png")
    save_png(p, img)
    np.testing.assert_array_equal(np.asarray(Image.open(p)), img)


def test_str2bool():
    import argparse

    assert str2bool(True) is True
    assert str2bool("yes") and str2bool("TRUE") and str2bool("1")
    assert not str2bool("no") and not str2bool("False") and not str2bool("0")
    # the reference's version raises NameError here (argparse not imported,
    # src/utils.py:70); ours raises the intended ArgumentTypeError
    with pytest.raises(argparse.ArgumentTypeError):
        str2bool("maybe")


def test_metrics_logger_jsonl(tmp_path):
    lg = MetricsLogger(str(tmp_path), use_tensorboard=False)
    lg.scalars(1, {"psnr/train": 20.0})
    lg.scalars(2, {"psnr/train": 21.5, "reg/train": 3.0})
    lg.image(2, "probe", np.zeros((4, 4, 3), np.uint8))
    lg.close()
    lines = [json.loads(l) for l in
             open(os.path.join(tmp_path, "metrics.jsonl"))]
    assert [l["step"] for l in lines] == [1, 2]
    assert lines[1]["psnr/train"] == 21.5
    assert os.path.isfile(os.path.join(tmp_path, "probe_2.png"))
