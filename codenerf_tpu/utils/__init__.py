from codenerf_tpu.utils.images import image_float_to_uint8, side_by_side, str2bool
from codenerf_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from codenerf_tpu.utils.logging import MetricsLogger

__all__ = [
    "image_float_to_uint8",
    "side_by_side",
    "str2bool",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "MetricsLogger",
]
