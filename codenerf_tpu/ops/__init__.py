from codenerf_tpu.ops.fused_mlp import fused_codenerf_apply, fused_available
from codenerf_tpu.ops.fused_train import (
    fused_apply_train,
    fused_train_available,
    make_fused_train_op,
)

__all__ = [
    "fused_codenerf_apply",
    "fused_available",
    "fused_apply_train",
    "fused_train_available",
    "make_fused_train_op",
]
