from codenerf_tpu.models.codenerf import (
    apply_codenerf,
    init_codenerf,
    param_count,
)
from codenerf_tpu.models.codes import init_codes, mean_code

__all__ = [
    "init_codenerf",
    "apply_codenerf",
    "param_count",
    "init_codes",
    "mean_code",
]
