from codenerf_tpu.ops.fused_mlp import fused_codenerf_apply, fused_available

__all__ = ["fused_codenerf_apply", "fused_available"]
