from codenerf_tpu.optimization.codes_opt import (
    CodeOptimizer,
    OptimizationResult,
    optimize_codes,
)
from codenerf_tpu.optimization.pose_opt import optimize_pose_and_codes
from codenerf_tpu.optimization.editing import (
    interpolate_codes,
    render_code_grid,
    render_shape_texture_matrix,
)

__all__ = [
    "CodeOptimizer",
    "OptimizationResult",
    "optimize_codes",
    "optimize_pose_and_codes",
    "interpolate_codes",
    "render_code_grid",
    "render_shape_texture_matrix",
]
