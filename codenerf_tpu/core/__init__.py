"""Pure-functional rendering core (stateless jax.numpy, jit/vmap/shard-safe)."""

from codenerf_tpu.core.encoding import positional_encoding
from codenerf_tpu.core.rays import camera_rays, pixel_rays
from codenerf_tpu.core.sampling import (
    fixed_zvals,
    sample_pdf,
    stratified_zvals,
)
from codenerf_tpu.core.render import RenderOutput, composite
from codenerf_tpu.core.poses import (
    exp_se3,
    refine_pose,
)

__all__ = [
    "positional_encoding",
    "camera_rays",
    "pixel_rays",
    "stratified_zvals",
    "fixed_zvals",
    "sample_pdf",
    "composite",
    "RenderOutput",
    "exp_se3",
    "refine_pose",
]
