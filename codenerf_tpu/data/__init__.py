from codenerf_tpu.data.srn import SRNDataset, load_intrinsics, load_pose
from codenerf_tpu.data.pipeline import RayBatchPipeline
from codenerf_tpu.data.synthetic import synthetic_scene, write_srn_layout

__all__ = [
    "SRNDataset",
    "load_pose",
    "load_intrinsics",
    "RayBatchPipeline",
    "synthetic_scene",
    "write_srn_layout",
]
