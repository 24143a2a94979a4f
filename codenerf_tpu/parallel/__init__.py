from codenerf_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    state_shardings,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "state_shardings"]
