"""Persistent XLA compilation cache.

The Pallas training kernels take minutes to compile on the axon remote
compiler (measured ~16 min for the fused backward at the flagship config);
the persistent cache makes every later process start instantly for
already-seen programs. Called by the CLIs and bench.py before first jit.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> str:
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.cache/codenerf_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
