"""codenerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) CodeNeRF framework.

A from-scratch re-design of the capabilities of yuliangguo/code-nerf
(CodeNeRF: Disentangled Neural Radiance Fields for Object Categories,
Jang & Agapito, ICCV 2021) for TPU hardware:

- pure-functional rendering core (ray generation, stratified + hierarchical
  sampling, positional encoding, volume compositing),
- a latent-code-conditioned NeRF MLP as a parameter pytree with bfloat16
  MXU matmuls and float32 compositing,
- a host-side ray-batch pipeline feeding a single jitted train step that
  samples rays globally across all objects (instead of the reference's
  per-object python chunk loop),
- data/tensor parallelism through ``jax.sharding.Mesh`` + ``jit`` sharding
  annotations (XLA inserts the collectives),
- test-time latent-code optimization, joint pose+code optimization and
  shape/texture editing,
- Orbax checkpoints with full resume (params, codes, optimizer state, RNG).

Reference parity targets are documented per-function via ``file:line``
citations into the reference repo (mounted read-only at /root/reference).
"""

__version__ = "0.1.0"

from codenerf_tpu.config import Hparams, NetConfig, RenderConfig, load_hparams


def __getattr__(name):
    """Lazy top-level API: the heavyweight entry points import on first use
    so `import codenerf_tpu` stays cheap."""
    lazy = {
        "Trainer": ("codenerf_tpu.training.trainer", "Trainer"),
        "CodeOptimizer": ("codenerf_tpu.optimization.codes_opt", "CodeOptimizer"),
        "RenderServer": ("codenerf_tpu.serving", "RenderServer"),
        "render_rays": ("codenerf_tpu.renderer", "render_rays"),
        "render_image": ("codenerf_tpu.renderer", "render_image"),
        "SRNDataset": ("codenerf_tpu.data.srn", "SRNDataset"),
        "synthetic_scene": ("codenerf_tpu.data.synthetic", "synthetic_scene"),
        "make_mesh": ("codenerf_tpu.parallel.mesh", "make_mesh"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'codenerf_tpu' has no attribute {name!r}")


__all__ = [
    "Hparams",
    "NetConfig",
    "RenderConfig",
    "load_hparams",
    "Trainer",
    "CodeOptimizer",
    "RenderServer",
    "render_rays",
    "render_image",
    "SRNDataset",
    "synthetic_scene",
    "make_mesh",
    "__version__",
]
