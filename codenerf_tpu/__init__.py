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

__all__ = [
    "Hparams",
    "NetConfig",
    "RenderConfig",
    "load_hparams",
    "__version__",
]
