"""Device mesh and sharding rules.

The reference is strictly single-device (``src/trainer.py:25``; no
torch.distributed anywhere — SURVEY §2 row 20/21). The TPU-native scaling
model is declarative: a 2-D ``jax.sharding.Mesh`` with axes

- ``data``  — the ray batch is sharded along its leading axis. Because the
  loss is a mean over sharded rays against replicated (or model-sharded)
  parameters, XLA's SPMD partitioner inserts the gradient ``psum`` over ICI
  automatically; there is no hand-written collective in the framework.
- ``model`` — tensor parallelism over the MLP's hidden width: every weight
  matrix whose output dim is a multiple of 128·|model| is sharded on its
  last axis (activations follow; XLA places the contraction collectives).
  A ~715K-parameter MLP does not NEED TP — the axis exists so the same
  train step scales to wide-W variants and proves out multi-chip layouts.

Optimizer moments inherit the parameter sharding automatically because the
rules are shape-based and optax's Adam state mirrors the parameter tree.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, data: int = -1,
              model: int = 1, replica: int = 1) -> Mesh:
    """Build a (data, model) mesh, or a 3-axis (replica, data, model) mesh
    when ``replica > 1``. ``data=-1`` uses all remaining devices.

    ``replica`` is the multi-slice axis: device order from ``jax.devices()``
    groups a slice's chips contiguously, so the leading mesh axis maps
    across slices — gradient all-reduce over 'replica' rides DCN while
    'data'/'model' collectives stay on ICI (the reference has no
    distribution at all; SURVEY §5.8)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data == -1:
        if n % (model * replica) != 0:
            raise ValueError(
                f"{n} devices not divisible by model*replica={model * replica}")
        data = n // (model * replica)
    if data * model * replica != n:
        raise ValueError(
            f"replica*data*model={replica * data * model} != device count {n}")
    if replica > 1:
        return Mesh(np.asarray(devices).reshape(replica, data, model),
                    ("replica", "data", "model"))
    return Mesh(np.asarray(devices).reshape(data, model), ("data", "model"))


def batch_axes(mesh: Mesh) -> tuple:
    """Names of the batch-parallel mesh axes, in mesh order: ``('replica',
    'data')`` on a 3-axis mesh, ``('data',)`` otherwise. These are the axes
    batches — and independent OBJECTS in the test-time-optimization path —
    shard across; 'model' (tensor parallelism) is never one of them."""
    return tuple(ax for ax in ("replica", "data") if ax in mesh.axis_names)


def n_batch_shards(mesh: Mesh) -> int:
    """Total way-ness of the batch-parallel axes (see :func:`batch_axes`)."""
    n = 1
    for ax in batch_axes(mesh):
        n *= mesh.shape[ax]
    return n


def shard_map_compat(fn, mesh: Mesh, in_specs, out_specs):
    """``jax.shard_map`` with replication checking disabled, across the
    jax>=0.9 (``check_vma``) / earlier (``check_rep``) keyword rename —
    the same shim the fused training path uses
    (``training/train_step.py``)."""
    from jax import shard_map as _shard_map

    kw = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        return _shard_map(fn, check_vma=False, **kw)
    except TypeError:  # pre-0.9 jax spells it check_rep
        return _shard_map(fn, check_rep=False, **kw)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across 'data' (and 'replica' when the
    mesh has one — pure DP across slices); trailing dims replicated. The
    mean loss over sharded rays against replicated parameters makes XLA
    insert the gradient psum over both axes automatically."""
    if "replica" in mesh.axis_names:
        return NamedSharding(mesh, P(("replica", "data")))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_spec(leaf: Any, model_size: int) -> P:
    shape = getattr(leaf, "shape", ())
    if (
        model_size > 1
        and len(shape) >= 1
        and shape[-1] % (128 * model_size) == 0
    ):
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def state_shardings(mesh: Mesh, state: Any):
    """Sharding pytree for a TrainState (or any pytree): width-sharded
    weights over 'model' per the shape rule, everything else replicated."""
    model_size = mesh.shape["model"]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, model_size)), state
    )
