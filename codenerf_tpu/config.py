"""Configuration system.

Reads the reference's JSON hyperparameter schema (see
``/root/reference/jsonfiles/srncar.json:1-24`` and the loading sites
``src/trainer.py:22-24`` / ``src/optimizer.py:31-33``) into typed, frozen
dataclasses, and accepts a small set of extension keys for capabilities the
reference lacks (hierarchical sampling, compute dtype, per-ray jitter).

Unknown keys raise, so typos in experiment configs fail fast — the reference
had no validation at all.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

# Keys understood at the top level of a hyperparameter JSON file. The first
# group mirrors the reference schema exactly; the second group is our
# extensions (all optional, all defaulted).
_REFERENCE_KEYS = {
    "net_hyperparams",
    "data",
    "N_samples",
    "near",
    "far",
    "loss_reg_coef",
    "lr_schedule",
    "check_points",
}
_EXTENSION_KEYS = {
    "N_importance",
    "white_bg",
    "shared_jitter",
    "compute_dtype",
    "weight_decay",
    "hierarchical_share_weights",
    "seed",
    "use_fused_train",
    "fused_composite",
    "train_occupancy",
    "bound_sphere_radius",
    "occ_probes",
    "reference_quirks",
}


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """MLP architecture hyperparameters (reference ``net_hyperparams``,
    consumed by ``src/model.py:10-18``). Defaults match the shipped configs
    (``jsonfiles/srncar.json:2-9``), not the code-default ``shape_blocks=2``.
    """

    shape_blocks: int = 3
    texture_blocks: int = 1
    W: int = 256
    num_xyz_freq: int = 10
    num_dir_freq: int = 4
    latent_dim: int = 256

    @property
    def d_xyz(self) -> int:
        return 3 + 6 * self.num_xyz_freq

    @property
    def d_viewdir(self) -> int:
        return 3 + 6 * self.num_dir_freq


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Volumetric sampling / compositing parameters.

    ``n_samples``/``near``/``far`` map to the reference JSON keys
    (``jsonfiles/srncar.json:15-17``). ``n_importance`` enables hierarchical
    inverse-CDF sampling (absent from the reference — added per the paper,
    NeRF arXiv 2003.08934 §5.2). ``shared_jitter=True`` replicates the
    reference quirk of one jitter vector shared across all rays of an image
    (``src/utils.py:27-29``); the default is standard per-ray stratification.
    """

    n_samples: int = 96
    near: float = 0.8
    far: float = 1.8
    n_importance: int = 0
    white_bg: bool = True
    shared_jitter: bool = False
    # When hierarchical sampling is on: reuse the coarse network for the fine
    # pass (True) or keep a separate fine parameter set (False).
    share_fine_weights: bool = True
    # Optional origin-centered bounding-sphere radius: per-ray [t0, t1]
    # sampling bounds via ray/sphere intersection (core/rays.py) — the fixed
    # sample budget concentrates on the object instead of empty space.
    # Absent from the reference (one global slab only).
    bound_sphere_radius: Optional[float] = None
    # Probes per ray for occupancy-grid interval tightening
    # (core/occupancy.py), used when an OccupancyGrid is passed to the
    # renderer. Measured on v5e at 16K rays, G=64, dilate=1: 32 probes
    # produce the same mean interval width as 64 (0.1666 vs 0.1661 — the
    # dilation makes cell hits robust to probe spacing) at 1.6x less
    # z-generation time (2.6 vs 4.2 ms).
    occ_probes: int = 32


@dataclasses.dataclass(frozen=True)
class TrainOccupancyConfig:
    """Occupancy-grid-driven sampling during TRAINING (extension; the
    reference samples one global slab per ray, ``src/utils.py:21-32``).

    A single CATEGORY-LEVEL density grid is maintained on-device: every
    ``update_every`` steps the model's sigma is evaluated at the grid cell
    centers for ``codes_per_update`` objects' codes (round-robin over the
    table) and folded in as ``density = max(decay * density, new_sigma)``
    — cells only stay occupied while some object keeps density there
    (NerfAcc-style EMA, arXiv 2210.04847, recast shape-static for XLA).
    The thresholded + dilated + sphere-masked binary grid then tightens
    every training ray's [t0, t1] to the occupied span
    (``core/occupancy.py::ray_grid_bounds``), so a reduced ``N_samples``
    budget lands on surfaces. Before ``warmup`` steps (untrained density)
    the grid is all-occupied — sampling equals the plain bounded slab.

    ``radius`` is the grid half-extent (and sphere mask); None uses
    ``RenderConfig.bound_sphere_radius``. Incompatible with
    ``shared_jitter`` (one global jitter vector cannot have per-ray
    bounds)."""

    grid_size: int = 64
    update_every: int = 500
    warmup: int = 2000
    # Codes refreshed per update. None = AUTO: scale with the category so a
    # full round-robin coverage cycle keeps decay^rounds >= 0.5 (the
    # staleness regime the trainer warns about is unreachable) — see
    # ``core/occupancy.resolve_codes_per_update``. An explicit int pins it
    # (the round-3 behavior), at the cost of the warning at large n.
    codes_per_update: Optional[int] = None
    sigma_threshold: float = 0.01
    dilate: int = 1
    decay: float = 0.99
    radius: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class LrSchedule:
    """One entry of the reference ``lr_schedule`` list: step-halving —
    lr * 2^-(step // interval) (``src/trainer.py:126-131``)."""

    lr: float
    interval: int
    type: str = "step"


@dataclasses.dataclass(frozen=True)
class ReferenceQuirks:
    """Opt-in reproductions of the reference's training-dynamics quirks
    (SURVEY §2.3 #3/#4), for parity debugging against real ShapeNet-SRN runs.
    Both default OFF — the clean formulation is the framework default.

    - ``optimizer_reset_every``: N > 0 re-initializes the AdamW moments (and
      bias-correction count) every N steps, with the learning rate frozen at
      its window-start value — the reference rebuilds its optimizer every
      epoch during training (``src/trainer.py:52,114-120``) and every
      ``lr_half_interval`` during code optimization (``src/optimizer.py:104-105``).
      One reference epoch = n_objects steps at the default batch size.
    - ``reg_chunk_divisor``: d > 1 scales the code-norm regularizer by 1/d.
      The reference adds the reg loss on the FIRST of its d serial
      gradient-accumulation chunks only (``src/trainer.py:76-81``), so the
      reg gradient is 1/d of the full-image formulation; d = ceil(H*W /
      batchsize) = 8 for full 128x128 images at the default batchsize 2048.
    """

    optimizer_reset_every: int = 0
    reg_chunk_divisor: int = 1


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Reference ``data`` block (``jsonfiles/srncar.json:10-14``)."""

    cat: str = "srn_cars"
    splits: str = "cars_train"
    data_dir: str = "data/ShapeNet_SRN"


@dataclasses.dataclass(frozen=True)
class Hparams:
    net: NetConfig = dataclasses.field(default_factory=NetConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    loss_reg_coef: float = 1e-4
    lr_model: LrSchedule = dataclasses.field(
        default_factory=lambda: LrSchedule(lr=1e-4, interval=250_000)
    )
    lr_codes: LrSchedule = dataclasses.field(
        default_factory=lambda: LrSchedule(lr=1e-3, interval=250_000)
    )
    check_points: int = 100_000
    # torch.optim.AdamW default, which the reference uses implicitly
    # (``src/trainer.py:117-121``).
    weight_decay: float = 0.01
    compute_dtype: str = "bfloat16"
    seed: int = 0
    # Use the fused Pallas fwd+bwd kernels (ops/fused_train.py) for the
    # training-step MLP instead of XLA autodiff. Requires W % 128 == 0 and
    # a tile-divisible ray batch; also yields MORE accurate gradients (f32
    # inter-layer cotangents and f32 dW accumulation).
    use_fused_train: bool = False
    # With use_fused_train and coarse-only sampling (N_importance == 0),
    # also run the volume rendering INSIDE the kernels (per-ray op
    # boundary — no (rays, samples) plane ever reaches HBM). Off = keep
    # the plane-output kernels + XLA composite (A/B and debugging).
    fused_composite: bool = True
    # Occupancy-grid-driven training-time sampling (extension); None = off.
    train_occupancy: Optional[TrainOccupancyConfig] = None
    quirks: ReferenceQuirks = dataclasses.field(default_factory=ReferenceQuirks)
    raw: Optional[Dict[str, Any]] = None

    def to_json_dict(self) -> Dict[str, Any]:
        """Serialize back to the reference JSON schema (plus extensions), for
        the run-dir snapshot the reference writes (``src/trainer.py:163-166``)."""
        d: Dict[str, Any] = {
            "net_hyperparams": dataclasses.asdict(self.net),
            "data": dataclasses.asdict(self.data),
            "N_samples": self.render.n_samples,
            "near": self.render.near,
            "far": self.render.far,
            "loss_reg_coef": self.loss_reg_coef,
            "lr_schedule": [
                {"type": self.lr_model.type, "lr": self.lr_model.lr,
                 "interval": self.lr_model.interval},
                {"type": self.lr_codes.type, "lr": self.lr_codes.lr,
                 "interval": self.lr_codes.interval},
            ],
            "check_points": self.check_points,
            "N_importance": self.render.n_importance,
            "white_bg": self.render.white_bg,
            "shared_jitter": self.render.shared_jitter,
            "hierarchical_share_weights": self.render.share_fine_weights,
            "bound_sphere_radius": self.render.bound_sphere_radius,
            "occ_probes": self.render.occ_probes,
            "compute_dtype": self.compute_dtype,
            "weight_decay": self.weight_decay,
            "seed": self.seed,
            "use_fused_train": self.use_fused_train,
            "fused_composite": self.fused_composite,
            "train_occupancy": (
                dataclasses.asdict(self.train_occupancy)
                if self.train_occupancy is not None else None
            ),
            "reference_quirks": dataclasses.asdict(self.quirks),
        }
        return d


def hparams_from_dict(cfg: Dict[str, Any], strict: bool = True) -> Hparams:
    unknown = set(cfg) - _REFERENCE_KEYS - _EXTENSION_KEYS
    if unknown and strict:
        raise ValueError(f"Unknown hyperparameter keys: {sorted(unknown)}")

    net = NetConfig(**cfg.get("net_hyperparams", {}))
    data = DataConfig(**cfg.get("data", {}))
    render = RenderConfig(
        n_samples=int(cfg.get("N_samples", 96)),
        near=float(cfg.get("near", 0.8)),
        far=float(cfg.get("far", 1.8)),
        n_importance=int(cfg.get("N_importance", 0)),
        white_bg=bool(cfg.get("white_bg", True)),
        shared_jitter=bool(cfg.get("shared_jitter", False)),
        share_fine_weights=bool(cfg.get("hierarchical_share_weights", True)),
        bound_sphere_radius=(
            float(cfg["bound_sphere_radius"])
            if cfg.get("bound_sphere_radius") is not None else None
        ),
        occ_probes=int(cfg.get("occ_probes", 32)),
    )
    sched = cfg.get(
        "lr_schedule",
        [
            {"type": "step", "lr": 1e-4, "interval": 250_000},
            {"type": "step", "lr": 1e-3, "interval": 250_000},
        ],
    )
    lr_model = LrSchedule(lr=float(sched[0]["lr"]), interval=int(sched[0]["interval"]),
                          type=str(sched[0].get("type", "step")))
    lr_codes = LrSchedule(lr=float(sched[1]["lr"]), interval=int(sched[1]["interval"]),
                          type=str(sched[1].get("type", "step")))
    return Hparams(
        net=net,
        data=data,
        render=render,
        loss_reg_coef=float(cfg.get("loss_reg_coef", 1e-4)),
        lr_model=lr_model,
        lr_codes=lr_codes,
        check_points=int(cfg.get("check_points", 100_000)),
        weight_decay=float(cfg.get("weight_decay", 0.01)),
        compute_dtype=str(cfg.get("compute_dtype", "bfloat16")),
        seed=int(cfg.get("seed", 0)),
        use_fused_train=bool(cfg.get("use_fused_train", False)),
        fused_composite=bool(cfg.get("fused_composite", True)),
        train_occupancy=(
            TrainOccupancyConfig(**cfg["train_occupancy"])
            if cfg.get("train_occupancy") is not None else None
        ),
        quirks=ReferenceQuirks(**cfg.get("reference_quirks", {})),
        raw=dict(cfg),
    )


def load_hparams(jsonfile: str, jsondir: str = "jsonfiles") -> Hparams:
    """Load hyperparameters the way the reference CLIs do: a filename
    resolved against a ``jsonfiles/`` directory (``src/trainer.py:22-24``),
    or an absolute/relative path that exists as-is."""
    path = jsonfile if os.path.isfile(jsonfile) else os.path.join(jsondir, jsonfile)
    with open(path, "r") as f:
        cfg = json.load(f)
    return hparams_from_dict(cfg)


def resolve_dtype(name: str):
    import jax.numpy as jnp

    table = {
        "bfloat16": jnp.bfloat16,
        "bf16": jnp.bfloat16,
        "float32": jnp.float32,
        "f32": jnp.float32,
    }
    if name not in table:
        raise ValueError(f"Unsupported compute dtype {name!r}")
    return table[name]
