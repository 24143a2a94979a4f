"""Category-level training driver.

Capability parity with the reference ``Trainer`` (``src/trainer.py:17-180``):
two-stage cropped-then-full schedule, per-object latent code tables,
MSE + code-norm loss, AdamW with split model/code learning rates and
step-halving decay, periodic checkpoints and image/scalar logging, and a
run-dir ``hpam.json`` snapshot.

TPU-native differences (SURVEY §7):
- one jitted train step over a globally-sampled ray batch (all objects mixed
  per step) instead of per-object epochs — the crop->full switch changes
  only the host-side pixel sampling window, so BOTH phases share one
  compiled executable (no recompile at the phase boundary);
- optional (data, model) mesh: the batch is sharded over 'data', wide
  weights over 'model'; XLA inserts all collectives;
- donated state buffers — parameters/moments update in place in HBM;
- full-state checkpoints (optimizer moments + RNG), so training actually
  resumes (the reference cannot, SURVEY §5.3).

Step-count semantics: the reference's ``niter`` counts OBJECTS visited
(one ~16K-ray image each, ``src/trainer.py:99``); our ``step`` counts ray
batches. With the default ``batch_size=16384`` one step does the same
pixel work as one reference iteration, so schedule intervals transfer.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from codenerf_tpu.config import Hparams, resolve_dtype
from codenerf_tpu.data.pipeline import RayBatchPipeline
from codenerf_tpu.data.srn import SRNDataset
from codenerf_tpu.evaluation.metrics import reference_psnr_mse
from codenerf_tpu.parallel.mesh import batch_sharding, state_shardings
from codenerf_tpu.renderer import render_image
from codenerf_tpu.training.state import TrainState, create_train_state
from codenerf_tpu.training.train_step import build_optimizer, build_train_step
from codenerf_tpu.utils import checkpoint as ckpt
from codenerf_tpu.utils.images import side_by_side
from codenerf_tpu.utils.logging import MetricsLogger


class Trainer:
    def __init__(
        self,
        save_dir: str,
        hparams: Hparams,
        batch_size: int = 16384,
        dataset: Optional[Any] = None,
        exps_root: str = "exps",
        mesh=None,
        use_tensorboard: bool = False,
        check_iter: int = 10000,
        max_objects: Optional[int] = None,
        microbatch_rays: int = 0,
        compact_batches: bool = True,
    ):
        """``dataset`` is anything exposing images/poses/focals/H/W (an
        :class:`SRNDataset` or a synthetic scene dict); when omitted it is
        loaded from ``hparams.data`` like the reference does.

        ``compact_batches`` (default on) ships 15 B/ray index batches and
        gathers pose/focal from device-resident tables inside the step —
        5x less H2D than the expanded 76 B/ray layout (the per-ray f32
        pose dominated the transfer over the tunneled device link)."""
        self.hp = hparams
        self.B = int(batch_size)
        self.mesh = mesh
        self.check_iter = check_iter

        if dataset is None:
            dataset = SRNDataset(
                cat=hparams.data.cat,
                splits=hparams.data.splits,
                data_dir=hparams.data.data_dir,
                max_objects=max_objects,
            )
        if isinstance(dataset, dict):
            images, poses, focals = (
                dataset["images"], dataset["poses"], dataset["focals"],
            )
        else:
            images, poses, focals = dataset.images, dataset.poses, dataset.focals
        self.dataset = dataset
        self.pipeline = RayBatchPipeline(images, poses, focals, seed=hparams.seed)
        self.H, self.W = self.pipeline.H, self.pipeline.W
        self.n_objects = self.pipeline.n_objects

        # Run directory: exps/<save_dir>/{hpam.json, metrics.jsonl, ckpt/}
        # (reference layout, src/trainer.py:158-166).
        self.save_dir = os.path.join(exps_root, save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        with open(os.path.join(self.save_dir, "hpam.json"), "w") as f:
            json.dump(self.hp.to_json_dict(), f, indent=2)
        self.logger = MetricsLogger(self.save_dir, use_tensorboard=use_tensorboard)
        self.ckpt_dir = os.path.join(self.save_dir, "ckpt")

        self.tx = build_optimizer(self.hp)
        self.state: TrainState = create_train_state(
            jax.random.PRNGKey(self.hp.seed), self.hp, self.n_objects, self.tx
        )

        self._init_occupancy()
        self.compact = bool(compact_batches)
        step_fn = build_train_step(self.hp, self.H, self.W, self.tx,
                                   microbatch_rays=microbatch_rays,
                                   batch_size=self.B, mesh=mesh,
                                   compact=self.compact)
        batch_keys = (("obj", "view", "uv", "rgb") if self.compact
                      else ("obj", "uv", "c2w", "focal", "rgb"))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            st_sh = state_shardings(mesh, self.state)
            b_sh = batch_sharding(mesh)
            rep = NamedSharding(mesh, PartitionSpec())
            batch_shardings = {k: b_sh for k in batch_keys}
            self._batch_sharding = batch_shardings
            self.state = jax.device_put(self.state, st_sh)
            self._tables = (
                jax.device_put(self.pipeline.tables(),
                               {"c2w": rep, "focal": rep})
                if self.compact else None
            )
            in_sh = [st_sh, batch_shardings]
            if self._occ is not None:
                in_sh.append(type(self._occ)(occ=rep, radius=rep))
            if self.compact:
                in_sh.append({"c2w": rep, "focal": rep})
            self._train_step = jax.jit(
                step_fn,
                in_shardings=tuple(in_sh),
                out_shardings=(st_sh, None),
                donate_argnums=0,
            )
        else:
            self._batch_sharding = None
            self._tables = (jax.device_put(self.pipeline.tables())
                            if self.compact else None)
            self._train_step = jax.jit(step_fn, donate_argnums=0)

        self._render_fn = None

    # ------------------------------------------------------ train occupancy
    def _init_occupancy(self) -> None:
        """Training-time occupancy-grid state (config.TrainOccupancyConfig):
        a category-level density field refreshed from round-robin object
        codes every ``update_every`` steps; the thresholded grid is a
        per-step INPUT to the jitted train step (never a recompile)."""
        self._occ = None
        oc = self.hp.train_occupancy
        if oc is None:
            return
        from codenerf_tpu.core import occupancy as occ_mod

        radius = (oc.radius if oc.radius is not None
                  else self.hp.render.bound_sphere_radius)
        self._occ_radius = float(radius)
        self._density = jnp.zeros((oc.grid_size,) * 3, jnp.float32)
        self._occ = occ_mod.full_grid(oc.grid_size, self._occ_radius)
        self._occ_cursor = 0
        self._occ_seeded = False
        cd = resolve_dtype(self.hp.compute_dtype)

        # codes_per_update=None scales k with the category so decay^rounds
        # stays >= 0.5 at any n_objects (the staleness regime below is
        # unreachable); an EXPLICIT k can still land in it and warns.
        k = occ_mod.resolve_codes_per_update(oc, self.n_objects)
        self._occ_k = k
        rounds = -(-self.n_objects // k)  # ceil
        if rounds > 1 and oc.decay ** rounds < 0.5:
            import warnings

            warnings.warn(
                f"train_occupancy: codes_per_update={k} covers "
                f"{self.n_objects} objects in {rounds} rounds, and "
                f"decay^rounds = {oc.decay ** rounds:.3f} < 0.5 — cells kept "
                "alive only by rarely-refreshed objects will decay below "
                "threshold between their refreshes. Raise codes_per_update "
                "or decay, or leave codes_per_update unset (auto-scales "
                "with the category).",
                stacklevel=3,
            )

        def upd(density, trainables, obj_idx, decay):
            d = occ_mod.update_density_grid(
                density, trainables["params"], self.hp.net,
                trainables["shape_codes"][obj_idx],
                trainables["texture_codes"][obj_idx],
                self._occ_radius, decay=decay, compute_dtype=cd,
            )
            grid = occ_mod.grid_from_density(
                d, self._occ_radius, sigma_threshold=oc.sigma_threshold,
                dilate=oc.dilate, mask_radius=self._occ_radius,
            )
            return d, grid

        self._occ_update_fn = jax.jit(upd, static_argnames="decay")

        def rebuild(trainables):
            # Full-category max-union in ONE dispatch (decay=1.0, order-
            # independent): occupancy.category_density_scan — the same
            # function the optimize CLI uses to reconstruct the grid from
            # a restored checkpoint.
            return occ_mod.category_density_scan(
                trainables, self.hp.net, oc.grid_size, self._occ_radius,
                k, sigma_threshold=oc.sigma_threshold, dilate=oc.dilate,
                compute_dtype=cd)

        self._occ_rebuild_fn = jax.jit(rebuild)

    def _update_occupancy(self) -> None:
        oc = self.hp.train_occupancy
        k = self._occ_k
        idx = (np.arange(k) + self._occ_cursor) % self.n_objects
        self._occ_cursor = int((self._occ_cursor + k) % self.n_objects)
        self._density, self._occ = self._occ_update_fn(
            self._density, self.state.trainables, jnp.asarray(idx), oc.decay
        )

    def _rebuild_occupancy(self) -> None:
        """Full grid rebuild covering EVERY object (decay=1.0 — a pure
        max-union over all current codes). Used at the warmup boundary and
        on post-warmup resume: a single incremental update there would see
        only ``codes_per_update`` objects and mark every other object's
        cells empty, collapsing their rays to the degenerate near-bound
        span until round-robin coverage completed.

        One dispatch (jitted scan over code chunks): the earlier per-chunk
        python loop paid ceil(n/k) tunnel round-trips + per-chunk H2D of
        the indices — measured ~540 s of a 788 s training run at 2458
        objects with codes_per_update=8 on the tunneled v5e."""
        self._density, self._occ = self._occ_rebuild_fn(
            self.state.trainables)
        self._occ_cursor = 0
        self._occ_seeded = True

    def _maybe_update_occupancy(self, next_step: int) -> None:
        oc = self.hp.train_occupancy
        if oc is None:
            return
        if next_step >= oc.warmup and next_step % oc.update_every == 0:
            if self._occ_seeded:
                self._update_occupancy()
            else:
                self._rebuild_occupancy()

    # ------------------------------------------------------------------ ckpt
    def save_checkpoint(self) -> str:
        return ckpt.save_checkpoint(
            self.ckpt_dir, self.state, int(self.state.step)
        )

    @property
    def occupancy_grid(self):
        """The live category occupancy grid (None when train_occupancy is
        off). The category-level max-union over trained codes is a valid
        conservative bound for UNSEEN objects of the same category too, so
        test-time optimization (CodeOptimizer ``occ_grid=``) can reuse it
        for empty-space skipping."""
        return self._occ

    def resume(self) -> bool:
        """Restore the latest checkpoint if one exists. Returns True if
        restored."""
        step = ckpt.latest_step(self.ckpt_dir)
        if step is None:
            return False
        self.state = ckpt.restore_checkpoint(self.ckpt_dir, self.state, step)
        return True

    # ------------------------------------------------------------- main loop
    def training(self, iters_crop: int, iters_all: int,
                 log_every: int = 100) -> Dict[str, float]:
        """Run the two-stage schedule until ``iters_all`` total steps.

        Stage 1 (steps < iters_crop): rays restricted to the center crop
        window; stage 2: whole images — reference semantics
        (``src/trainer.py:35-47``) minus the per-epoch optimizer resets.
        """
        if iters_crop > iters_all:
            raise ValueError(
                f"iters_crop={iters_crop} > iters_all={iters_all}"
            )
        metrics = {}
        last_metrics = None
        t_phase = time.time()
        rays_since_log = 0
        start = int(self.state.step)
        crop_phase = start < iters_crop
        batches = self.pipeline.prefetch(self.B, crop=crop_phase,
                                         transform=self._stage,
                                         compact=self.compact)

        occ_cfg = self.hp.train_occupancy
        if occ_cfg is not None and start >= occ_cfg.warmup \
                and not self._occ_seeded:
            # Resume past warmup: the density field is rebuilt from the
            # restored model immediately (it is not checkpointed) — over
            # ALL objects, not one round-robin window. A live in-process
            # grid (_occ_seeded) is already current via the periodic
            # refresh cycle and is NOT rebuilt — repeated training() calls
            # in one process must not pay a full-category rebuild each.
            self._rebuild_occupancy()
        step = start
        try:
            for step in range(start, iters_all):
                if crop_phase and step >= iters_crop:
                    crop_phase = False
                    batches.close()  # stop the crop-phase worker
                    batches = self.pipeline.prefetch(self.B, crop=False,
                                                     transform=self._stage,
                                                     compact=self.compact)
                batch = next(batches)
                self.state, metrics = self._train_step(
                    self.state, batch, *self._step_extras())
                rays_since_log += self.B

                next_step = step + 1
                self._maybe_update_occupancy(next_step)
                if next_step % log_every == 0 or next_step == iters_all:
                    last_metrics = {k: float(v) for k, v in metrics.items()}
                    dt = time.time() - t_phase
                    last_metrics["rays_per_sec"] = rays_since_log / max(dt, 1e-9)
                    self.logger.scalars(
                        next_step,
                        {
                            "psnr/train": last_metrics["psnr"],
                            "reg/train": last_metrics["reg"],
                            "loss/train": last_metrics["loss"],
                            "time/train": dt,
                            "rays_per_sec": last_metrics["rays_per_sec"],
                        },
                    )
                    t_phase = time.time()
                    rays_since_log = 0
                if self.check_iter and next_step % self.check_iter == 0:
                    self._log_render(next_step)
                if self.hp.check_points and next_step % self.hp.check_points == 0:
                    self.save_checkpoint()
        except (KeyboardInterrupt, Exception):
            # Crash-safe checkpoint: the reference loses everything since the
            # last epoch on any failure (no resume path at all, SURVEY §5.3);
            # here an interrupted run resumes from the step it died at.
            # In-flight donated buffers may be poisoned by the failure, so
            # only save if the state is still fetchable.
            try:
                self.save_checkpoint()
            except Exception:
                pass
            raise
        finally:
            batches.close()  # stop the prefetch worker

        self.save_checkpoint()
        return last_metrics or {}

    def profile_steps(self, n_steps: int = 5, trace_dir: Optional[str] = None) -> str:
        """Capture a JAX profiler trace of ``n_steps`` training steps (view
        with TensorBoard or xprof). The reference's only 'profiling' is
        wall-clock TB scalars (``src/trainer.py:89,104``)."""
        import jax.profiler

        trace_dir = trace_dir or os.path.join(self.save_dir, "profile")
        batch = self._put(self.pipeline.sample(self.B, compact=self.compact))
        extras = self._step_extras()
        self.state, m = self._train_step(self.state, batch, *extras)  # compile
        np.asarray(m["loss"])
        jax.profiler.start_trace(trace_dir)
        for _ in range(n_steps):
            self.state, m = self._train_step(self.state, batch, *extras)
        np.asarray(m["loss"])  # host fetch = real device sync on axon
        jax.profiler.stop_trace()
        return trace_dir

    def _step_extras(self) -> tuple:
        """Trailing train-step arguments beyond (state, batch): the
        occupancy grid (when configured) and the device-resident
        pose/focal tables (compact batches)."""
        extras = ()
        if self._occ is not None:
            extras += (self._occ,)
        if self.compact:
            extras += (self._tables,)
        return extras

    # ------------------------------------------------------------- utilities
    def _put(self, batch: Dict[str, np.ndarray]):
        if self._batch_sharding is not None:
            return jax.device_put(batch, self._batch_sharding)
        return batch

    def _stage(self, batch: Dict[str, np.ndarray]):
        """Device staging for the prefetch worker: always an explicit
        device_put (sharded under a mesh) so the H2D transfer happens on
        the worker thread, overlapped with the in-flight step."""
        if self._batch_sharding is not None:
            return jax.device_put(batch, self._batch_sharding)
        return jax.device_put(batch)

    def render_view(self, obj_idx: int, view_idx: int,
                    key: Optional[jax.Array] = None) -> np.ndarray:
        """Render one dataset view with the current model. (H, W, 3) f32."""
        if self._render_fn is None:
            self._render_fn = jax.jit(
                lambda tr, focal, c2w, s, t: render_image(
                    tr["params"], self.hp.net, self.hp.render,
                    self.H, self.W, focal, c2w, s, t, key=None,
                    chunk=min(4096, self.H * self.W),
                    fine_params=tr.get("fine_params"),
                    compute_dtype=resolve_dtype(self.hp.compute_dtype),
                )
            )
        tr = self.state.trainables
        img = self._render_fn(
            tr,
            jnp.asarray(self.pipeline.focals[obj_idx]),
            jnp.asarray(self.pipeline.poses[obj_idx, view_idx]),
            tr["shape_codes"][obj_idx],
            tr["texture_codes"][obj_idx],
        )
        return np.asarray(img)

    def _log_render(self, step: int, obj_idx: int = 0, view_idx: int = 0) -> None:
        img = self.render_view(obj_idx, view_idx)
        gt = self.pipeline.images[obj_idx, view_idx].astype(np.float32) / 255.0
        mse = float(reference_psnr_mse(jnp.asarray(img), jnp.asarray(gt)))
        self.logger.scalars(step, {"psnr/render": -10.0 * np.log10(mse)})
        self.logger.image(step, f"train_{step}_{obj_idx}", side_by_side(img, gt))
