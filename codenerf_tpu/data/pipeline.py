"""Host-side ray-batch pipeline.

The TPU-native replacement for the reference's DataLoader + per-object /
per-image / per-chunk python loops (``src/trainer.py:57-99``): every train
step consumes ONE globally-sampled batch of rays drawn across all objects,
views and pixels. The host does only cheap integer sampling + gathers (no
image decode — the split is already resident as uint8); ray construction
happens on-device from (pixel, pose, focal), see ``core/rays.pixel_rays``.

Crop mode reproduces the reference's two-stage schedule (center 64x64 of
128x128 for the first ``iters_crop`` steps, ``src/data.py:76-78``) as a
restriction of the sampled pixel range — the camera model is unchanged
because the crop preserves the principal point.

A background thread keeps a small queue of ready batches so host sampling
overlaps device compute (`prefetch`).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np


class _WorkerFailure:
    """Sentinel carrying a prefetch-worker exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class RayBatchPipeline:
    def __init__(
        self,
        images: np.ndarray,   # (N, V, H, W, 3) uint8
        poses: np.ndarray,    # (N, V, 4, 4) float32
        focals: np.ndarray,   # (N,) float32
        seed: int = 0,
        backend: str = "numpy",
    ):
        """``backend``: "numpy" (default), "native" (C++ sampler from
        native/ray_sampler.cpp — requires a toolchain, raises if absent), or
        "auto" (native when buildable, else numpy). The two backends draw
        from different (each internally deterministic) random streams."""
        assert images.dtype == np.uint8, "pipeline stores images as uint8"
        self.images = np.ascontiguousarray(images)
        self.poses = np.ascontiguousarray(poses.astype(np.float32))
        self.focals = np.ascontiguousarray(focals.astype(np.float32))
        self.n_objects, self.n_views, self.H, self.W = images.shape[:4]
        self._rng = np.random.default_rng(seed)
        self._seed = seed
        self._step = 0
        self._stream_count = 0
        if backend == "auto":
            from codenerf_tpu.data.native import native_available

            backend = "native" if native_available() else "numpy"
        elif backend == "native":
            from codenerf_tpu.data.native import native_available

            if not native_available():
                raise RuntimeError("native pipeline backend unavailable "
                                   "(no C++ toolchain or build failed)")
        self.backend = backend

    def _pixel_bounds(self, crop: bool):
        if crop:
            # Center half of the image, the reference's [32:-32] of 128.
            return (self.H // 4, self.H - self.H // 4,
                    self.W // 4, self.W - self.W // 4)
        return 0, self.H, 0, self.W

    def sample(self, batch_size: int, crop: bool = False,
               rng: np.random.Generator = None,
               native_step: int = None,
               compact: bool = False) -> Dict[str, np.ndarray]:
        """One training batch of rays, sampled i.i.d. across the dataset.

        ``rng``/``native_step`` override the pipeline's own stream — used by
        :meth:`prefetch` so each iterator draws from an independent,
        deterministic stream (a background worker sharing the pipeline RNG
        would make the batch sequence depend on thread timing).

        Returns host numpy arrays. Default (expanded) layout:
          obj   (B,)   int32   object index (latent-code row)
          uv    (B, 2) float32 full-image pixel coords (u=col, v=row)
          c2w   (B, 3, 4) float32 per-ray camera pose
          focal (B,)   float32
          rgb   (B, 3) float32 ground-truth pixel in [0, 1]

        ``compact=True`` returns the INDEX layout (15 B/ray vs 76 — the
        per-ray f32 pose dominates the H2D transfer otherwise; the train
        step gathers pose/focal from device-resident :meth:`tables` and
        converts rgb on-device, see ``train_step.expand_compact_batch``):
          obj   (B,)   int32
          view  (B,)   int32
          uv    (B, 2) int16
          rgb   (B, 3) uint8
        Both layouts draw the SAME (object, view, pixel) triples from a
        given stream state.
        """
        v0, v1, u0, u1 = self._pixel_bounds(crop)
        if self.backend == "native":
            from codenerf_tpu.data.native import (
                sample_batch,
                sample_batch_compact,
            )

            if native_step is None:
                self._step += 1
                native_step = self._step
            fn = sample_batch_compact if compact else sample_batch
            return fn(
                self.images, self.poses, self.focals, batch_size,
                self._seed, native_step, v0, v1, u0, u1,
            )
        if rng is None:
            rng = self._rng
        obj = rng.integers(0, self.n_objects, batch_size, dtype=np.int64)
        view = rng.integers(0, self.n_views, batch_size, dtype=np.int64)
        pu = rng.integers(u0, u1, batch_size, dtype=np.int64)
        pv = rng.integers(v0, v1, batch_size, dtype=np.int64)

        if compact:
            return {
                "obj": obj.astype(np.int32),
                "view": view.astype(np.int32),
                "uv": np.stack([pu, pv], axis=-1).astype(np.int16),
                "rgb": self.images[obj, view, pv, pu],
            }
        rgb = self.images[obj, view, pv, pu].astype(np.float32) / 255.0
        return {
            "obj": obj.astype(np.int32),
            "uv": np.stack([pu, pv], axis=-1).astype(np.float32),
            "c2w": self.poses[obj, view, :3, :],
            "focal": self.focals[obj],
            "rgb": rgb,
        }

    def tables(self) -> Dict[str, np.ndarray]:
        """Device-residency companions of the compact batch layout: the full
        pose/focal tables, put on device ONCE at trainer start so each step
        gathers (obj, view) -> pose instead of shipping 48 B/ray of f32
        pose over the host link."""
        return {
            "c2w": np.ascontiguousarray(self.poses[:, :, :3, :]),
            "focal": self.focals,
        }

    def rays_of_view(self, obj: int, view: int,
                     crop: bool = False) -> Dict[str, np.ndarray]:
        """All pixels of one (object, view), row-major — the eval layout
        (matches the reference's whole-image flattening, ``src/utils.py:18``)."""
        v0, v1, u0, u1 = self._pixel_bounds(crop)
        vv, uu = np.meshgrid(np.arange(v0, v1), np.arange(u0, u1), indexing="ij")
        n = vv.size
        rgb = self.images[obj, view, vv.ravel(), uu.ravel()].astype(np.float32) / 255.0
        return {
            "obj": np.full((n,), obj, dtype=np.int32),
            "uv": np.stack([uu.ravel(), vv.ravel()], -1).astype(np.float32),
            "c2w": np.broadcast_to(self.poses[obj, view, :3, :], (n, 3, 4)).copy(),
            "focal": np.full((n,), self.focals[obj], dtype=np.float32),
            "rgb": rgb,
        }

    def prefetch(self, batch_size: int, crop: bool = False,
                 depth: int = 2,
                 transform=None,
                 compact: bool = False) -> Iterator[Dict[str, np.ndarray]]:
        """Endless iterator of batches produced on a background thread.

        Each call gets its own deterministic stream derived from
        (pipeline seed, stream index), so the sequence of batches is
        independent of thread scheduling and of any earlier (possibly
        still-draining) prefetch iterator. Close the iterator (``.close()``)
        to stop its worker.

        ``transform`` (e.g. a sharded ``jax.device_put``) runs on the
        WORKER thread, so host→device staging overlaps the training step
        instead of serializing with it — on a remote-tunneled device the
        per-batch transfer is tens of ms and otherwise lands between steps.
        """
        stream_id = self._stream_count
        self._stream_count += 1
        rng = np.random.default_rng([self._seed, stream_id])
        q: "queue.Queue" = queue.Queue(maxsize=depth)
        stop = threading.Event()

        def put(item) -> None:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        def worker():
            # Any failure (the device_put `transform` rides a flaky tunnel)
            # is forwarded through the queue and re-raised on the consumer
            # thread — a silently dead worker would leave training blocked
            # on q.get() forever with no error.
            try:
                i = 0
                while not stop.is_set():
                    batch = self.sample(
                        batch_size, crop=crop, rng=rng,
                        native_step=(stream_id << 32) | i,
                        compact=compact,
                    )
                    if transform is not None:
                        batch = transform(batch)
                    i += 1
                    put(batch)
            except BaseException as e:  # noqa: BLE001 — forwarded, not dropped
                put(_WorkerFailure(e))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, _WorkerFailure):
                    raise RuntimeError(
                        "prefetch worker failed"
                    ) from item.exc
                yield item
        finally:
            stop.set()
