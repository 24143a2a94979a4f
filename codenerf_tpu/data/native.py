"""ctypes binding for the native (C++) host-pipeline library.

Builds ``native/ray_sampler.cpp`` on demand with g++ (no pybind11 in this
environment — plain C ABI + ctypes), caches the .so under ``native/build/``,
and exposes numpy-facing wrappers. Import is safe everywhere: if no C++
toolchain is available the loader returns None and callers fall back to the
pure-numpy path in :mod:`codenerf_tpu.data.pipeline`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ray_sampler.cpp")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "build", "libcn_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_i64 = ctypes.c_int64
_u64 = ctypes.c_uint64


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-pthread",
        "-shared", "-o", _LIB_PATH, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            return None
        if not os.path.isfile(_LIB_PATH) or (
            os.path.isfile(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            return _bind(lib)
        except (OSError, AttributeError):
            # AttributeError: a stale prebuilt .so predating a newer entry
            # point (mtime check defeated by e.g. a restored build cache).
            # Rebuild once from the current source before giving up. The
            # stale library must be UNLINKED first: the failed CDLL above
            # keeps its mapping open and g++ rewriting the same inode
            # would make the retry dlopen dedup to the stale handle
            # (verified: same _handle, symbol still missing). A fresh
            # inode gets a fresh mapping.
            try:
                os.unlink(_LIB_PATH)
            except OSError:
                pass
            if _build():
                try:
                    return _bind(ctypes.CDLL(_LIB_PATH))
                except (OSError, AttributeError):
                    pass
            _load_failed = True
            return None


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Declare signatures for every entry point (raises AttributeError if
    the library is missing one) and publish the handle."""
    global _lib

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.cn_sample_batch.restype = ctypes.c_int
    lib.cn_sample_batch.argtypes = [
        u8p, f32p, f32p,
        _i64, _i64, _i64, _i64, _i64, _u64, _u64,
        _i64, _i64, _i64, _i64,
        i32p, f32p, f32p, f32p, f32p, ctypes.c_int,
    ]
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    u8wp = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.cn_sample_batch_compact.restype = ctypes.c_int
    lib.cn_sample_batch_compact.argtypes = [
        u8p,
        _i64, _i64, _i64, _i64, _i64, _u64, _u64,
        _i64, _i64, _i64, _i64,
        i32p, i32p, i16p, u8wp, ctypes.c_int,
    ]
    lib.cn_rays_of_view.restype = ctypes.c_int
    lib.cn_rays_of_view.argtypes = [
        u8p, f32p, f32p,
        _i64, _i64, _i64, _i64, _i64, _i64,
        _i64, _i64, _i64, _i64,
        i32p, f32p, f32p, f32p, f32p,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return load_library() is not None


def sample_batch(
    images: np.ndarray, poses: np.ndarray, focals: np.ndarray,
    batch: int, seed: int, step: int,
    v0: int, v1: int, u0: int, u1: int,
    n_threads: int = 0,
) -> Dict[str, np.ndarray]:
    """Native equivalent of ``RayBatchPipeline.sample`` (same output
    contract; different — but deterministic — random stream)."""
    lib = load_library()
    assert lib is not None, "native library unavailable"
    N, V, H, W = images.shape[:4]
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    out = {
        "obj": np.empty(batch, np.int32),
        "uv": np.empty((batch, 2), np.float32),
        "c2w": np.empty((batch, 3, 4), np.float32),
        "focal": np.empty(batch, np.float32),
        "rgb": np.empty((batch, 3), np.float32),
    }
    rc = lib.cn_sample_batch(
        images, np.ascontiguousarray(poses), np.ascontiguousarray(focals),
        N, V, H, W, batch, seed & (2**64 - 1), step & (2**64 - 1),
        v0, v1, u0, u1,
        out["obj"], out["uv"], out["c2w"], out["focal"], out["rgb"],
        n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"cn_sample_batch failed with code {rc}")
    return out


def sample_batch_compact(
    images: np.ndarray, poses: np.ndarray, focals: np.ndarray,
    batch: int, seed: int, step: int,
    v0: int, v1: int, u0: int, u1: int,
    n_threads: int = 0,
) -> Dict[str, np.ndarray]:
    """Native compact (index-layout) batch — same (obj, view, pixel) picks
    as :func:`sample_batch` for the same (seed, step). ``poses``/``focals``
    are unused (they live in device-resident tables) but kept in the
    signature so both backends share a call shape."""
    del poses, focals
    lib = load_library()
    assert lib is not None, "native library unavailable"
    N, V, H, W = images.shape[:4]
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    out = {
        "obj": np.empty(batch, np.int32),
        "view": np.empty(batch, np.int32),
        "uv": np.empty((batch, 2), np.int16),
        "rgb": np.empty((batch, 3), np.uint8),
    }
    rc = lib.cn_sample_batch_compact(
        images, N, V, H, W, batch, seed & (2**64 - 1), step & (2**64 - 1),
        v0, v1, u0, u1,
        out["obj"], out["view"], out["uv"], out["rgb"],
        n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"cn_sample_batch_compact failed with code {rc}")
    return out


def rays_of_view(
    images: np.ndarray, poses: np.ndarray, focals: np.ndarray,
    obj: int, view: int, v0: int, v1: int, u0: int, u1: int,
) -> Dict[str, np.ndarray]:
    lib = load_library()
    assert lib is not None, "native library unavailable"
    N, V, H, W = images.shape[:4]
    n = (v1 - v0) * (u1 - u0)
    out = {
        "obj": np.empty(n, np.int32),
        "uv": np.empty((n, 2), np.float32),
        "c2w": np.empty((n, 3, 4), np.float32),
        "focal": np.empty(n, np.float32),
        "rgb": np.empty((n, 3), np.float32),
    }
    rc = lib.cn_rays_of_view(
        images, np.ascontiguousarray(poses), np.ascontiguousarray(focals),
        N, V, H, W, obj, view, v0, v1, u0, u1,
        out["obj"], out["uv"], out["c2w"], out["focal"], out["rgb"],
    )
    if rc != 0:
        raise RuntimeError(f"cn_rays_of_view failed with code {rc}")
    return out
