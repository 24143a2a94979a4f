"""Native (C++) host-pipeline tests: builds the library with g++, checks
the batch contract, gather correctness, determinism, crop bounds, and the
pipeline integration. Skipped cleanly when no toolchain is present."""

import numpy as np
import pytest

from codenerf_tpu.data import native
from codenerf_tpu.data.pipeline import RayBatchPipeline

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain / build failed"
)


def _scene(n=3, v=4, H=16, W=16, seed=0):
    from codenerf_tpu.data.synthetic import synthetic_scene

    return synthetic_scene(n_objects=n, n_views=v, H=H, W=W, seed=seed)


def test_sample_contract_and_gather_correctness():
    s = _scene()
    b = native.sample_batch(s["images"], s["poses"], s["focals"],
                            batch=512, seed=7, step=1,
                            v0=0, v1=16, u0=0, u1=16)
    assert b["obj"].shape == (512,) and b["obj"].dtype == np.int32
    assert b["uv"].shape == (512, 2) and b["c2w"].shape == (512, 3, 4)
    assert set(np.unique(b["obj"])) <= set(range(3))
    # focal and pose gathers must match the indexed object
    np.testing.assert_allclose(b["focal"], s["focals"][b["obj"]], atol=0)
    # rgb must equal some view's pixel at (v,u) for that object
    for i in range(0, 512, 37):
        o = b["obj"][i]
        u, v = b["uv"][i].astype(int)
        candidates = s["images"][o, :, v, u].astype(np.float32) / 255.0
        assert np.any(np.all(np.abs(candidates - b["rgb"][i]) < 1e-6, axis=-1))
        # pose row gather: c2w must equal one of the object's view poses
        pose_matches = np.all(
            np.abs(s["poses"][o, :, :3, :] - b["c2w"][i]) < 1e-6, axis=(1, 2)
        )
        assert pose_matches.any()


def test_determinism_and_step_variation():
    s = _scene()
    a1 = native.sample_batch(s["images"], s["poses"], s["focals"], 256, 7, 5,
                             0, 16, 0, 16)
    a2 = native.sample_batch(s["images"], s["poses"], s["focals"], 256, 7, 5,
                             0, 16, 0, 16)
    b = native.sample_batch(s["images"], s["poses"], s["focals"], 256, 7, 6,
                            0, 16, 0, 16)
    for k in a1:
        np.testing.assert_array_equal(a1[k], a2[k])
    assert not np.array_equal(a1["uv"], b["uv"])


def test_thread_count_invariance():
    s = _scene(H=32, W=32)
    a = native.sample_batch(s["images"], s["poses"], s["focals"], 8192, 3, 9,
                            0, 32, 0, 32, n_threads=1)
    b = native.sample_batch(s["images"], s["poses"], s["focals"], 8192, 3, 9,
                            0, 32, 0, 32, n_threads=8)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_crop_bounds_respected():
    s = _scene(H=32, W=32)
    b = native.sample_batch(s["images"], s["poses"], s["focals"], 4096, 1, 1,
                            8, 24, 8, 24)
    assert b["uv"][:, 0].min() >= 8 and b["uv"][:, 0].max() < 24
    assert b["uv"][:, 1].min() >= 8 and b["uv"][:, 1].max() < 24


def test_sampling_is_roughly_uniform():
    s = _scene(n=4, v=4, H=16, W=16)
    b = native.sample_batch(s["images"], s["poses"], s["focals"], 40000, 11, 2,
                            0, 16, 0, 16)
    counts = np.bincount(b["obj"], minlength=4)
    assert (np.abs(counts / 40000 - 0.25) < 0.02).all()
    u_hist = np.bincount(b["uv"][:, 0].astype(int), minlength=16)
    assert (np.abs(u_hist / 40000 - 1 / 16) < 0.01).all()


def test_rays_of_view_matches_numpy_path():
    s = _scene()
    pipe = RayBatchPipeline(s["images"], s["poses"], s["focals"])
    ref = pipe.rays_of_view(1, 2)
    nat = native.rays_of_view(s["images"], s["poses"], s["focals"],
                              1, 2, 0, 16, 0, 16)
    for k in ref:
        np.testing.assert_allclose(nat[k], ref[k], atol=1e-6)


def test_pipeline_native_backend():
    s = _scene()
    pipe = RayBatchPipeline(s["images"], s["poses"], s["focals"], seed=5,
                            backend="native")
    assert pipe.backend == "native"
    b = pipe.sample(128, crop=True)
    assert b["rgb"].shape == (128, 3)
    H, W = pipe.H, pipe.W
    assert b["uv"][:, 0].min() >= W // 4 and b["uv"][:, 0].max() < W - W // 4
    # step counter advances -> different batches
    b2 = pipe.sample(128, crop=True)
    assert not np.array_equal(b["uv"], b2["uv"])


def test_compact_matches_full_layout():
    """cn_sample_batch_compact shares the RNG chain with cn_sample_batch:
    identical (obj, view, pixel) picks for the same (seed, step)."""
    s = _scene(H=32, W=32)
    full = native.sample_batch(s["images"], s["poses"], s["focals"], 2048,
                               13, 4, 0, 32, 0, 32)
    comp = native.sample_batch_compact(s["images"], s["poses"], s["focals"],
                                       2048, 13, 4, 0, 32, 0, 32)
    assert comp["uv"].dtype == np.int16 and comp["rgb"].dtype == np.uint8
    np.testing.assert_array_equal(full["obj"], comp["obj"])
    np.testing.assert_array_equal(full["uv"].astype(np.int16), comp["uv"])
    np.testing.assert_allclose(comp["rgb"].astype(np.float32) / 255.0,
                               full["rgb"], atol=1e-7)
    # view index consistency: the gathered pose must be that view's pose
    for i in range(0, 2048, 111):
        o, v = comp["obj"][i], comp["view"][i]
        np.testing.assert_allclose(s["poses"][o, v, :3, :], full["c2w"][i],
                                   atol=1e-6)


def test_compact_thread_count_invariance():
    s = _scene(H=32, W=32)
    a = native.sample_batch_compact(s["images"], s["poses"], s["focals"],
                                    8192, 3, 9, 0, 32, 0, 32, n_threads=1)
    b = native.sample_batch_compact(s["images"], s["poses"], s["focals"],
                                    8192, 3, 9, 0, 32, 0, 32, n_threads=8)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_pipeline_native_compact_backend():
    s = _scene()
    pipe = RayBatchPipeline(s["images"], s["poses"], s["focals"], seed=5,
                            backend="native")
    b = pipe.sample(128, compact=True)
    assert set(b) == {"obj", "view", "uv", "rgb"}
    assert b["rgb"].dtype == np.uint8


def test_error_codes():
    s = _scene()
    with pytest.raises(RuntimeError):
        native.sample_batch(s["images"], s["poses"], s["focals"], 16, 0, 0,
                            0, 99, 0, 16)  # v1 > H
