"""Serving tests: the HTTP render service end to end on localhost — health,
renders by object id and by raw codes, orbit-parameter cameras, error paths,
stats."""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(trained):
    from codenerf_tpu.serving import RenderServer

    tr, scene, hp = trained
    srv = RenderServer(tr.state.trainables, hp, port=0)
    srv.start_background()
    yield srv, scene
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(f"http://{srv.host}:{srv.port}{path}",
                                timeout=60) as r:
        return json.loads(r.read())


def _post_render(srv, payload, timeout=120):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}/render",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        assert r.headers["Content-Type"] == "image/png"
        return r.read()


def _decode(png_bytes):
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(png_bytes)))


def test_healthz(server):
    srv, scene = server
    h = _get(srv, "/healthz")
    assert h["status"] == "ok"
    assert h["n_objects"] == scene["images"].shape[0]


def test_render_by_object_matches_direct_render(server, trained):
    srv, scene = server
    tr, _, hp = trained
    H, W = scene["H"], scene["W"]
    c2w = scene["poses"][0, 0].tolist()
    png = _post_render(srv, {"obj": 0, "c2w": c2w, "H": H, "W": W,
                             "focal": float(scene["focals"][0])})
    img = _decode(png)
    assert img.shape == (H, W, 3)
    direct = tr.render_view(0, 0)
    direct_u8 = np.clip(direct * 255.0, 0, 255).astype(np.uint8)
    assert np.abs(img.astype(int) - direct_u8.astype(int)).mean() < 2.0


def test_render_by_raw_codes_and_orbit_camera(server, trained):
    srv, scene = server
    tr, _, hp = trained
    sc = np.asarray(tr.state.trainables["shape_codes"][1]).tolist()
    tc = np.asarray(tr.state.trainables["texture_codes"][1]).tolist()
    png = _post_render(srv, {
        "shape_code": sc, "texture_code": tc,
        "azimuth": 0.7, "elevation": 0.3, "radius": 4.0,
        "H": 16, "W": 16, "focal": float(scene["focals"][0]),
    })
    img = _decode(png)
    assert img.shape == (16, 16, 3)
    assert img.std() > 0  # not a constant image


def test_error_paths(server):
    srv, _ = server
    for payload in (
        {"obj": 999},                       # out of range
        {"c2w": [[1, 0], [0, 1]], "obj": 0},  # malformed pose
        {},                                  # no codes
    ):
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/render",
            data=json.dumps(payload).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"http://{srv.host}:{srv.port}/nope",
                               timeout=60)
    assert e.value.code == 404


def test_stats_accumulate(server):
    srv, scene = server
    s = _get(srv, "/stats")
    assert s["requests"] >= 2
    assert s["latency_ms"]["p50"] > 0
    assert len(s["compiled_sizes"]) >= 1


def test_render_with_occupancy_grid(trained):
    """use_occupancy=True: the served render runs with per-object
    empty-space skipping and still closely matches the plain render (the
    grid only tightens sampling intervals around the trained density)."""
    import dataclasses

    import jax

    from codenerf_tpu.serving import RenderServer

    tr, scene, hp = trained
    hp_b = dataclasses.replace(
        hp, render=dataclasses.replace(hp.render, bound_sphere_radius=1.4))
    srv = RenderServer(tr.state.trainables, hp_b, port=0,
                       use_occupancy=True, occ_grid_size=16)
    srv_plain = RenderServer(tr.state.trainables, hp_b, port=0)
    req = {"obj": 0, "azimuth": 0.6, "elevation": 0.3,
           "radius": 1.3, "H": 16, "W": 16}
    img_occ = srv.render(dict(req))
    img_plain = srv_plain.render(dict(req))
    assert img_occ.shape == (16, 16, 3)
    # occupancy must reuse the cached per-object grid on a second call
    assert 0 in srv._occ_grids
    srv.render(dict(req))
    # same scene content (interval tightening, not a different model)
    diff = np.mean(np.abs(img_occ.astype(np.float32)
                          - img_plain.astype(np.float32))) / 255.0
    assert diff < 0.08, diff
    # custom codes path builds a grid on the fly
    t = tr.state.trainables
    img_codes = srv.render({
        "shape_code": np.asarray(t["shape_codes"][0]).tolist(),
        "texture_code": np.asarray(t["texture_codes"][0]).tolist(),
        "azimuth": 0.6, "elevation": 0.3, "radius": 1.3, "H": 16, "W": 16,
    })
    np.testing.assert_allclose(img_codes.astype(np.float32),
                               img_occ.astype(np.float32), atol=25)


def test_occupancy_requires_radius(trained):
    import pytest as _pytest

    from codenerf_tpu.serving import RenderServer

    tr, scene, hp = trained
    with _pytest.raises(ValueError, match="grid extent"):
        RenderServer(tr.state.trainables, hp, port=0, use_occupancy=True)
