"""Occupancy-grid empty-space skipping: grid construction from a trained
model, per-ray interval tightening, degenerate misses, and render quality
at reduced sample budgets (core/occupancy.py — absent from the reference,
which samples one global slab, src/utils.py:21-32)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from codenerf_tpu.core.occupancy import (
    OccupancyGrid,
    build_occupancy_grid,
    dilate_grid,
    grid_cell_centers,
    occupancy_at,
    ray_grid_bounds,
)


def test_grid_cell_centers_layout():
    g = grid_cell_centers(4, 1.0)
    assert g.shape == (64, 3)
    # first center is the (-,-,-) corner cell, component order = axis order
    np.testing.assert_allclose(np.asarray(g[0]), [-0.75, -0.75, -0.75])
    np.testing.assert_allclose(np.asarray(g[1]), [-0.75, -0.75, -0.25])
    np.testing.assert_allclose(np.asarray(g[4]), [-0.75, -0.25, -0.75])
    np.testing.assert_allclose(np.asarray(g[16]), [-0.25, -0.75, -0.75])


def test_occupancy_at_roundtrip():
    """occupancy_at(grid, center_of_cell_i) must read exactly cell i."""
    G = 8
    key = jax.random.PRNGKey(0)
    occ = jax.random.bernoulli(key, 0.4, (G, G, G))
    grid = OccupancyGrid(occ=occ, radius=jnp.asarray(1.0))
    centers = grid_cell_centers(G, 1.0)
    vals = occupancy_at(grid, centers)
    np.testing.assert_array_equal(np.asarray(vals),
                                  np.asarray(occ.reshape(-1)))
    # outside the box -> unoccupied
    outside = jnp.asarray([[1.5, 0.0, 0.0], [0.0, -2.0, 0.0]])
    assert not np.asarray(occupancy_at(grid, outside)).any()


def test_dilate_grid():
    occ = jnp.zeros((5, 5, 5), bool).at[2, 2, 2].set(True)
    d = dilate_grid(occ, 1)
    assert int(np.asarray(d).sum()) == 27
    assert bool(d[1, 1, 1]) and bool(d[3, 3, 3]) and not bool(d[0, 0, 0])


def test_ray_grid_bounds_brackets_occupied_span():
    """A single occupied cell: the tightened interval must bracket it, and
    an empty grid must give the degenerate miss interval."""
    G = 16
    occ = jnp.zeros((G, G, G), bool)
    # occupy the cell containing the point (0, 0, 0.5): axis index
    # floor((p + 1) / 2 * 16)
    idx = tuple(int(np.floor((p + 1.0) / 2.0 * G)) for p in (0.0, 0.0, 0.5))
    occ = occ.at[idx].set(True)
    grid = OccupancyGrid(occ=occ, radius=jnp.asarray(1.0))

    # ray along +z through the occupied cell
    ro = jnp.asarray([[0.0, 0.0, -2.0]])
    vd = jnp.asarray([[0.0, 0.0, 1.0]])
    t0 = jnp.asarray([0.5])
    t1 = jnp.asarray([3.5])
    n0, n1 = ray_grid_bounds(grid, ro, vd, t0, t1, n_probes=64)
    # the occupied cell spans z in [0.5, 0.625] -> t in [2.5, 2.625]
    assert float(n0[0]) <= 2.5 and float(n1[0]) >= 2.625
    assert float(n1[0]) - float(n0[0]) < 0.5  # massively tightened

    # a parallel ray that misses the cell: degenerate interval
    ro_miss = jnp.asarray([[0.9, 0.9, -2.0]])
    m0, m1 = ray_grid_bounds(grid, ro_miss, vd, t0, t1, n_probes=64)
    assert float(m0[0]) == 0.5
    assert float(m1[0]) - float(m0[0]) < 0.01


def test_build_grid_from_trained_model(trained):
    """On the trained tiny scene the sphere-masked grid must be partially
    occupied (the object) and zero outside the mask sphere; occ-grid
    rendering at a SMALLER budget must match the full-budget render.

    NB: cells NO training ray traversed carry arbitrary density (the model
    is unsupervised there — measured sigma ~8 vs ~1 inside the object on
    this fixture), hence the mask_radius; the renderer composes the grid
    with the same bounding sphere."""
    tr, scene, hp = trained
    trainables = tr.state.trainables
    params = trainables["params"]
    obj_r = float(scene["radii"][0])

    grid = build_occupancy_grid(
        params, hp.net,
        trainables["shape_codes"][0], trainables["texture_codes"][0],
        G=32, radius=1.8, sigma_threshold=0.3,
        mask_radius=obj_r * 1.25,
        compute_dtype=jnp.float32,
    )
    occ = np.asarray(grid.occ)
    frac = occ.mean()
    assert 0.0 < frac < 0.6, f"grid degenerate: {frac:.3f} occupied"
    # outside the mask sphere (up to one dilation cell) everything is empty
    centers = np.asarray(grid_cell_centers(32, 1.8))
    r = np.linalg.norm(centers, axis=-1).reshape(32, 32, 32)
    cell = 2 * 1.8 / 32
    assert not occ[r > obj_r * 1.25 + 2 * cell].any()

    from codenerf_tpu.renderer import render_image

    H, W = scene["images"].shape[2:4]
    focal = float(scene["focals"][0])
    c2w = jnp.asarray(scene["poses"][0, 0])
    s_code = trainables["shape_codes"][0]
    t_code = trainables["texture_codes"][0]

    rcfg_sphere = dataclasses.replace(hp.render,
                                      bound_sphere_radius=obj_r * 1.3)
    full = render_image(params, hp.net, rcfg_sphere, H, W, focal, c2w,
                        s_code, t_code, key=None, compute_dtype=jnp.float32)
    rcfg_occ = dataclasses.replace(
        rcfg_sphere, n_samples=max(12, hp.render.n_samples // 2))
    occ_img = render_image(params, hp.net, rcfg_occ, H, W, focal, c2w,
                           s_code, t_code, key=None,
                           compute_dtype=jnp.float32, occ_grid=grid)
    mse = float(np.mean((np.asarray(full) - np.asarray(occ_img)) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-10))
    assert psnr > 25.0, f"occ render at half budget vs full: {psnr:.2f} dB"
