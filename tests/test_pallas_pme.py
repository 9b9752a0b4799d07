"""Pallas fused PME spread/interp vs the XLA brick oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from nonbondedslicing_tpu.ops import neighbors, pme, pme_bricks, pallas_pme
from nonbondedslicing_tpu.utils.indexing import slice_pair_table, slice_subsets


def test_pallas_pme_matches_brick_oracle():
    rng = np.random.default_rng(12)
    n, nsub = 500, 3
    box = 4.2
    bricks = (2, 2, 2)
    grid_shape = (16, 16, 16)
    capacity = 96  # per-brick capacity
    box_arr = jnp.asarray(np.diag([box] * 3), jnp.float32)
    positions = jnp.asarray(rng.random((n, 3)) * box, jnp.float32)
    charge = jnp.asarray(rng.normal(size=n), jnp.float32)
    subsets = jnp.asarray(rng.integers(0, nsub, n), dtype=jnp.int32)
    alpha = 2.8
    moduli = pme.bspline_moduli(grid_shape)
    spairs = jnp.asarray(slice_subsets(nsub))
    sl_tab = slice_pair_table(nsub).astype(np.int32)
    lam = jnp.asarray(rng.random(6), jnp.float32)

    # brick-major slot tensors
    cell = neighbors.cell_ids(positions, box_arr, bricks)
    table, ov = neighbors.build_occupancy(cell, n, bricks, capacity)
    assert int(ov) == 0
    slots = table.reshape(-1)
    g = bricks[0] * bricks[1] * bricks[2]
    pos_p = jnp.concatenate([positions, jnp.zeros((1, 3), jnp.float32)])
    q_p = jnp.concatenate([charge, jnp.zeros((1,), jnp.float32)])
    sub_p = jnp.concatenate([subsets, jnp.full((1,), nsub, jnp.int32)])
    pos_b = pos_p[slots].reshape(g, capacity, 3).swapaxes(1, 2)
    q_b = q_p[slots].reshape(g, capacity)
    soh_b = (sub_p[slots][:, None] == jnp.arange(nsub, dtype=jnp.int32)
             ).astype(jnp.float32).reshape(g, capacity, nsub).swapaxes(1, 2)

    e_o, f_o = pme_bricks.pme_reciprocal_bricks(
        pos_b, q_b, soh_b, box_arr, lam, alpha=alpha, grid_shape=grid_shape,
        moduli=moduli, counts=bricks, slice_subset_pairs=spairs,
        slice_table=sl_tab)
    e_p, f_p = pallas_pme.pme_reciprocal_pallas(
        pos_b, q_b, soh_b, box_arr, lam, alpha=alpha, grid_shape=grid_shape,
        moduli=moduli, bricks=bricks, slice_subset_pairs=spairs,
        slice_table=sl_tab, interpret=True)

    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_o),
                               rtol=2e-5)
    scale = float(jnp.max(jnp.abs(f_o))) + 1.0
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_o),
                               atol=2e-5 * scale)


def test_fold_extract_kernels_match_scatter_gather():
    """fold = roll(scatter_windows, +1) and extract = gather_windows on the
    unshifted grid (the +1-shifted convention of the grid pipeline,
    pallas_pme.make_fold_kernel)."""
    rng = np.random.default_rng(5)
    bricks = (2, 3, 2)
    grid_shape = (16, 21, 14)   # p = (8, 7, 7) >= order+1
    nsub = 2
    (px, wx), (py, wy), (pz, wz) = pme_bricks.brick_window(grid_shape, bricks)
    g = bricks[0] * bricks[1] * bricks[2]
    W = jnp.asarray(rng.normal(size=(g, nsub, wx, wy, wz)), jnp.float32)

    fold = pallas_pme.make_fold_kernel(grid_shape=grid_shape, bricks=bricks,
                                       nsub=nsub, interpret=True)
    grid_shift = fold(W.reshape(bricks + (nsub, wx, wy, wz)))
    grid_ref = pme_bricks.scatter_windows(
        W.reshape(g, nsub, wx, wy * wz), bricks, grid_shape)
    np.testing.assert_allclose(
        np.asarray(grid_shift),
        np.roll(np.asarray(grid_ref), (1, 1, 1), axis=(1, 2, 3)),
        rtol=1e-6, atol=1e-6)

    extract = pallas_pme.make_extract_kernel(grid_shape=grid_shape,
                                             bricks=bricks, nsub=nsub,
                                             interpret=True)
    Wx = extract(grid_shift)
    W_ref = pme_bricks.gather_windows(grid_ref, bricks)
    np.testing.assert_allclose(
        np.asarray(Wx.reshape(g, nsub, wx, wy, wz)), np.asarray(W_ref),
        rtol=1e-6, atol=1e-6)


def test_windows_fallback_matches_grid_pipeline():
    """Coarse bricks (w > 2p) must route to the window-spectrum fallback and
    agree with the grid pipeline run on finer bricks."""
    import os
    rng = np.random.default_rng(9)
    n, nsub = 200, 2
    box = 3.0
    grid_shape = (8, 8, 8)       # with bricks (2,2,2): p=4 < order+1
    bricks = (2, 2, 2)
    capacity = 64
    box_arr = jnp.asarray(np.diag([box] * 3), jnp.float32)
    positions = jnp.asarray(rng.random((n, 3)) * box, jnp.float32)
    charge = jnp.asarray(rng.normal(size=n), jnp.float32)
    subsets = jnp.asarray(rng.integers(0, nsub, n), dtype=jnp.int32)
    moduli = pme.bspline_moduli(grid_shape)
    spairs = jnp.asarray(slice_subsets(nsub))
    sl_tab = slice_pair_table(nsub).astype(np.int32)
    lam = jnp.asarray(rng.random(3), jnp.float32)

    cell = neighbors.cell_ids(positions, box_arr, bricks)
    table, ov = neighbors.build_occupancy(cell, n, bricks, capacity)
    assert int(ov) == 0
    slots = table.reshape(-1)
    g = bricks[0] * bricks[1] * bricks[2]
    pos_p = jnp.concatenate([positions, jnp.zeros((1, 3), jnp.float32)])
    q_p = jnp.concatenate([charge, jnp.zeros((1,), jnp.float32)])
    sub_p = jnp.concatenate([subsets, jnp.full((1,), nsub, jnp.int32)])
    pos_b = pos_p[slots].reshape(g, capacity, 3).swapaxes(1, 2)
    q_b = q_p[slots].reshape(g, capacity)
    soh_b = (sub_p[slots][:, None] == jnp.arange(nsub, dtype=jnp.int32)
             ).astype(jnp.float32).reshape(g, capacity, nsub).swapaxes(1, 2)

    e_o, f_o = pme_bricks.pme_reciprocal_bricks(
        pos_b, q_b, soh_b, box_arr, lam, alpha=2.2, grid_shape=grid_shape,
        moduli=moduli, counts=bricks, slice_subset_pairs=spairs,
        slice_table=sl_tab)
    e_p, f_p = pallas_pme.pme_reciprocal_pallas(
        pos_b, q_b, soh_b, box_arr, lam, alpha=2.2, grid_shape=grid_shape,
        moduli=moduli, bricks=bricks, slice_subset_pairs=spairs,
        slice_table=sl_tab, interpret=True)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_o), rtol=2e-5)
    scale = float(jnp.max(jnp.abs(f_o))) + 1.0
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_o),
                               atol=2e-5 * scale)


def test_all_spectrum_pipelines_agree(monkeypatch):
    """blocked / grid / windows spectrum pipelines produce identical
    energies and forces (same spread/interp kernels around them)."""
    rng = np.random.default_rng(21)
    n, nsub = 300, 2
    box = 3.6
    bricks = (2, 2, 2)
    grid_shape = (16, 16, 16)     # p=8 >= order+1: grid mode legal
    capacity = 80
    box_arr = jnp.asarray(np.diag([box] * 3), jnp.float32)
    positions = jnp.asarray(rng.random((n, 3)) * box, jnp.float32)
    charge = jnp.asarray(rng.normal(size=n), jnp.float32)
    subsets = jnp.asarray(rng.integers(0, nsub, n), dtype=jnp.int32)
    moduli = pme.bspline_moduli(grid_shape)
    spairs = jnp.asarray(slice_subsets(nsub))
    sl_tab = slice_pair_table(nsub).astype(np.int32)
    lam = jnp.asarray(rng.random(3), jnp.float32)

    cell = neighbors.cell_ids(positions, box_arr, bricks)
    table, ov = neighbors.build_occupancy(cell, n, bricks, capacity)
    assert int(ov) == 0
    slots = table.reshape(-1)
    g = bricks[0] * bricks[1] * bricks[2]
    pos_p = jnp.concatenate([positions, jnp.zeros((1, 3), jnp.float32)])
    q_p = jnp.concatenate([charge, jnp.zeros((1,), jnp.float32)])
    sub_p = jnp.concatenate([subsets, jnp.full((1,), nsub, jnp.int32)])
    pos_b = pos_p[slots].reshape(g, capacity, 3).swapaxes(1, 2)
    q_b = q_p[slots].reshape(g, capacity)
    soh_b = (sub_p[slots][:, None] == jnp.arange(nsub, dtype=jnp.int32)
             ).astype(jnp.float32).reshape(g, capacity, nsub).swapaxes(1, 2)

    out = {}
    for pipe in ("blocked", "grid", "windows"):
        monkeypatch.setenv("NBS_PME_PIPELINE", pipe)
        out[pipe] = pallas_pme.pme_reciprocal_pallas(
            pos_b, q_b, soh_b, box_arr, lam, alpha=2.5,
            grid_shape=grid_shape, moduli=moduli, bricks=bricks,
            slice_subset_pairs=spairs, slice_table=sl_tab, interpret=True)
    e_ref, f_ref = out["blocked"]
    scale = float(jnp.max(jnp.abs(f_ref))) + 1.0
    for pipe in ("grid", "windows"):
        e, f = out[pipe]
        np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                                   atol=1e-5 * scale)


def test_dot_3pass_accuracy_vs_highest(monkeypatch):
    """The default bf16x3 MXU dot (lo*lo term dropped, ~2^-16 relative) must
    track the 6-pass HIGHEST scheme within the documented bound on realistic
    spread/interp data — the accuracy contract behind the NBS_PME_DOT
    escape hatch (ADVICE r3; docs/devnotes.md 'PME dot precision')."""
    rng = np.random.default_rng(21)
    n, nsub = 400, 2
    box = 3.6
    bricks = (2, 2, 2)
    grid_shape = (16, 16, 16)
    capacity = 96
    box_arr = jnp.asarray(np.diag([box] * 3), jnp.float32)
    positions = jnp.asarray(rng.random((n, 3)) * box, jnp.float32)
    charge = jnp.asarray(rng.normal(size=n), jnp.float32)
    subsets = jnp.asarray(rng.integers(0, nsub, n), dtype=jnp.int32)
    alpha = 2.8
    moduli = pme.bspline_moduli(grid_shape)
    spairs = jnp.asarray(slice_subsets(nsub))
    sl_tab = slice_pair_table(nsub).astype(np.int32)
    lam = jnp.asarray(rng.random(nsub * (nsub + 1) // 2), jnp.float32)

    cell = neighbors.cell_ids(positions, box_arr, bricks)
    table, ov = neighbors.build_occupancy(cell, n, bricks, capacity)
    assert int(ov) == 0
    slots = table.reshape(-1)
    g = bricks[0] * bricks[1] * bricks[2]
    pos_p = jnp.concatenate([positions, jnp.zeros((1, 3), jnp.float32)])
    q_p = jnp.concatenate([charge, jnp.zeros((1,), jnp.float32)])
    sub_p = jnp.concatenate([subsets, jnp.full((1,), nsub, jnp.int32)])
    pos_b = pos_p[slots].reshape(g, capacity, 3).swapaxes(1, 2)
    q_b = q_p[slots].reshape(g, capacity)
    soh_b = (sub_p[slots][:, None] == jnp.arange(nsub, dtype=jnp.int32)
             ).astype(jnp.float32).reshape(g, capacity, nsub).swapaxes(1, 2)

    outs = {}
    for scheme in ("3pass", "highest"):
        monkeypatch.setattr(pallas_pme, "_DOT_SCHEME", scheme)
        outs[scheme] = pallas_pme.pme_reciprocal_pallas(
            pos_b, q_b, soh_b, box_arr, lam, alpha=alpha,
            grid_shape=grid_shape, moduli=moduli, bricks=bricks,
            slice_subset_pairs=spairs, slice_table=sl_tab, interpret=True)
    e3, f3 = outs["3pass"]
    eh, fh = outs["highest"]
    # documented bound: dropped lo*lo term is O(2^-16) relative; allow 8x
    # headroom for accumulation across the order-5 window contractions
    bound = 8.0 * 2.0 ** -16
    np.testing.assert_allclose(np.asarray(e3), np.asarray(eh), rtol=bound)
    scale = float(jnp.max(jnp.abs(fh))) + 1.0
    np.testing.assert_allclose(np.asarray(f3), np.asarray(fh),
                               atol=bound * scale)
