"""Brick-decomposed PME spread/interp vs the dense/scatter oracle paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonbondedslicing_tpu.ops import neighbors, pme, pme_bricks
from nonbondedslicing_tpu.utils.indexing import slice_pair_table, slice_subsets


def _slotted(positions, box_arr, counts, capacity, charge, subsets, nsub):
    n = positions.shape[0]
    cell = neighbors.cell_ids(positions, box_arr, counts)
    table, overflow = neighbors.build_occupancy(cell, n, counts, capacity)
    assert int(overflow) == 0
    slots = table.reshape(-1)
    pos_p = jnp.concatenate([positions, jnp.zeros((1, 3), positions.dtype)])
    q_p = jnp.concatenate([charge, jnp.zeros((1,), charge.dtype)])
    sub_p = jnp.concatenate([subsets, jnp.full((1,), nsub, subsets.dtype)])
    g = counts[0] * counts[1] * counts[2]
    pos_fm = pos_p[slots].reshape(g, capacity, 3).swapaxes(1, 2)
    q_slot = q_p[slots].reshape(g, capacity)
    soh = (sub_p[slots][:, None] == jnp.arange(nsub, dtype=subsets.dtype)
           ).astype(positions.dtype)
    soh_fm = soh.reshape(g, capacity, nsub).swapaxes(1, 2)
    return pos_fm, q_slot, soh_fm, slots


@pytest.mark.parametrize("grid_shape,counts", [
    ((16, 16, 16), (4, 4, 4)),     # p=4 < w=10: three roll chunks per axis
    ((18, 24, 12), (3, 4, 3)),     # anisotropic, p in {6, 6, 4}
])
def test_spread_matches_scatter_oracle(grid_shape, counts):
    rng = np.random.default_rng(7)
    n, nsub = 400, 3
    box = 4.0
    box_arr = jnp.asarray(np.diag([box, box, box]))
    positions = jnp.asarray(rng.random((n, 3)) * box)
    charge = jnp.asarray(rng.normal(size=n))
    subsets = jnp.asarray(rng.integers(0, nsub, n), dtype=jnp.int32)
    capacity = 24
    pos_fm, q_slot, soh_fm, _ = _slotted(positions, box_arr, counts, capacity,
                                         charge, subsets, nsub)
    qoh = soh_fm * q_slot[:, None, :]
    grid_b = pme_bricks.spread_bricks(pos_fm, qoh, box_arr, counts, grid_shape)

    recip = pme.recip_box_vectors(box_arr)
    index, frac = pme.grid_index_and_fraction(positions, recip, grid_shape)
    theta, _ = pme.bsplines(frac, 5)
    grid_o = pme.spread_charges(charge, subsets, index, theta, grid_shape, nsub)
    np.testing.assert_allclose(np.asarray(grid_b), np.asarray(grid_o),
                               rtol=0, atol=1e-12)


def test_reciprocal_bricks_matches_reference_pipeline():
    rng = np.random.default_rng(3)
    n, nsub = 600, 3
    box = 4.5
    counts = (4, 4, 4)
    grid_shape = (20, 20, 20)
    box_arr = jnp.asarray(np.diag([box, box, box]))
    positions = jnp.asarray(rng.random((n, 3)) * box)
    charge = jnp.asarray(rng.normal(size=n))
    subsets = jnp.asarray(rng.integers(0, nsub, n), dtype=jnp.int32)
    alpha = 3.0
    moduli = pme.bspline_moduli(grid_shape)
    spairs = jnp.asarray(slice_subsets(nsub))
    sl_tab = slice_pair_table(nsub).astype(np.int32)
    lam = jnp.asarray(rng.random(spairs.shape[0]))

    e_o, f_o = pme.pme_reciprocal(
        positions, box_arr, charge, subsets, lam, alpha=alpha,
        grid_shape=grid_shape, moduli=moduli, num_subsets=nsub,
        slice_subset_pairs=spairs, slice_table=sl_tab)

    capacity = 28
    pos_fm, q_slot, soh_fm, slots = _slotted(
        positions, box_arr, counts, capacity, charge, subsets, nsub)
    e_b, f_slot = pme_bricks.pme_reciprocal_bricks(
        pos_fm, q_slot, soh_fm, box_arr, lam, alpha=alpha,
        grid_shape=grid_shape, moduli=moduli, counts=counts,
        slice_subset_pairs=spairs, slice_table=sl_tab)
    forces = jnp.zeros((n + 1, 3)).at[slots].add(f_slot.reshape(-1, 3))[:n]

    np.testing.assert_allclose(np.asarray(e_b), np.asarray(e_o), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(forces), np.asarray(f_o),
                               rtol=1e-9, atol=1e-11)


def test_drifted_atoms_stay_in_window():
    """Slot assignment from rebuild positions + current positions drifted by
    less than one grid point must still spread exactly."""
    rng = np.random.default_rng(11)
    n, nsub = 300, 2
    box = 4.0
    counts = (4, 4, 4)
    grid_shape = (16, 16, 16)
    box_arr = jnp.asarray(np.diag([box, box, box]))
    pos0 = rng.random((n, 3)) * box
    drift = rng.uniform(-1, 1, (n, 3)) * (0.9 * box / grid_shape[0])
    pos1 = jnp.asarray(pos0 + drift)  # may cross cell borders
    charge = jnp.asarray(rng.normal(size=n))
    subsets = jnp.asarray(rng.integers(0, nsub, n), dtype=jnp.int32)

    capacity = 24
    # slot table from OLD positions, spread with NEW positions
    cell = neighbors.cell_ids(jnp.asarray(pos0), box_arr, counts)
    table, _ = neighbors.build_occupancy(cell, n, counts, capacity)
    slots = table.reshape(-1)
    g = counts[0] * counts[1] * counts[2]
    pos_p = jnp.concatenate([pos1, jnp.zeros((1, 3))])
    q_p = jnp.concatenate([charge, jnp.zeros((1,))])
    sub_p = jnp.concatenate([subsets, jnp.full((1,), nsub, jnp.int32)])
    pos_fm = pos_p[slots].reshape(g, capacity, 3).swapaxes(1, 2)
    q_slot = q_p[slots].reshape(g, capacity)
    soh_fm = (sub_p[slots][:, None] == jnp.arange(nsub, dtype=jnp.int32)
              ).astype(jnp.float64).reshape(g, capacity, nsub).swapaxes(1, 2)
    qoh = soh_fm * q_slot[:, None, :]
    grid_b = pme_bricks.spread_bricks(pos_fm, qoh, box_arr, counts, grid_shape)

    recip = pme.recip_box_vectors(box_arr)
    index, frac = pme.grid_index_and_fraction(pos1, recip, grid_shape)
    theta, _ = pme.bsplines(frac, 5)
    grid_o = pme.spread_charges(charge, subsets, index, theta, grid_shape, nsub)
    np.testing.assert_allclose(np.asarray(grid_b), np.asarray(grid_o),
                               rtol=0, atol=1e-12)


def test_window_dft_matches_scatter_then_fft():
    """rfft3_matmul_windows (overlap-add folded into the DFT matrices) must
    equal scatter_windows followed by rfft3_matmul."""
    import jax.numpy as jnp
    from nonbondedslicing_tpu.ops import pme, pme_bricks

    rng = np.random.default_rng(12)
    bricks = (3, 3, 3)
    grid_shape = (12, 9, 15)
    order = 5
    (px, wx), (py, wy), (pz, wz) = pme_bricks.brick_window(grid_shape,
                                                           bricks, order)
    g = bricks[0] * bricks[1] * bricks[2]
    nsub = 2
    W = jnp.asarray(rng.normal(size=(g, nsub, wx, wy, wz)), jnp.float64)
    grid = pme_bricks.scatter_windows(W.reshape(g, nsub, wx, wy * wz),
                                      bricks, grid_shape)
    re_ref, im_ref = pme.rfft3_matmul(grid)
    re, im = pme.rfft3_matmul_windows(
        W.reshape(bricks + (nsub, wx, wy, wz)), bricks, grid_shape)
    np.testing.assert_allclose(np.asarray(re), np.asarray(re_ref),
                               atol=1e-9 * float(jnp.max(jnp.abs(re_ref))))
    np.testing.assert_allclose(np.asarray(im), np.asarray(im_ref),
                               atol=1e-9 * float(jnp.max(jnp.abs(re_ref))))


def test_inverse_window_dft_matches_ifft_then_gather():
    """irfft3_matmul_windows (window gather folded into the synthesis
    matrices) must equal irfft3_matmul followed by gather_windows."""
    import jax.numpy as jnp
    from nonbondedslicing_tpu.ops import pme, pme_bricks

    rng = np.random.default_rng(13)
    bricks = (3, 3, 3)
    grid_shape = (12, 9, 15)
    order = 5
    (px, wx), (py, wy), (pz, wz) = pme_bricks.brick_window(grid_shape,
                                                           bricks, order)
    nsub = 2
    nzr = grid_shape[2] // 2 + 1
    # a spectrum that came from a real grid (so the half-spectrum synthesis
    # convention holds exactly)
    grid_in = jnp.asarray(rng.normal(size=(nsub,) + grid_shape), jnp.float64)
    re, im = pme.rfft3_matmul(grid_in)
    assert re.shape == (nsub,) + grid_shape[:2] + (nzr,)
    phi = pme.irfft3_matmul(re, im, grid_shape)
    win_ref = pme_bricks.gather_windows(phi, bricks)
    win = pme.irfft3_matmul_windows(re, im, bricks, grid_shape, (wx, wy, wz))
    np.testing.assert_allclose(np.asarray(win), np.asarray(win_ref),
                               atol=1e-9 * float(jnp.max(jnp.abs(win_ref))))


def test_brick_count_heuristic():
    """Round-5 _brick_counts rules: <= ~6 bricks/axis (per-brick Pallas
    grid-step overhead dominates at ~1000 bricks), 4 MB VMEM bound on the
    interp B-plane with fallback to one-brick-per-cell, NBS_BRICK_TARGET
    override."""
    import os

    from nonbondedslicing_tpu.ops.fused import _brick_counts

    # one brick per cell up to 6 cells/axis (the 23k bench shape)
    assert _brick_counts((6, 6, 6), capacity=136,
                         raw_grid=(60, 60, 60)) == (6, 6, 6)
    assert _brick_counts((3, 3, 3), capacity=64,
                         raw_grid=(16, 16, 16)) == (3, 3, 3)
    # the 100k shape: largest divisor <= 6 of 10 is 5, VMEM estimate passes
    assert _brick_counts((10, 10, 10), capacity=128,
                         raw_grid=(90, 90, 90)) == (5, 5, 5)
    assert _brick_counts((8, 8, 8), capacity=24,
                         raw_grid=(64, 64, 64)) == (4, 4, 4)
    # (9,9,9): divisor 3 would need a (36*36) x (27*164) B-plane ~ 23 MB
    # -> falls back to one brick per cell
    assert _brick_counts((9, 9, 9), capacity=164,
                         raw_grid=(90, 90, 90)) == (9, 9, 9)
    # no grid info (non-PME methods): the <=6 rule alone applies
    assert _brick_counts((10, 10, 10)) == (5, 5, 5)
    # explicit override wins
    os.environ["NBS_BRICK_TARGET"] = "2"
    try:
        assert _brick_counts((10, 10, 10), capacity=128,
                             raw_grid=(90, 90, 90)) == (2, 2, 2)
    finally:
        del os.environ["NBS_BRICK_TARGET"]
