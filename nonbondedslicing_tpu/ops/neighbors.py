"""Cell-list direct-space engine: O(N) pair search on TPU.

The reference rebuilds a voxel-hash neighbor list on every evaluation
(computeNeighborListVoxelHash, ReferenceNonbondedSlicingKernels.cpp:197) and
its GPU platforms use OpenMM's tiled neighbor machinery.  The TPU-native
equivalent built here is a fully jittable, static-shape cell list that is
rebuilt *inside* the compiled step (so an MD ``lax.scan`` never leaves the
device):

1. atoms -> fractional coordinates -> cell ids on a static (ncx, ncy, ncz)
   grid whose perpendicular slab widths are >= cutoff
2. ``argsort`` by cell id + ``searchsorted`` ranks -> a dense
   (n_cells, capacity) occupancy table padded with a dummy atom index N
   (deterministic; no atomics, unlike the GPU sort+spread path in
   kernels/pme.cc:19-21)
3. each cell's candidate set is the occupancy of its (host-precomputed,
   deduplicated) <=27 neighbor cells; rows of one cell all share the same
   candidate columns, so the pair space is processed as
   (cell-chunk, capacity) x (27*capacity) tiles — the TPU analog of OpenMM's
   GPU tile decomposition
4. per-slice energies via ``segment_sum`` over the compile-time-small slice
   table; row forces only (each unordered pair is visited from both sides, so
   energies carry a 1/2 weight and no scatter of column forces is needed)

Capacity overflow (a cell holding more atoms than the static capacity) drops
atoms; capacity is chosen with a >=2x margin over the uniform-density mean
and the engine exposes ``cell_overflow`` for validation paths.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from .direct import PLAIN, make_pair_terms, slice_reduce
from .geometry import min_image, recip_box_vectors


def _perpendicular_widths(box):
    """Perpendicular distance between periodic images along each axis."""
    box = np.asarray(box, dtype=np.float64)
    recip = np.linalg.inv(box).T  # rows are reciprocal vectors
    return 1.0 / np.linalg.norm(recip, axis=1)


def choose_cell_grid(box, cutoff, num_particles, max_cells=262144):
    """Static cell-grid configuration (counts, capacity) or None if a cell
    list is not applicable (too few cells per axis)."""
    widths = _perpendicular_widths(box)
    counts = np.maximum(np.floor(widths / cutoff).astype(int), 1)
    if np.any(counts < 3):
        return None
    while int(np.prod(counts)) > max_cells:
        counts = np.maximum(counts // 2, 1)
    n_cells = int(np.prod(counts))
    mean_occ = num_particles / n_cells
    capacity = int(math.ceil(mean_occ * 2.0 + 4))
    capacity = max(8, ((capacity + 3) // 4) * 4)
    return tuple(int(c) for c in counts), capacity


def neighbor_cell_table(counts):
    """(n_cells, 27) neighbor-cell ids, deduplicated per cell and padded with
    the dummy cell id ``n_cells`` (host precomputation; static data)."""
    ncx, ncy, ncz = counts
    n_cells = ncx * ncy * ncz
    cx, cy, cz = np.meshgrid(np.arange(ncx), np.arange(ncy), np.arange(ncz),
                             indexing="ij")
    cells = np.stack([cx.ravel(), cy.ravel(), cz.ravel()], axis=1)  # (n_cells, 3)
    offsets = np.array([(dx, dy, dz) for dx in (-1, 0, 1)
                        for dy in (-1, 0, 1) for dz in (-1, 0, 1)])
    table = np.full((n_cells, 27), n_cells, dtype=np.int32)
    for k, (dx, dy, dz) in enumerate(offsets):
        nb = (cells + (dx, dy, dz)) % (ncx, ncy, ncz)
        table[:, k] = (nb[:, 0] * ncy + nb[:, 1]) * ncz + nb[:, 2]
    # dedup per row (wrapped duplicates only occur when some count == 2,
    # which choose_cell_grid excludes, but keep this robust)
    out = np.full_like(table, n_cells)
    for i in range(n_cells):
        uniq = np.unique(table[i])
        out[i, :len(uniq)] = uniq
    return out


def cell_ids(positions, box, counts):
    """Runtime cell id per atom from fractional coordinates."""
    recip = recip_box_vectors(box)
    frac = positions @ recip
    frac = frac - jnp.floor(frac)
    nc = jnp.asarray(counts, dtype=jnp.int32)
    ci = jnp.clip((frac * jnp.asarray(counts, positions.dtype)).astype(jnp.int32),
                  0, nc - 1)
    return (ci[:, 0] * counts[1] + ci[:, 1]) * counts[2] + ci[:, 2]


def build_occupancy(cell, n, counts, capacity):
    """Dense (n_cells, capacity) occupancy table of atom indices, padded with
    the dummy index ``n``.  Also returns the number of dropped atoms."""
    n_cells = counts[0] * counts[1] * counts[2]
    order = jnp.argsort(cell)
    sorted_cell = cell[order]
    starts = jnp.searchsorted(sorted_cell, jnp.arange(n_cells, dtype=cell.dtype))
    rank = jnp.arange(n) - starts[sorted_cell]
    dest = jnp.where(rank < capacity, sorted_cell * capacity + rank,
                     n_cells * capacity)
    table = jnp.full((n_cells * capacity + 1,), n, dtype=jnp.int32)
    table = table.at[dest].set(order.astype(jnp.int32))
    overflow = jnp.sum(rank >= capacity)
    return table[:-1].reshape(n_cells, capacity), overflow


def cell_overflow(positions, box, counts, capacity):
    """Number of atoms dropped by the static capacity (validation helper)."""
    cell = cell_ids(positions, box, counts)
    _, overflow = build_occupancy(cell, positions.shape[0], counts, capacity)
    return overflow


def make_cell_direct_space(*, mode, cutoff, counts, capacity, krf=0.0, crf=0.0,
                           use_switch=False, switch_distance=0.0,
                           ewald_alpha=0.0, ljpme=False, dispersion_alpha=0.0,
                           num_slices=1, cells_per_chunk=None):
    """Cell-list variant of ``make_direct_space`` (periodic methods only).

    Same signature as the all-pairs engine:
    f(positions, box, charge, sig_half, eps2, subsets, exclusion_list,
      slice_table, lam_coul, lam_vdw) -> (slice_energies (S, 2), forces (N, 3))
    """
    assert mode != PLAIN
    pair_terms = make_pair_terms(
        mode=mode, cutoff=cutoff, krf=krf, crf=crf, use_switch=use_switch,
        switch_distance=switch_distance, ewald_alpha=ewald_alpha, ljpme=ljpme,
        dispersion_alpha=dispersion_alpha)
    n_cells = counts[0] * counts[1] * counts[2]
    nbr_cells = jnp.asarray(neighbor_cell_table(counts))  # (n_cells, 27)
    ncand = 27 * capacity
    if cells_per_chunk is None:
        cells_per_chunk = max(1, 256 // capacity)
    # pad cell count to a chunk multiple
    n_chunks = (n_cells + cells_per_chunk - 1) // cells_per_chunk
    n_cells_pad = n_chunks * cells_per_chunk

    def direct_space(positions, box, charge, sig_half, eps2, subsets,
                     exclusion_list, slice_table, lam_coul, lam_vdw):
        n = positions.shape[0]
        dtype = positions.dtype
        cell = cell_ids(positions, box, counts)
        table, _ = build_occupancy(cell, n, counts, capacity)

        # dummy atom at index n: far away, zero parameters, no interactions
        pos_p = jnp.concatenate([positions, jnp.zeros((1, 3), dtype)], axis=0)
        q_p = jnp.concatenate([charge, jnp.zeros((1,), dtype)])
        sh_p = jnp.concatenate([sig_half, jnp.zeros((1,), dtype)])
        e2_p = jnp.concatenate([eps2, jnp.zeros((1,), dtype)])
        sub_p = jnp.concatenate([subsets, jnp.zeros((1,), subsets.dtype)])
        excl_p = jnp.concatenate(
            [exclusion_list,
             jnp.full((1, exclusion_list.shape[1]), -1, exclusion_list.dtype)],
            axis=0)

        # candidate columns per cell: occupancy of the <=27 neighbor cells
        table_pad = jnp.concatenate(
            [table, jnp.full((1, capacity), n, jnp.int32)], axis=0)
        cand = table_pad[nbr_cells].reshape(n_cells, ncand)  # (n_cells, 27C)
        rows_pad = jnp.concatenate(
            [table, jnp.full((n_cells_pad - n_cells, capacity), n, jnp.int32)],
            axis=0)
        cand_pad = jnp.concatenate(
            [cand, jnp.full((n_cells_pad - n_cells, ncand), n, jnp.int32)],
            axis=0)

        lam_c_nn = lam_coul[jnp.asarray(slice_table)]
        lam_v_nn = lam_vdw[jnp.asarray(slice_table)]
        sl_tab = jnp.asarray(slice_table)
        cutoff2 = jnp.asarray(cutoff * cutoff, dtype)

        def chunk_fn(c0):
            rows = jax.lax.dynamic_slice(rows_pad, (c0, 0),
                                         (cells_per_chunk, capacity))
            cols = jax.lax.dynamic_slice(cand_pad, (c0, 0),
                                         (cells_per_chunk, ncand))
            pos_i = pos_p[rows]               # (G, C, 3)
            pos_j = pos_p[cols]               # (G, 27C, 3)
            dr = pos_i[:, :, None, :] - pos_j[:, None, :, :]
            dr = min_image(dr, box)
            r2 = jnp.sum(dr * dr, axis=-1)    # (G, C, 27C)

            mask = rows[:, :, None] != cols[:, None, :]
            mask &= (rows[:, :, None] < n) & (cols[:, None, :] < n)
            mask &= r2 < cutoff2
            excl_i = excl_p[rows]             # (G, C, Emax)
            excluded = jnp.any(cols[:, None, :, None] == excl_i[:, :, None, :],
                               axis=-1)
            mask &= ~excluded

            r2s = jnp.where(mask, r2, jnp.ones((), dtype))
            rinv = jax.lax.rsqrt(r2s)
            qq = q_p[rows][:, :, None] * q_p[cols][:, None, :]
            e_coul, e_vdw, dedr_c, dedr_v = pair_terms(
                r2s, rinv, sh_p[rows][:, :, None], sh_p[cols][:, None, :],
                e2_p[rows][:, :, None], e2_p[cols][:, None, :], qq)

            sub_i = sub_p[rows]
            sub_j = sub_p[cols]
            lam_cp = lam_c_nn[sub_i[:, :, None], sub_j[:, None, :]]
            lam_vp = lam_v_nn[sub_i[:, :, None], sub_j[:, None, :]]
            factor = jnp.where(mask, lam_vp * dedr_v + lam_cp * dedr_c, 0.0)
            f_rows = jnp.einsum("gcj,gcjk->gck", factor, dr)

            sl = sl_tab[sub_i[:, :, None], sub_j[:, None, :]]
            e_coul = jnp.where(mask, e_coul, 0.0)
            e_vdw = jnp.where(mask, e_vdw, 0.0)
            ec = slice_reduce(0.5 * e_coul, sl, num_slices)
            ev = slice_reduce(0.5 * e_vdw, sl, num_slices)
            return jnp.stack([ec, ev], axis=-1), f_rows.reshape(-1, 3), \
                rows.reshape(-1)

        starts = jnp.arange(0, n_cells_pad, cells_per_chunk)
        slice_parts, f_parts, row_parts = jax.lax.map(chunk_fn, starts)
        slice_energies = jnp.sum(slice_parts, axis=0)
        forces = jnp.zeros((n + 1, 3), dtype).at[row_parts.reshape(-1)].add(
            f_parts.reshape(-1, 3))
        return slice_energies, forces[:n]

    return direct_space
