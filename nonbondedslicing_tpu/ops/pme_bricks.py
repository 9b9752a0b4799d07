"""Brick-decomposed PME charge spreading / force interpolation.

The dense spread/interp path (ops/pme.py) contracts per-atom B-spline
stencils against FULL-axis matrices — ``(B, nx)`` rows with 5 non-zeros —
burning ~5000x the minimal interpolation FLOPs (the reference touches
order^3 = 125 grid points per atom, ReferencePME.cpp:320-396,598-702).

This module keeps the MXU-matmul formulation but makes the support LOCAL:
the charge grid is partitioned into *bricks* aligned with the neighbor-list
cell grid (one brick per cell, ``p = n_grid / n_cells`` points per axis), and
atoms — already slot-sorted by cell for the direct-space kernel — spread into
a per-brick window of ``w = p + order + 1`` points per axis (order-5 stencil
plus a +-1-point drift margin so the slot assignment can be reused across
skin-sharing MD steps).  Per-cell contractions are small batched matmuls;
window<->grid conversion is 8 dense roll-adds (no scatter anywhere).

Cost per atom: 2*(nsub*wx)*(wy*wz) FLOPs — for a typical (9,9,9)-cell,
81^3-grid water box that is ~20k FLOPs/atom vs ~1M for the dense path.

Atoms that drift more than one grid point past their window (impossible while
the skin guard holds) drop out of the one-hot projection; callers must check
the max-displacement flag from the slot-table rebuild machinery.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import recip_box_vectors
from . import pme


def brick_window(grid_shape, counts, order=5):
    """Per-axis (points-per-cell, window) sizes; grid must align with cells."""
    out = []
    for n, c in zip(grid_shape, counts):
        if n % c != 0:
            raise ValueError(f"grid axis {n} not divisible by cell count {c}")
        p = n // c
        out.append((p, p + order + 1))
    return tuple(out)


def aligned_grid(raw_grid, counts):
    """Smallest per-axis grid >= raw that is a multiple of the cell count.

    The matmul-DFT FFT path works for any size, so no prime-factor
    legality constraint is needed (the reference GPU platforms round up to
    factors <= 13 for cuFFT/VkFFT, FFT3DFactory.h:31-47; we round up to
    cell-aligned sizes instead for the brick decomposition).
    """
    return tuple(int(-(-n // c) * c) for n, c in zip(raw_grid, counts))


def local_splines(pos_fm, recip, counts, grid_shape, order=5):
    """B-splines + window-relative base columns for slot-ordered atoms.

    pos_fm: (g, 3, C) feature-major slot positions (g = ncx*ncy*ncz cells in
    x-major linear order).  Returns (theta, dtheta) each (g, 3, C, order) and
    rel (g, 3, C) int32: the window-relative base column, in [0, w-order] for
    atoms within their cell's window and out-of-range otherwise (their
    contribution drops out of the one-hot projection).
    """
    ncx, ncy, ncz = counts
    g = ncx * ncy * ncz
    ng = jnp.asarray(grid_shape, pos_fm.dtype)
    # fractional coordinates: frac[a] = sum_d pos[d] * recip[d, a]
    f = jnp.einsum("gdc,da->gac", pos_fm, recip.astype(pos_fm.dtype))
    t = (f - jnp.floor(f)) * ng[None, :, None]
    ti = jnp.floor(t).astype(jnp.int32)          # (g, 3, C) in [0, n)
    frac = t - ti
    theta, dtheta = pme.bsplines(frac, order)    # (g, 3, C, order)
    # cell index per axis from the x-major linear layout
    lin = np.arange(g, dtype=np.int32)
    cx = lin // (ncy * ncz)
    cy = (lin // ncz) % ncy
    cz = lin % ncz
    cell_ax = jnp.asarray(np.stack([cx, cy, cz], axis=1))   # (g, 3)
    ngi = jnp.asarray(grid_shape, jnp.int32)
    p = ngi // jnp.asarray(counts, jnp.int32)
    # window of cell c starts at grid point p*c - 1 (margin 1); wrap-safe
    rel = jnp.mod(ti - (p[None, :] * cell_ax)[:, :, None] + 1, ngi[None, :, None])
    return theta, dtheta, rel


def _axis_T(rel_a, theta_a, w, order):
    """Dense local spline matrix (g, C, w) from base columns and weights."""
    cols = rel_a[..., None] + jnp.arange(order, dtype=jnp.int32)  # (g, C, K)
    onehot = (cols[..., None]
              == jnp.arange(w, dtype=jnp.int32)).astype(theta_a.dtype)
    return jnp.einsum("gck,gckw->gcw", theta_a, onehot)


def scatter_windows(W, counts, grid_shape):
    """Accumulate per-cell windows into the global grid.

    W: (g, nsub, wx, wy, wz) with window point u covering grid point
    p*c - 1 + u (periodic).  Returns (nsub, nx, ny, nz).

    Layout strategy: the overlap-add runs entirely in the chunk-friendly
    (nsub, bx, by, bz, px, py, pz) layout — each of the 8 chunks is a
    slice + brick-axis roll + add, no axis interleaving — and ONE final
    transpose interleaves (b, p) pairs into grid order (the reshape to
    (nsub, nx, ny, nz) is then free because (b, p) pairs are adjacent).
    The previous formulation paid that 7-D interleave transpose per chunk
    (8 of them), measured ~5x the cost of the whole overlap-add at the
    23k bench config.
    """
    ncx, ncy, ncz = counts
    (px, wx), (py, wy), (pz, wz) = brick_window(grid_shape, counts)
    nsub = W.shape[1]
    Wg = W.reshape(ncx, ncy, ncz, nsub, wx, wy, wz).transpose(
        3, 0, 1, 2, 4, 5, 6)                     # (nsub, bx, by, bz, w...)
    qx = -(-wx // px)
    qy = -(-wy // py)
    qz = -(-wz // pz)
    acc = jnp.zeros((nsub, ncx, ncy, ncz, px, py, pz), W.dtype)
    for ox in range(qx):
        sx = min(px, wx - ox * px)
        for oy in range(qy):
            sy = min(py, wy - oy * py)
            for oz in range(qz):
                sz = min(pz, wz - oz * pz)
                chunk = Wg[:, :, :, :, ox * px:ox * px + sx,
                           oy * py:oy * py + sy, oz * pz:oz * pz + sz]
                chunk = jnp.pad(chunk, ((0, 0), (0, 0), (0, 0), (0, 0),
                                        (0, px - sx), (0, py - sy),
                                        (0, pz - sz)))
                acc = acc + jnp.roll(chunk, (ox, oy, oz), axis=(1, 2, 3))
    grid = acc.transpose(0, 1, 4, 2, 5, 3, 6).reshape(
        nsub, grid_shape[0], grid_shape[1], grid_shape[2])
    # window origin is p*c - 1: shift the assembled p*c + u frame down by one
    return jnp.roll(grid, (-1, -1, -1), axis=(1, 2, 3))


def fold_windows_blocked(W, counts, grid_shape):
    """Overlap-add windows into the BLOCKED grid layout — no interleave
    transpose, no Pallas.

    W: (bx, by, bz, nsub, wx, wy, wz) with window point u of brick b
    covering true grid line (b*p - 1 + u) mod n.  Returns
    (nsub, bx, by, bz, px, py, pz) where entry (s, B, u) holds true grid
    line (B*p - 1 + u) mod n — the (brick, point) blocked view of the
    charge grid, consumed by pme.rfft3_matmul_blocked whose DFT matrices
    absorb the line permutation.  The 8 chunk roll-adds run on leading
    brick axes with large contiguous trailing blocks (the grid-major
    assembly's 7-D interleave transpose is what made scatter_windows
    expensive; this keeps the layout blocked end-to-end)."""
    ncx, ncy, ncz = counts
    (px, wx), (py, wy), (pz, wz) = brick_window(grid_shape, counts)
    nsub = W.shape[3]
    Wg = W.transpose(3, 0, 1, 2, 4, 5, 6)        # (nsub, bx, by, bz, w...)
    qx, qy, qz = -(-wx // px), -(-wy // py), -(-wz // pz)
    acc = jnp.zeros((nsub, ncx, ncy, ncz, px, py, pz), W.dtype)
    for ox in range(qx):
        sx = min(px, wx - ox * px)
        for oy in range(qy):
            sy = min(py, wy - oy * py)
            for oz in range(qz):
                sz = min(pz, wz - oz * pz)
                chunk = Wg[:, :, :, :, ox * px:ox * px + sx,
                           oy * py:oy * py + sy, oz * pz:oz * pz + sz]
                chunk = jnp.pad(chunk, ((0, 0), (0, 0), (0, 0), (0, 0),
                                        (0, px - sx), (0, py - sy),
                                        (0, pz - sz)))
                acc = acc + jnp.roll(chunk, (ox, oy, oz), axis=(1, 2, 3))
    return acc


def gather_windows(grid, counts):
    """Extract per-cell windows from the global grid (inverse layout of
    scatter_windows).  grid: (nsub, nx, ny, nz) -> (g, nsub, wx, wy, wz)."""
    nsub = grid.shape[0]
    grid_shape = grid.shape[1:]
    ncx, ncy, ncz = counts
    (px, wx), (py, wy), (pz, wz) = brick_window(grid_shape, counts)
    g1 = jnp.roll(grid, (1, 1, 1), axis=(1, 2, 3))
    t = g1.reshape(nsub, ncx, px, ncy, py, ncz, pz)

    def expand(t, cell_axis, point_axis, nc, p, w):
        q = -(-w // p)
        pieces = []
        for o in range(q):
            s = min(p, w - o * p)
            piece = jnp.roll(t, -o, axis=cell_axis)
            piece = jax.lax.slice_in_dim(piece, 0, s, axis=point_axis)
            pieces.append(piece)
        return jnp.concatenate(pieces, axis=point_axis)

    t = expand(t, 1, 2, ncx, px, wx)
    t = expand(t, 3, 4, ncy, py, wy)
    t = expand(t, 5, 6, ncz, pz, wz)
    # (nsub, ncx, wx, ncy, wy, ncz, wz) -> (g, nsub, wx, wy, wz)
    t = t.transpose(1, 3, 5, 0, 2, 4, 6)
    return t.reshape(ncx * ncy * ncz, nsub, wx, wy, wz)


def spread_bricks(pos_fm, qoh_fm, box, counts, grid_shape, order=5,
                  theta_rel=None):
    """Per-subset charge grids from slot-ordered atoms.

    pos_fm: (g, 3, C); qoh_fm: (g, nsub, C) charge * subset-onehot (dummy
    slots carry zero charge).  Returns (nsub, nx, ny, nz).
    """
    (px, wx), (py, wy), (pz, wz) = brick_window(grid_shape, counts, order)
    nsub = qoh_fm.shape[1]
    if theta_rel is None:
        recip = recip_box_vectors(box)
        theta, _, rel = local_splines(pos_fm, recip, counts, grid_shape, order)
    else:
        theta, _, rel = theta_rel
    tx = _axis_T(rel[:, 0], theta[:, 0], wx, order)   # (g, C, wx)
    ty = _axis_T(rel[:, 1], theta[:, 1], wy, order)
    tz = _axis_T(rel[:, 2], theta[:, 2], wz, order)
    g, _, cap = pos_fm.shape
    prec = jax.lax.Precision.HIGH
    a = jnp.einsum("gsc,gcx->gcsx", qoh_fm, tx,
                   precision=prec).reshape(g, cap, nsub * wx)
    b = jnp.einsum("gcy,gcz->gcyz", ty, tz,
                   precision=prec).reshape(g, cap, wy * wz)
    W = jnp.einsum("gca,gcb->gab", a, b, precision=prec)
    return scatter_windows(W.reshape(g, nsub, wx, wy * wz), counts, grid_shape)


def interp_bricks(combined, pos_fm, soh_fm, q_slot, box, counts, grid_shape,
                  order=5, theta_rel=None):
    """Forces (slot order, (g, C, 3)) from lambda-combined potential grids.

    combined: (nsub, nx, ny, nz) where grid s is the lambda-weighted sum of
    subset potentials for atoms of subset s (pme.interpolate_forces
    convention); soh_fm: (g, nsub, C) subset one-hots; q_slot: (g, C).
    """
    nx, ny, nz = grid_shape
    (px, wx), (py, wy), (pz, wz) = brick_window(grid_shape, counts, order)
    nsub = combined.shape[0]
    recip = recip_box_vectors(box)
    if theta_rel is None:
        theta, dtheta, rel = local_splines(pos_fm, recip, counts, grid_shape,
                                           order)
    else:
        theta, dtheta, rel = theta_rel
    tx = _axis_T(rel[:, 0], theta[:, 0], wx, order)
    ty = _axis_T(rel[:, 1], theta[:, 1], wy, order)
    tz = _axis_T(rel[:, 2], theta[:, 2], wz, order)
    dtx = _axis_T(rel[:, 0], dtheta[:, 0], wx, order)
    dty = _axis_T(rel[:, 1], dtheta[:, 1], wy, order)
    dtz = _axis_T(rel[:, 2], dtheta[:, 2], wz, order)

    g, _, cap = pos_fm.shape
    prec = jax.lax.Precision.HIGH
    Wm = gather_windows(combined, counts).reshape(g, nsub * wx, wy * wz)
    planes = jnp.concatenate([
        jnp.einsum("gcy,gcz->gcyz", ty, tz, precision=prec).reshape(
            g, cap, wy * wz),
        jnp.einsum("gcy,gcz->gcyz", dty, tz, precision=prec).reshape(
            g, cap, wy * wz),
        jnp.einsum("gcy,gcz->gcyz", ty, dtz, precision=prec).reshape(
            g, cap, wy * wz),
    ], axis=1)                                        # (g, 3C, wy*wz)
    P = jnp.einsum("gap,gcp->gac", Wm, planes, precision=prec)  # (g, a, 3C)
    sx = jnp.einsum("gsc,gcx->gcsx", soh_fm, tx,
                    precision=prec).reshape(g, cap, nsub * wx)
    sdx = jnp.einsum("gsc,gcx->gcsx", soh_fm, dtx,
                     precision=prec).reshape(g, cap, nsub * wx)
    fx = jnp.einsum("gca,gac->gc", sdx, P[:, :, :cap], precision=prec)
    fy = jnp.einsum("gca,gac->gc", sx, P[:, :, cap:2 * cap], precision=prec)
    fz = jnp.einsum("gca,gac->gc", sx, P[:, :, 2 * cap:], precision=prec)
    r = recip.astype(pos_fm.dtype)
    f0 = -q_slot * (fx * nx * r[0, 0])
    f1 = -q_slot * (fx * nx * r[1, 0] + fy * ny * r[1, 1])
    f2 = -q_slot * (fx * nx * r[2, 0] + fy * ny * r[2, 1] + fz * nz * r[2, 2])
    return jnp.stack([f0, f1, f2], axis=-1)


def pme_reciprocal_bricks(pos_fm, q_slot, soh_fm, box, lam_s, *, alpha,
                          grid_shape, moduli, counts, slice_subset_pairs,
                          slice_table, dispersion=False, order=5, eterm=None):
    """Sliced-PME reciprocal term on slot-ordered atoms.

    Same physics as pme.pme_reciprocal (spread -> batched FFT -> convolution
    + per-slice spectral energies -> inverse FFT -> interpolation) with the
    spread/interp stages brick-decomposed.  Returns (slice_energies (S,),
    forces in slot order (g, C, 3)).
    """
    dtype = pos_fm.dtype
    nx, ny, nz = grid_shape
    recip = recip_box_vectors(box)
    theta_rel = local_splines(pos_fm, recip, counts, grid_shape, order)
    qoh = soh_fm * q_slot[:, None, :]
    grid = spread_bricks(pos_fm, qoh, box, counts, grid_shape, order,
                         theta_rel=theta_rel)
    if eterm is None:
        if dispersion:
            eterm = pme.dispersion_eterm(grid_shape, moduli, box, recip,
                                         alpha, dtype, half=True)
        else:
            eterm = pme.coulomb_eterm(grid_shape, moduli, box, recip, alpha,
                                      dtype, half=True)
    w = pme.rfft_energy_weights(nz, dtype)
    s_re, s_im = pme.rfft3_matmul(grid)
    slice_energies = pme.pme_slice_energies_ri(
        s_re, s_im, eterm * w[None, None, :], slice_subset_pairs)
    phi = pme.irfft3_matmul(s_re * eterm[None], s_im * eterm[None], grid_shape)
    lam_nn = lam_s[jnp.asarray(slice_table)]
    combined = jnp.einsum("st,txyz->sxyz", lam_nn, phi)
    forces = interp_bricks(combined, pos_fm, soh_fm, q_slot, box, counts,
                           grid_shape, order, theta_rel=theta_rel)
    return slice_energies, forces
