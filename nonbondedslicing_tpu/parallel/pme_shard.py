"""Atom-sharded sliced PME over a jax.sharding.Mesh.

The reference's multi-GPU scheme computes the whole reciprocal space on one
device (CommonNonbondedSlicingKernels.cpp:388,416,465: reciprocal work is
gated on ``contextIndex == 0``).  On TPU we can do better with the standard
within-pod PME decomposition:

* **spread**: each device spreads its shard of atoms into a full-size local
  charge grid (one grid per subset), then the grids are ``psum``-reduced
  over ICI — an all-reduce of (n_subsets, nx, ny, nz) reals.
* **convolution + slice energies**: after the psum every device holds the
  complete grid; the batched FFT, sliced convolution and per-slice energy
  reduction are computed replicated (they are identical on all devices and
  small next to spread/interp at scale).
* **interpolate**: each device evaluates forces only for its own atom
  shard from the lambda-combined potential grid.

Spread and interpolation — the O(N·order³) parts that dominate reciprocal
cost at MD sizes — scale 1/D; only one grid all-reduce rides ICI per term.

Padding atoms to a multiple of the device count uses zero charges, which
contribute nothing to the grid and receive zero force.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..ops import ewald, pme
from ..ops.geometry import recip_box_vectors


def make_pme_device_term(axis: str, n_devices: int, num_particles: int, *,
                         alpha, grid_shape, moduli, num_subsets,
                         slice_subset_pairs, slice_table, dispersion=False,
                         order=5):
    """Device-side sliced-PME term for use INSIDE an existing ``shard_map``
    body over ``axis``: spread the local atom-range shard, psum the charge
    grids over ICI, replicated FFT + convolution (+ optional per-slice
    energies), interpolate forces for the local shard only.

    Returns (rows, n_pad, f) where
    f(pos_p (n_pad, 3), box, q_p, sub_p, lam_s, dev, energies=True)
      -> (slice_energies (S,) or None, forces_shard (rows, 3), start)
    with pos_p/q_p/sub_p replicated padded arrays and ``dev`` the caller's
    axis index."""
    rows = -(-num_particles // n_devices)
    n_pad = rows * n_devices
    nx, ny, nz = grid_shape
    use_matmul_dft = max(grid_shape) <= pme._MATMUL_DFT_MAX

    def term(pos_p, box, q_p, sub_p, lam_s, dev, energies=True):
        dtype = pos_p.dtype
        recip = recip_box_vectors(box)
        if dispersion:
            eterm = pme.dispersion_eterm(grid_shape, moduli, box, recip,
                                         alpha, dtype, half=True)
        else:
            eterm = pme.coulomb_eterm(grid_shape, moduli, box, recip,
                                      alpha, dtype, half=True)
        lam_nn = lam_s[jnp.asarray(slice_table)]
        start = dev * rows
        pos_s = jax.lax.dynamic_slice_in_dim(pos_p, start, rows)
        q_s = jax.lax.dynamic_slice_in_dim(q_p, start, rows)
        sub_s = jax.lax.dynamic_slice_in_dim(sub_p, start, rows)
        index, frac = pme.grid_index_and_fraction(pos_s, recip, grid_shape)
        theta, dtheta = pme.bsplines(frac, order)
        grid = pme.spread_charges(q_s, sub_s, index, theta, grid_shape,
                                  num_subsets, order)
        # all-reduce the per-device partial charge grids over ICI; after
        # this every device holds the full grid (replicated)
        grid = jax.lax.psum(grid, axis)
        slice_e = None
        if use_matmul_dft:
            s_re, s_im = pme.rfft3_matmul(grid)
            if energies:
                w = pme.rfft_energy_weights(nz, dtype)
                slice_e = pme.pme_slice_energies_ri(
                    s_re, s_im, eterm * w[None, None, :], slice_subset_pairs)
            phi = pme.irfft3_matmul(s_re * eterm[None], s_im * eterm[None],
                                    grid_shape)
        else:
            spectra = jnp.fft.rfftn(grid, axes=(1, 2, 3))
            if energies:
                w = pme.rfft_energy_weights(nz, dtype)
                slice_e = pme.pme_slice_energies(
                    spectra, eterm * w[None, None, :], slice_subset_pairs)
            phi = jnp.fft.irfftn(spectra * eterm[None], axes=(1, 2, 3),
                                 s=grid_shape) * (nx * ny * nz)
        f_s = pme.interpolate_forces(phi, q_s, sub_s, index, theta,
                                     dtheta, recip, lam_nn, grid_shape,
                                     order)
        return slice_e, f_s, start

    return rows, n_pad, term


def make_sharded_pme(mesh: Mesh, axis: str, num_particles: int, *,
                     alpha, grid_shape, moduli, num_subsets,
                     slice_subset_pairs, slice_table, dispersion=False,
                     order=5):
    """Returns f(positions, box, charges, subsets, lam_s) ->
    (slice_energies (S,), forces (N, 3)) computing one sliced-PME term
    (Coulomb or LJPME dispersion) sharded over ``axis`` of ``mesh``.

    Inputs are replicated (matching parallel.mesh's direct-space design);
    the output force array is sharded over atoms and reassembled by XLA.
    """
    n_devices = mesh.shape[axis]
    rows, n_pad, term = make_pme_device_term(
        axis, n_devices, num_particles, alpha=alpha, grid_shape=grid_shape,
        moduli=moduli, num_subsets=num_subsets,
        slice_subset_pairs=slice_subset_pairs, slice_table=slice_table,
        dispersion=dispersion, order=order)

    def run(positions, box, charges, subsets, lam_s):
        pad = n_pad - num_particles
        pos_p = jnp.pad(positions, ((0, pad), (0, 0)))
        q_p = jnp.pad(charges, (0, pad))
        sub_p = jnp.pad(subsets, (0, pad))

        def device_fn():
            dev = jax.lax.axis_index(axis)
            slice_e, f_s, _ = term(pos_p, box, q_p, sub_p, lam_s, dev)
            return slice_e, f_s

        slice_e, forces = jax.shard_map(
            device_fn, mesh=mesh, in_specs=(),
            out_specs=(P(), P(axis)), check_vma=False)()
        return slice_e, forces[:num_particles]

    return run


def make_sharded_ewald(mesh: Mesh, axis: str, num_particles: int, *,
                       kvec_ints, alpha, num_subsets, num_slices,
                       slice_subset_pairs):
    """Bare-Ewald k-space sum sharded over atoms: each device computes the
    (rows, K) phase matrix and per-subset structure-factor partials for its
    shard, the (n_subsets, K) structure factors are psum-reduced over ICI,
    then energies run replicated and forces cover the local shard only.
    Same return contract as ops.ewald.ewald_reciprocal."""
    n_devices = mesh.shape[axis]
    rows = -(-num_particles // n_devices)
    n_pad = rows * n_devices

    def run(positions, box, charges, subsets, lam_s):
        pad = n_pad - num_particles
        pos_p = jnp.pad(positions, ((0, pad), (0, 0)))
        q_p = jnp.pad(charges, (0, pad))
        sub_p = jnp.pad(subsets, (0, pad))

        def device_fn():
            dev = jax.lax.axis_index(axis)
            start = dev * rows
            pos_s = jax.lax.dynamic_slice_in_dim(pos_p, start, rows)
            q_s = jax.lax.dynamic_slice_in_dim(q_p, start, rows)
            sub_s = jax.lax.dynamic_slice_in_dim(sub_p, start, rows)
            return ewald.ewald_reciprocal(
                pos_s, box, q_s, sub_s, lam_s, kvec_ints=kvec_ints,
                alpha=alpha, num_subsets=num_subsets, num_slices=num_slices,
                slice_subset_pairs=jnp.asarray(slice_subset_pairs),
                psum_axis=axis)

        slice_e, forces = jax.shard_map(
            device_fn, mesh=mesh, in_specs=(),
            out_specs=(P(), P(axis)), check_vma=False)()
        return slice_e, forces[:num_particles]

    return run
