"""Multi-chip SPMD evaluation over a jax.sharding.Mesh.

TPU-native replacement for the reference's multi-GPU scheme
(CudaParallelNonbondedSlicingKernels.cpp:19-66: per-device contexts + host
work threads + host-side energy summation).  Here the whole step is ONE
SPMD program:

* direct space is sharded over atom row-blocks with ``shard_map`` — each
  device computes the pair interactions of its row shard against all atoms
  (positions replicated; the j-loop is the same tile sweep as single-chip),
  producing its shard of the force array and per-slice energy partials that
  are ``psum``-reduced over ICI.
* reciprocal space: PME/LJPME spread and force interpolation are sharded
  over atoms with one charge-grid ``psum`` over ICI per term
  (parallel/pme_shard.py); the batched FFT + convolution run replicated.
  The reference keeps ALL reciprocal work on one device
  (CommonNonbondedSlicingKernels.cpp:388,416,465) — we scale the
  O(N·order³) parts of it.  Bare-Ewald k-sums and bonded terms stay
  replicated.
* exceptions/exclusions are round-robined across devices in the reference
  (:643-645); here they ride the replicated section.

Usage: build with a Mesh over an ``atoms`` axis and call inside jit; XLA
partitions per the shard_map specs with collectives over ICI.

NOTE — production multi-chip MD lives in ``parallel/fused_shard.py``
(``make_sharded_md_step``: spatial x-slab decomposition, K-step scan blocks
per dispatch, sharded PME, constraints).  This module provides the generic
single-evaluation sharded compute (``make_sharded_compute``, used by the
Platform layer for one-shot sharded energy/force evaluations) and a
test-only per-step harness (``make_multichip_md_step``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..models.force import NonbondedForce
from ..ops import bonded, direct, engine, params, pme
from ..ops.plan import EWALD_METHODS, Plan
from ..utils.constants import COUL, VDW


def make_sharded_compute(plan: Plan, mesh: Mesh, axis: str = "atoms",
                         block_size: int = None):
    """Returns f(positions, box, gvals, data) -> (slice_energies, forces)
    that runs direct space sharded over `axis` of `mesh`.

    Must be called under jit with the mesh active (jax.jit is applied by the
    caller); positions/data are replicated inputs.
    """
    n_devices = mesh.shape[axis]
    n = plan.num_particles
    nslices = plan.num_slices
    method = plan.method
    periodic = method in (NonbondedForce.CutoffPeriodic,) + tuple(EWALD_METHODS)

    # periodic cutoff systems: shard the cell-list engine over cells (tile
    # prep replicated, pair tiles split across devices, psum over ICI)
    if periodic and method != NonbondedForce.NoCutoff:
        from ..ops import neighbors
        cell_cfg = neighbors.choose_cell_grid(plan.box0, plan.cutoff, n)
        if cell_cfg is not None:
            return engine.make_compute(plan, True, True, neighbor="cell",
                                       shard=(mesh, axis))

    if method == NonbondedForce.NoCutoff:
        mode = direct.PLAIN
    elif method in (NonbondedForce.CutoffNonPeriodic, NonbondedForce.CutoffPeriodic):
        mode = direct.CUTOFF
    else:
        mode = direct.EWALD_DIRECT

    eps_rf = plan.rf_dielectric
    krf = plan.cutoff ** -3 * (eps_rf - 1.0) / (2.0 * eps_rf + 1.0)
    crf = (1.0 / plan.cutoff) * (3.0 * eps_rf) / (2.0 * eps_rf + 1.0)

    direct_fn = direct.make_direct_space(
        mode=mode, periodic=periodic, cutoff=plan.cutoff, krf=krf, crf=crf,
        use_switch=plan.use_switch, switch_distance=plan.switch_distance,
        ewald_alpha=plan.ewald_alpha, ljpme=(method == NonbondedForce.LJPME),
        dispersion_alpha=plan.dispersion_alpha, num_slices=nslices)

    # rows per device, padded so every device gets whole blocks
    block = block_size or direct._pick_block(max(n // n_devices, 8))
    rows_per_dev = -(-n // (n_devices * block)) * block
    n_pad = rows_per_dev * n_devices

    # reciprocal space reuses the engine with direct space disabled; the
    # shard argument routes PME/LJPME through the atom-sharded pipeline
    recip_compute = engine.make_compute(plan, include_direct=False,
                                        include_reciprocal=True,
                                        shard=(mesh, axis))
    slice_table = plan.slice_table

    def sharded_direct(positions, box, charge, sig_half, eps2, subsets,
                       exclusion_list, lam_c, lam_v):
        padded = direct_fn.pad_inputs(positions, charge, sig_half, eps2,
                                      subsets, exclusion_list, n_pad)
        padded["n_pad"] = n_pad

        def device_fn():
            dev = jax.lax.axis_index(axis)
            block_fn = direct_fn.make_block_fn(padded, box, slice_table,
                                               lam_c, lam_v, block)
            starts = dev * rows_per_dev + jnp.arange(0, rows_per_dev, block)
            slice_parts, force_blocks = jax.lax.map(block_fn, starts)
            slice_e = jax.lax.psum(jnp.sum(slice_parts, axis=0), axis)
            return slice_e, force_blocks.reshape(rows_per_dev, 3)

        slice_e, forces = jax.shard_map(
            device_fn, mesh=mesh, in_specs=(),
            out_specs=(P(), P(axis)), check_vma=False)()
        return slice_e, forces[:n]

    def compute(positions, box, gvals, data):
        subsets = data["subsets"]
        charge, sig_half, eps2 = params.particle_params(data, gvals)
        lam = params.slice_lambdas(plan.lam_source, gvals)
        lam_c = lam[:, COUL]
        lam_v = lam[:, VDW]

        slice_e, forces = sharded_direct(positions, box, charge, sig_half,
                                         eps2, subsets,
                                         data["exclusion_list"], lam_c, lam_v)

        # replicated remainder: reciprocal space, exclusions corrections, 1-4s,
        # dispersion correction
        e_rest, f_rest = _direct_side_terms(plan, positions, box, gvals, data,
                                            charge, sig_half, eps2, subsets,
                                            lam_c, lam_v)
        slice_e = slice_e + e_rest
        forces = forces + f_rest
        if method in EWALD_METHODS:
            e_recip, f_recip = recip_compute(positions, box, gvals, data)
            slice_e = slice_e + e_recip
            forces = forces + f_recip
        return slice_e, forces

    return compute


def _direct_side_terms(plan, positions, box, gvals, data, charge, sig_half,
                       eps2, subsets, lam_c, lam_v):
    """Exclusion corrections + 1-4s + dispersion correction (replicated)."""
    method = plan.method
    n = plan.num_particles
    nslices = plan.num_slices
    dtype = positions.dtype
    slice_e = jnp.zeros((nslices, 2), dtype)
    forces = jnp.zeros((n, 3), dtype)
    if method in EWALD_METHODS:
        e_x, f_x = bonded.exclusion_corrections(
            positions, box, data["exclusion_pairs"], charge, sig_half, eps2,
            subsets, plan.slice_table, lam_c, lam_v,
            alpha=plan.ewald_alpha,
            periodic_exceptions=plan.exceptions_periodic,
            ljpme=(method == NonbondedForce.LJPME),
            dispersion_alpha=plan.dispersion_alpha,
            num_slices=nslices, num_particles=n)
        slice_e = slice_e + e_x
        forces = forces + f_x
    sigma14, four_eps14, qq14 = params.nb14_params(data, gvals)
    e_14, f_14 = bonded.nb14_interactions(
        positions, box, data["nb14_atoms"], sigma14, four_eps14, qq14,
        data["nb14_slice"], lam_c, lam_v,
        periodic=plan.exceptions_periodic, num_slices=nslices, num_particles=n)
    slice_e = slice_e + e_14
    forces = forces + f_14
    if method in (NonbondedForce.CutoffPeriodic, NonbondedForce.Ewald,
                  NonbondedForce.PME):
        volume = box[0, 0] * box[1, 1] * box[2, 2]
        slice_e = slice_e.at[:, VDW].add(
            data["dispersion_coefficients"].astype(dtype) / volume)
    return slice_e, forces


def make_multichip_md_step(plan: Plan, masses, dt, mesh: Mesh,
                           axis: str = "atoms", dtype=jnp.float32):
    """TEST/PARITY HARNESS ONLY — one jitted dispatch per step with
    replicated prep, kept because its simple structure makes sharded-vs-host
    comparisons easy to localize.  The PRODUCTION multi-chip MD path is
    ``parallel.fused_shard.make_sharded_md_step`` (spatial slab
    decomposition, K-step blocks per dispatch, constraints); use that for
    any real run."""
    compute = make_sharded_compute(plan, mesh, axis)
    inv_m = jnp.asarray(
        np.where(np.asarray(masses) > 0,
                 1.0 / np.maximum(np.asarray(masses), 1e-300), 0.0),
        dtype)[:, None]

    @jax.jit
    def step(pos, vel, box, gvals, data):
        slice_e, forces = compute(pos, box, gvals, data)
        vel = vel + dt * forces * inv_m
        pos = pos + dt * vel
        lam = params.slice_lambdas(plan.lam_source, gvals)
        energy = engine.contract_energy(slice_e, lam)
        return pos, vel, energy

    return step
