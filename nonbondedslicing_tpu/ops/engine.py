"""Assembles the full sliced-nonbonded computation into one pure function.

``make_compute(plan, include_direct, include_reciprocal)`` returns
``f(positions, box, gvals, data) -> (slice_energies (S, 2), forces (N, 3))``
with slice energies *unscaled* by lambda: the total energy is
``sum(lam * slice_energies)`` and, because E is lambda-linear, the exact
dE/dlambda derivatives are just sums of slice energies
(ReferenceNonbondedSlicingKernels.cpp:252-265) — no autodiff needed.

``data`` carries every mutable parameter array (base charges/sigmas/epsilons,
offsets, subsets, exception tables, dispersion coefficients) so that
``updateParametersInContext`` never recompiles; only structural changes
(method, particle/exception counts, scaling parameters) rebuild the plan.

Evaluation order mirrors the reference execute()
(ReferenceNonbondedSlicingKernels.cpp:187-268 and
ReferenceSlicedLJCoulombIxn.cpp:179-507):
self energy + neutralizing plasma -> reciprocal (Ewald k-sum or sliced PME,
plus LJPME dispersion PME) -> direct space -> exclusion corrections -> 1-4
exceptions -> per-slice dispersion correction / volume.
"""




import jax
import jax.numpy as jnp
import numpy as np

from ..models.force import NonbondedForce
from ..utils.constants import COUL, EPSILON0, ONE_4PI_EPS0, SQRT_PI, VDW
from ..utils.indexing import slice_subsets
from . import bonded, direct, ewald, neighbors, params, pme
from .geometry import box_volume
from .plan import EWALD_METHODS, Plan


def plan_data(plan: Plan):
    """The mutable-parameter pytree passed to the compiled function."""
    return {
        "base_params": jnp.asarray(plan.base_params),
        "charge_offsets": jnp.asarray(plan.charge_offsets),
        "sigma_offsets": jnp.asarray(plan.sigma_offsets),
        "epsilon_offsets": jnp.asarray(plan.epsilon_offsets),
        "subsets": jnp.asarray(plan.subsets),
        "exclusion_pairs": jnp.asarray(plan.exclusion_pairs),
        "exclusion_list": jnp.asarray(plan.exclusion_list),
        "nb14_atoms": jnp.asarray(plan.nb14_atoms),
        "nb14_base": jnp.asarray(plan.nb14_base),
        "nb14_slice": jnp.asarray(plan.nb14_slice),
        "nb14_charge_offsets": jnp.asarray(plan.nb14_charge_offsets),
        "nb14_sigma_offsets": jnp.asarray(plan.nb14_sigma_offsets),
        "nb14_epsilon_offsets": jnp.asarray(plan.nb14_epsilon_offsets),
        "dispersion_coefficients": jnp.asarray(plan.dispersion_coefficients),
    }


_CELL_LIST_MIN_PARTICLES = 1024


def make_compute(plan: Plan, include_direct: bool, include_reciprocal: bool,
                 block_size=None, neighbor="auto", cell_capacity=None,
                 hoist_eterm=False, shard=None, with_aux=False):
    """``with_aux=True`` returns f(...) -> (slice_energies, forces, aux)
    where aux = {"overflow": int32} counts atoms silently outside the static
    cell capacity (0 for engines without a cell list).  Callers evaluating
    through a cell-list engine MUST check it — the reference's voxel hash is
    exact every call (ReferenceNonbondedSlicingKernels.cpp:197)."""
    method = plan.method
    is_ewald_family = method in EWALD_METHODS
    n = plan.num_particles
    nsub = plan.num_subsets
    nslices = plan.num_slices
    slice_pairs = jnp.asarray(slice_subsets(nsub))
    slice_table = plan.slice_table
    periodic = method in (NonbondedForce.CutoffPeriodic,) + tuple(EWALD_METHODS)

    if method == NonbondedForce.NoCutoff:
        mode = direct.PLAIN
    elif method in (NonbondedForce.CutoffNonPeriodic, NonbondedForce.CutoffPeriodic):
        mode = direct.CUTOFF
    else:
        mode = direct.EWALD_DIRECT

    # reaction-field constants (ReferenceSlicedLJCoulombIxn.cpp:66-67)
    eps_rf = plan.rf_dielectric
    krf = plan.cutoff ** -3 * (eps_rf - 1.0) / (2.0 * eps_rf + 1.0)
    crf = (1.0 / plan.cutoff) * (3.0 * eps_rf) / (2.0 * eps_rf + 1.0)

    # cell-list engine for large periodic cutoff systems; O(N^2) otherwise
    cell_cfg = None
    if (mode != direct.PLAIN and periodic and neighbor != "all_pairs"
            and plan.box0 is not None
            and (neighbor in ("cell", "pallas")
                 or n >= _CELL_LIST_MIN_PARTICLES)):
        cell_cfg = neighbors.choose_cell_grid(plan.box0, plan.cutoff, n)
    if cell_cfg is not None:
        counts, capacity = cell_cfg
        if cell_capacity is not None:
            capacity = int(cell_capacity)
        cell_kw = dict(
            mode=mode, cutoff=plan.cutoff, counts=counts, capacity=capacity,
            krf=krf, crf=crf, use_switch=plan.use_switch,
            switch_distance=plan.switch_distance, ewald_alpha=plan.ewald_alpha,
            ljpme=(method == NonbondedForce.LJPME),
            dispersion_alpha=plan.dispersion_alpha, num_slices=nslices)
        if shard is not None:
            mesh, axis = shard
            cell_kw.update(mesh=mesh, shard_axis=axis)
        use_pallas = (shard is None
                      and (neighbor == "pallas"
                           or (neighbor == "auto"
                               and jax.default_backend() == "tpu")))
        if use_pallas:
            from . import pallas_direct
            direct_fn = pallas_direct.make_pallas_direct_space(
                exceptions_periodic=plan.exceptions_periodic,
                exclusion_pairs=plan.exclusion_pairs,
                interpret=(jax.default_backend() != "tpu"), **cell_kw)
        else:
            direct_fn = neighbors.make_cell_direct_space(**cell_kw)
    else:
        direct_fn = direct.make_direct_space(
            mode=mode, periodic=periodic, cutoff=plan.cutoff, krf=krf, crf=crf,
            use_switch=plan.use_switch, switch_distance=plan.switch_distance,
            ewald_alpha=plan.ewald_alpha, ljpme=(method == NonbondedForce.LJPME),
            dispersion_alpha=plan.dispersion_alpha, num_slices=nslices,
            block_size=block_size)

    if method == NonbondedForce.Ewald:
        kvec_ints = ewald.half_space_kvectors(plan.ewald_kmax)
    else:
        kvec_ints = None

    # Multi-chip: atom-sharded PME spread/interp with a grid psum over ICI
    # (parallel/pme_shard.py) — the reference keeps reciprocal space on one
    # device (CommonNonbondedSlicingKernels.cpp:388,416,465); we scale it.
    pme_sharded = None
    dpme_sharded = None
    ewald_sharded = None
    if shard is not None and include_reciprocal and is_ewald_family:
        smesh, saxis = shard
        pairs_np = np.asarray(slice_subsets(nsub))
        if method == NonbondedForce.Ewald:
            from ..parallel.pme_shard import make_sharded_ewald
            ewald_sharded = make_sharded_ewald(
                smesh, saxis, n, kvec_ints=kvec_ints, alpha=plan.ewald_alpha,
                num_subsets=nsub, num_slices=nslices,
                slice_subset_pairs=pairs_np)
        else:
            from ..parallel.pme_shard import make_sharded_pme
            pme_sharded = make_sharded_pme(
                smesh, saxis, n, alpha=plan.ewald_alpha,
                grid_shape=plan.pme_grid, moduli=plan.pme_moduli,
                num_subsets=nsub, slice_subset_pairs=pairs_np,
                slice_table=slice_table)
            if method == NonbondedForce.LJPME:
                dpme_sharded = make_sharded_pme(
                    smesh, saxis, n, alpha=plan.dispersion_alpha,
                    grid_shape=plan.dispersion_grid, moduli=plan.dpme_moduli,
                    num_subsets=nsub, slice_subset_pairs=pairs_np,
                    slice_table=slice_table, dispersion=True)

    # Box-static convolution kernels hoisted out of the per-step trace (MD
    # fastpath only — invalid if the runtime box differs from plan.box0).
    eterm0 = None
    dterm0 = None
    if hoist_eterm and method in (NonbondedForce.PME, NonbondedForce.LJPME):
        # numpy: device-array closure constants lower catastrophically slowly
        eterm0 = pme.coulomb_eterm_np(plan.pme_grid, plan.pme_moduli,
                                      plan.box0, plan.ewald_alpha,
                                      half=True).astype(np.float32)
        if method == NonbondedForce.LJPME:
            dterm0 = pme.dispersion_eterm_np(
                plan.dispersion_grid, plan.dpme_moduli, plan.box0,
                plan.dispersion_alpha, half=True).astype(np.float32)

    def compute(positions, box, gvals, data):
        dtype = positions.dtype
        box = box.astype(dtype)
        gvals = gvals.astype(dtype)
        subsets = data["subsets"]
        charge, sig_half, eps2 = params.particle_params(data, gvals)
        lam = params.slice_lambdas(plan.lam_source, gvals)  # (S, 2)
        lam_c = lam[:, COUL]
        lam_v = lam[:, VDW]

        # per-slice energy scalars accumulate in f64: they carry the
        # ~1e6 kJ/mol self-energy cancellation and the exact dE/dlambda;
        # forces and all pair math stay in the working dtype
        slice_energies = jnp.zeros((nslices, 2), jnp.float64)
        forces = jnp.zeros((n, 3), dtype)

        if is_ewald_family and include_reciprocal:
            alpha = plan.ewald_alpha
            onehot = (subsets[:, None] == jnp.arange(nsub)[None, :]).astype(dtype)
            diag_ids = np.array([s * (s + 3) // 2 for s in range(nsub)])
            # ---- self energy (ReferenceSlicedLJCoulombIxn.cpp:203-213);
            # per-subset reduction via the one-hot matmul (a 23k-element
            # scatter per step is near-serial on TPU)
            charge64 = charge.astype(jnp.float64)
            onehot64 = onehot.astype(jnp.float64)
            self_coul = -ONE_4PI_EPS0 * charge64 * charge64 * alpha / SQRT_PI
            slice_energies = slice_energies.at[diag_ids, COUL].add(
                self_coul @ onehot64)
            if method == NonbondedForce.LJPME:
                self_vdw = (plan.dispersion_alpha ** 6 * 64.0
                            * sig_half.astype(jnp.float64) ** 6
                            * eps2.astype(jnp.float64) ** 2 / 12.0)
                slice_energies = slice_energies.at[diag_ids, VDW].add(
                    self_vdw @ onehot64)
            # ---- neutralizing plasma (cpp:214-221)
            volume = box_volume(box).astype(jnp.float64)
            q_sub = charge64 @ onehot64  # (nsub,)
            factor = (-1.0 / (4.0 * alpha * alpha)) / (2.0 * EPSILON0 * volume)
            qi = q_sub[slice_pairs[:, 0]]
            qj = q_sub[slice_pairs[:, 1]]
            w = jnp.where(slice_pairs[:, 0] == slice_pairs[:, 1],
                          1.0, 2.0).astype(jnp.float64)
            slice_energies = slice_energies.at[:, COUL].add(w * qi * qj * factor)
            # ---- k-space
            if method == NonbondedForce.Ewald:
                if ewald_sharded is not None:
                    e_k, f_k = ewald_sharded(positions, box, charge, subsets,
                                             lam_c)
                else:
                    e_k, f_k = ewald.ewald_reciprocal(
                        positions, box, charge, subsets, lam_c,
                        kvec_ints=kvec_ints, alpha=alpha, num_subsets=nsub,
                        num_slices=nslices, slice_subset_pairs=slice_pairs)
                slice_energies = slice_energies.at[:, COUL].add(
                    e_k.astype(jnp.float64))
                forces = forces + f_k
            else:
                if pme_sharded is not None:
                    e_k, f_k = pme_sharded(positions, box, charge, subsets,
                                           lam_c)
                else:
                    e_k, f_k = pme.pme_reciprocal(
                        positions, box, charge, subsets, lam_c,
                        alpha=alpha, grid_shape=plan.pme_grid,
                        moduli=plan.pme_moduli, num_subsets=nsub,
                        slice_subset_pairs=slice_pairs, slice_table=slice_table,
                        eterm=(None if eterm0 is None
                               else eterm0.astype(dtype)))
                slice_energies = slice_energies.at[:, COUL].add(
                    e_k.astype(jnp.float64))
                forces = forces + f_k
                if method == NonbondedForce.LJPME:
                    c6 = 8.0 * sig_half ** 3 * eps2
                    if dpme_sharded is not None:
                        e_d, f_d = dpme_sharded(positions, box, c6, subsets,
                                                lam_v)
                    else:
                        e_d, f_d = pme.pme_reciprocal(
                            positions, box, c6, subsets, lam_v,
                            alpha=plan.dispersion_alpha,
                            grid_shape=plan.dispersion_grid,
                            moduli=plan.dpme_moduli, num_subsets=nsub,
                            slice_subset_pairs=slice_pairs,
                            slice_table=slice_table, dispersion=True,
                            eterm=(None if dterm0 is None
                                   else dterm0.astype(dtype)))
                    slice_energies = slice_energies.at[:, VDW].add(
                        e_d.astype(jnp.float64))
                    forces = forces + f_d

        overflow = jnp.zeros((), jnp.int32)
        if include_direct:
            out = direct_fn(positions, box, charge, sig_half, eps2,
                            subsets, data["exclusion_list"],
                            slice_table, lam_c, lam_v)
            if getattr(direct_fn, "returns_overflow", False):
                e_dir, f_dir, overflow = out
            else:
                e_dir, f_dir = out
            slice_energies = slice_energies + e_dir.astype(jnp.float64)
            forces = forces + f_dir

            if is_ewald_family and not getattr(direct_fn,
                                               "handles_exclusions", False):
                e_x, f_x = bonded.exclusion_corrections(
                    positions, box, data["exclusion_pairs"], charge, sig_half,
                    eps2, subsets, slice_table, lam_c, lam_v,
                    alpha=plan.ewald_alpha,
                    periodic_exceptions=plan.exceptions_periodic,
                    ljpme=(method == NonbondedForce.LJPME),
                    dispersion_alpha=plan.dispersion_alpha,
                    num_slices=nslices, num_particles=n)
                slice_energies = slice_energies + e_x.astype(jnp.float64)
                forces = forces + f_x

            sigma14, four_eps14, qq14 = params.nb14_params(data, gvals)
            e_14, f_14 = bonded.nb14_interactions(
                positions, box, data["nb14_atoms"], sigma14, four_eps14, qq14,
                data["nb14_slice"], lam_c, lam_v,
                periodic=plan.exceptions_periodic, num_slices=nslices,
                num_particles=n)
            slice_energies = slice_energies + e_14.astype(jnp.float64)
            forces = forces + f_14

            # per-slice long-range dispersion correction / volume
            # (ReferenceNonbondedSlicingKernels.cpp:244-249; note LJPME handles
            # dispersion exactly, so it is excluded)
            if method in (NonbondedForce.CutoffPeriodic, NonbondedForce.Ewald,
                          NonbondedForce.PME):
                volume = box_volume(box)
                slice_energies = slice_energies.at[:, VDW].add(
                    data["dispersion_coefficients"].astype(jnp.float64)
                    / box_volume(box).astype(jnp.float64))

        if with_aux:
            return slice_energies, forces, {"overflow": overflow}
        return slice_energies, forces

    return compute


def contract_energy(slice_energies, lam):
    """E = sum(lam * slice_energies) (ReferenceNonbondedSlicingKernels.cpp:252-257)."""
    return jnp.sum(lam * slice_energies)


def parameter_derivatives(slice_energies, deriv_mask):
    """dE/dlambda_p = sum of unscaled slice energies assigned to p
    (ReferenceNonbondedSlicingKernels.cpp:259-265)."""
    return jnp.einsum("dst,st->d", jnp.asarray(deriv_mask,
                                               dtype=slice_energies.dtype),
                      slice_energies)
