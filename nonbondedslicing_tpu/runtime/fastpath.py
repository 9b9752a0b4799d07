"""Fused MD step loop for production throughput.

One jitted nested ``lax.scan`` over leapfrog-Verlet steps with the full
sliced nonbonded evaluation inside — the TPU analog of the reference's
integrator.step() loop, but with zero host round-trips per step (the
reference launches ~10 kernels per step from the host,
CommonNonbondedSlicingKernels.cpp:846-1402).

Structure (round 2): the neighbor/slot state from ``ops.fused.prepare`` is
rebuilt every ``reuse_steps`` outer iterations and reused by the inner steps
under a skin guard — the analog of Verlet-list reuse (the reference instead
rebuilds per evaluation, ReferenceNonbondedSlicingKernels.cpp:197, or relies
on OpenMM's tile lists).  Safety is monitored *in-trace* and checked on the
host after the scan:

* ``overflow`` — atoms beyond the static cell capacity (never silently
  dropped; raise and rebuild with a larger capacity)
* ``maxdisp2`` — max squared displacement since the last rebuild; beyond
  (skin/2)^2 the frozen cell assignment may miss pairs or PME windows
* the runtime box must equal ``plan.box0`` exactly: the cell grid sizing and
  the hoisted PME convolution kernels are box0-static (ops/engine.py analog
  of the reference's per-call box re-read is the Context path, not this one)

Optionally includes harmonic bonds (for flexible intramolecular geometry)
computed inside the same compiled step.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.force import OpenMMException
from ..ops import engine as engine_mod
from ..ops import fused as fused_mod
from ..ops.params import slice_lambdas


def _bond_forces_fn(bonds, n, dtype, periodic=False, box=None):
    if bonds is None or len(bonds) == 0:
        return None
    from ..ops.geometry import min_image
    # numpy closure constants (device arrays lower element-wise over the
    # TPU tunnel)
    np_dt = np.dtype(jnp.dtype(dtype).name)
    bonds = np.asarray(bonds, dtype=np.float64)
    b_i = bonds[:, 0].astype(np.int32)
    b_j = bonds[:, 1].astype(np.int32)
    b_r0 = bonds[:, 2].astype(np_dt)
    b_k = bonds[:, 3].astype(np_dt)
    box_c = None if box is None else np.asarray(box, dtype=np_dt)

    def bond_forces(pos):
        dr = pos[b_i] - pos[b_j]
        if periodic:
            dr = min_image(dr, box_c)
        r = jnp.sqrt(jnp.sum(dr * dr, axis=-1))
        dedr = b_k * (r - b_r0) / jnp.maximum(r, 1e-12)
        f = -dedr[:, None] * dr
        out = jnp.zeros((n, 3), dtype)
        return out.at[b_i].add(f).at[b_j].add(-f)

    return bond_forces


def _ds_add(hi, lo, x):
    """Compensated add of f32 ``x`` into a double-single (hi, lo) f32 pair:
    branch-free TwoSum for the exact rounding error, then a Fast2Sum
    renormalization (valid since |lo + err| << |hi + x| for MD-scale
    updates).  ~9 f32 VPU ops/element — the f64 equivalent runs ~250x
    slower per element on this TPU (extras/probe_nve_tpu.py notes)."""
    s = hi + x
    bb = s - hi
    err = (hi - (s - bb)) + (x - bb)
    lo2 = lo + err
    hi2 = s + lo2
    lo3 = lo2 - (hi2 - s)
    return hi2, lo3


@jax.jit
def _ds_join(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def _ds_split(pos):
    """Host-side split of f64 positions into the (hi, lo) f32 pair."""
    p64 = np.asarray(pos, dtype=np.float64)
    hi = p64.astype(np.float32)
    lo = (p64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


# nm — Verlet-list style cell oversizing for MD reuse.  0.09 (not 0.10):
# at ~10 nm boxes (100k atoms, cutoff 0.9) it admits one more cell per axis
# — (10,10,10) instead of (9,9,9) — cutting per-row candidate slots by 20%
# and the measured apply() from 12.3 to 9.9 ms/step; at the 23k bench box
# (6.16 nm) both values give the same (6,6,6) grid.
DEFAULT_SKIN = 0.09


def make_md_step(plan, masses, dt, dtype=jnp.float32, block_size=None,
                 bonds=None, cell_capacity=None, reuse_steps=None,
                 interpret=None, bonds_periodic=False, constraints=None,
                 target_skin=DEFAULT_SKIN, mixed_precision=None):
    """Returns run(pos, vel, box, gvals, data, n_steps) -> (pos, vel, energy).

    Leapfrog Verlet: v += dt*F/m; x += dt*v.  ``bonds`` is an optional
    (M, 4) array-like of (i, j, r0, k) harmonic bonds evaluated inside the
    step (periodic minimum image is NOT applied — bonded pairs are assumed
    never to straddle half the box).

    ``reuse_steps`` (K) controls how many steps share one neighbor/slot
    rebuild; None picks K from the available skin (conservative default).
    Raises OpenMMException after the run if the cell capacity overflowed or
    any atom moved more than skin/2 between rebuilds.

    ``mixed_precision`` (default: on for the f32 fused path): forces and
    velocities stay f32 but POSITIONS accumulate in a DOUBLE-SINGLE
    (hi, lo) f32 pair via compensated adds, and SHAKE/RATTLE/SETTLE solve
    at f32 in a per-cluster LOCAL frame (constraints.py make_constrainer
    ``mixed=True``) — the practical core of the reference CUDA platform's
    "mixed" Precision, its production benchmark default, built from pure
    f32 VPU ops because f64 elementwise runs ~250x slower on this TPU.
    Pure-f32 integration heats the 23k bench at ~540 kJ/mol/ps
    (≈ 4.7 kT/dof/ns — f32-ulp position noise from the absolute-coordinate
    constraint solve and position accumulation); this path measures
    ~−1 kJ/mol/ps (4e-3 |E|/ns) NVE drift (extras/probe_nve_tpu.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mixed_precision is None:
        # explicit opt-in: the semantic owner is the Platform's Precision
        # property ("mixed"), mirroring the reference CUDA platform whose
        # default Precision is likewise "single"
        mixed_precision = False
    mixed_precision = bool(mixed_precision) and (
        jnp.dtype(dtype) == jnp.dtype(jnp.float32))
    eng = fused_mod.make_fused_engine(plan, cell_capacity=cell_capacity,
                                      hoist_eterm=True, interpret=interpret,
                                      target_skin=target_skin, energies=False)
    eng_full = fused_mod.make_fused_engine(plan, cell_capacity=cell_capacity,
                                           hoist_eterm=True,
                                           interpret=interpret,
                                           target_skin=target_skin,
                                           energies=True)
    n = plan.num_particles
    inv_m = np.where(np.asarray(masses) > 0,
                     1.0 / np.maximum(np.asarray(masses), 1e-300),
                     0.0).astype(np.dtype(jnp.dtype(dtype).name))[:, None]
    lam_source = plan.lam_source
    bond_forces = _bond_forces_fn(bonds, n, dtype, periodic=bonds_periodic,
                                  box=plan.box0)
    box0 = np.asarray(plan.box0, dtype=np.float64)
    if constraints is not None:
        from .constraints import make_constrainer
        c_pairs, c_dists = constraints[0], constraints[1]
        c_mask = constraints[2] if len(constraints) > 2 else None
        proj_x, proj_v = make_constrainer(c_pairs, c_dists, masses, n,
                                          dtype=dtype, mask=c_mask,
                                          mixed=mixed_precision)
    else:
        proj_x = proj_v = None

    def integrate(pos, vel, forces):
        """Leapfrog Verlet with optional SHAKE/RATTLE constraint stages."""
        vel = vel + dt * forces * inv_m
        if proj_x is None:
            return pos + dt * vel, vel
        pos_new = proj_x(pos, pos + dt * vel)
        vel = (pos_new - pos) / dt
        return pos_new, proj_v(pos_new, vel)

    def integrate_mixed(pos, vel, forces):
        """Leapfrog with DOUBLE-SINGLE position accumulation: ``pos`` is an
        (hi, lo) pair of f32 arrays carrying ~2x f32 precision; updates go
        through the compensated ``_ds_add`` and the constraint solver runs
        at f32 in a per-cluster local frame, returning a correction that is
        compensated-added too (make_constrainer ``mixed=True``).
        Velocities and the kick stay f32 (velocity-increment rounding
        enters positions at ~1e-10 nm/step — harmless).  Accumulating and
        solving on plain absolute f32 coordinates instead injects f32-ulp
        position noise every step — measured as the dominant NVE heating —
        while an f64 carry fixes the drift but costs 6-9% of throughput
        (f64 elementwise runs ~250x slower than f32 on this TPU); the
        double-single form gets the full drift fix in pure f32 ops."""
        hi, lo = pos
        vel = vel + dt * forces * inv_m
        hi1, lo1 = _ds_add(hi, lo, dt * vel)
        if proj_x is None:
            return (hi1, lo1), vel
        corr = proj_x(hi, lo, hi1, lo1)          # px_corr: local-frame f32
        hi2, lo2 = _ds_add(hi1, lo1, corr)
        # velocity from the actual constrained displacement (hi deltas are
        # exact by Sterbenz; lo deltas carry the compensation bits)
        vel = ((hi2 - hi) + (lo2 - lo)) * (1.0 / dt)
        return (hi2, lo2), proj_v(hi2, lo2, vel)

    if eng is None:
        return _make_md_step_simple(
            plan, integrate_mixed if mixed_precision else integrate, dt,
            dtype, block_size, bond_forces, cell_capacity, lam_source,
            mixed_precision=mixed_precision)

    prepare, apply, cfg = eng           # force-only inner-step variant
    _, apply_full, _ = eng_full         # energies for the end-of-run report
    skin = cfg["skin"]
    if reuse_steps is None:
        # steps until the fastest plausible atom covers half the skin.  The
        # 7 nm/ps bound is calibrated for 1 amu hydrogens at 300 K
        # (sustained per-step max displacement measured at ~0.012 nm over
        # 120-step windows of the 23k rigid-water bench — K=4 leaves a ~25%
        # margin there; K=6 tripped the guard); thermal speeds scale as
        # 1/sqrt(m), so repartitioned hydrogens (HMR, 3 amu) admit a
        # sqrt(3)-longer window.  The in-trace skin guard still verifies
        # every run and the callers' retry paths halve K on a trip.
        m_pos = np.asarray(masses, dtype=np.float64)
        m_min = float(np.min(m_pos[m_pos > 0])) if np.any(m_pos > 0) else 1.0
        v_ref = 7.0 / np.sqrt(max(m_min, 1.008) / 1.008)
        reuse_steps = int(0.5 * skin / (dt * v_ref))
    K = min(25, max(1, int(reuse_steps)))
    disp_limit2 = (0.5 * skin) ** 2 if K > 1 else np.inf

    @partial(jax.jit, static_argnums=(5, 6), donate_argnums=(0, 1))
    def run_scan(pos, vel, box, gvals, data, n_outer, rem):
        nslices = plan.num_slices

        def _pos32(pos):
            return pos[0] if mixed_precision else pos.astype(dtype)

        def inner(carry, _):
            pos, vel, dmax, state = carry
            pos32 = _pos32(pos)
            _, forces, aux = apply(pos32, box, gvals, data, state)
            if bond_forces is not None:
                forces = forces + bond_forces(pos32)
            if mixed_precision:
                pos, vel = integrate_mixed(pos, vel, forces)
            else:
                pos, vel = integrate(pos, vel, forces)
            dmax = jnp.maximum(dmax, aux["maxdisp2"])
            return (pos, vel, dmax, state), None

        def block(pos, vel, ov, dmax, k):
            state = prepare(_pos32(pos), box, gvals, data)
            (pos, vel, dmax, _), _ = jax.lax.scan(
                inner, (pos, vel, dmax, state), None, length=k)
            ov = jnp.maximum(ov, state["overflow"])
            return pos, vel, ov, dmax

        def outer(carry, _):
            pos, vel, ov, dmax = carry
            return block(pos, vel, ov, dmax, K), None

        zero = jnp.zeros((), dtype)
        (pos, vel, ov, dmax), _ = jax.lax.scan(
            outer, (pos, vel, jnp.zeros((), jnp.int32), zero), None,
            length=n_outer)
        if rem:
            pos, vel, ov, dmax = block(pos, vel, ov, dmax, rem)
        # full-variant evaluation for the reported energy (the inner steps
        # run the force-only kernel)
        pos32 = _pos32(pos)
        state = prepare(pos32, box, gvals, data)
        slice_e, _, _ = apply_full(pos32, box, gvals, data, state)
        ov = jnp.maximum(ov, state["overflow"])
        lam = slice_lambdas(lam_source, gvals)
        energy = engine_mod.contract_energy(slice_e, lam)
        # pack the guard scalars into ONE array: each blocking scalar fetch
        # over the tunneled TPU costs a full round trip (~40 ms), and run()
        # must fetch the guards every call (counts stay below 2^24, exact
        # in f32).
        guards = jnp.stack([ov.astype(jnp.float32),
                            dmax.astype(jnp.float32)])
        return pos, vel, energy, guards

    def run(pos, vel, box, gvals, data, n_steps):
        # hoisted convolution kernels + static cell grid are box0-only
        # (tolerance covers the f32 cast of an f64 default box)
        if not np.allclose(np.asarray(box, dtype=np.float64), box0,
                           rtol=0.0, atol=1e-6 * float(np.max(np.abs(box0)))):
            raise OpenMMException(
                "make_md_step: the runtime box must equal the plan's default "
                "box (the cell grid and PME convolution kernels are "
                "box-static); reinitialize for a different box.")
        if mixed_precision:
            hi, lo = _ds_split(pos)
            pos_in = (jnp.asarray(hi), jnp.asarray(lo))
        else:
            pos_in = jnp.asarray(pos, dtype)
        pos, vel, energy, guards = run_scan(
            pos_in, jnp.asarray(vel, dtype), box, gvals,
            data, int(n_steps) // K, int(n_steps) % K)
        guards = np.asarray(guards)
        ov_cell = int(guards[0])
        dmax = float(guards[1])
        if ov_cell > 0:
            raise OpenMMException(
                f"Cell-list capacity overflow ({ov_cell} atoms dropped): "
                "the density fluctuation exceeded the static cell capacity. "
                "Rebuild with a larger cell_capacity.")
        if float(dmax) > disp_limit2:
            raise OpenMMException(
                "Neighbor-list skin violation: an atom moved "
                f"{float(dmax) ** 0.5:.4f} nm between rebuilds "
                f"(> skin/2 = {0.5 * skin:.4f} nm). Reduce reuse_steps.")
        if mixed_precision:
            # one-time f64 reconstruction per run() call ON DEVICE: a single
            # (n, 3) f64 add costs ~0.3 ms once per chunk, while fetching
            # hi/lo to the host costs two extra ~50 ms tunnel round trips
            hi, lo = pos
            pos = _ds_join(hi, lo)
        return pos, vel, energy

    run.config = dict(reuse_steps=K, skin=skin,
                      mixed_precision=bool(mixed_precision),
                      **{k: v for k, v in cfg.items()
                         if k in ("counts", "capacity", "pme_grid")})
    return run


def _make_md_step_simple(plan, integrate, dt, dtype, block_size, bond_forces,
                         cell_capacity, lam_source, mixed_precision=False):
    """Fallback: per-step rebuild via the generic engine (small / nonperiodic
    systems where the fused slot engine does not apply).  ``integrate`` is
    the (possibly mixed-precision) integrator; with mixed precision the
    position carry is a double-single (hi, lo) f32 pair and forces are
    evaluated at ``dtype``."""
    compute = engine_mod.make_compute(plan, True, True, block_size=block_size,
                                      cell_capacity=cell_capacity,
                                      with_aux=True)

    def _pos32(pos):
        return pos[0] if mixed_precision else pos.astype(dtype)

    @partial(jax.jit, static_argnums=(5,), donate_argnums=(0, 1))
    def run_scan(pos, vel, box, gvals, data, n_steps):
        def step(carry, _):
            pos, vel, ov = carry
            pos32 = _pos32(pos)
            _, forces, aux = compute(pos32, box, gvals, data)
            if bond_forces is not None:
                forces = forces + bond_forces(pos32)
            pos, vel = integrate(pos, vel, forces)
            return (pos, vel, jnp.maximum(ov, aux["overflow"])), None

        (pos, vel, ov), _ = jax.lax.scan(
            step, (pos, vel, jnp.zeros((), jnp.int32)), None, length=n_steps)
        slice_e, _, aux = compute(_pos32(pos), box, gvals, data)
        ov = jnp.maximum(ov, aux["overflow"])
        lam = slice_lambdas(lam_source, gvals)
        energy = engine_mod.contract_energy(slice_e, lam)
        return pos, vel, energy, ov

    def run(pos, vel, box, gvals, data, n_steps):
        if mixed_precision:
            hi, lo = _ds_split(pos)
            pos_in = (jnp.asarray(hi), jnp.asarray(lo))
        else:
            pos_in = jnp.asarray(pos, dtype)
        pos, vel, energy, ov = run_scan(pos_in, jnp.asarray(vel, dtype),
                                        box, gvals, data, int(n_steps))
        if int(ov) > 0:
            raise OpenMMException(
                f"Cell-list capacity overflow ({int(ov)} atoms dropped) "
                "during the MD scan. Rebuild with a larger cell_capacity.")
        if mixed_precision:
            hi, lo = pos
            pos = _ds_join(hi, lo)
        return pos, vel, energy

    run.config = dict(reuse_steps=1,
                      mixed_precision=bool(mixed_precision))
    return run
