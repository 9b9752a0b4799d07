"""PME under triclinic boxes and under runtime box changes.

The reference inherits triclinic PME from OpenMM and only brute-force-checks
the cutoff methods (TestSlicedNonbondedForce.h:432-492); these tests exceed
that by checking PME force consistency in a genuinely triclinic box and that
a Context evaluates PME correctly when the runtime box differs from the
plan's default box (which would catch any accidental box0 baking — the MD
fastpath legitimately bakes box0 and *raises* on mismatch instead).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops import engine as engine_mod
from nonbondedslicing_tpu.ops import plan as plan_mod
from nonbondedslicing_tpu.ops.params import slice_lambdas
from nonbondedslicing_tpu.runtime.fastpath import make_md_step


def _triclinic_system(method, n=96, seed=9):
    rng = np.random.default_rng(seed)
    system = nbs.System()
    # reduced-form triclinic box (a along x, b in xy)
    box = np.array([[3.6, 0.0, 0.0],
                    [1.1, 3.4, 0.0],
                    [-0.8, 1.2, 3.2]])
    system.setDefaultPeriodicBoxVectors(*[tuple(v) for v in box])
    force = nbs.SlicedNonbondedForce(2)
    force.setNonbondedMethod(method)
    force.setCutoffDistance(1.1)
    for i in range(n):
        system.addParticle(16.0)
        force.addParticle(0.3 * (-1) ** i, 0.29, 0.4)
        force.setParticleSubset(i, i % 2)
    force.addGlobalParameter("lam", 0.7)
    force.addScalingParameter("lam", 0, 1, True, True)
    force.addEnergyParameterDerivative("lam")
    system.addForce(force)
    positions = rng.random((n, 3)) @ box
    return system, force, positions, box


@pytest.mark.parametrize("method", [nbs.SlicedNonbondedForce.PME,
                                    nbs.SlicedNonbondedForce.LJPME])
def test_triclinic_pme_force_consistency(method):
    """Forces = -dE/dx by central differences in a triclinic box (f64)."""
    system, force, positions, box = _triclinic_system(method)
    plan = plan_mod.build_plan(force, system)
    data = engine_mod.plan_data(plan)
    compute = engine_mod.make_compute(plan, True, True, neighbor="all_pairs")
    box_arr = jnp.asarray(box)
    gvals = jnp.asarray([0.7])

    def energy(p):
        se, _ = compute(p, box_arr, gvals, data)
        lam = slice_lambdas(plan.lam_source, gvals)
        return engine_mod.contract_energy(se, lam)

    pos = jnp.asarray(positions)
    _, forces = compute(pos, box_arr, gvals, data)
    h = 1e-5
    rng = np.random.default_rng(0)
    for atom in rng.integers(0, positions.shape[0], 4):
        for d in range(3):
            dp = np.zeros_like(positions)
            dp[atom, d] = h
            e_p = float(energy(jnp.asarray(positions + dp)))
            e_m = float(energy(jnp.asarray(positions - dp)))
            num = -(e_p - e_m) / (2 * h)
            ana = float(forces[atom, d])
            assert abs(num - ana) < 1e-4 * max(abs(ana), 1.0), \
                (atom, d, num, ana)


def test_triclinic_pme_lambda_identities():
    """E(lam) linearity holds in triclinic PME: E(1)-E(0) == dE/dlam."""
    system, force, positions, box = _triclinic_system(
        nbs.SlicedNonbondedForce.PME)
    ctx = nbs.Context(system, nbs.VerletIntegrator(0.001),
                      nbs.Platform.getPlatformByName("Reference"))
    ctx.setPositions(positions)
    ctx.setParameter("lam", 1.0)
    st = ctx.getState(getEnergy=True, getParameterDerivatives=True)
    e1, d = st.getPotentialEnergy(), st.getEnergyParameterDerivatives()["lam"]
    ctx.setParameter("lam", 0.0)
    e0 = ctx.getState(getEnergy=True).getPotentialEnergy()
    assert abs((e1 - e0) - d) < 1e-9 * max(abs(d), 1.0)


def test_pme_with_runtime_box_change():
    """Context PME with a runtime box != default box must equal a fresh
    Context built with that box as its default (no box0 baking)."""
    rng = np.random.default_rng(4)
    n = 120

    def build(box):
        system = nbs.System()
        system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0),
                                            (0, 0, box))
        force = nbs.SlicedNonbondedForce(2)
        force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
        force.setCutoffDistance(1.0)
        # pin PME params so both boxes use identical alpha/grid
        force.setPMEParameters(3.0, 27, 27, 27)
        for i in range(n):
            system.addParticle(16.0)
            force.addParticle(0.25 * (-1) ** i, 0.3, 0.35)
            force.setParticleSubset(i, i % 2)
        system.addForce(force)
        return system, force

    box0, box1 = 3.6, 3.9
    positions = rng.random((n, 3)) * box0 * 0.95 + 0.05

    system_a, _ = build(box0)
    ctx_a = nbs.Context(system_a, nbs.VerletIntegrator(0.001),
                        nbs.Platform.getPlatformByName("Reference"))
    ctx_a.setPositions(positions)
    ctx_a.setPeriodicBoxVectors((box1, 0, 0), (0, box1, 0), (0, 0, box1))
    e_changed = ctx_a.getState(getEnergy=True).getPotentialEnergy()
    f_changed = np.asarray(ctx_a.getState(getForces=True).getForces())

    system_b, _ = build(box1)
    ctx_b = nbs.Context(system_b, nbs.VerletIntegrator(0.001),
                        nbs.Platform.getPlatformByName("Reference"))
    ctx_b.setPositions(positions)
    e_fresh = ctx_b.getState(getEnergy=True).getPotentialEnergy()
    f_fresh = np.asarray(ctx_b.getState(getForces=True).getForces())

    assert abs(e_changed - e_fresh) < 1e-9 * max(abs(e_fresh), 1.0)
    np.testing.assert_allclose(f_changed, f_fresh, rtol=1e-9, atol=1e-12)


def test_box_shrink_below_cell_grid_raises():
    """Shrinking the runtime box below the default-box cell grid must raise,
    not silently drop pairs (the grid is sized from the default box)."""
    rng = np.random.default_rng(1)
    n = 1400  # above the cell-list threshold
    box = 4.5
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(2)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffPeriodic)
    force.setCutoffDistance(1.0)
    for i in range(n):
        system.addParticle(16.0)
        force.addParticle(0.1 * (-1) ** i, 0.3, 0.3)
        force.setParticleSubset(i, i % 2)
    system.addForce(force)
    ctx = nbs.Context(system, nbs.VerletIntegrator(0.001),
                      nbs.Platform.getPlatformByName("Reference"))
    ctx.setPositions(rng.random((n, 3)) * box)
    # still >= 2*cutoff, but cell width shrinks to 3.9/4 = 0.975 < cutoff
    shrunk = 3.9
    ctx.setPeriodicBoxVectors((shrunk, 0, 0), (0, shrunk, 0), (0, 0, shrunk))
    with pytest.raises(nbs.OpenMMException):
        ctx.getState(getEnergy=True)


def test_fastpath_rejects_non_default_box():
    """The MD fastpath bakes box0 into cell sizing + PME eterm; any other
    runtime box must be rejected loudly."""
    from tests.test_fused import _system
    system, force, positions = _system(nbs.SlicedNonbondedForce.PME,
                                       n_mol=200)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    masses = np.tile([16.0, 1.0], 200)
    run = make_md_step(plan, masses, dt=1e-6, dtype=dtype)
    pos = jnp.asarray(positions, dtype)
    vel = jnp.zeros_like(pos)
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()), dtype)
    gvals = jnp.asarray([0.8], dtype)
    with pytest.raises(nbs.OpenMMException):
        run(pos, vel, box * 1.02, gvals, data, 2)
