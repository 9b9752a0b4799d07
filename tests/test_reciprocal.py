"""Reciprocal-space behavior tests: testEwaldExceptions
(TestSlicedNonbondedForce.h:947-985), testDirectAndReciprocal (:987-1029),
testChangingParameters (:683-758), testLargeSystem (:494-555) and gradient
consistency of forces vs jax.grad."""

import math

import numpy as np
import pytest

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.utils.constants import ONE_4PI_EPS0

from conftest import (assert_energy, assert_equal_to, assert_equal_vec,
                      assert_forces, assert_forces_and_energy)

TOL = 1e-4
REFERENCE = nbs.Platform.getPlatformByName("Reference")


def test_ewald_exceptions():
    # LJPME: adding a periodic exception changes the energy by the analytic delta
    system = nbs.System()
    for _ in range(4):
        system.addParticle(1.0)
    system.setDefaultPeriodicBoxVectors((2, 0, 0), (0, 2, 0), (0, 0, 2))
    force = nbs.SlicedNonbondedForce(1)
    system.addForce(force)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.LJPME)
    force.setCutoffDistance(1.0)
    force.addParticle(1.0, 0.5, 1.0)
    force.addParticle(1.0, 0.5, 1.0)
    force.addParticle(-1.0, 0.5, 1.0)
    force.addParticle(-1.0, 0.5, 1.0)
    positions = [(0, 0, 0), (1.5, 0, 0), (0, 0.5, 0.5), (0.2, 1.3, 0)]
    context = nbs.Context(system, nbs.VerletIntegrator(0.001), REFERENCE)
    context.setPositions(positions)
    e1 = context.getState(getEnergy=True).getPotentialEnergy()

    force.addException(0, 1, 0.2, 0.8, 2.0)
    force.setExceptionsUsePeriodicBoundaryConditions(True)
    context.reinitialize(True)
    e2 = context.getState(getEnergy=True).getPotentialEnergy()
    r = 0.5
    expected = (ONE_4PI_EPS0 * (0.2 - 1.0) / r
                + 4 * 2.0 * ((0.8 / r) ** 12 - (0.8 / r) ** 6)
                - 4 * 1.0 * ((0.5 / r) ** 12 - (0.5 / r) ** 6))
    assert_equal_to(expected, e2 - e1, 1e-4)


def test_direct_and_reciprocal():
    system = nbs.System()
    for _ in range(4):
        system.addParticle(1.0)
    system.setDefaultPeriodicBoxVectors((2, 0, 0), (0, 2, 0), (0, 0, 2))
    force = nbs.SlicedNonbondedForce(1)
    system.addForce(force)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.setCutoffDistance(1.0)
    force.setReciprocalSpaceForceGroup(1)
    force.addParticle(1.0, 0.5, 1.0)
    force.addParticle(1.0, 0.5, 1.0)
    force.addParticle(-1.0, 0.5, 1.0)
    force.addParticle(-1.0, 0.5, 1.0)
    force.addException(0, 2, -2.0, 0.5, 3.0)
    positions = [(0, 0, 0), (1.5, 0, 0), (0, 0.5, 0.5), (0.2, 1.3, 0)]
    context = nbs.Context(system, nbs.VerletIntegrator(0.001), REFERENCE)
    context.setPositions(positions)

    e1 = context.getState(getEnergy=True).getPotentialEnergy()
    e2 = context.getState(getEnergy=True, groups={0}).getPotentialEnergy()
    e3 = context.getState(getEnergy=True, groups={1}).getPotentialEnergy()
    assert_equal_to(e1, e2 + e3, 1e-4)
    assert e2 != 0
    assert e3 != 0

    force.setIncludeDirectSpace(False)
    context.reinitialize(True)
    e4 = context.getState(getEnergy=True).getPotentialEnergy()
    assert_equal_to(e3, e4, 1e-4)


def _molecular_system(num_molecules=100, box_size=10.0, method=None,
                      cutoff=2.0, seed=0):
    num_particles = num_molecules * 2
    system = nbs.System()
    for _ in range(num_particles):
        system.addParticle(1.0)
    system.setDefaultPeriodicBoxVectors((box_size, 0, 0), (0, box_size, 0),
                                        (0, 0, box_size))
    nonbonded = nbs.SlicedNonbondedForce(1)
    positions = np.zeros((num_particles, 3))
    M = int(num_molecules ** (1 / 3))
    if M ** 3 < num_molecules:
        M += 1
    for k in range(num_molecules):
        iz = k // (M * M)
        iy = (k - iz * M * M) // M
        ix = k - M * (iy + iz * M)
        x = (ix + 0.5) * box_size / M
        y = (iy + 0.5) * box_size / M
        z = (iz + 0.5) * box_size / M
        dx = (0.5 - ix % 2) / 2
        dy = (0.5 - iy % 2) / 2
        dz = (0.5 - iz % 2) / 2
        if k < num_molecules / 2:
            nonbonded.addParticle(-1.0, 0.2, 0.1)
            nonbonded.addParticle(1.0, 0.1, 0.1)
        else:
            nonbonded.addParticle(-1.0, 0.2, 0.2)
            nonbonded.addParticle(1.0, 0.1, 0.2)
        positions[2 * k] = (x + dx, y + dy, z + dz)
        positions[2 * k + 1] = (x - dx, y - dy, z - dz)
        nonbonded.addException(2 * k, 2 * k + 1, 0.0, 0.15, 0.0)
    if method is not None:
        nonbonded.setNonbondedMethod(method)
        nonbonded.setCutoffDistance(cutoff)
    return system, nonbonded, positions


def test_changing_parameters():
    # PME n=1 sliced vs unsliced oracle, direct and reciprocal groups,
    # then update parameters in place (TestSlicedNonbondedForce.h:683-758)
    system, nonbonded, positions = _molecular_system(
        num_molecules=216, box_size=20.0, method=nbs.NonbondedForce.PME,
        cutoff=2.0)
    nonbonded.setForceGroup(0)
    nonbonded.setReciprocalSpaceForceGroup(2)
    system.addForce(nonbonded)
    sliced = nbs.SlicedNonbondedForce(nonbonded, 1)
    sliced.setForceGroup(1)
    sliced.setReciprocalSpaceForceGroup(3)
    system.addForce(sliced)

    context = nbs.Context(system, nbs.VerletIntegrator(0.01), REFERENCE)
    context.setPositions(positions)
    s1 = context.getState(getForces=True, getEnergy=True, groups={0})
    s2 = context.getState(getForces=True, getEnergy=True, groups={1})
    assert_energy(s1, s2, TOL)
    assert_forces(s1, s2, TOL)
    s3 = context.getState(getForces=True, getEnergy=True, groups={2})
    s4 = context.getState(getForces=True, getEnergy=True, groups={3})
    assert_energy(s3, s4, TOL)
    assert_forces(s3, s4, TOL)

    for i in range(0, nonbonded.getNumParticles(), 5):
        charge, sigma, epsilon = nonbonded.getParticleParameters(i)
        nonbonded.setParticleParameters(i, 1.5 * charge, 1.1 * sigma, 1.7 * epsilon)
        charge, sigma, epsilon = sliced.getParticleParameters(i)
        sliced.setParticleParameters(i, 1.5 * charge, 1.1 * sigma, 1.7 * epsilon)
    nonbonded.updateParametersInContext(context)
    sliced.updateParametersInContext(context)
    assert_forces_and_energy(context, TOL)


@pytest.mark.parametrize("method", [nbs.NonbondedForce.NoCutoff,
                                    nbs.NonbondedForce.CutoffNonPeriodic,
                                    nbs.NonbondedForce.CutoffPeriodic])
def test_large_system(method):
    # 1200 particles; n=1 sliced copy must match the original in the same
    # context via force groups (TestSlicedNonbondedForce.h:494-555)
    system, nonbonded, positions = _molecular_system(
        num_molecules=600, box_size=20.0,
        method=method if method != nbs.NonbondedForce.NoCutoff else None)
    nonbonded.setForceGroup(0)
    system.addForce(nonbonded)
    sliced = nbs.SlicedNonbondedForce(nonbonded, 1)
    sliced.setForceGroup(1)
    system.addForce(sliced)
    context = nbs.Context(system, nbs.VerletIntegrator(0.01), REFERENCE)
    context.setPositions(positions)
    assert_forces_and_energy(context, TOL)


@pytest.mark.parametrize("method", [nbs.NonbondedForce.CutoffPeriodic,
                                    nbs.NonbondedForce.PME,
                                    nbs.NonbondedForce.LJPME])
def test_forces_match_energy_gradient(method):
    # forces are computed analytically; they must equal -dE/dx from autodiff
    import jax
    import jax.numpy as jnp
    from nonbondedslicing_tpu.ops import engine as engine_mod
    from nonbondedslicing_tpu.ops import plan as plan_mod
    from nonbondedslicing_tpu.ops.params import slice_lambdas

    system, nonbonded, positions = _molecular_system(
        num_molecules=27, box_size=6.0, method=method, cutoff=1.2)
    sliced = nbs.SlicedNonbondedForce(nonbonded, 2)
    for k in range(sliced.getNumParticles()):
        if k % 3 == 0:
            sliced.setParticleSubset(k, 1)
    sliced.addGlobalParameter("lam", 0.7)
    sliced.addScalingParameter("lam", 0, 1, True, True)
    plan = plan_mod.build_plan(sliced, system)
    data = engine_mod.plan_data(plan)
    compute = engine_mod.make_compute(plan, True, True)
    gvals = jnp.asarray([0.7])
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()))

    def energy_fn(pos):
        slice_e, _ = compute(pos, box, gvals, data)
        lam = slice_lambdas(plan.lam_source, gvals)
        return engine_mod.contract_energy(slice_e, lam)

    pos = jnp.asarray(positions)
    _, forces = compute(pos, box, gvals, data)
    grad = jax.grad(energy_fn)(pos)
    np.testing.assert_allclose(np.asarray(forces), -np.asarray(grad),
                               rtol=1e-8, atol=1e-8)
