"""Two independent SlicedNonbondedForce instances in one system, evaluated
per force group and together; behavior mirror of testTwoForces
(tests/TestSlicedNonbondedForce.h:815-881).  Plus a determinism check:
repeated evaluation of an identical state must be bitwise equal (the XLA
program is deterministic; the reference's analogue is testDeterministicForces,
platforms/cuda/tests/TestCudaSlicedNonbondedForce.cpp:109-141)."""

import numpy as np

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.utils.constants import ONE_4PI_EPS0

from conftest import assert_equal_to

TOL = 1e-4
REFERENCE = nbs.Platform.getPlatformByName("Reference")


def _lj(sigma, eps, r):
    return 4.0 * eps * ((sigma / r) ** 12 - (sigma / r) ** 6)


def test_two_forces():
    system = nbs.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    nb1 = nbs.SlicedNonbondedForce(1)
    nb1.addParticle(-1.5, 1.0, 1.2)
    nb1.addParticle(0.5, 1.0, 1.0)
    system.addForce(nb1)
    nb2 = nbs.SlicedNonbondedForce(1)
    nb2.addParticle(0.4, 1.4, 0.5)
    nb2.addParticle(0.3, 1.8, 1.0)
    nb2.setForceGroup(1)
    system.addForce(nb2)
    context = nbs.Context(system, nbs.VerletIntegrator(0.01), REFERENCE)
    context.setPositions([(0.0, 0.0, 0.0), (1.5, 0.0, 0.0)])

    e1 = context.getState(getEnergy=True, groups=1 << 0).getPotentialEnergy()
    assert_equal_to(ONE_4PI_EPS0 * (-1.5 * 0.5) / 1.5
                    + _lj(1.0, np.sqrt(1.2 * 1.0), 1.5), e1, TOL)
    e2 = context.getState(getEnergy=True, groups=1 << 1).getPotentialEnergy()
    assert_equal_to(ONE_4PI_EPS0 * (0.4 * 0.3) / 1.5
                    + _lj(1.6, np.sqrt(0.5 * 1.0), 1.5), e2, TOL)
    e = context.getState(getEnergy=True).getPotentialEnergy()
    assert_equal_to(e1 + e2, e, TOL)

    # modify each force independently; updateParametersInContext must keep
    # the two evaluations separate and correct
    nb1.setParticleParameters(0, -1.2, 1.1, 1.4)
    nb1.updateParametersInContext(context)
    nb2.setParticleParameters(0, 0.5, 1.6, 0.6)
    nb2.updateParametersInContext(context)
    e1 = context.getState(getEnergy=True, groups=1 << 0).getPotentialEnergy()
    assert_equal_to(ONE_4PI_EPS0 * (-1.2 * 0.5) / 1.5
                    + _lj(1.05, np.sqrt(1.4 * 1.0), 1.5), e1, TOL)
    e2 = context.getState(getEnergy=True, groups=1 << 1).getPotentialEnergy()
    assert_equal_to(ONE_4PI_EPS0 * (0.5 * 0.3) / 1.5
                    + _lj(1.7, np.sqrt(0.6 * 1.0), 1.5), e2, TOL)

    # the same system with both forces switched to PME: the group-by-group
    # energies must still sum to the full evaluation
    nb1.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    nb2.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    context.reinitialize(preserveState=True)
    e1 = context.getState(getEnergy=True, groups=1 << 0).getPotentialEnergy()
    e2 = context.getState(getEnergy=True, groups=1 << 1).getPotentialEnergy()
    e = context.getState(getEnergy=True).getPotentialEnergy()
    assert_equal_to(e1 + e2, e, TOL)


def test_deterministic_forces():
    """Two evaluations of the identical state are bitwise equal."""
    rng = np.random.default_rng(11)
    system = nbs.System()
    box = 3.2
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(2)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.setCutoffDistance(1.0)
    n = 120
    for i in range(n):
        system.addParticle(16.0)
        force.addParticle((-1.0) ** i * 0.35, 0.3, 0.4)
        force.setParticleSubset(i, i % 2)
    system.addForce(force)
    context = nbs.Context(system, nbs.VerletIntegrator(0.001), REFERENCE)
    positions = rng.random((n, 3)) * box
    context.setPositions(positions)
    f1 = context.getState(getForces=True).getForces()
    # force a fresh evaluation of the same positions
    context.setPositions(positions)
    f2 = context.getState(getForces=True).getForces()
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
