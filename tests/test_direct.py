"""Direct-space analytic tests, ported from the reference C++ test spec
(/root/reference/tests/TestSlicedNonbondedForce.h): testCoulomb, testLJ,
testExclusionsAnd14, testCutoff, testCutoff14, testPeriodic,
testPeriodicExceptions, testTriclinic, testSwitchingFunction, testTwoForces,
testParameterOffsets, testDispersionCorrection."""

import math

import numpy as np
import pytest

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.utils.constants import ONE_4PI_EPS0

from conftest import assert_equal_to, assert_equal_vec

TOL = 1e-4
REFERENCE = nbs.Platform.getPlatformByName("Reference")


def make_context(system, dt=0.01):
    return nbs.Context(system, nbs.VerletIntegrator(dt), REFERENCE)


def test_coulomb():
    # TestSlicedNonbondedForce.h:87-109
    system = nbs.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    force = nbs.SlicedNonbondedForce(1)
    force.addParticle(0.5, 1, 0)
    force.addParticle(-1.5, 1, 0)
    system.addForce(force)
    assert not force.usesPeriodicBoundaryConditions()
    assert not system.usesPeriodicBoundaryConditions()
    context = make_context(system)
    context.setPositions([(0, 0, 0), (2, 0, 0)])
    state = context.getState(getForces=True, getEnergy=True)
    forces = state.getForces()
    f = ONE_4PI_EPS0 * (-0.75) / 4.0
    assert_equal_vec((-f, 0, 0), forces[0], TOL)
    assert_equal_vec((f, 0, 0), forces[1], TOL)
    assert_equal_to(ONE_4PI_EPS0 * (-0.75) / 2.0, state.getPotentialEnergy(), TOL)


def test_lj():
    # TestSlicedNonbondedForce.h:111-135
    system = nbs.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    force = nbs.SlicedNonbondedForce(1)
    force.addParticle(0, 1.2, 1)
    force.addParticle(0, 1.4, 2)
    system.addForce(force)
    context = make_context(system)
    context.setPositions([(0, 0, 0), (2, 0, 0)])
    state = context.getState(getForces=True, getEnergy=True)
    forces = state.getForces()
    x = 1.3 / 2.0
    eps = math.sqrt(2.0)
    f = 4.0 * eps * (12 * x**12 - 6 * x**6) / 2.0
    assert_equal_vec((-f, 0, 0), forces[0], TOL)
    assert_equal_vec((f, 0, 0), forces[1], TOL)
    assert_equal_to(4.0 * eps * (x**12 - x**6), state.getPotentialEnergy(), TOL)


def _find_exception(force, a, b):
    for i in range(force.getNumExceptions()):
        p1, p2, *_ = force.getExceptionParameters(i)
        if {p1, p2} == {a, b}:
            return i
    raise AssertionError("exception not found")


def test_exclusions_and_14():
    # TestSlicedNonbondedForce.h:137-222
    system = nbs.System()
    sliced = nbs.SlicedNonbondedForce(1)
    for _ in range(5):
        system.addParticle(1.0)
        sliced.addParticle(0, 1.5, 0)
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4)]
    sliced.createExceptionsFromBonds(bonds, 0.0, 0.0)
    first14 = _find_exception(sliced, 0, 3)
    second14 = _find_exception(sliced, 1, 4)
    system.addForce(sliced)
    for i in range(1, 5):
        positions = [(0, j, 0) for j in range(5)]
        for j in range(5):
            sliced.setParticleParameters(j, 0, 1.5, 0)
        sliced.setParticleParameters(0, 0, 1.5, 1)
        sliced.setParticleParameters(i, 0, 1.5, 1)
        sliced.setExceptionParameters(first14, 0, 3, 0, 1.5, 0.5 if i == 3 else 0.0)
        sliced.setExceptionParameters(second14, 1, 4, 0, 1.5, 0.0)
        r = 1.0
        positions[i] = (r, 0, 0)
        context = make_context(system)
        context.setPositions(positions)
        state = context.getState(getForces=True, getEnergy=True)
        forces = state.getForces()
        x = 1.5 / r
        force = 4.0 * (12 * x**12 - 6 * x**6) / r
        energy = 4.0 * (x**12 - x**6)
        if i == 3:
            force *= 0.5
            energy *= 0.5
        if i < 3:
            force = 0
            energy = 0
        assert_equal_vec((-force, 0, 0), forces[0], TOL)
        assert_equal_vec((force, 0, 0), forces[i], TOL)
        assert_equal_to(energy, state.getPotentialEnergy(), TOL)

        # Coulomb part
        sliced.setParticleParameters(0, 2, 1.5, 0)
        sliced.setParticleParameters(i, 2, 1.5, 0)
        sliced.setExceptionParameters(first14, 0, 3, 4 / 1.2 if i == 3 else 0, 1.5, 0)
        sliced.setExceptionParameters(second14, 1, 4, 0, 1.5, 0)
        context = make_context(system)
        context.setPositions(positions)
        state = context.getState(getForces=True, getEnergy=True)
        forces2 = state.getForces()
        force = ONE_4PI_EPS0 * 4 / (r * r)
        energy = ONE_4PI_EPS0 * 4 / r
        if i == 3:
            force /= 1.2
            energy /= 1.2
        if i < 3:
            force = 0
            energy = 0
        assert_equal_vec((-force, 0, 0), forces2[0], TOL)
        assert_equal_vec((force, 0, 0), forces2[i], TOL)
        assert_equal_to(energy, state.getPotentialEnergy(), TOL)


def test_cutoff():
    # TestSlicedNonbondedForce.h:224-260
    system = nbs.System()
    for _ in range(3):
        system.addParticle(1.0)
    force = nbs.SlicedNonbondedForce(1)
    for _ in range(3):
        force.addParticle(1.0, 1, 0)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffNonPeriodic)
    cutoff = 2.9
    force.setCutoffDistance(cutoff)
    eps = 50.0
    force.setReactionFieldDielectric(eps)
    system.addForce(force)
    context = make_context(system)
    context.setPositions([(0, 0, 0), (0, 2, 0), (0, 3, 0)])
    state = context.getState(getForces=True, getEnergy=True)
    forces = state.getForces()
    krf = (1.0 / cutoff**3) * (eps - 1.0) / (2.0 * eps + 1.0)
    crf = (1.0 / cutoff) * (3.0 * eps) / (2.0 * eps + 1.0)
    force1 = ONE_4PI_EPS0 * (0.25 - 2.0 * krf * 2.0)
    force2 = ONE_4PI_EPS0 * (1.0 - 2.0 * krf * 1.0)
    assert_equal_vec((0, -force1, 0), forces[0], TOL)
    assert_equal_vec((0, force1 - force2, 0), forces[1], TOL)
    assert_equal_vec((0, force2, 0), forces[2], TOL)
    energy1 = ONE_4PI_EPS0 * (0.5 + krf * 4.0 - crf)
    energy2 = ONE_4PI_EPS0 * (1.0 + krf * 1.0 - crf)
    assert_equal_to(energy1 + energy2, state.getPotentialEnergy(), TOL)


def test_cutoff14():
    # TestSlicedNonbondedForce.h:262-356
    system = nbs.System()
    sliced = nbs.SlicedNonbondedForce(1)
    sliced.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffNonPeriodic)
    for _ in range(5):
        system.addParticle(1.0)
        sliced.addParticle(0, 1.5, 0)
    cutoff = 3.5
    sliced.setCutoffDistance(cutoff)
    sliced.setReactionFieldDielectric(30.0)
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4)]
    sliced.createExceptionsFromBonds(bonds, 0.0, 0.0)
    first14 = _find_exception(sliced, 0, 3)
    second14 = _find_exception(sliced, 1, 4)
    system.addForce(sliced)
    positions = [(0, 0, 0), (1, 0, 0), (2, 0, 0), (3, 0, 0), (4, 0, 0)]
    for i in range(1, 5):
        sliced.setParticleParameters(0, 0, 1.5, 1)
        for j in range(1, 5):
            sliced.setParticleParameters(j, 0, 1.5, 0)
        sliced.setParticleParameters(i, 0, 1.5, 1)
        sliced.setExceptionParameters(first14, 0, 3, 0, 1.5, 0.5 if i == 3 else 0.0)
        sliced.setExceptionParameters(second14, 1, 4, 0, 1.5, 0.0)
        context = make_context(system)
        context.setPositions(positions)
        state = context.getState(getForces=True, getEnergy=True)
        forces = state.getForces()
        r = positions[i][0]
        x = 1.5 / r
        force = 4.0 * (12 * x**12 - 6 * x**6) / r
        energy = 4.0 * (x**12 - x**6)
        if i == 3:
            force *= 0.5
            energy *= 0.5
        if i < 3 or r > cutoff:
            force = 0
            energy = 0
        assert_equal_vec((-force, 0, 0), forces[0], TOL)
        assert_equal_vec((force, 0, 0), forces[i], TOL)
        assert_equal_to(energy, state.getPotentialEnergy(), TOL)

        q = 0.7
        sliced.setParticleParameters(0, q, 1.5, 0)
        sliced.setParticleParameters(i, q, 1.5, 0)
        sliced.setExceptionParameters(first14, 0, 3, q * q / 1.2 if i == 3 else 0, 1.5, 0)
        sliced.setExceptionParameters(second14, 1, 4, 0, 1.5, 0)
        context = make_context(system)
        context.setPositions(positions)
        state = context.getState(getForces=True, getEnergy=True)
        forces2 = state.getForces()
        force = ONE_4PI_EPS0 * q * q / (r * r)
        energy = ONE_4PI_EPS0 * q * q / r
        if i == 3:
            force /= 1.2
            energy /= 1.2
        if i < 3 or r > cutoff:
            force = 0
            energy = 0
        assert_equal_vec((-force, 0, 0), forces2[0], TOL)
        assert_equal_vec((force, 0, 0), forces2[i], TOL)
        assert_equal_to(energy, state.getPotentialEnergy(), TOL)


def test_periodic():
    # TestSlicedNonbondedForce.h:358-392
    system = nbs.System()
    for _ in range(3):
        system.addParticle(1.0)
    sliced = nbs.SlicedNonbondedForce(1)
    for _ in range(3):
        sliced.addParticle(1.0, 1, 0)
    sliced.addException(0, 1, 0.0, 1.0, 0.0)
    sliced.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffPeriodic)
    cutoff = 2.0
    sliced.setCutoffDistance(cutoff)
    system.setDefaultPeriodicBoxVectors((4, 0, 0), (0, 4, 0), (0, 0, 4))
    system.addForce(sliced)
    assert sliced.usesPeriodicBoundaryConditions()
    assert system.usesPeriodicBoundaryConditions()
    context = make_context(system)
    context.setPositions([(0, 0, 0), (2, 0, 0), (3, 0, 0)])
    state = context.getState(getForces=True, getEnergy=True)
    forces = state.getForces()
    eps = 78.3
    krf = (1.0 / cutoff**3) * (eps - 1.0) / (2.0 * eps + 1.0)
    crf = (1.0 / cutoff) * (3.0 * eps) / (2.0 * eps + 1.0)
    force = ONE_4PI_EPS0 * (1.0 - 2.0 * krf * 1.0)
    assert_equal_vec((force, 0, 0), forces[0], TOL)
    assert_equal_vec((-force, 0, 0), forces[1], TOL)
    assert_equal_vec((0, 0, 0), forces[2], TOL)
    assert_equal_to(2 * ONE_4PI_EPS0 * (1.0 + krf * 1.0 - crf),
                    state.getPotentialEnergy(), TOL)


def test_periodic_exceptions():
    # TestSlicedNonbondedForce.h:394-430
    system = nbs.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    sliced = nbs.SlicedNonbondedForce(1)
    sliced.addParticle(1.0, 1, 0)
    sliced.addParticle(1.0, 1, 0)
    sliced.addException(0, 1, 1.0, 1.0, 0.0)
    sliced.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffPeriodic)
    sliced.setCutoffDistance(2.0)
    system.setDefaultPeriodicBoxVectors((4, 0, 0), (0, 4, 0), (0, 0, 4))
    system.addForce(sliced)
    context = make_context(system)
    context.setPositions([(0, 0, 0), (3, 0, 0)])
    state = context.getState(getForces=True, getEnergy=True)
    forces = state.getForces()
    force = ONE_4PI_EPS0 / 9
    assert_equal_vec((-force, 0, 0), forces[0], TOL)
    assert_equal_vec((force, 0, 0), forces[1], TOL)
    assert_equal_to(ONE_4PI_EPS0 / 3, state.getPotentialEnergy(), TOL)

    sliced.setExceptionsUsePeriodicBoundaryConditions(True)
    context.reinitialize(True)
    state = context.getState(getForces=True, getEnergy=True)
    forces = state.getForces()
    force = ONE_4PI_EPS0
    assert_equal_vec((force, 0, 0), forces[0], TOL)
    assert_equal_vec((-force, 0, 0), forces[1], TOL)
    assert_equal_to(ONE_4PI_EPS0, state.getPotentialEnergy(), TOL)


def test_triclinic():
    # TestSlicedNonbondedForce.h:432-492
    system = nbs.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    a = np.array([3.1, 0, 0])
    b = np.array([0.4, 3.5, 0])
    c = np.array([-0.1, -0.5, 4.0])
    system.setDefaultPeriodicBoxVectors(a, b, c)
    sliced = nbs.SlicedNonbondedForce(1)
    sliced.addParticle(1.0, 1, 0)
    sliced.addParticle(1.0, 1, 0)
    sliced.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffPeriodic)
    cutoff = 1.5
    sliced.setCutoffDistance(cutoff)
    system.addForce(sliced)
    context = make_context(system)
    eps = 78.3
    krf = (1.0 / cutoff**3) * (eps - 1.0) / (2.0 * eps + 1.0)
    crf = (1.0 / cutoff) * (3.0 * eps) / (2.0 * eps + 1.0)
    rng = np.random.default_rng(0)
    for _ in range(50):
        positions = [a * rng.random() + b * rng.random() + c * rng.random()
                     for _ in range(2)]
        context.setPositions(positions)
        delta = None
        distance2 = 100.0
        for i in (-1, 0, 1):
            for j in (-1, 0, 1):
                for k in (-1, 0, 1):
                    d = positions[1] - positions[0] + a * i + b * j + c * k
                    if d @ d < distance2:
                        delta = d
                        distance2 = d @ d
        distance = math.sqrt(distance2)
        state = context.getState(getForces=True, getEnergy=True)
        if distance >= cutoff:
            assert state.getPotentialEnergy() == 0.0
            assert_equal_vec((0, 0, 0), state.getForces()[0], 1e-12)
            assert_equal_vec((0, 0, 0), state.getForces()[1], 1e-12)
        else:
            force = delta * ONE_4PI_EPS0 * (-1.0 / distance**3 + 2.0 * krf)
            assert_equal_to(ONE_4PI_EPS0 * (1.0 / distance + krf * distance2 - crf),
                            state.getPotentialEnergy(), 1e-4)
            assert_equal_vec(force, state.getForces()[0], 1e-4)
            assert_equal_vec(-force, state.getForces()[1], 1e-4)


@pytest.mark.parametrize("method", [nbs.SlicedNonbondedForce.CutoffNonPeriodic,
                                    nbs.SlicedNonbondedForce.PME])
def test_switching_function(method):
    # TestSlicedNonbondedForce.h:760-813
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((6, 0, 0), (0, 6, 0), (0, 0, 6))
    system.addParticle(1.0)
    system.addParticle(1.0)
    sliced = nbs.SlicedNonbondedForce(1)
    sliced.addParticle(0, 1.2, 1)
    sliced.addParticle(0, 1.4, 2)
    sliced.setNonbondedMethod(method)
    sliced.setCutoffDistance(2.0)
    sliced.setUseSwitchingFunction(True)
    sliced.setSwitchingDistance(1.5)
    sliced.setUseDispersionCorrection(False)
    system.addForce(sliced)
    context = make_context(system)
    eps = math.sqrt(2.0)
    r = 1.0
    while r < 2.5:
        positions = [(0, 0, 0), (r, 0, 0)]
        context.setPositions(positions)
        state = context.getState(getForces=True, getEnergy=True)
        x = 1.3 / r
        expected = 4.0 * eps * (x**12 - x**6)
        if r <= 1.5:
            switch_value = 1
        elif r >= 2.0:
            switch_value = 0
        else:
            t = (r - 1.5) / 0.5
            switch_value = 1 + t * t * t * (-10 + t * (15 - t * 6))
        if method == nbs.SlicedNonbondedForce.PME:
            # direct-space LJ only; PME Coulomb contributes nothing (q=0)
            pass
        assert_equal_to(switch_value * expected, state.getPotentialEnergy(), TOL)

        delta = 1e-3
        context.setPositions([(0, 0, 0), (r - delta, 0, 0)])
        e1 = context.getState(getEnergy=True).getPotentialEnergy()
        context.setPositions([(0, 0, 0), (r + delta, 0, 0)])
        e2 = context.getState(getEnergy=True).getPotentialEnergy()
        assert_equal_to((e2 - e1) / (2 * delta), state.getForces()[0][0], 1e-3)
        r += 0.1


def test_two_forces():
    # TestSlicedNonbondedForce.h:815-881
    system = nbs.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    nb1 = nbs.SlicedNonbondedForce(1)
    nb1.addParticle(-1.5, 1, 1.2)
    nb1.addParticle(0.5, 1, 1.0)
    system.addForce(nb1)
    nb2 = nbs.SlicedNonbondedForce(1)
    nb2.addParticle(0.4, 1.4, 0.5)
    nb2.addParticle(0.3, 1.8, 1.0)
    nb2.setForceGroup(1)
    system.addForce(nb2)
    context = make_context(system)
    context.setPositions([(0, 0, 0), (1.5, 0, 0)])
    state1 = context.getState(getEnergy=True, groups={0})
    assert_equal_to(
        ONE_4PI_EPS0 * (-1.5 * 0.5) / 1.5
        + 4.0 * math.sqrt(1.2) * ((1.0 / 1.5)**12 - (1.0 / 1.5)**6),
        state1.getPotentialEnergy(), TOL)
    state2 = context.getState(getEnergy=True, groups={1})
    assert_equal_to(
        ONE_4PI_EPS0 * (0.4 * 0.3) / 1.5
        + 4.0 * math.sqrt(0.5) * ((1.6 / 1.5)**12 - (1.6 / 1.5)**6),
        state2.getPotentialEnergy(), TOL)
    state = context.getState(getEnergy=True)
    assert_equal_to(state1.getPotentialEnergy() + state2.getPotentialEnergy(),
                    state.getPotentialEnergy(), TOL)

    nb1.setParticleParameters(0, -1.2, 1.1, 1.4)
    nb1.updateParametersInContext(context)
    nb2.setParticleParameters(0, 0.5, 1.6, 0.6)
    nb2.updateParametersInContext(context)
    state1 = context.getState(getEnergy=True, groups={0})
    assert_equal_to(
        ONE_4PI_EPS0 * (-1.2 * 0.5) / 1.5
        + 4.0 * math.sqrt(1.4) * ((1.05 / 1.5)**12 - (1.05 / 1.5)**6),
        state1.getPotentialEnergy(), TOL)
    state2 = context.getState(getEnergy=True, groups={1})
    assert_equal_to(
        ONE_4PI_EPS0 * (0.5 * 0.3) / 1.5
        + 4.0 * math.sqrt(0.6) * ((1.7 / 1.5)**12 - (1.7 / 1.5)**6),
        state2.getPotentialEnergy(), TOL)

    # PME consistency between groups
    system.setDefaultPeriodicBoxVectors((4, 0, 0), (0, 4, 0), (0, 0, 4))
    nb1.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    nb2.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    context = make_context(system)
    context.setPositions([(0, 0, 0), (1.5, 0, 0)])
    state1 = context.getState(getEnergy=True, groups={0})
    state2 = context.getState(getEnergy=True, groups={1})
    state = context.getState(getEnergy=True)
    assert_equal_to(state1.getPotentialEnergy() + state2.getPotentialEnergy(),
                    state.getPotentialEnergy(), TOL)


def test_parameter_offsets():
    # TestSlicedNonbondedForce.h:883-945
    system = nbs.System()
    for _ in range(4):
        system.addParticle(1.0)
    force = nbs.SlicedNonbondedForce(1)
    force.addParticle(0.0, 1.0, 0.5)
    force.addParticle(1.0, 0.5, 0.6)
    force.addParticle(-1.0, 2.0, 0.7)
    force.addParticle(0.5, 2.0, 0.8)
    force.addException(0, 3, 0.0, 1.0, 0.0)
    force.addException(2, 3, 0.5, 1.0, 1.5)
    force.addException(0, 1, 1.0, 1.5, 1.0)
    force.addGlobalParameter("p1", 0.0)
    force.addGlobalParameter("p2", 1.0)
    force.addParticleParameterOffset("p1", 0, 3.0, 0.5, 0.5)
    force.addParticleParameterOffset("p2", 1, 1.0, 1.0, 2.0)
    force.addExceptionParameterOffset("p1", 1, 0.5, 0.5, 1.5)
    system.addForce(force)
    context = make_context(system, 0.001)
    context.setPositions([(i, 0, 0) for i in range(4)])
    assert len(context.getParameters()) == 2
    assert context.getParameter("p1") == 0.0
    assert context.getParameter("p2") == 1.0
    context.setParameter("p1", 0.5)
    context.setParameter("p2", 1.5)

    charge = [0.0 + 3.0 * 0.5, 1.0 + 1.0 * 1.5, -1.0, 0.5]
    sigma = [1.0 + 0.5 * 0.5, 0.5 + 1.0 * 1.5, 2.0, 2.0]
    epsilon = [0.5 + 0.5 * 0.5, 0.6 + 2.0 * 1.5, 0.7, 0.8]
    pair_q = {}
    pair_sig = {}
    pair_eps = {}
    for i in range(4):
        for j in range(i + 1, 4):
            pair_q[(i, j)] = charge[i] * charge[j]
            pair_sig[(i, j)] = 0.5 * (sigma[i] + sigma[j])
            pair_eps[(i, j)] = math.sqrt(epsilon[i] * epsilon[j])
    pair_q[(0, 3)], pair_sig[(0, 3)], pair_eps[(0, 3)] = 0.0, 1.0, 0.0
    pair_q[(2, 3)] = 0.5 + 0.5 * 0.5
    pair_sig[(2, 3)] = 1.0 + 0.5 * 0.5
    pair_eps[(2, 3)] = 1.5 + 1.5 * 0.5
    pair_q[(0, 1)], pair_sig[(0, 1)], pair_eps[(0, 1)] = 1.0, 1.5, 1.0

    energy = 0.0
    for i in range(4):
        for j in range(i + 1, 4):
            dist = j - i
            x = pair_sig[(i, j)] / dist
            energy += (ONE_4PI_EPS0 * pair_q[(i, j)] / dist
                       + 4.0 * pair_eps[(i, j)] * (x**12 - x**6))
    assert_equal_to(energy, context.getState(getEnergy=True).getPotentialEnergy(), 1e-4)


def test_dispersion_correction():
    # TestSlicedNonbondedForce.h:614-681
    grid = 5
    num_particles = grid**3
    box_size = grid * 0.7
    cutoff = box_size / 3
    system = nbs.System()
    sliced = nbs.SlicedNonbondedForce(1)
    positions = []
    for i in range(grid):
        for j in range(grid):
            for k in range(grid):
                system.addParticle(1.0)
                sliced.addParticle(0, 1.1, 0.5)
                positions.append((i * box_size / grid, j * box_size / grid,
                                  k * box_size / grid))
    sliced.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffPeriodic)
    sliced.setCutoffDistance(cutoff)
    system.setDefaultPeriodicBoxVectors((box_size, 0, 0), (0, box_size, 0),
                                        (0, 0, box_size))
    system.addForce(sliced)
    context = make_context(system)
    context.setPositions(positions)
    energy1 = context.getState(getEnergy=True).getPotentialEnergy()
    sliced.setUseDispersionCorrection(False)
    context.reinitialize()
    context.setPositions(positions)
    energy2 = context.getState(getEnergy=True).getPotentialEnergy()
    term1 = (0.5 * 1.1**12 / cutoff**9) / 9
    term2 = (0.5 * 1.1**6 / cutoff**3) / 3
    expected = 8 * math.pi * num_particles**2 * (term1 - term2) / box_size**3
    assert_equal_to(expected, energy1 - energy2, 1e-4)

    # half the particles different
    num_type2 = 0
    for i in range(0, num_particles, 2):
        sliced.setParticleParameters(i, 0, 1, 1)
        num_type2 += 1
    num_type1 = num_particles - num_type2
    sliced.updateParametersInContext(context)
    energy2 = context.getState(getEnergy=True).getPotentialEnergy()
    sliced.setUseDispersionCorrection(True)
    context.reinitialize()
    context.setPositions(positions)
    energy1 = context.getState(getEnergy=True).getPotentialEnergy()
    term1 = (num_type1 * (num_type1 + 1) / 2) * (0.5 * 1.1**12 / cutoff**9) / 9
    term2 = (num_type1 * (num_type1 + 1) / 2) * (0.5 * 1.1**6 / cutoff**3) / 3
    term1 += (num_type2 * (num_type2 + 1) / 2) * (1 * 1.0**12 / cutoff**9) / 9
    term2 += (num_type2 * (num_type2 + 1) / 2) * (1 * 1.0**6 / cutoff**3) / 3
    comb_sigma = 0.5 * (1 + 1.1)
    comb_eps = math.sqrt(0.5)
    term1 += num_type1 * num_type2 * (comb_eps * comb_sigma**12 / cutoff**9) / 9
    term2 += num_type1 * num_type2 * (comb_eps * comb_sigma**6 / cutoff**3) / 3
    term1 /= num_particles * (num_particles + 1) / 2
    term2 /= num_particles * (num_particles + 1) / 2
    expected = 8 * math.pi * num_particles**2 * (term1 - term2) / box_size**3
    assert_equal_to(expected, energy1 - energy2, 1e-4)
