"""The flagship slicing-equivalence matrix, ported from testNonbondedSlicing
(/root/reference/tests/TestSlicedNonbondedForce.h:1031-1318) and
testScalingParameterSeparation (:1320-1457).

system1: an unsliced force whose charges/epsilons are manually lambda-scaled
(q -> lambda*q for Coulomb, eps -> lambda*eps via sqrtLambda per particle).
system2: a 2-subset sliced force with scaling parameters {lambda_01,
lambda_11}.  Energies and forces must agree at lambda = 1, 0, 0.5 for
direct space, reciprocal space, and total, for all 6 methods x offsets x
exceptions x (Coulomb | LJ).  Then the exact-derivative identities:
E(1) - E(0) = sum dE/dlambda, and total E = sum lambda * dE/dlambda over a
complete set of scaling parameters.
"""

import math

import numpy as np
import pytest

import nonbondedslicing_tpu as nbs

from conftest import assert_energy, assert_equal_to, assert_forces

TOL = 1e-4
REFERENCE = nbs.Platform.getPlatformByName("Reference")

METHODS = [
    nbs.NonbondedForce.NoCutoff,
    nbs.NonbondedForce.CutoffNonPeriodic,
    nbs.NonbondedForce.CutoffPeriodic,
    nbs.NonbondedForce.Ewald,
    nbs.NonbondedForce.PME,
    nbs.NonbondedForce.LJPME,
]


def build_systems(method, offsets, exceptions, lj, seed=0):
    include_lj = lj
    include_coulomb = not lj
    num_molecules = 100
    num_particles = num_molecules * 2
    cutoff = 3.5
    L = 7.0 if exceptions else 10.0

    system1 = nbs.System()
    system2 = nbs.System()
    for _ in range(num_particles):
        system1.addParticle(1.0)
        system2.addParticle(1.0)
    system1.setDefaultPeriodicBoxVectors((L, 0, 0), (0, L, 0), (0, 0, L))
    system2.setDefaultPeriodicBoxVectors((L, 0, 0), (0, L, 0), (0, 0, L))

    nonbonded = nbs.NonbondedForce()
    nonbonded = nbs.SlicedNonbondedForce(1)  # unsliced oracle (single subset)
    nonbonded.setNonbondedMethod(method)
    nonbonded.setCutoffDistance(cutoff)
    nonbonded.setUseDispersionCorrection(True)
    nonbonded.setReciprocalSpaceForceGroup(1)
    nonbonded.setEwaldErrorTolerance(1e-4)

    def q(k):
        return 1 - 2 * (k % 2)

    M = int(num_molecules ** (1.0 / 3.0))
    if M * M * M < num_molecules:
        M += 1
    eps = 1.0
    positions = np.zeros((num_particles, 3))
    for k in range(num_molecules):
        iz = k // (M * M)
        iy = (k - iz * M * M) // M
        ix = k - M * (iy + iz * M)
        center = np.array([ix + 0.5, iy + 0.5, iz + 0.5]) * L / M
        delta = np.array([0.5 - ix % 2, 0.5 - iy % 2, 0.5 - iz % 2]) / 2
        i, j = 2 * k, 2 * k + 1
        positions[i] = center + delta
        positions[j] = center - delta
        nonbonded.addParticle(q(i), 1, eps)
        nonbonded.addParticle(q(j), 1, eps)
        if exceptions:
            nonbonded.addException(i, j, q(i) * q(j), 1, eps)

    particle_offsets = []
    exception_offsets = []
    if offsets:
        offset_param = "offsetLambda"
        particle_offsets = [(0, offset_param, 1.0, 0.0, 0.0),
                            (1, offset_param, 0.0, 0.0, 1.0)]
        if exceptions:
            exception_offsets = [(0, offset_param, 1.0, 0.0, 0.0),
                                 (1, offset_param, 0.0, 0.0, 1.0)]
        nonbonded.addGlobalParameter(offset_param, 0.0)
        for particle, param, cq, cs, ce in particle_offsets:
            nonbonded.addParticleParameterOffset(param, particle, cq, cs, ce)
        for exception, param, cq, cs, ce in exception_offsets:
            nonbonded.addExceptionParameterOffset(param, exception, cq, cs, ce)

    sliced = nbs.SlicedNonbondedForce(nonbonded, 2)
    rng = np.random.default_rng(seed)
    for k in range(num_particles):
        if rng.random() < 0.5:
            sliced.setParticleSubset(k, 1)

    param01 = "lambda" if include_coulomb else "sqrtLambda"
    sliced.addGlobalParameter(param01, 1)
    sliced.addScalingParameter(param01, 0, 1, include_coulomb, include_lj)
    param11 = "lambdaSq" if include_coulomb else "lambda"
    sliced.addGlobalParameter(param11, 1)
    sliced.addScalingParameter(param11, 1, 1, include_coulomb, include_lj)

    system1.addForce(nonbonded)
    system2.addForce(sliced)

    particle_scale = [("one", "one")] * num_particles
    for k in range(num_particles):
        if sliced.getParticleSubset(k) == 1:
            particle_scale[k] = ("lambda" if include_coulomb else "one",
                                 "lambda" if include_lj else "one")

    num_exceptions = nonbonded.getNumExceptions()
    exception_scale = [("one", "one")] * num_exceptions
    for k in range(num_exceptions):
        i, j, *_ = nonbonded.getExceptionParameters(k)
        si = sliced.getParticleSubset(i)
        sj = sliced.getParticleSubset(j)
        if si != sj or si == 1:
            parameter = param01 if si != sj else param11
            exception_scale[k] = (parameter if include_coulomb else "one",
                                  parameter if include_lj else "one")

    return dict(system1=system1, system2=system2, nonbonded=nonbonded,
                sliced=sliced, positions=positions, q=q, eps=eps,
                particle_scale=particle_scale, exception_scale=exception_scale,
                particle_offsets=particle_offsets,
                exception_offsets=exception_offsets,
                param01=param01, param11=param11,
                include_coulomb=include_coulomb, include_lj=include_lj)


def apply_lambda(b, value_map):
    """Reparameterize the unsliced force to mimic lambda scaling."""
    nonbonded = b["nonbonded"]
    q, eps = b["q"], b["eps"]
    for k in range(nonbonded.getNumParticles()):
        sc, sl = b["particle_scale"][k]
        nonbonded.setParticleParameters(k, q(k) * value_map[sc], 1,
                                        eps * value_map[sl])
    for k in range(nonbonded.getNumExceptions()):
        sc, sl = b["exception_scale"][k]
        nonbonded.setExceptionParameters(k, 2 * k, 2 * k + 1,
                                         q(2 * k) * q(2 * k + 1) * value_map[sc],
                                         1, eps * value_map[sl])
    for j, (particle, param, cq, cs, ce) in enumerate(b["particle_offsets"]):
        sc, sl = b["particle_scale"][particle]
        nonbonded.setParticleParameterOffset(j, param, particle,
                                             cq * value_map[sc], cs,
                                             ce * value_map[sl])
    for j, (exception, param, cq, cs, ce) in enumerate(b["exception_offsets"]):
        sc, sl = b["exception_scale"][exception]
        nonbonded.setExceptionParameterOffset(j, param, exception,
                                              cq * value_map[sc], cs,
                                              ce * value_map[sl])


def compare(context1, context2, tol):
    for groups in ({0}, {1}, None):
        s1 = context1.getState(getEnergy=True, getForces=True, groups=groups)
        s2 = context2.getState(getEnergy=True, getForces=True, groups=groups)
        assert_energy(s1, s2, tol)
        assert_forces(s1, s2, tol)


@pytest.mark.parametrize("lj", [False, True], ids=["coulomb", "lj"])
@pytest.mark.parametrize("exceptions", [False, True], ids=["noexc", "exc"])
@pytest.mark.parametrize("offsets", [False, True], ids=["nooff", "off"])
@pytest.mark.parametrize("method", METHODS,
                         ids=["NoCutoff", "CutoffNonPeriodic", "CutoffPeriodic",
                              "Ewald", "PME", "LJPME"])
def test_nonbonded_slicing(method, offsets, exceptions, lj):
    b = build_systems(method, offsets, exceptions, lj)
    context1 = nbs.Context(b["system1"], nbs.VerletIntegrator(0.01), REFERENCE)
    context1.setPositions(b["positions"])
    context2 = nbs.Context(b["system2"], nbs.VerletIntegrator(0.01), REFERENCE)
    context2.setPositions(b["positions"])

    param01, param11 = b["param01"], b["param11"]

    # lambda = 1
    compare(context1, context2, TOL)
    energy_lambda_one = context1.getState(getEnergy=True).getPotentialEnergy()

    # lambda = 0
    values = {"one": 1, "lambda": 0, "sqrtLambda": 0, "lambdaSq": 0}
    apply_lambda(b, values)
    b["nonbonded"].updateParametersInContext(context1)
    context2.setParameter(param01, values[param01])
    context2.setParameter(param11, values[param11])
    compare(context1, context2, TOL)
    energy_lambda_zero = context1.getState(getEnergy=True).getPotentialEnergy()

    # lambda = 0.5
    lam = 0.5
    values = {"one": 1, "lambda": lam, "sqrtLambda": math.sqrt(lam),
              "lambdaSq": lam * lam}
    apply_lambda(b, values)
    b["nonbonded"].updateParametersInContext(context1)
    context2.setParameter(param01, values[param01])
    context2.setParameter(param11, values[param11])
    compare(context1, context2, TOL)

    # derivative identity: E(1) - E(0) = sum of dE/dlambda at any lambda
    sliced = b["sliced"]
    sliced.addEnergyParameterDerivative(param01)
    sliced.addEnergyParameterDerivative(param11)
    context2.reinitialize(True)
    s2 = context2.getState(getParameterDerivatives=True)
    derivatives = s2.getEnergyParameterDerivatives()
    assert_equal_to(energy_lambda_one - energy_lambda_zero,
                    derivatives[param01] + derivatives[param11], TOL)

    # sum of lambda*dE/dlambda over a complete set = total energy
    nonbonded = b["nonbonded"]
    q, eps = b["q"], b["eps"]
    inc_c, inc_lj = b["include_coulomb"], b["include_lj"]
    for k in range(nonbonded.getNumParticles()):
        nonbonded.setParticleParameters(k, q(k) if inc_c else 0, 1,
                                        eps if inc_lj else 0)
    for k in range(nonbonded.getNumExceptions()):
        nonbonded.setExceptionParameters(k, 2 * k, 2 * k + 1,
                                         q(2 * k) * q(2 * k + 1) if inc_c else 0,
                                         1, eps if inc_lj else 0)
    for j, (particle, param, cq, cs, ce) in enumerate(b["particle_offsets"]):
        nonbonded.setParticleParameterOffset(j, param, particle,
                                             cq if inc_c else 0, cs,
                                             ce if inc_lj else 0)
    for j, (exception, param, cq, cs, ce) in enumerate(b["exception_offsets"]):
        nonbonded.setExceptionParameterOffset(j, param, exception,
                                              cq if inc_c else 0, cs,
                                              ce if inc_lj else 0)
    nonbonded.updateParametersInContext(context1)
    energy = context1.getState(getEnergy=True).getPotentialEnergy()

    sliced.addGlobalParameter("remainder", 1.0)
    sliced.addScalingParameter("remainder", 0, 0, inc_c, inc_lj)
    sliced.addEnergyParameterDerivative("remainder")
    context2.reinitialize(True)
    s2 = context2.getState(getEnergy=True, getParameterDerivatives=True)
    derivatives = s2.getEnergyParameterDerivatives()
    total = (derivatives[param01] + derivatives[param11]
             + derivatives["remainder"])
    assert_equal_to(energy, total, TOL)


@pytest.mark.parametrize("exceptions", [False, True], ids=["noexc", "exc"])
@pytest.mark.parametrize("method", METHODS,
                         ids=["NoCutoff", "CutoffNonPeriodic", "CutoffPeriodic",
                              "Ewald", "PME", "LJPME"])
def test_scaling_parameter_separation(method, exceptions):
    # TestSlicedNonbondedForce.h:1320-1457
    num_molecules = 100
    num_particles = num_molecules * 2
    cutoff = 3.5
    L = 7.0 if exceptions else 10.0

    system1 = nbs.System()
    system2 = nbs.System()
    for _ in range(num_particles):
        system1.addParticle(1.0)
        system2.addParticle(1.0)
    system1.setDefaultPeriodicBoxVectors((L, 0, 0), (0, L, 0), (0, 0, L))
    system2.setDefaultPeriodicBoxVectors((L, 0, 0), (0, L, 0), (0, 0, L))

    nonbonded = nbs.SlicedNonbondedForce(1)
    nonbonded.setNonbondedMethod(method)
    nonbonded.setCutoffDistance(cutoff)
    nonbonded.setUseDispersionCorrection(True)
    nonbonded.setReciprocalSpaceForceGroup(1)
    nonbonded.setEwaldErrorTolerance(1e-4)

    def q(k):
        return 1 - 2 * (k % 2)

    M = int(num_molecules ** (1.0 / 3.0))
    if M * M * M < num_molecules:
        M += 1
    positions = np.zeros((num_particles, 3))
    for k in range(num_molecules):
        iz = k // (M * M)
        iy = (k - iz * M * M) // M
        ix = k - M * (iy + iz * M)
        center = np.array([ix + 0.5, iy + 0.5, iz + 0.5]) * L / M
        delta = np.array([0.5 - ix % 2, 0.5 - iy % 2, 0.5 - iz % 2]) / 2
        i, j = 2 * k, 2 * k + 1
        positions[i] = center + delta
        positions[j] = center - delta
        nonbonded.addParticle(q(i), 1, 1)
        nonbonded.addParticle(q(j), 1, 1)
        if exceptions:
            nonbonded.addException(i, j, q(i) * q(j), 1, 1)

    sliced1 = nbs.SlicedNonbondedForce(nonbonded, 2)
    sliced2 = nbs.SlicedNonbondedForce(nonbonded, 2)
    rng = np.random.default_rng(0)
    for k in range(num_particles):
        if rng.random() < 0.5:
            sliced1.setParticleSubset(k, 1)
            sliced2.setParticleSubset(k, 1)

    lam = 0.5
    sliced1.addGlobalParameter("lambda", lam)
    sliced1.addScalingParameter("lambda", 0, 1, True, True)
    sliced1.addEnergyParameterDerivative("lambda")
    sliced2.addGlobalParameter("lambdaCoulomb", lam)
    sliced2.addGlobalParameter("lambdaLJ", lam)
    sliced2.addScalingParameter("lambdaCoulomb", 0, 1, True, False)
    sliced2.addScalingParameter("lambdaLJ", 0, 1, False, True)
    sliced2.addEnergyParameterDerivative("lambdaCoulomb")
    sliced2.addEnergyParameterDerivative("lambdaLJ")

    value = 0.3
    sliced1.addGlobalParameter("alpha", value)
    sliced1.addScalingParameter("alpha", 0, 0, True, True)
    sliced1.addEnergyParameterDerivative("alpha")
    sliced1.addGlobalParameter("beta", value)
    sliced1.addScalingParameter("beta", 1, 1, True, True)
    sliced1.addEnergyParameterDerivative("beta")
    sliced2.addGlobalParameter("gamma", value)
    sliced2.addScalingParameter("gamma", 0, 0, True, True)
    sliced2.addScalingParameter("gamma", 1, 1, True, True)
    sliced2.addEnergyParameterDerivative("gamma")

    system1.addForce(sliced1)
    system2.addForce(sliced2)

    context1 = nbs.Context(system1, nbs.VerletIntegrator(0.01), REFERENCE)
    context1.setPositions(positions)
    context2 = nbs.Context(system2, nbs.VerletIntegrator(0.01), REFERENCE)
    context2.setPositions(positions)

    for groups in (None, {0}, {1}):
        s1 = context1.getState(getEnergy=True, getForces=True,
                               getParameterDerivatives=True, groups=groups)
        s2 = context2.getState(getEnergy=True, getForces=True,
                               getParameterDerivatives=True, groups=groups)
        d1 = s1.getEnergyParameterDerivatives()
        d2 = s2.getEnergyParameterDerivatives()
        assert_energy(s1, s2, TOL)
        assert_forces(s1, s2, TOL)
        assert_equal_to(d1["lambda"], d2["lambdaCoulomb"] + d2["lambdaLJ"], TOL)
        assert_equal_to(s1.getPotentialEnergy(),
                        lam * d1["lambda"] + value * (d1["alpha"] + d1["beta"]),
                        TOL)
        assert_equal_to(d1["alpha"] + d1["beta"], d2["gamma"], TOL)
