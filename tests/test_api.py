"""API-surface tests: construction, validation, clash rules, copy-ctor parity,
serialization round trip.  Ports of testInstantiateFromNonbondedForce
(TestSlicedNonbondedForce.h:29-85), the Python testParameterClash
(python/tests/TestSlicedNonbondedForce.py:52-67), and the serialization test
(serialization/tests/TestSerializeSlicedNonbondedForce.cpp:22-181)."""

import numpy as np
import pytest

import nonbondedslicing_tpu as nbs

from conftest import assert_energy, assert_forces

TOL = 1e-4
REFERENCE = nbs.Platform.getPlatformByName("Reference")


def build_populated_force():
    force = nbs.NonbondedForce()
    force.setCutoffDistance(2.0)
    force.addParticle(0.0, 1.0, 0.5)
    force.addParticle(1.0, 0.5, 0.6)
    force.addParticle(-1.0, 2.0, 0.7)
    force.addParticle(0.5, 2.0, 0.8)
    force.addParticle(-0.5, 2.0, 0.8)
    force.addException(0, 3, 0.0, 1.0, 0.0)
    force.addException(2, 3, 0.5, 1.0, 1.5)
    force.addException(0, 1, 1.0, 1.5, 1.0)
    force.addGlobalParameter("p1", 0.5)
    force.addGlobalParameter("p2", 1.0)
    force.addParticleParameterOffset("p1", 0, -2.0, 0.5, 0.5)
    force.addParticleParameterOffset("p2", 1, 1.0, 1.0, 2.0)
    force.addExceptionParameterOffset("p1", 1, 0.5, 0.5, 1.5)
    force.setReciprocalSpaceForceGroup(2)
    return force


@pytest.mark.parametrize("method", [0, 1, 2, 3, 4, 5])
def test_instantiate_from_nonbonded_force(method):
    force = build_populated_force()
    force.setNonbondedMethod(method)
    sliced = nbs.SlicedNonbondedForce(force, 1)
    sliced.setForceGroup(1)
    sliced.setReciprocalSpaceForceGroup(3)

    n = force.getNumParticles()
    system = nbs.System()
    L = float(n)
    system.setDefaultPeriodicBoxVectors((L, 0, 0), (0, L, 0), (0, 0, L))
    for _ in range(n):
        system.addParticle(1.0)
    # the oracle "stock" force is an unsliced SlicedNonbondedForce (n=1)
    stock = nbs.SlicedNonbondedForce(force, 1)
    system.addForce(stock)
    system.addForce(sliced)

    context = nbs.Context(system, nbs.VerletIntegrator(0.001), REFERENCE)
    context.setPositions([(i, 0, 0) for i in range(n)])

    state1 = context.getState(getForces=True, getEnergy=True, groups={0})
    state2 = context.getState(getForces=True, getEnergy=True, groups={1})
    assert_energy(state1, state2, TOL)
    assert_forces(state1, state2, TOL)

    context.setParameter("p1", 1)
    state3 = context.getState(getForces=True, getEnergy=True, groups={2})
    state4 = context.getState(getForces=True, getEnergy=True, groups={3})
    assert_energy(state3, state4, TOL)
    assert_forces(state3, state4, TOL)


def test_parameter_clash():
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((4, 0, 0), (0, 4, 0), (0, 0, 4))
    system.addParticle(1.0)
    system.addParticle(1.0)
    force = nbs.SlicedNonbondedForce(1)
    force.addParticle(1.5, 1, 0)
    force.addParticle(-1.5, 1, 0)
    force.addGlobalParameter("param", 1)
    force.addScalingParameter("param", 0, 0, True, True)
    force.addParticleParameterOffset("param", 0, 1, 1, 0)
    system.addForce(force)
    with pytest.raises(Exception):
        nbs.Context(system, nbs.VerletIntegrator(0.01), REFERENCE)


def test_scaling_parameter_clash_rules():
    force = nbs.SlicedNonbondedForce(3)
    for _ in range(3):
        force.addParticle(1.0, 1.0, 0.0)
    force.addGlobalParameter("a", 1.0)
    force.addGlobalParameter("b", 1.0)
    force.addScalingParameter("a", 0, 1, True, False)
    # LJ-only on the same slice is fine
    force.addScalingParameter("b", 0, 1, False, True)
    # another Coulomb scaler for the same slice clashes
    with pytest.raises(nbs.OpenMMException):
        force.addScalingParameter("b", 1, 0, True, False)
    # both-false is rejected
    with pytest.raises(nbs.OpenMMException):
        force.addScalingParameter("a", 1, 2, False, False)
    # unknown global parameter
    with pytest.raises(nbs.OpenMMException):
        force.addScalingParameter("nope", 1, 2, True, True)
    # derivative of a non-scaling parameter is rejected
    with pytest.raises(nbs.OpenMMException):
        force.addEnergyParameterDerivative("nope")
    force.addEnergyParameterDerivative("a")
    with pytest.raises(nbs.OpenMMException):
        force.addEnergyParameterDerivative("a")


def test_subsets_and_slices():
    force = nbs.SlicedNonbondedForce(3)
    assert force.getNumSubsets() == 3
    assert force.getNumSlices() == 6
    for _ in range(4):
        force.addParticle(0.0, 1.0, 0.0)
    assert force.getParticleSubset(0) == 0
    force.setParticleSubset(0, 2)
    assert force.getParticleSubset(0) == 2
    with pytest.raises(nbs.OpenMMException):
        force.setParticleSubset(0, 3)
    with pytest.raises(nbs.OpenMMException):
        force.setParticleSubset(4, 0)
    assert nbs.sliceIndex(1, 2) == 4
    assert nbs.sliceIndex(2, 1) == 4
    assert nbs.sliceIndex(0, 0) == 0


def test_method_names():
    force = nbs.SlicedNonbondedForce(1)
    names = ["NoCutoff", "CutoffNonPeriodic", "CutoffPeriodic", "Ewald",
             "PME", "LJPME"]
    for i, name in enumerate(names):
        force.setNonbondedMethod(i)
        assert force.getNonbondedMethodName() == name


def test_serialization_round_trip():
    # field set mirrors TestSerializeSlicedNonbondedForce.cpp:22-181
    force = nbs.SlicedNonbondedForce(3)
    force.setForceGroup(3)
    force.setName("custom name")
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.LJPME)
    force.setCutoffDistance(2.0)
    force.setUseSwitchingFunction(True)
    force.setSwitchingDistance(1.5)
    force.setEwaldErrorTolerance(1e-3)
    force.setReactionFieldDielectric(50.0)
    force.setUseDispersionCorrection(False)
    force.setIncludeDirectSpace(False)
    force.setPMEParameters(0.3, 20, 20, 20)
    force.setLJPMEParameters(0.27, 24, 24, 24)
    force.setReciprocalSpaceForceGroup(1)
    force.setExceptionsUsePeriodicBoundaryConditions(True)
    force.addGlobalParameter("lambda01", 0.5)
    force.addGlobalParameter("lambda11", 0.25)
    force.addGlobalParameter("offsetP", 1.0)
    for i in range(5):
        force.addParticle(0.1 * i, 1.0 + 0.1 * i, 0.2 * i)
    force.setParticleSubset(1, 1)
    force.setParticleSubset(2, 2)
    force.addException(0, 1, 0.5, 1.2, 0.3)
    force.addException(2, 3, 0.0, 1.0, 0.0)
    force.addParticleParameterOffset("offsetP", 0, 1.0, 0.5, 0.25)
    force.addExceptionParameterOffset("offsetP", 0, 0.5, 0.1, 0.2)
    force.addScalingParameter("lambda01", 0, 1, True, True)
    force.addScalingParameter("lambda11", 1, 1, True, False)
    force.addEnergyParameterDerivative("lambda01")

    xml = nbs.XmlSerializer.serialize(force)
    copy = nbs.XmlSerializer.deserialize(xml)

    assert copy.getNumSubsets() == force.getNumSubsets()
    assert copy.getForceGroup() == force.getForceGroup()
    assert copy.getName() == force.getName()
    assert copy.getNonbondedMethod() == force.getNonbondedMethod()
    assert copy.getCutoffDistance() == force.getCutoffDistance()
    assert copy.getUseSwitchingFunction() == force.getUseSwitchingFunction()
    assert copy.getSwitchingDistance() == force.getSwitchingDistance()
    assert copy.getEwaldErrorTolerance() == force.getEwaldErrorTolerance()
    assert copy.getReactionFieldDielectric() == force.getReactionFieldDielectric()
    assert copy.getUseDispersionCorrection() == force.getUseDispersionCorrection()
    assert copy.getIncludeDirectSpace() == force.getIncludeDirectSpace()
    assert copy.getPMEParameters() == force.getPMEParameters()
    assert copy.getLJPMEParameters() == force.getLJPMEParameters()
    assert copy.getReciprocalSpaceForceGroup() == force.getReciprocalSpaceForceGroup()
    assert (copy.getExceptionsUsePeriodicBoundaryConditions()
            == force.getExceptionsUsePeriodicBoundaryConditions())
    assert copy.getNumGlobalParameters() == force.getNumGlobalParameters()
    for i in range(force.getNumGlobalParameters()):
        assert copy.getGlobalParameterName(i) == force.getGlobalParameterName(i)
        assert (copy.getGlobalParameterDefaultValue(i)
                == force.getGlobalParameterDefaultValue(i))
    assert copy.getNumParticles() == force.getNumParticles()
    for i in range(force.getNumParticles()):
        assert copy.getParticleParameters(i) == force.getParticleParameters(i)
        assert copy.getParticleSubset(i) == force.getParticleSubset(i)
    assert copy.getNumExceptions() == force.getNumExceptions()
    for i in range(force.getNumExceptions()):
        assert copy.getExceptionParameters(i) == force.getExceptionParameters(i)
    assert copy.getNumParticleParameterOffsets() == force.getNumParticleParameterOffsets()
    for i in range(force.getNumParticleParameterOffsets()):
        assert copy.getParticleParameterOffset(i) == force.getParticleParameterOffset(i)
    assert copy.getNumExceptionParameterOffsets() == force.getNumExceptionParameterOffsets()
    for i in range(force.getNumExceptionParameterOffsets()):
        assert copy.getExceptionParameterOffset(i) == force.getExceptionParameterOffset(i)
    assert copy.getNumScalingParameters() == force.getNumScalingParameters()
    for i in range(force.getNumScalingParameters()):
        assert copy.getScalingParameter(i) == force.getScalingParameter(i)
    assert (copy.getNumEnergyParameterDerivatives()
            == force.getNumEnergyParameterDerivatives())
    for i in range(force.getNumEnergyParameterDerivatives()):
        assert (copy.getEnergyParameterDerivativeName(i)
                == force.getEnergyParameterDerivativeName(i))


def test_validation_errors():
    system = nbs.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    # particle count mismatch
    force = nbs.SlicedNonbondedForce(1)
    force.addParticle(0.0, 1.0, 0.0)
    system.addForce(force)
    with pytest.raises(nbs.OpenMMException):
        nbs.Context(system, nbs.VerletIntegrator(0.01), REFERENCE)
    system.removeForce(0)

    # negative sigma
    force = nbs.SlicedNonbondedForce(1)
    force.addParticle(0.0, -1.0, 0.0)
    force.addParticle(0.0, 1.0, 0.0)
    system.addForce(force)
    with pytest.raises(nbs.OpenMMException):
        nbs.Context(system, nbs.VerletIntegrator(0.01), REFERENCE)
    system.removeForce(0)

    # bad switching distance
    force = nbs.SlicedNonbondedForce(1)
    force.addParticle(0.0, 1.0, 0.0)
    force.addParticle(0.0, 1.0, 0.0)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffNonPeriodic)
    force.setUseSwitchingFunction(True)
    force.setSwitchingDistance(2.0)
    force.setCutoffDistance(1.0)
    system.addForce(force)
    with pytest.raises(nbs.OpenMMException):
        nbs.Context(system, nbs.VerletIntegrator(0.01), REFERENCE)
    system.removeForce(0)

    # cutoff > box/2
    force = nbs.SlicedNonbondedForce(1)
    force.addParticle(0.0, 1.0, 0.0)
    force.addParticle(0.0, 1.0, 0.0)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffPeriodic)
    force.setCutoffDistance(1.5)
    system.setDefaultPeriodicBoxVectors((2, 0, 0), (0, 2, 0), (0, 0, 2))
    system.addForce(force)
    with pytest.raises(nbs.OpenMMException):
        nbs.Context(system, nbs.VerletIntegrator(0.01), REFERENCE)
    system.removeForce(0)

    # duplicate exception
    force = nbs.SlicedNonbondedForce(1)
    force.addParticle(0.0, 1.0, 0.0)
    force.addParticle(0.0, 1.0, 0.0)
    force.addException(0, 1, 0.0, 1.0, 0.0)
    with pytest.raises(nbs.OpenMMException):
        force.addException(1, 0, 0.5, 1.0, 0.0)


def test_deserialize_robustness():
    """Malformed XML raises OpenMMException (not TypeError/ValueError),
    mirroring the reference proxy's property access
    (SlicedNonbondedForceProxy.cpp:103-162): required scalars and all child
    sections must be present; documented-optional scalars have defaults."""
    import re
    import xml.etree.ElementTree as ET

    force = nbs.SlicedNonbondedForce(2)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.addParticle(0.1, 0.3, 0.5)
    force.addParticle(-0.1, 0.3, 0.5)
    force.addException(0, 1, 0.0, 1.0, 0.0)
    force.addGlobalParameter("lam", 1.0)
    force.addScalingParameter("lam", 0, 1, True, True)
    xml = nbs.XmlSerializer.serialize(force)

    # not XML at all
    with pytest.raises(nbs.OpenMMException):
        nbs.XmlSerializer.deserialize("<unclosed")
    # wrong root tag
    with pytest.raises(nbs.OpenMMException):
        nbs.XmlSerializer.deserialize("<NonbondedForce version='1'/>")
    # wrong version
    with pytest.raises(nbs.OpenMMException):
        nbs.XmlSerializer.deserialize(
            re.sub(r'version="1"', 'version="2"', xml))

    # dropping any child section raises OpenMMException
    for section in ("GlobalParameters", "ParticleOffsets", "ExceptionOffsets",
                    "Particles", "Exceptions", "Subsets", "scalingParameters",
                    "energyParameterDerivatives"):
        node = ET.fromstring(xml)
        child = node.find(section)
        node.remove(child)
        with pytest.raises(nbs.OpenMMException):
            nbs.XmlSerializer.deserialize(ET.tostring(node,
                                                      encoding="unicode"))

    # dropping a required scalar raises; dropping an optional one defaults
    for attr, required in (("cutoff", True), ("method", True),
                           ("ewaldTolerance", True), ("rfDielectric", True),
                           ("dispersionCorrection", True),
                           ("exceptionsUsePeriodic", True),
                           ("forceGroup", False), ("recipForceGroup", False),
                           ("useSwitchingFunction", False),
                           ("switchingDistance", False), ("alpha", False)):
        node = ET.fromstring(xml)
        del node.attrib[attr]
        text = ET.tostring(node, encoding="unicode")
        if required:
            with pytest.raises(nbs.OpenMMException):
                nbs.XmlSerializer.deserialize(text)
        else:
            nbs.XmlSerializer.deserialize(text)

    # malformed numeric raises OpenMMException, not ValueError
    with pytest.raises(nbs.OpenMMException):
        nbs.XmlSerializer.deserialize(
            xml.replace('cutoff="', 'cutoff="not-a-number'))


def test_enforce_periodic_box():
    """getState(enforcePeriodicBox=True) wraps whole molecules into the
    primary box; without it raw positions are returned."""
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((2, 0, 0), (0, 2, 0), (0, 0, 2))
    force = nbs.SlicedNonbondedForce(1)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.NoCutoff)
    for _ in range(4):
        system.addParticle(1.0)
        force.addParticle(0.0, 0.3, 0.1)
    # two diatomic "molecules" via exceptions
    force.addException(0, 1, 0.0, 1.0, 0.0)
    force.addException(2, 3, 0.0, 1.0, 0.0)
    system.addForce(force)
    ctx = nbs.Context(system, nbs.VerletIntegrator(0.001))
    # molecule A straddles the box face near 2.0 (must stay whole when
    # wrapped); molecule B sits a full box above
    pos = np.array([[1.95, 0.5, 0.5], [2.05, 0.5, 0.5],
                    [0.5, 2.6, 0.5], [0.6, 2.7, 0.5]])
    ctx.setPositions(pos)
    raw = np.asarray(ctx.getState(getPositions=True).getPositions())
    np.testing.assert_allclose(raw, pos)
    wrapped = np.asarray(ctx.getState(getPositions=True,
                                      enforcePeriodicBox=True).getPositions())
    # A: center 2.0 -> wrapped down one box on x, staying whole
    np.testing.assert_allclose(wrapped[0], [-0.05, 0.5, 0.5], atol=1e-12)
    np.testing.assert_allclose(wrapped[1], [0.05, 0.5, 0.5], atol=1e-12)
    # B: wrapped down one box on y
    np.testing.assert_allclose(wrapped[2], [0.5, 0.6, 0.5], atol=1e-12)
    np.testing.assert_allclose(wrapped[3], [0.6, 0.7, 0.5], atol=1e-12)


def test_bulk_construction_api():
    """Bulk addParticles / setParticleSubsets match the per-call API exactly
    (the construction path extras/huge_system.py uses at 3.375M particles;
    reference analog testHugeSystem, TestSlicedNonbondedForce.h:557-612)."""
    rng = np.random.default_rng(17)
    n = 200
    params = np.column_stack([rng.normal(scale=0.3, size=n),
                              rng.uniform(0.1, 0.3, n),
                              rng.uniform(0.0, 0.8, n)])
    masses = rng.uniform(1.0, 16.0, n)
    subs = rng.integers(0, 3, n)

    sys_a, sys_b = nbs.System(), nbs.System()
    f_a = nbs.SlicedNonbondedForce(3)
    f_b = nbs.SlicedNonbondedForce(3)
    for k in range(n):
        sys_a.addParticle(masses[k])
        f_a.addParticle(*params[k])
        f_a.setParticleSubset(k, int(subs[k]))
    first_m = sys_b.addParticles(masses)
    first_p = f_b.addParticles(params)
    f_b.setParticleSubsets(np.arange(n), subs)
    assert first_m == 0 and first_p == 0
    assert sys_b.getNumParticles() == n and f_b.getNumParticles() == n
    for k in range(0, n, 17):
        assert sys_b.getParticleMass(k) == sys_a.getParticleMass(k)
        assert f_b.getParticleParameters(k) == f_a.getParticleParameters(k)
        assert f_b.getParticleSubset(k) == f_a.getParticleSubset(k)
    # scalar subset broadcast + validation
    f_b.setParticleSubsets(np.arange(10), 2)
    assert all(f_b.getParticleSubset(k) == 2 for k in range(10))
    with pytest.raises(nbs.OpenMMException):
        f_b.setParticleSubsets([0, n], 0)
    with pytest.raises(nbs.OpenMMException):
        f_b.setParticleSubsets([0], 3)
    with pytest.raises(nbs.OpenMMException):
        f_b.addParticles(np.zeros((4, 2)))
    # identical energies through a Context
    sys_a.addForce(f_a)
    sys_b.addForce(f_b)
    pos = rng.random((n, 3)) * 2.0
    es = []
    for system in (sys_a, sys_b):
        ctx = nbs.Context(system, nbs.VerletIntegrator(0.001),
                          nbs.Platform.getPlatformByName("Reference"))
        ctx.setPositions(pos)
        es.append(ctx.getState(getEnergy=True).getPotentialEnergy())
    assert es[0] == es[1]


def test_platform_enumeration_and_properties():
    """OpenMM Platform API surface: enumeration, properties, speed
    (Platform.h semantics; the reference relies on OpenMM core for these)."""
    n = nbs.Platform.getNumPlatforms()
    assert n == 2
    names = {nbs.Platform.getPlatform(i).getName() for i in range(n)}
    assert names == {"TPU", "Reference"}
    with pytest.raises(nbs.OpenMMException):
        nbs.Platform.getPlatform(n)
    fastest = nbs.Platform.findPlatform()
    assert fastest.getName() == "TPU"
    ref = nbs.Platform.getPlatformByName("Reference")
    assert fastest.getSpeed() > ref.getSpeed()
    assert ref.supportsDoublePrecision()
    assert ref.getPropertyNames() == ["Precision"]
    assert ref.getPropertyDefaultValue("Precision") == "double"

    system = nbs.System()
    system.addParticle(1.0)
    force = nbs.SlicedNonbondedForce(1)
    force.addParticle(0.0, 0.3, 0.1)
    system.addForce(force)
    ctx = nbs.Context(system, nbs.VerletIntegrator(0.001), ref)
    assert ref.getPropertyValue(ctx, "Precision") == "double"
    with pytest.raises(nbs.OpenMMException):
        ref.getPropertyValue(ctx, "nope")
    with pytest.raises(nbs.OpenMMException):
        ref.setPropertyValue(ctx, "Precision", "single")
