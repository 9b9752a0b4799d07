"""Cross-platform parity: fast f32 path vs the double-precision Reference
oracle, mirroring the reference's Python test
(python/tests/TestSlicedNonbondedForce.py:113-180: 1200 particles, every
method, forces and energy to single-precision tolerance)."""

import numpy as np
import pytest

import nonbondedslicing_tpu as nbs

TOL = 1e-3  # single-vs-double tolerance (TestSlicedNonbondedForce.h:1039)


def _build(method, n=1200, seed=2024):
    rng = np.random.default_rng(seed)
    box = 4.5
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(3)
    force.setNonbondedMethod(method)
    force.setCutoffDistance(1.0)
    for i in range(n):
        system.addParticle(10.0)
        q = 0.3 if i % 2 == 0 else -0.3
        force.addParticle(q, 0.25 + 0.05 * (i % 3), 0.4)
        force.setParticleSubset(i, i % 3)
    for i in range(0, n - 1, 5):
        force.addException(i, i + 1, 0.05, 0.3, 0.2)
    force.addGlobalParameter("lam01", 0.8)
    force.addScalingParameter("lam01", 0, 1, True, True)
    force.addEnergyParameterDerivative("lam01")
    system.addForce(force)
    positions = rng.random((n, 3)) * box
    return system, positions


@pytest.mark.parametrize("method", [
    nbs.SlicedNonbondedForce.CutoffPeriodic,
    nbs.SlicedNonbondedForce.PME,
    nbs.SlicedNonbondedForce.LJPME,
])
def test_fast_path_matches_reference_platform(method):
    system, positions = _build(method)
    state = {}
    for platform in ("Reference", "TPU"):
        ctx = nbs.Context(system, nbs.VerletIntegrator(0.001),
                          nbs.Platform.getPlatformByName(platform))
        ctx.setPositions(positions)
        st = ctx.getState(getEnergy=True, getForces=True,
                          getParameterDerivatives=True)
        state[platform] = st
    e_ref = state["Reference"].getPotentialEnergy()
    e_tpu = state["TPU"].getPotentialEnergy()
    assert abs(e_tpu - e_ref) / max(abs(e_ref), 1.0) < TOL
    f_ref = np.asarray(state["Reference"].getForces())
    f_tpu = np.asarray(state["TPU"].getForces())
    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(f_tpu, f_ref, rtol=0, atol=TOL * scale)
    d_ref = state["Reference"].getEnergyParameterDerivatives()["lam01"]
    d_tpu = state["TPU"].getEnergyParameterDerivatives()["lam01"]
    assert abs(d_tpu - d_ref) / max(abs(d_ref), 1.0) < TOL
