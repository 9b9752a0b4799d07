"""updateParametersInContext: cheap refreshes succeed, structural changes
raise (reference constraints: ReferenceNonbondedSlicingKernels.cpp:270-319,
CommonNonbondedSlicingKernels.cpp:1404-1568)."""

import numpy as np
import pytest

import nonbondedslicing_tpu as nbs


def _ctx(nsub=2, n=40):
    rng = np.random.default_rng(0)
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((4, 0, 0), (0, 4, 0), (0, 0, 4))
    force = nbs.SlicedNonbondedForce(nsub)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.setCutoffDistance(1.0)
    for i in range(n):
        system.addParticle(16.0)
        force.addParticle(0.2 * (-1) ** i, 0.3, 0.4)
        force.setParticleSubset(i, i % nsub)
    force.addGlobalParameter("lam", 1.0)
    force.addScalingParameter("lam", 0, 1, True, True)
    system.addForce(force)
    ctx = nbs.Context(system, nbs.VerletIntegrator(0.001),
                      nbs.Platform.getPlatformByName("Reference"))
    ctx.setPositions(rng.random((n, 3)) * 4)
    return ctx, force


def test_parameter_refresh_updates_energy():
    ctx, force = _ctx()
    e0 = ctx.getState(getEnergy=True).getPotentialEnergy()
    for i in range(force.getNumParticles()):
        q, s, e = force.getParticleParameters(i)
        force.setParticleParameters(i, q * 1.2, s, e)
    force.updateParametersInContext(ctx)
    e1 = ctx.getState(getEnergy=True).getPotentialEnergy()
    assert abs(e1 - e0) > 1e-6


def test_added_scaling_parameter_rejected():
    ctx, force = _ctx(nsub=3)
    ctx.getState(getEnergy=True)
    force.addGlobalParameter("lam2", 1.0)
    force.addScalingParameter("lam2", 1, 2, True, False)
    with pytest.raises(nbs.OpenMMException):
        force.updateParametersInContext(ctx)
    # reinitialize picks the new wiring up
    ctx.reinitialize(preserveState=True)
    ctx.setParameter("lam2", 0.5)
    assert np.isfinite(ctx.getState(getEnergy=True).getPotentialEnergy())


def test_changed_method_config_rejected():
    ctx, force = _ctx()
    ctx.getState(getEnergy=True)
    force.setCutoffDistance(0.9)
    with pytest.raises(nbs.OpenMMException):
        force.updateParametersInContext(ctx)


def test_changed_exception_set_rejected():
    ctx, force = _ctx()
    force.addException(0, 1, 0.05, 0.3, 0.1)
    ctx.reinitialize(preserveState=True)
    ctx.getState(getEnergy=True)
    # turning the 1-4 into a pure exclusion changes the non-excluded set
    force.setExceptionParameters(0, 0, 1, 0.0, 1.0, 0.0)
    with pytest.raises(nbs.OpenMMException):
        force.updateParametersInContext(ctx)


def test_subset_reassignment_via_update():
    """Changing particle subsets is a data refresh (no lambda re-wiring):
    updateParametersInContext must match a freshly built context."""
    ctx, force = _ctx(nsub=2, n=36)
    ctx.getState(getEnergy=True)
    rng = np.random.default_rng(7)
    new_subsets = rng.integers(0, 2, force.getNumParticles())
    for i, s in enumerate(new_subsets):
        force.setParticleSubset(i, int(s))
    force.updateParametersInContext(ctx)
    e_updated = ctx.getState(getEnergy=True).getPotentialEnergy()

    ctx2 = nbs.Context(ctx.getSystem(), nbs.VerletIntegrator(0.001),
                       nbs.Platform.getPlatformByName("Reference"))
    ctx2.setPositions(np.asarray(ctx.getState(getPositions=True).getPositions()))
    ctx2.setParameter("lam", ctx.getParameter("lam"))
    e_fresh = ctx2.getState(getEnergy=True).getPotentialEnergy()
    assert abs(e_updated - e_fresh) < 1e-9 * max(abs(e_fresh), 1.0)
