"""Checkpoint/resume and profiling-harness tests (SURVEY.md section 5)."""

import numpy as np
import pytest

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.runtime import profiling


def _make_context(n=24):
    rng = np.random.default_rng(0)
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((3, 0, 0), (0, 3, 0), (0, 0, 3))
    force = nbs.SlicedNonbondedForce(2)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffPeriodic)
    force.setCutoffDistance(1.0)
    for i in range(n):
        system.addParticle(1.0)
        force.addParticle((-1) ** i * 0.1, 0.3, 0.2)
        force.setParticleSubset(i, i % 2)
    force.addGlobalParameter("lam", 0.5)
    force.addScalingParameter("lam", 0, 1, True, True)
    system.addForce(force)
    ctx = nbs.Context(system, nbs.VerletIntegrator(0.001),
                      nbs.Platform.getPlatformByName("Reference"))
    ctx.setPositions(rng.random((n, 3)) * 3)
    ctx.setVelocitiesToTemperature(300.0, seed=1)
    return ctx


def test_checkpoint_round_trip():
    ctx = _make_context()
    ctx.setParameter("lam", 0.25)
    e0 = ctx.getState(getEnergy=True).getPotentialEnergy()
    blob = ctx.createCheckpoint()

    # perturb everything, then restore
    ctx.getIntegrator().step(5)
    ctx.setParameter("lam", 1.0)
    assert ctx.getState(getEnergy=True).getPotentialEnergy() != pytest.approx(e0)

    ctx.loadCheckpoint(blob)
    assert ctx.getParameter("lam") == 0.25
    assert ctx.getState(getEnergy=True).getPotentialEnergy() == pytest.approx(e0)


def test_checkpoint_wrong_system_rejected():
    ctx_a = _make_context(n=24)
    ctx_b = _make_context(n=30)
    blob = ctx_a.createCheckpoint()
    with pytest.raises(nbs.OpenMMException):
        ctx_b.loadCheckpoint(blob)


def test_checkpoint_resume_trajectory_identical():
    """Resuming from a checkpoint reproduces the uninterrupted trajectory."""
    ctx = _make_context()
    blob = ctx.createCheckpoint()
    ctx.getIntegrator().step(10)
    ref = np.asarray(ctx.getState(getPositions=True).getPositions())

    ctx.loadCheckpoint(blob)
    ctx.getIntegrator().step(4)
    mid = ctx.createCheckpoint()
    ctx.loadCheckpoint(mid)
    ctx.getIntegrator().step(6)
    got = np.asarray(ctx.getState(getPositions=True).getPositions())
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_time_fn_returns_positive():
    import jax.numpy as jnp

    def f(x):
        return jnp.sum(x * x)

    dt = profiling.time_fn(f, jnp.arange(1000.0), warmup=1, reps=3)
    assert dt > 0
