"""Box rescaling (NPT) behavior: the per-slice dispersion correction divides
by the *current* volume at evaluation time
(ReferenceNonbondedSlicingKernels.cpp:244-249), and the box-shrink guard
rejects boxes below twice the cutoff
(ReferenceNonbondedSlicingKernels.cpp:202-204)."""

import numpy as np
import pytest

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops import plan as plan_mod


def _system(correction, box=4.0, n=120):
    rng = np.random.default_rng(3)
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(2)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffPeriodic)
    force.setCutoffDistance(1.0)
    force.setUseDispersionCorrection(correction)
    for i in range(n):
        system.addParticle(10.0)
        force.addParticle(0.0, 0.3 + 0.05 * (i % 2), 0.5)
        force.setParticleSubset(i, i % 2)
    system.addForce(force)
    # grid placement keeps |E| small so the on-off difference is not lost to
    # f64 cancellation
    m = int(np.ceil(n ** (1 / 3)))
    idx = np.arange(n)
    positions = np.stack([(idx // (m * m)) % m, (idx // m) % m, idx % m],
                         axis=1) * (box / m)
    positions = positions + rng.normal(scale=0.02, size=(n, 3))
    return system, force, positions


def test_dispersion_correction_tracks_volume():
    system_on, force_on, positions = _system(True)
    system_off, _, _ = _system(False)
    plan = plan_mod.build_plan(force_on, system_on)
    coeff_total = float(np.sum(plan.dispersion_coefficients))

    for scale in (1.0, 1.25):
        box = 4.0 * scale
        ctxs = []
        for system in (system_on, system_off):
            ctx = nbs.Context(system, nbs.VerletIntegrator(0.001),
                              nbs.Platform.getPlatformByName("Reference"))
            ctx.setPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
            ctx.setPositions(positions * scale)
            ctxs.append(ctx)
        e_on = ctxs[0].getState(getEnergy=True).getPotentialEnergy()
        e_off = ctxs[1].getState(getEnergy=True).getPotentialEnergy()
        assert e_on - e_off == pytest.approx(coeff_total / box ** 3, rel=1e-9)


def test_box_shrink_guard():
    system, _, positions = _system(True)
    ctx = nbs.Context(system, nbs.VerletIntegrator(0.001),
                      nbs.Platform.getPlatformByName("Reference"))
    ctx.setPositions(positions)
    ctx.setPeriodicBoxVectors((1.9, 0, 0), (0, 1.9, 0), (0, 0, 1.9))
    with pytest.raises(nbs.OpenMMException):
        ctx.getState(getEnergy=True)
