"""OpenMM-parity pinning of the Ewald/PME parameter heuristics.

The reference delegates parameter selection to OpenMM core
(NonbondedForceImpl::calcEwaldParameters / calcPMEParameters, called at
/root/reference/platforms/reference/src/ReferenceNonbondedSlicingKernels.cpp:158-175).
These tables pin (alpha, kmax, grid) for standard (box, cutoff, tol) triples
to the values OpenMM's published algorithm produces:

  alpha  = sqrt(-log(2*tol)) / cutoff               (Coulomb AND LJPME)
  kmax   = findZero(error(k) - tol, guess=10), bumped to odd
  grid   = max(ceil(2*alpha*d / (3*tol^0.2)), 6)    (LJPME drops the 2)

and check the in-context queries report them.

External provenance of the PINNED values: this environment has neither
OpenMM installed nor network access, so pins cannot be captured from an
OpenMM run.  Instead, ``_rederive_pin`` below recomputes every tuple from
the formulas OpenMM publishes (OpenMM User Guide, "Nonbonded Interactions":
alpha and the d_i = 2*alpha*d/(3*tol^(1/5)) mesh rule; the Ewald error
estimate err(k) = k*sqrt(d*alpha)/20 * exp(-(pi*k/(d*alpha))^2) from
NonbondedForceImpl::ewaldErrorEstimate) using ONLY the ``math`` module — it
shares no code with nonbondedslicing_tpu.utils.ewald_params, including the
zero-finding strategy (plain walk-up vs findZero's walk-down from 10).
``test_pins_rederived_standalone`` asserts the two independent
implementations agree on every pinned tuple, so a transcription error in
either implementation fails the suite.
"""

import math

import numpy as np
import pytest

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.utils import ewald_params

# (cutoff, tol, box) -> (alpha, kmax, pme_grid, ljpme_grid) per OpenMM's algorithm
PINNED = [
    (0.9, 5e-4, 8.8675, 2.9202898721, 27, 79, 40),
    (1.0, 5e-4, 2.48, 2.6282608849, 7, 20, 10),
    (1.2, 1e-4, 4.0, 2.4320192216, 11, 41, 21),
    (0.9, 1e-5, 6.0, 3.6548257097, 27, 147, 74),
    (1.0, 5e-4, 3.0, 2.6282608849, 7, 25, 13),
]


def _rederive_pin(cutoff, tol, d):
    """Standalone (math-only) recomputation of one pinned tuple from the
    published OpenMM formulas; deliberately shares nothing with the
    implementation under test."""
    alpha = math.sqrt(-math.log(2.0 * tol)) / cutoff
    grid = int(math.ceil(2.0 * alpha * d / (3.0 * tol ** 0.2)))
    ljgrid = int(math.ceil(alpha * d / (3.0 * tol ** 0.2)))

    def err(k):
        t = k * math.pi / (d * alpha)
        return k * math.sqrt(d * alpha) / 20.0 * math.exp(-t * t)

    k = 1
    while err(k) >= tol:
        k += 1
    kmax = k if k % 2 == 1 else k + 1  # OpenMM bumps kmax to odd
    return alpha, kmax, grid, ljgrid


@pytest.mark.parametrize("cutoff,tol,box,alpha,kmax,grid,ljgrid", PINNED)
def test_pins_rederived_standalone(cutoff, tol, box, alpha, kmax, grid,
                                   ljgrid):
    a2, k2, g2, lg2 = _rederive_pin(cutoff, tol, box)
    assert abs(a2 - alpha) < 1e-9
    assert (k2, g2, lg2) == (kmax, grid, ljgrid)


@pytest.mark.parametrize("cutoff,tol,box,alpha,kmax,grid,ljgrid", PINNED)
def test_pinned_parameters(cutoff, tol, box, alpha, kmax, grid, ljgrid):
    b = np.diag([box, box, box])
    a, kx, ky, kz = ewald_params.calc_ewald_parameters(b, cutoff, tol)
    assert abs(a - alpha) < 1e-9
    assert (kx, ky, kz) == (kmax, kmax, kmax)
    a, nx, ny, nz = ewald_params.calc_pme_parameters(b, cutoff, tol)
    assert abs(a - alpha) < 1e-9
    assert (nx, ny, nz) == (grid, grid, grid)
    # LJPME dispersion: same alpha, grid without the factor 2
    a, nx, ny, nz = ewald_params.calc_pme_parameters(b, cutoff, tol,
                                                     dispersion=True)
    assert abs(a - alpha) < 1e-9
    assert (nx, ny, nz) == (ljgrid, ljgrid, ljgrid)


def test_find_zero_small_box_upper_crossing():
    """findZero walks from 10, so a small-k dip below tol before the error
    hump must not terminate the search early (unlike a naive k=1 walk-up)."""
    # contrived error profile via a tiny box: error(1) can already be < tol
    f = lambda k: ewald_params._ewald_error(k, 0.4, 1.2) - 0.05
    k = ewald_params._find_zero(f, 10)
    assert f(k) <= 0
    assert k == 1 or f(k - 1) > 0  # smallest k at the upper crossing


def test_user_supplied_parameters_take_precedence():
    b = np.diag([3.0, 3.0, 3.0])
    a, nx, ny, nz = ewald_params.calc_pme_parameters(
        b, 1.0, 5e-4, alpha=3.5, grid=(32, 40, 48))
    assert (a, nx, ny, nz) == (3.5, 32, 40, 48)


def test_in_context_pme_parameters_match_openmm():
    """getPMEParametersInContext on the Reference platform must report the
    OpenMM raw values (the reference Reference platform uses them as-is)."""
    cutoff, tol, box = 1.0, 5e-4, 3.0
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(2)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.LJPME)
    force.setCutoffDistance(cutoff)
    force.setEwaldErrorTolerance(tol)
    rng = np.random.default_rng(0)
    for i in range(24):
        system.addParticle(16.0)
        force.addParticle(0.1 * (-1) ** i, 0.3, 0.5)
        force.setParticleSubset(i, i % 2)
    system.addForce(force)
    ctx = nbs.Context(system, nbs.VerletIntegrator(0.001),
                      nbs.Platform.getPlatformByName("Reference"))
    ctx.setPositions(rng.random((24, 3)) * box)
    alpha, nx, ny, nz = force.getPMEParametersInContext(ctx)
    assert abs(alpha - 2.6282608849) < 1e-9
    assert (nx, ny, nz) == (25, 25, 25)
    dalpha, dx, dy, dz = force.getLJPMEParametersInContext(ctx)
    assert abs(dalpha - 2.6282608849) < 1e-9
    assert (dx, dy, dz) == (13, 13, 13)


def test_plan_grid_sizes_are_fft_legal():
    """build_plan legalizes auto-computed PME grid sizes to prime factors
    <= 13 (reference GPU platforms' findLegalDimension,
    CommonNonbondedSlicingKernels.cpp:440-449): a 9.99 nm box would land on
    the prime 89 raw."""
    from nonbondedslicing_tpu.ops import plan as plan_mod
    box = 9.986
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0),
                                        (0, 0, box))
    force = nbs.SlicedNonbondedForce(1)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.setCutoffDistance(0.9)
    force.setEwaldErrorTolerance(5e-4)
    for i in range(8):
        system.addParticle(16.0)
        force.addParticle(0.1 * (-1) ** i, 0.3, 0.5)
    system.addForce(force)
    raw = ewald_params.calc_pme_parameters(
        np.diag([box] * 3), 0.9, 5e-4)
    assert raw[1:] == (89, 89, 89)  # prime raw size
    plan = plan_mod.build_plan(force, system)
    assert plan.pme_grid == (90, 90, 90)
