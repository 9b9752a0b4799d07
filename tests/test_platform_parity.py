"""Cross-platform parity: fast f32 path vs the double-precision Reference
oracle, mirroring the reference's Python test
(python/tests/TestSlicedNonbondedForce.py:113-180: 1200 particles, every
method, forces and energy to single-precision tolerance)."""

import numpy as np
import pytest

import nonbondedslicing_tpu as nbs

# Tightened from the reference's single-precision 1e-3
# (TestSlicedNonbondedForce.h:1039): per-slice energy scalars accumulate in
# f64 on every engine (see ops/direct.py slice_reduce), so the fast path's
# residual error is per-pair f32 rounding only.  Measured on this config:
# relE 2.3e-5, relF 3.6e-5, relD 3.3e-5 (dominated by close-contact pair
# terms of the uniform-random positions); on an equilibrated liquid the
# energy parity is ~3e-7 (see test_equilibrated_regime_energy_parity).
TOL = 2e-4


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


def test_equilibrated_regime_energy_parity():
    """In the physically relevant regime (no steric clashes, total energy
    riding on the ~1e6 kJ/mol self-energy cancellation) the f32 fast path's
    total energy matches the f64 oracle to ~1e-6 relative, because all
    per-slice energy reductions accumulate in f64.  Pre-change this was
    ~2e-4 (measured on the 23k-atom bench state: 1.9e-4 -> 2.7e-7)."""
    n_mol = 600
    rng = np.random.default_rng(7)
    box = float(np.cbrt(3 * n_mol / 100.2))
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(3)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.setCutoffDistance(0.9)
    positions = np.zeros((3 * n_mol, 3))
    m = int(np.ceil(n_mol ** (1 / 3)))
    spacing = box / m
    for k in range(n_mol):
        iz, r = divmod(k, m * m)
        iy, ix = divmod(r, m)
        center = (np.array([ix, iy, iz]) + 0.5) * spacing
        center += rng.uniform(-0.05, 0.05, 3) * spacing
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        perp = np.cross(axis, rng.normal(size=3))
        perp /= np.linalg.norm(perp)
        o = 3 * k
        positions[o] = center
        positions[o + 1] = center + 0.0586 * axis + 0.0757 * perp
        positions[o + 2] = center + 0.0586 * axis - 0.0757 * perp
        for idx, (q, sig, eps) in enumerate([(-0.834, 0.3151, 0.6364),
                                             (0.417, 0.04, 0.192),
                                             (0.417, 0.04, 0.192)]):
            system.addParticle(15.999 if idx == 0 else 1.008)
            force.addParticle(q, sig, eps)
            force.setParticleSubset(o + idx, k % 3)
        force.addException(o, o + 1, 0, 1, 0)
        force.addException(o, o + 2, 0, 1, 0)
        force.addException(o + 1, o + 2, 0, 1, 0)
    system.addForce(force)
    energies = {}
    for platform in ("Reference", "TPU"):
        ctx = nbs.Context(system, nbs.VerletIntegrator(0.001),
                          nbs.Platform.getPlatformByName(platform))
        ctx.setPositions(positions)
        energies[platform] = ctx.getState(getEnergy=True).getPotentialEnergy()
    rel = (abs(energies["TPU"] - energies["Reference"])
           / abs(energies["Reference"]))
    assert rel < 1e-5, (energies, rel)
