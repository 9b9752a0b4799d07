"""Alchemical lambda sweep with a sliced nonbonded force — the library's
core use case, end to end through the public API.

A box of "solvent" molecules (subset 0) plus one "solute" molecule
(subset 1).  The solute-solvent slice (0,1) is scaled by a global
parameter ``lambda_sv``; because the total energy is linear in the
scaling parameter, dE/dlambda comes out of the same evaluation exactly
(no finite differences), and E(lambda) interpolates linearly between the
decoupled and fully-coupled endpoints.

Mirrors the workflow of the reference plugin's docs (README.md usage
example; scaling-parameter semantics from
openmmapi/src/SlicedNonbondedForce.cpp:121-130).

Run:  python examples/lambda_sweep.py          (CPU or TPU, ~1 min)
"""

import os
import sys

import numpy as np

# runnable in-place from a source checkout (python examples/lambda_sweep.py)
# without an installed wheel
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nonbondedslicing_tpu as nbs  # noqa: E402


def build(n_solvent=60, box=3.6, seed=7):
    rng = np.random.default_rng(seed)
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(2)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.setCutoffDistance(1.0)
    force.setEwaldErrorTolerance(5e-4)

    positions = []
    # solvent: neutral LJ dimers with partial charges, subset 0 (default)
    for k in range(n_solvent):
        a = system.addParticle(16.0)
        b = system.addParticle(1.0)
        force.addParticle(-0.4, 0.31, 0.65)
        force.addParticle(0.4, 0.12, 0.05)
        force.addException(a, b, 0.0, 1.0, 0.0)
        base = rng.random(3) * box
        positions += [base, base + rng.normal(scale=0.04, size=3)]
    # solute: one charged dimer, subset 1
    s0 = system.addParticle(16.0)
    s1 = system.addParticle(16.0)
    force.addParticle(0.6, 0.35, 0.8)
    force.addParticle(-0.6, 0.35, 0.8)
    force.addException(s0, s1, 0.0, 1.0, 0.0)
    force.setParticleSubset(s0, 1)
    force.setParticleSubset(s1, 1)
    center = np.full(3, box / 2)
    positions += [center, center + (0.25, 0.0, 0.0)]

    # lambda_sv scales the solute-solvent slice (subsets 0 x 1), both
    # Coulomb and LJ; request its exact derivative
    force.addGlobalParameter("lambda_sv", 1.0)
    force.addScalingParameter("lambda_sv", 0, 1, True, True)
    force.addEnergyParameterDerivative("lambda_sv")
    system.addForce(force)
    return system, np.asarray(positions)


def main():
    system, positions = build()
    platform = nbs.Platform.getPlatformByName("Reference")  # f64 oracle
    context = nbs.Context(system, nbs.VerletIntegrator(0.001), platform)
    context.setPositions(positions)

    print(" lambda    E(lambda) [kJ/mol]    dE/dlambda (exact)")
    energies, derivs = [], []
    for lam in (0.0, 0.25, 0.5, 0.75, 1.0):
        context.setParameter("lambda_sv", lam)
        state = context.getState(getEnergy=True, getParameterDerivatives=True)
        e = state.getPotentialEnergy()
        d = state.getEnergyParameterDerivatives()["lambda_sv"]
        energies.append(e)
        derivs.append(d)
        print(f"  {lam:4.2f}   {e:18.6f}   {d:18.6f}")

    # linearity: every dE/dlambda equals the endpoint difference, exactly
    de = energies[-1] - energies[0]
    assert all(abs(d - de) < 1e-6 * max(abs(de), 1) for d in derivs), derivs
    print(f"\n E(1) - E(0) = {de:.6f} = dE/dlambda at every window "
          "(energy is lambda-linear; free-energy gradients are exact)")

    # short MD at the half-coupled state
    context.setParameter("lambda_sv", 0.5)
    context.getIntegrator().step(50)
    e_md = context.getState(getEnergy=True).getPotentialEnergy()
    print(f" 50 MD steps at lambda=0.5: E = {e_md:.4f}")


if __name__ == "__main__":
    main()
