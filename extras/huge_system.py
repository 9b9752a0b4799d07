#!/usr/bin/env python
"""Huge-system gradient-consistency check — the analog of the reference's
testHugeSystem (tests/TestSlicedNonbondedForce.h:557-612): a 150^3-site
switched-LJ CutoffPeriodic crystal (3.375M particles, 2 subsets), asserting
force/energy consistency E(x) - E(x+d) ~= F.d along the gradient to 1e-4.

Run on TPU: python extras/huge_system.py [side]   (default side=150)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(side=150):
    import jax
    import jax.numpy as jnp

    import nonbondedslicing_tpu as nbs
    from nonbondedslicing_tpu.ops import engine as engine_mod
    from nonbondedslicing_tpu.ops import plan as plan_mod
    from nonbondedslicing_tpu.ops.params import slice_lambdas

    n = side ** 3
    spacing = 0.3
    box = side * spacing
    print(f"{n:,} particles, box {box:.1f} nm", flush=True)

    force = nbs.SlicedNonbondedForce(2)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffPeriodic)
    force.setCutoffDistance(1.0)
    force.setUseSwitchingFunction(True)
    force.setSwitchingDistance(0.9)
    force.setUseDispersionCorrection(False)
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    # bulk public construction API (System.addParticles /
    # NonbondedForce.addParticles / setParticleSubsets)
    system.addParticles(np.ones(n))
    force.addParticles(np.tile([0.0, 0.1, 1.0], (n, 1)))
    subs = np.arange(n) % 2
    force.setParticleSubsets(np.nonzero(subs)[0], 1)
    system.addForce(force)

    rng = np.random.default_rng(7)
    ix = np.arange(n)
    positions = np.stack([(ix // (side * side)) % side,
                          (ix // side) % side,
                          ix % side], axis=1) * spacing
    positions = positions + rng.random((n, 3)) * 0.1

    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    compute = jax.jit(engine_mod.make_compute(plan, True, False))
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    pos = jnp.asarray(positions, dtype)
    boxj = jnp.asarray(np.diag([box] * 3), dtype)
    gvals = jnp.zeros((0,), dtype)

    t0 = time.time()
    e1, f1 = compute(pos, boxj, gvals, data)
    jax.block_until_ready(f1)
    t1 = time.time()
    e1, f1 = compute(pos, boxj, gvals, data)
    jax.block_until_ready(f1)
    t2 = time.time()
    lam = slice_lambdas(plan.lam_source, gvals)
    norm = float(jnp.sqrt(jnp.sum(f1.astype(jnp.float64) ** 2)))
    # central difference along the gradient (TestSlicedNonbondedForce.h:598)
    delta = 0.3
    step = 0.5 * delta / norm
    e2, _ = compute(pos - step * f1, boxj, gvals, data)
    e3, _ = compute(pos + step * f1, boxj, gvals, data)
    E2 = float(engine_mod.contract_energy(e2, lam))
    E3 = float(engine_mod.contract_energy(e3, lam))
    got = E2 - E3
    expected = norm * delta
    rel = abs(got - expected) / abs(expected)
    print(f"compile+run={t1-t0:.1f}s eval={t2-t1:.3f}s "
          f"E={float(engine_mod.contract_energy(e1, lam)):.1f} "
          f"dE={got:.4f} vs {expected:.4f} rel={rel:.2e}", flush=True)
    assert rel < 1e-3, rel
    print("huge-system gradient consistency OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 150)
