"""NVE energy conservation through the public integrator fast path.

A leapfrog + SHAKE/RATTLE step with consistent forces must conserve
PE + KE to a small drift; systematic heating would indicate inconsistent
forces (e.g. dropped PME window contributions or stale neighbor tiles).
"""

import numpy as np
import jax.numpy as jnp

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops import engine as engine_mod
from nonbondedslicing_tpu.ops import plan as plan_mod
from nonbondedslicing_tpu.runtime.fastpath import make_md_step

D_OH, D_HH = 0.09572, 0.15139


def _water_box(n_mol=125, seed=3):
    rng = np.random.default_rng(seed)
    n_atoms = 3 * n_mol
    box = float(np.cbrt(n_atoms / 100.2))
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(2)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.setCutoffDistance(0.75)
    positions = np.zeros((n_atoms, 3))
    cons_p, cons_d = [], []
    m = int(round(n_mol ** (1 / 3)))
    sp = box / m
    for k in range(n_mol):
        iz, r = divmod(k, m * m)
        iy, ix = divmod(r, m)
        c = (np.array([ix, iy, iz]) + 0.5) * sp + rng.uniform(-0.03, 0.03, 3) * sp
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        perp = np.cross(axis, rng.normal(size=3))
        perp /= np.linalg.norm(perp)
        half = D_HH / 2
        h = np.sqrt(D_OH ** 2 - half ** 2)
        o = 3 * k
        positions[o] = c
        positions[o + 1] = c + h * axis + half * perp
        positions[o + 2] = c + h * axis - half * perp
        system.addParticle(15.999)
        system.addParticle(1.008)
        system.addParticle(1.008)
        force.addParticle(-0.834, 0.3151, 0.6364)
        force.addParticle(0.417, 0.04, 0.192)
        force.addParticle(0.417, 0.04, 0.192)
        for a, b in ((o, o + 1), (o, o + 2), (o + 1, o + 2)):
            force.addException(a, b, 0, 1, 0)
        for a in range(3):
            force.setParticleSubset(o + a, k % 2)
        cons_p.append([[o, o + 1], [o, o + 2], [o + 1, o + 2]])
        cons_d.append([D_OH, D_OH, D_HH])
    force.addGlobalParameter("lam", 1.0)
    force.addScalingParameter("lam", 0, 1, True, True)
    system.addForce(force)
    masses = np.tile([15.999, 1.008, 1.008], n_mol)
    return system, force, positions, masses, (cons_p, cons_d), box


def test_nve_energy_conservation_rigid_water():
    system, force, positions, masses, constraints, box = _water_box()
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    run = make_md_step(plan, masses, dt=0.001, dtype=dtype,
                       constraints=constraints, reuse_steps=4)
    pos = jnp.asarray(positions, dtype)
    vel = jnp.zeros_like(pos)
    box_arr = jnp.asarray(np.diag([box] * 3), dtype)
    gvals = jnp.asarray([1.0], dtype)

    # settle the lattice (discard), then measure drift over 60 x 1 fs
    pos, vel, _ = run(pos, vel, box_arr, gvals, data, 40)

    def total_energy(p, v):
        pe, _, _ = None, None, None
        # PE via a 1-step-less call is awkward; use the oracle engine
        compute = engine_mod.make_compute(plan, True, True,
                                          neighbor="all_pairs")
        from nonbondedslicing_tpu.ops.params import slice_lambdas
        se, _ = compute(jnp.asarray(p, jnp.float64), box_arr.astype(jnp.float64),
                        gvals.astype(jnp.float64),
                        engine_mod.plan_data(plan))
        lam = slice_lambdas(plan.lam_source, gvals.astype(jnp.float64))
        pe = float(engine_mod.contract_energy(se, lam))
        ke = 0.5 * float(np.sum(masses[:, None] * np.asarray(v, np.float64) ** 2))
        return pe + ke, ke

    e0, ke0 = total_energy(pos, vel)
    pos, vel, _ = run(pos, vel, box_arr, gvals, data, 60)
    e1, ke1 = total_energy(pos, vel)
    # drift bounded by a small fraction of the kinetic energy scale
    assert abs(e1 - e0) < 0.05 * max(ke0, ke1, 100.0), (e0, e1, ke0, ke1)


def test_mixed_precision_default_and_trajectory_consistency():
    """Round 5: Platform Precision "mixed" (opt-in, like the reference CUDA
    platform whose default is likewise "single") carries positions as a
    double-single (hi, lo) f32 pair with compensated updates and solves
    constraints at f32 in a per-cluster local frame.  The mixed trajectory
    must track the pure-f32 one over a short horizon (identical forces,
    integration differs only at f32 rounding); the f32 heating measured on
    hardware (~540 kJ/mol/ps at 23k, extras/probe_nve_tpu.py) comes from
    the absolute-coordinate f32 rounding this removes."""
    system, force, positions, masses, constraints, box = _water_box()
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    box_arr = jnp.asarray(np.diag([box] * 3), dtype)
    gvals = jnp.asarray([1.0], dtype)

    run_mix = make_md_step(plan, masses, dt=0.001, dtype=dtype,
                           constraints=constraints, reuse_steps=4,
                           mixed_precision=True)
    run_f32 = make_md_step(plan, masses, dt=0.001, dtype=dtype,
                           constraints=constraints, reuse_steps=4)
    assert run_mix.config["mixed_precision"] is True
    assert run_f32.config["mixed_precision"] is False

    pos0 = jnp.asarray(positions, dtype)
    vel0 = jnp.zeros_like(pos0)
    p_m, v_m, e_m = run_mix(pos0, vel0, box_arr, gvals, data, 10)
    p_f, v_f, e_f = run_f32(jnp.asarray(positions, dtype),
                            jnp.zeros_like(pos0), box_arr, gvals, data, 10)
    assert p_m.dtype == jnp.float64 and p_f.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(p_m, np.float64),
                               np.asarray(p_f, np.float64), atol=1e-4)
    np.testing.assert_allclose(float(e_m), float(e_f),
                               rtol=0, atol=1e-3 * abs(float(e_f)) + 1.0)
    # constraints hold on the f64 state to f32 projection accuracy
    p = np.asarray(p_m, np.float64)
    d01 = np.linalg.norm(p[0] - p[1])
    assert abs(d01 - D_OH) < 5e-6, d01
