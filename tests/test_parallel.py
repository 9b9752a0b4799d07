"""Multi-chip sharding tests on an 8-device virtual CPU mesh.

The reference's entire distributed test strategy is comparing a multi-device
run against the single-context result on the same data
(testParallelComputation, TestCudaSlicedNonbondedForce.cpp:53-64); we do the
same: the shard_map-sharded compute must match the single-device engine to
float tolerance, and an MD step must execute on the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops import engine as engine_mod
from nonbondedslicing_tpu.ops import plan as plan_mod
from nonbondedslicing_tpu.parallel.mesh import (make_multichip_md_step,
                                                make_sharded_compute)


def _system(method, n_mol=32, box=3.0, seed=3):
    rng = np.random.default_rng(seed)
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(3)
    force.setNonbondedMethod(method)
    force.setCutoffDistance(0.9)
    n = 2 * n_mol
    positions = rng.random((n, 3)) * box
    for k in range(n_mol):
        system.addParticle(16.0)
        system.addParticle(1.0)
        force.addParticle(-0.5, 0.3, 0.5)
        force.addParticle(0.5, 0.1, 0.0)
        force.addException(2 * k, 2 * k + 1, 0.0, 1.0, 0.0)
        force.setParticleSubset(2 * k, k % 3)
        force.setParticleSubset(2 * k + 1, k % 3)
    force.addGlobalParameter("lam", 0.7)
    force.addScalingParameter("lam", 0, 1, True, True)
    system.addForce(force)
    return system, force, positions


@pytest.mark.parametrize("method", [nbs.NonbondedForce.CutoffPeriodic,
                                    nbs.NonbondedForce.PME,
                                    nbs.NonbondedForce.LJPME,
                                    nbs.NonbondedForce.Ewald])
def test_sharded_matches_single_device(method):
    system, force, positions = _system(method)
    plan = plan_mod.build_plan(force, system)
    data = engine_mod.plan_data(plan)
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()))
    gvals = jnp.asarray([0.7])
    pos = jnp.asarray(positions)

    single = jax.jit(engine_mod.make_compute(plan, True, True))
    e_single, f_single = single(pos, box, gvals, data)

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("atoms",))
    sharded = jax.jit(make_sharded_compute(plan, mesh))
    e_sharded, f_sharded = sharded(pos, box, gvals, data)

    np.testing.assert_allclose(np.asarray(e_single), np.asarray(e_sharded),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(f_single), np.asarray(f_sharded),
                               rtol=1e-10, atol=1e-10)


def test_multichip_md_step_runs():
    system, force, positions = _system(nbs.NonbondedForce.PME)
    plan = plan_mod.build_plan(force, system)
    masses = np.tile([16.0, 1.0], len(positions) // 2)
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("atoms",))
    step = make_multichip_md_step(plan, masses, dt=0.001, mesh=mesh,
                                  dtype=jnp.float64)
    data = engine_mod.plan_data(plan)
    pos = jnp.asarray(positions)
    vel = jnp.zeros_like(pos)
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()))
    gvals = jnp.asarray([0.7])
    pos2, vel2, energy = step(pos, vel, box, gvals, data)
    assert np.isfinite(float(energy))
    assert pos2.shape == pos.shape
    # a second step keeps running (jit cache) and changes state
    pos3, vel3, _ = step(pos2, vel2, box, gvals, data)
    assert not np.allclose(np.asarray(pos2), np.asarray(pos3))


def _water_system(n_mol=40, box=3.2, seed=9, nsub=3,
                  method=nbs.SlicedNonbondedForce.PME, offsets=False):
    """Rigid 3-site waters on a lattice: triangle exclusions + constraints
    (the production regime of the sharded MD step)."""
    rng = np.random.default_rng(seed)
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(nsub)
    force.setNonbondedMethod(method)
    force.setCutoffDistance(0.9)
    grid = int(np.ceil(n_mol ** (1 / 3)))
    sites = np.stack(np.meshgrid(*[np.arange(grid)] * 3,
                                 indexing="ij"), -1).reshape(-1, 3)
    sites = (sites[:n_mol] + 0.5) * (box / grid)
    positions = np.empty((3 * n_mol, 3))
    d_oh, d_hh = 0.09572, 0.15139
    for m in range(n_mol):
        system.addParticle(15.999)
        system.addParticle(1.008)
        system.addParticle(1.008)
        force.addParticle(-0.834, 0.3151, 0.6364)
        force.addParticle(0.417, 0.04, 0.192)
        force.addParticle(0.417, 0.04, 0.192)
        o = 3 * m
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        perp = np.cross(axis, rng.normal(size=3))
        perp /= np.linalg.norm(perp)
        half = d_hh / 2
        h = np.sqrt(d_oh ** 2 - half ** 2)
        positions[o] = sites[m]
        positions[o + 1] = sites[m] + h * axis + half * perp
        positions[o + 2] = sites[m] + h * axis - half * perp
        for a, b in ((0, 1), (0, 2), (1, 2)):
            force.addException(o + a, o + b, 0.0, 1.0, 0.0)
        for a in range(3):
            force.setParticleSubset(o + a, (m + a) % nsub)
        system.addConstraint(o, o + 1, d_oh)
        system.addConstraint(o, o + 2, d_oh)
        system.addConstraint(o + 1, o + 2, d_hh)
    force.addGlobalParameter("lam", 0.8)
    force.addScalingParameter("lam", 0, 1, True, True)
    if offsets:
        # parameter offsets riding separate globals: per-particle charge/eps
        # offsets on a few atoms + one exception offset turning a zeroed
        # 1-4 back on — exercises the traced offsets->params path
        force.addGlobalParameter("qscale", 0.6)
        force.addGlobalParameter("xscale", 0.25)
        for m in range(0, n_mol, 5):
            force.addParticleParameterOffset("qscale", 3 * m, 0.05, 0.0, 0.1)
        force.addExceptionParameterOffset("xscale", 0, 0.02, 0.0, 0.03)
    system.addForce(force)
    return system, force, positions


def test_sharded_md_step_matches_host_loop():
    """The production sharded MD scan (spatial slab decomposition, per-shard
    prepare, K-step blocks, sharded PME + bonded terms, constraints) must
    reproduce an explicit f64 host loop over the all-pairs engine."""
    from nonbondedslicing_tpu.parallel.fused_shard import make_sharded_md_step
    from nonbondedslicing_tpu.runtime.constraints import (cluster_constraints,
                                                          make_constrainer)

    system, force, positions = _water_system()
    plan = plan_mod.build_plan(force, system)
    n = plan.num_particles
    data = engine_mod.plan_data(plan)  # f64 under x64
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()))
    gvals = jnp.asarray([0.8])
    masses = np.array([system.getParticleMass(i) for i in range(n)])
    cons = cluster_constraints(
        [system.getConstraintParameters(i)
         for i in range(system.getNumConstraints())], n)
    dt = 0.001
    n_steps = 5

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("x",))
    run = make_sharded_md_step(plan, masses, dt, mesh, axis="x",
                               dtype=jnp.float64, constraints=cons,
                               reuse_steps=2, cell_capacity=32)
    assert run.config["reuse_steps"] == 2  # K-step blocks per dispatch
    pos0 = jnp.asarray(positions)
    vel0 = jnp.asarray(np.random.default_rng(4).normal(
        scale=0.3, size=(n, 3)))
    pos_s, vel_s, e_s = run(pos0, vel0, box, gvals, data, n_steps)

    # explicit host reference: all-pairs engine + same leapfrog/M-SHAKE
    compute = jax.jit(engine_mod.make_compute(plan, True, True,
                                              neighbor="all_pairs"))
    proj_x, proj_v = make_constrainer(cons[0], cons[1], masses, n,
                                      dtype=jnp.float64, mask=cons[2])
    inv_m = jnp.asarray(np.where(masses > 0, 1.0 / masses, 0.0))[:, None]
    p, v = pos0, vel0
    for _ in range(n_steps):
        _, f = compute(p, box, gvals, data)
        v = v + dt * f * inv_m
        pn = proj_x(p, p + dt * v)
        v = proj_v(pn, (pn - p) / dt)
        p = pn
    e_ref, _ = compute(p, box, gvals, data)
    from nonbondedslicing_tpu.ops.params import slice_lambdas
    e_ref_total = float(engine_mod.contract_energy(
        e_ref, slice_lambdas(plan.lam_source, gvals)))

    np.testing.assert_allclose(np.asarray(pos_s), np.asarray(p),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vel_s), np.asarray(v),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(float(e_s), e_ref_total, rtol=1e-9)


def test_sharded_md_step_ljpme_offsets_matches_host_loop():
    """LJPME + particle/exception parameter offsets through the PRODUCTION
    sharded MD scan vs the explicit f64 host loop — the method x offsets
    case the PME-only parity test above does not cover."""
    from nonbondedslicing_tpu.parallel.fused_shard import make_sharded_md_step
    from nonbondedslicing_tpu.runtime.constraints import (cluster_constraints,
                                                          make_constrainer)

    system, force, positions = _water_system(
        method=nbs.SlicedNonbondedForce.LJPME, offsets=True)
    plan = plan_mod.build_plan(force, system)
    n = plan.num_particles
    data = engine_mod.plan_data(plan)
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()))
    gvals = jnp.asarray([0.8, 0.6, 0.25])     # lam, qscale, xscale
    masses = np.array([system.getParticleMass(i) for i in range(n)])
    cons = cluster_constraints(
        [system.getConstraintParameters(i)
         for i in range(system.getNumConstraints())], n)
    dt = 0.001
    n_steps = 4

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("x",))
    run = make_sharded_md_step(plan, masses, dt, mesh, axis="x",
                               dtype=jnp.float64, constraints=cons,
                               reuse_steps=2, cell_capacity=32)
    pos0 = jnp.asarray(positions)
    vel0 = jnp.asarray(np.random.default_rng(8).normal(
        scale=0.3, size=(n, 3)))
    pos_s, vel_s, e_s = run(pos0, vel0, box, gvals, data, n_steps)

    compute = jax.jit(engine_mod.make_compute(plan, True, True,
                                              neighbor="all_pairs"))
    proj_x, proj_v = make_constrainer(cons[0], cons[1], masses, n,
                                      dtype=jnp.float64, mask=cons[2])
    inv_m = jnp.asarray(np.where(masses > 0, 1.0 / masses, 0.0))[:, None]
    p, v = pos0, vel0
    for _ in range(n_steps):
        _, f = compute(p, box, gvals, data)
        v = v + dt * f * inv_m
        pn = proj_x(p, p + dt * v)
        v = proj_v(pn, (pn - p) / dt)
        p = pn
    e_ref, _ = compute(p, box, gvals, data)
    from nonbondedslicing_tpu.ops.params import slice_lambdas
    e_ref_total = float(engine_mod.contract_energy(
        e_ref, slice_lambdas(plan.lam_source, gvals)))

    np.testing.assert_allclose(np.asarray(pos_s), np.asarray(p),
                               rtol=0, atol=5e-9)
    # velocities difference positions across one dt: |dv| ~ |dx| / dt
    np.testing.assert_allclose(np.asarray(vel_s), np.asarray(v),
                               rtol=0, atol=5e-6)
    np.testing.assert_allclose(float(e_s), e_ref_total, rtol=1e-9)
    # the offsets must actually matter: rerun with the offset globals zeroed
    e2 = run(pos0, vel0, box, jnp.asarray([0.8, 0.0, 0.0]), data,
             n_steps)[2]
    assert abs(float(e2) - float(e_s)) > 1e-6


def test_sharded_md_step_skin_and_overflow_guards():
    from nonbondedslicing_tpu.parallel.fused_shard import make_sharded_md_step
    from nonbondedslicing_tpu.runtime.constraints import cluster_constraints

    system, force, positions = _water_system()
    plan = plan_mod.build_plan(force, system)
    n = plan.num_particles
    data = engine_mod.plan_data(plan)
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()))
    gvals = jnp.asarray([0.8])
    masses = np.array([system.getParticleMass(i) for i in range(n)])
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("x",))
    # tiny capacity -> overflow must raise, not silently drop
    run = make_sharded_md_step(plan, masses, 0.001, mesh, axis="x",
                               dtype=jnp.float64, cell_capacity=4,
                               reuse_steps=1)
    with pytest.raises(nbs.OpenMMException, match="overflow"):
        run(jnp.asarray(positions), jnp.zeros((n, 3)), box, gvals, data, 1)
