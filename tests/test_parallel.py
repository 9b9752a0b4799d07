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
