#!/usr/bin/env python
"""NVE energy drift of the production MD fastpath on REAL TPU hardware.

tests/test_md_conservation.py pins conservation on the CPU backend; this
runs the same check at full bench scale on the chip the officials are
measured on: 10 x 500 steps (10 ps at 2 fs) from the equilibrated 23k
state, total energy (potential from the engine + kinetic from velocities)
reported per chunk.  Rigid-water leapfrog+SHAKE/RATTLE at 2 fs should
drift O(1e-4) of |E| per ns or less.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_traceback_in_locations_limit", 0)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_nbs"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import bench
from nonbondedslicing_tpu.ops import engine as engine_mod
from nonbondedslicing_tpu.ops import plan as plan_mod
from nonbondedslicing_tpu.ops.neighbors import choose_cell_grid
from nonbondedslicing_tpu.runtime import native
from nonbondedslicing_tpu.runtime.fastpath import make_md_step, DEFAULT_SKIN


def main():
    system, force, positions, box, bonds, constraints = bench.build_system()
    if os.environ.get("NBS_NVE_SWITCH") == "1":
        # LJ switching: isolates the cutoff-truncation contribution to the
        # drift (the force discontinuity at r=cutoff deposits ~F(rc)*v*dt
        # per crossing; switching removes the LJ part of the jump)
        force.setUseSwitchingFunction(True)
        force.setSwitchingDistance(0.75)
        print("# LJ switching ON (0.75 -> 0.9 nm)", flush=True)
    blob = np.load(os.path.join(os.path.dirname(__file__),
                                "bench_state_rigid.npz"))
    pos_np, vel_np = blob["positions"], blob["velocities"]
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    n = plan.num_particles
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    masses = np.full(n, 15.999)
    masses[1::3] = masses[2::3] = 1.008
    cfg0 = choose_cell_grid(plan.box0, plan.cutoff, n,
                            target_skin=DEFAULT_SKIN)
    occ = native.max_cell_occupancy(pos_np, plan.box0, cfg0[0])
    cap = max(8, int(np.ceil((occ + 14) / 4) * 4))
    mixed = os.environ.get("NBS_NVE_MIXED", "1") == "1"
    print(f"# mixed_precision={mixed}", flush=True)
    run = make_md_step(plan, masses, dt=0.002, dtype=dtype, bonds=bonds,
                       cell_capacity=cap, constraints=constraints,
                       mixed_precision=mixed)
    box_arr = jnp.asarray(np.diag([box, box, box]), dtype)
    gvals = jnp.asarray([1.0, 1.0], dtype)
    m = jnp.asarray(masses, dtype)[:, None]
    pos = jnp.asarray(pos_np, dtype)
    vel = jnp.asarray(vel_np, dtype)
    es = []
    for chunk in range(10):
        pos, vel, e_pot = run(pos, vel, box_arr, gvals, data, 500)
        # leapfrog: velocities are at t - dt/2; the half-step offset is a
        # constant bias that cancels in the drift
        e_kin = float(0.5 * jnp.sum(m * vel * vel))
        e_tot = float(e_pot) + e_kin
        es.append(e_tot)
        print(f"chunk {chunk}: E_pot={float(e_pot):.1f} "
              f"E_kin={e_kin:.1f} E_tot={e_tot:.1f}", flush=True)
    es = np.asarray(es)
    drift_per_ns = (es[-1] - es[0]) / (9 * 0.5 * 0.002 * 500) / 1e3 * 1e3
    # 9 intervals x 1 ps each
    drift = (es[-1] - es[0]) / 9.0  # kJ/mol per ps
    rel = abs(drift * 1000.0) / abs(es.mean())
    print(f"drift: {drift:+.2f} kJ/mol/ps = {rel:.2e} |E|/ns "
          f"(mean E {es.mean():.1f}, spread {es.max()-es.min():.1f})",
          flush=True)


if __name__ == "__main__":
    main()
