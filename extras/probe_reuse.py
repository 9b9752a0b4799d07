#!/usr/bin/env python
"""Reuse-window (K) sweep of the fused MD step at bench scale.

The make_md_step default picks K from a conservative 8 nm/ps tail-speed
bound (runtime/fastpath.py); with rigid-water SHAKE the fastest hydrogens
never sustain that, so larger K may hold.  Measures slope ms/step per K and
reports whether the in-trace skin guard tripped.

    python extras/probe_reuse.py [K ...]     (default: 3 4 6 8 10)
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

def measure(run, pos, vel, box_arr, gvals, data, n1=30, n2=120):
    """Slope ms/step from two chained device-resident run() windows."""
    # warm both trip counts (rem/outer split differs)
    p, v, _ = run(jnp.asarray(pos, jnp.float32),
                  jnp.asarray(vel, jnp.float32), box_arr, gvals, data, n1)
    p, v, _ = run(p, v, box_arr, gvals, data, n2)
    ts = {}
    for n in (n1, n2, n1, n2):
        # run() donates its pos/vel buffers — time from fresh copies so the
        # base state survives every timed call
        q, w = jnp.copy(p), jnp.copy(v)
        jax.block_until_ready((q, w))
        t0 = time.perf_counter()
        q, w, e = run(q, w, box_arr, gvals, data, n)
        float(e)
        ts.setdefault(n, []).append(time.perf_counter() - t0)
    return (min(ts[n2]) - min(ts[n1])) / (n2 - n1) * 1e3


def main():
    ks = [int(a) for a in sys.argv[1:]] or [3, 4, 6, 8, 10]
    import bench
    from nonbondedslicing_tpu.ops import engine as engine_mod
    from nonbondedslicing_tpu.ops import plan as plan_mod
    from nonbondedslicing_tpu.ops.neighbors import choose_cell_grid
    from nonbondedslicing_tpu.runtime import native
    from nonbondedslicing_tpu.runtime.fastpath import make_md_step

    system, force, positions, box, bonds, constraints = bench.build_system()
    blob = np.load(os.path.join(os.path.dirname(__file__),
                                "bench_state_rigid.npz"))
    positions, velocities = blob["positions"], blob["velocities"]
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    box_arr = jnp.asarray(np.diag([box, box, box]), dtype)
    gvals = jnp.asarray([1.0, 1.0], dtype)
    masses = np.tile([15.999, 1.008, 1.008], plan.num_particles // 3)

    cfg0 = choose_cell_grid(plan.box0, plan.cutoff, plan.num_particles,
                            target_skin=0.1)
    occ = native.max_cell_occupancy(positions, plan.box0, cfg0[0])
    cell_capacity = max(8, int(np.ceil((occ + 8) / 4) * 4))

    results = {}
    for k in ks:
        t_build = time.perf_counter()
        run = make_md_step(plan, masses, dt=0.002, dtype=dtype,
                           bonds=bonds or None, constraints=constraints,
                           cell_capacity=cell_capacity, reuse_steps=k,
                           target_skin=0.1)
        print(f"K={k}: config={run.config} "
              f"(build {time.perf_counter() - t_build:.0f}s)", flush=True)
        try:
            ms = measure(run, positions, velocities, box_arr, gvals, data)
        except Exception as exc:
            print(f"K={k}: FAILED {exc}", flush=True)
            continue
        results[k] = ms
        print(f"K={k}: {ms:.3f} ms/step = {0.002 * 86400.0 / ms:.1f} ns/day",
              flush=True)
    print(results)


if __name__ == "__main__":
    main()
