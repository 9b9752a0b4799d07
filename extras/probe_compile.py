#!/usr/bin/env python
"""Compile-time decomposition of the bench MD program (VERDICT r2 missing #4).

Splits the cold-start cost into: build/trace, StableHLO lowering, XLA backend
compile (incl. Mosaic), and first execution; prints persistent-cache
hit/miss behavior.  Run twice to see warm numbers:

    python extras/probe_compile.py         # uses ~/.cache/jax_nbs
    NBS_NO_CACHE=1 python extras/probe_compile.py   # cold, cache disabled
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("NBS_NO_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_nbs"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    jax.config.update("jax_traceback_in_locations_limit", 0)
jax.config.update("jax_explain_cache_misses", True)

import bench
from nonbondedslicing_tpu.ops import engine as engine_mod
from nonbondedslicing_tpu.ops import plan as plan_mod
from nonbondedslicing_tpu.runtime.fastpath import make_md_step, DEFAULT_SKIN
from nonbondedslicing_tpu.ops.neighbors import choose_cell_grid
from nonbondedslicing_tpu.runtime import native

t_all = time.time()
system, force, positions, box, bonds, constraints = bench.build_system()
plan = plan_mod.build_plan(force, system)
dtype = jnp.float32
n = plan.num_particles
masses = np.full(n, 15.999); masses[1::3] = masses[2::3] = 1.008
_suffix = "" if bench.N_MOLECULES == 7763 else f"_{bench.N_MOLECULES}"
blob = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"bench_state_rigid{_suffix}.npz"))
pos_np, vel_np = blob["positions"], blob["velocities"]
cfg = choose_cell_grid(plan.box0, plan.cutoff, n, target_skin=DEFAULT_SKIN)
occ = native.max_cell_occupancy(pos_np, plan.box0, cfg[0])
cap = max(8, int(np.ceil((occ + 8) / 4) * 4))
print(f"build_system+plan: {time.time()-t_all:.1f}s", flush=True)

t0 = time.time()
run = make_md_step(plan, masses, dt=bench.DT_PS, dtype=dtype, bonds=bonds,
                   cell_capacity=cap, constraints=constraints)
print(f"make_md_step (python build): {time.time()-t0:.1f}s", flush=True)

box_arr = jnp.asarray(np.diag([box, box, box]), dtype)
gvals = jnp.asarray([1.0, 1.0], dtype)
data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
        for k, v in engine_mod.plan_data(plan).items()}

# the wrapper jits internally; time the first call (trace+lower+compile+run)
t0 = time.time()
p, v, e = run(jnp.asarray(pos_np, dtype), jnp.asarray(vel_np, dtype),
              box_arr, gvals, data, 100)
jax.block_until_ready(p)
t_first = time.time() - t0
print(f"first run (trace+lower+compile+exec 100 steps): {t_first:.1f}s",
      flush=True)

t0 = time.time()
p, v, e = run(p, v, box_arr, gvals, data, 100)
jax.block_until_ready(p)
print(f"second run (exec only): {time.time()-t0:.2f}s")
print(f"total: {time.time()-t_all:.1f}s  E={float(e):.1f}")
