#!/usr/bin/env python
"""AOT cross-lower the full bench MD program at the official shapes.

Runs the complete Mosaic TPU kernel lowering (no device needed) of
runtime.fastpath.make_md_step — constraints, bonds, fused engine — at the
exact configurations bench.py will compile on hardware: 7,763 and 33,333
molecules.  Catches shape-dependent Mosaic constraint
violations (VMEM block limits, lane alignment) before tunnel time is spent.

    JAX_PLATFORMS=cpu python extras/lower_bench_shapes.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# sitecustomize may have imported jax with the axon TPU platform selected;
# this script is pure host-side lowering — force CPU at the config level
# (the env var alone is too late, tests/conftest.py) so a dead tunnel can
# never hang it.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

jax.config.update("jax_traceback_in_locations_limit", 0)


def lower_one(n_mol):
    os.environ["NBS_MOLECULES"] = str(n_mol)
    # bench reads its config at import time; reload for each molecule count
    import importlib
    import bench
    importlib.reload(bench)
    from nonbondedslicing_tpu.ops import engine as engine_mod
    from nonbondedslicing_tpu.ops import plan as plan_mod
    from nonbondedslicing_tpu.runtime.fastpath import make_md_step

    system, force, positions, box, bonds, constraints = bench.build_system()
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    masses = np.tile([15.999, 1.008, 1.008], plan.num_particles // 3)
    # cell capacity exactly as bench.py main() derives it (native occupancy
    # scan + margin) so the lowered block shapes match the hardware run
    from nonbondedslicing_tpu.ops.neighbors import choose_cell_grid
    from nonbondedslicing_tpu.runtime import native
    from nonbondedslicing_tpu.runtime.fastpath import DEFAULT_SKIN
    cell_capacity = None
    cfg0 = choose_cell_grid(plan.box0, plan.cutoff, plan.num_particles,
                            target_skin=DEFAULT_SKIN)
    if cfg0 is not None:
        occ = native.max_cell_occupancy(positions, plan.box0, cfg0[0])
        cell_capacity = max(8, int(np.ceil((occ + 6) / 4) * 4))
    # interpret=False: on this CPU host the engine would default to
    # interpret-mode Pallas, which skips Mosaic entirely and makes the
    # lowering gate vacuous (0 tpu_custom_call sites)
    run = make_md_step(plan, masses, dt=0.002, dtype=dtype,
                       bonds=bonds or None, constraints=constraints,
                       cell_capacity=cell_capacity, interpret=False)
    # reach the inner jitted scan (run_scan) through the closure and lower
    # it for tpu with the same static args bench uses
    import nonbondedslicing_tpu.runtime.fastpath as fp
    run_scan = None
    for cell in run.__closure__ or ():
        obj = cell.cell_contents
        if hasattr(obj, "trace") and hasattr(obj, "lower"):
            run_scan = obj
    assert run_scan is not None, "jitted run_scan not found in closure"
    pos = jnp.asarray(positions, dtype)
    vel = jnp.zeros_like(pos)
    box_arr = jnp.asarray(np.diag([box, box, box]), dtype)
    gvals = jnp.asarray([1.0, 1.0], dtype)
    K = run.config["reuse_steps"]
    t0 = time.perf_counter()
    lowered = run_scan.trace(pos, vel, box_arr, gvals, data,
                             1000 // K, 1000 % K).lower(
        lowering_platforms=("tpu",))
    text = lowered.as_text()
    n_calls = text.count("tpu_custom_call")
    print(f"n_mol={n_mol}: lowered ok in "
          f"{time.perf_counter() - t0:.0f}s, {n_calls} tpu_custom_call "
          f"sites, config={run.config}", flush=True)


def main():
    for n_mol in (7763, 33333):
        lower_one(n_mol)


if __name__ == "__main__":
    main()
