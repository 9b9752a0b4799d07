#!/usr/bin/env python
"""Round-5 PME probe: whole-pipeline cost vs BRICK SHAPE x spectrum mode.

Motivation (measured r5): the window<->grid<->spectrum passes dominate PME
(windows-DFT roundtrip 0.74 ms vs 0.06 ms for the plain grid DFT+conv), and
every XLA/Pallas formulation of the fold founders on the tiny minor dims the
(6,6,6) bricking produces (pz=10 lanes -> 12.8x padded TPU layouts).
Hypothesis: z-unbricked shapes like (6,6,1) make the window z-dim ~the full
grid axis (wz = nz + order + 1 = 66), giving clean lane layouts and killing
the z-fold entirely, at a modest MXU-flop increase in spread/interp.

Run on the TPU: python extras/probe_pme_bricks_r5.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_traceback_in_locations_limit", 0)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_nbs"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def slope_ms(make_step, x0, n1=6, n2=30):
    @partial(jax.jit, static_argnums=(1,))
    def run(x, n):
        def body(c, _):
            return make_step(c), None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0)

    for n in (n1, n2):
        float(run(x0, n))
    ts = {}
    for n in (n1, n2, n1, n2):
        t0 = time.perf_counter()
        float(run(x0, n))
        ts.setdefault(n, []).append(time.perf_counter() - t0)
    return (min(ts[n2]) - min(ts[n1])) / (n2 - n1) * 1e3


def main():
    import bench
    from nonbondedslicing_tpu.ops import engine as engine_mod
    from nonbondedslicing_tpu.ops import fused as fused_mod
    from nonbondedslicing_tpu.ops import plan as plan_mod
    from nonbondedslicing_tpu.ops import pme as pme_mod
    from nonbondedslicing_tpu.ops import pme_bricks, pallas_pme
    from nonbondedslicing_tpu.ops.neighbors import choose_cell_grid
    from nonbondedslicing_tpu.runtime import native
    from nonbondedslicing_tpu.utils.indexing import slice_subsets

    system, force, positions, box, bonds, constraints = bench.build_system()
    state_file = os.path.join(os.path.dirname(__file__),
                              "bench_state_rigid.npz")
    if os.path.exists(state_file):
        positions = np.load(state_file)["positions"]
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    n = plan.num_particles
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    pos = jnp.asarray(positions, dtype)
    box_arr = jnp.asarray(np.diag([box, box, box]), dtype)
    gvals = jnp.asarray([1.0, 1.0], dtype)
    cfg0 = choose_cell_grid(plan.box0, plan.cutoff, n, target_skin=0.1)
    occ = native.max_cell_occupancy(positions, plan.box0, cfg0[0])
    eng = fused_mod.make_fused_engine(
        plan, hoist_eterm=True, energies=False,
        cell_capacity=max(8, int(np.ceil((occ + 6) / 4) * 4)),
        target_skin=0.1)
    prepare, apply, cfg = eng
    counts, capacity = cfg["counts"], cfg["capacity"]
    grid_shape = cfg["pme_grid"]
    state = jax.jit(prepare)(pos, box_arr, gvals, data)
    n_cells = counts[0] * counts[1] * counts[2]
    slots = state["slots"]
    nsub = plan.num_subsets
    spairs = np.asarray(slice_subsets(nsub))
    lam = jnp.ones((plan.num_slices,), dtype)
    eterm0 = jnp.asarray(pme_mod.coulomb_eterm_np(
        grid_shape, cfg["pme_moduli"], plan.box0, plan.ewald_alpha,
        half=True).astype(np.float32))
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dtype)], axis=0)
    pos_fm = jnp.swapaxes(pos_p[slots].reshape(n_cells, capacity, 3), 1, 2)
    sfeat = state["sfeat"]

    ref_ef = {}
    for bricks in [(6, 6, 6), (6, 6, 3), (6, 6, 2), (6, 6, 1), (6, 3, 1),
                   (3, 3, 1)]:
        (px, wx), (py, wy), (pz, wz) = pme_bricks.brick_window(
            grid_shape, bricks, 5)
        pos_b = jax.device_put(
            fused_mod._cells_to_bricks(pos_fm, counts, bricks))
        sfeat_b = fused_mod._cells_to_bricks(sfeat, counts, bricks)
        q_b = jax.device_put(sfeat_b[:, 0, :])
        soh_b = jax.device_put(sfeat_b[:, 3:3 + nsub, :])
        for pipe in ("windows", "grid"):
            os.environ["NBS_PME_PIPELINE"] = pipe

            def step_whole(pb, bricks=bricks, q_b=q_b, soh_b=soh_b):
                e_k, f_kb = pallas_pme.pme_reciprocal_pallas(
                    pb, q_b, soh_b, box_arr, lam, alpha=plan.ewald_alpha,
                    grid_shape=grid_shape, moduli=cfg["pme_moduli"],
                    bricks=bricks, slice_subset_pairs=spairs,
                    slice_table=plan.slice_table, energies=False,
                    eterm=eterm0)
                return pb + 1e-12 * jnp.swapaxes(f_kb, 1, 2)
            try:
                ms = slope_ms(step_whole, pos_b)
                # force parity vs the (6,6,6)/windows production reference
                e, f = pallas_pme.pme_reciprocal_pallas(
                    pos_b, q_b, soh_b, box_arr, lam, alpha=plan.ewald_alpha,
                    grid_shape=grid_shape, moduli=cfg["pme_moduli"],
                    bricks=bricks, slice_subset_pairs=spairs,
                    slice_table=plan.slice_table, energies=True,
                    eterm=eterm0)
                f_at = jnp.zeros((n + 1, 3), dtype).at[
                    fused_mod._cells_to_bricks(
                        jnp.asarray(slots, jnp.int32).reshape(
                            n_cells, 1, capacity).astype(jnp.float32),
                        counts, bricks).astype(jnp.int32)[:, 0, :].reshape(-1)
                ].add(f.reshape(-1, 3))[:n]
                key = "ref"
                if key not in ref_ef:
                    ref_ef[key] = (np.asarray(jnp.sum(e)), np.asarray(f_at))
                de = abs(float(jnp.sum(e)) - float(ref_ef[key][0]))
                df = float(jnp.max(jnp.abs(f_at - ref_ef[key][1])))
                fs = float(jnp.max(jnp.abs(ref_ef[key][1])))
                print(f"bricks={bricks} w=({wx},{wy},{wz}) [{pipe:7s}]: "
                      f"{ms:8.3f} ms   dE={de:.2e} dF/|F|={df / fs:.2e}",
                      flush=True)
            except Exception as exc:  # noqa: BLE001
                print(f"bricks={bricks} [{pipe:7s}]: FAILED "
                      f"{type(exc).__name__}: {str(exc)[:120]}", flush=True)
    os.environ.pop("NBS_PME_PIPELINE", None)


if __name__ == "__main__":
    main()
