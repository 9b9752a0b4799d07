#!/usr/bin/env python
"""Whole-pme_reciprocal_pallas slope timing under each spectrum pipeline
("blocked" / "grid" / "windows") at the 23k bench config, plus the blocked
stage decomposition.  Run on the TPU."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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
    from nonbondedslicing_tpu.ops.geometry import recip_box_vectors
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
    bricks = cfg["bricks"]
    grid_shape = cfg["pme_grid"]
    state = jax.jit(prepare)(pos, box_arr, gvals, data)
    n_cells = counts[0] * counts[1] * counts[2]
    slots = state["slots"]
    g = bricks[0] * bricks[1] * bricks[2]
    order = 5
    nsub = plan.num_subsets
    (px, wx), (py, wy), (pz, wz) = pme_bricks.brick_window(grid_shape,
                                                           bricks, order)
    print(f"n={n} grid={grid_shape} bricks={bricks} w=({wx},{wy},{wz})",
          flush=True)

    sfeat_b = fused_mod._cells_to_bricks(state["sfeat"], counts, bricks)
    q_b = jax.device_put(sfeat_b[:, 0, :])
    soh_b = jax.device_put(sfeat_b[:, 3:6, :])
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dtype)], axis=0)
    pos_fm = jnp.swapaxes(pos_p[slots].reshape(n_cells, capacity, 3), 1, 2)
    pos_b = jax.device_put(fused_mod._cells_to_bricks(pos_fm, counts, bricks))
    eterm0 = jnp.asarray(pme_mod.coulomb_eterm_np(
        grid_shape, cfg["pme_moduli"], plan.box0, plan.ewald_alpha,
        half=True).astype(np.float32))
    spairs = np.asarray(slice_subsets(nsub))
    lam = jnp.ones((plan.num_slices,), dtype)

    for pipe in ("blocked", "windows", "grid"):
        os.environ["NBS_PME_PIPELINE"] = pipe

        def step_whole(pb):
            e_k, f_kb = pallas_pme.pme_reciprocal_pallas(
                pb, q_b, soh_b, box_arr, lam, alpha=plan.ewald_alpha,
                grid_shape=grid_shape, moduli=cfg["pme_moduli"],
                bricks=bricks, slice_subset_pairs=spairs,
                slice_table=plan.slice_table, energies=False, eterm=eterm0)
            return pb + 1e-12 * jnp.swapaxes(f_kb, 1, 2)
        print(f"whole [{pipe:8s}]: {slope_ms(step_whole, pos_b):8.3f} ms",
              flush=True)
    os.environ.pop("NBS_PME_PIPELINE", None)

    # blocked stage decomposition
    recip0 = recip_box_vectors(box_arr)
    qoh0 = jax.device_put(soh_b * q_b[:, None, :])
    spread_k = pallas_pme.make_spread_kernel(grid_shape=grid_shape,
                                             bricks=bricks, nsub=nsub,
                                             order=order)
    windows0 = jax.device_put(spread_k(pos_b, qoh0, recip0))

    def step_fold_b(w):
        gb = pme_bricks.fold_windows_blocked(
            w.reshape(bricks + (nsub, wx, wy, wz)), bricks, grid_shape)
        return w + 1e-20 * jnp.sum(gb[:1, :1, :1, :1])
    print(f"fold_blocked:      {slope_ms(step_fold_b, windows0):8.3f} ms",
          flush=True)

    gb0 = jax.device_put(pme_bricks.fold_windows_blocked(
        windows0.reshape(bricks + (nsub, wx, wy, wz)), bricks, grid_shape))
    lam_nn0 = jnp.ones((nsub, nsub), dtype)

    def step_spec_b(gb):
        s_re, s_im = pme_mod.rfft3_matmul_blocked(gb, bricks, grid_shape)
        cr = jnp.einsum("st,txyk->sxyk", lam_nn0, s_re * eterm0[None])
        ci = jnp.einsum("st,txyk->sxyk", lam_nn0, s_im * eterm0[None])
        win_phi = pme_mod.irfft3_matmul_windows(cr, ci, bricks, grid_shape,
                                                (wx, wy, wz))
        return gb + 1e-20 * jnp.sum(win_phi[:1, :1, :1, :1])
    print(f"spec blocked->win: {slope_ms(step_spec_b, gb0):8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
