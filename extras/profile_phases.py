#!/usr/bin/env python
"""Per-phase timing decomposition of the 23k-atom bench step on real TPU.

Times each stage in isolation (own jit, block_until_ready) plus the fused
step, to ground optimization decisions. Not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=20, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench
    from nonbondedslicing_tpu.ops import engine as engine_mod
    from nonbondedslicing_tpu.ops import plan as plan_mod
    from nonbondedslicing_tpu.ops import pme, neighbors, bonded
    from nonbondedslicing_tpu.ops.params import particle_params, slice_lambdas
    from nonbondedslicing_tpu.runtime import native
    from nonbondedslicing_tpu.ops.geometry import recip_box_vectors

    system, force, positions, box, bonds, constraints = bench.build_system()
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    n = plan.num_particles

    cfg = neighbors.choose_cell_grid(plan.box0, plan.cutoff, n)
    counts, _ = cfg
    occ = native.max_cell_occupancy(positions, plan.box0, counts)
    cell_capacity = max(8, int(np.ceil((occ + 4) / 4) * 4))
    print(f"n={n} counts={counts} max_occ={occ} capacity={cell_capacity} "
          f"grid={plan.pme_grid} alpha={plan.ewald_alpha:.4f}")

    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    pos = jnp.asarray(positions, dtype)
    box_arr = jnp.asarray(np.diag([box, box, box]), dtype)
    gvals = jnp.asarray([1.0, 1.0], dtype)

    # ---- full compute (direct+recip)
    compute = engine_mod.make_compute(plan, True, True,
                                      cell_capacity=cell_capacity,
                                      hoist_eterm=True)
    f_full = jax.jit(lambda p: compute(p, box_arr, gvals, data))
    t = timeit(f_full, pos)
    print(f"full compute:        {t:8.3f} ms")

    # ---- direct only
    compute_d = engine_mod.make_compute(plan, True, False,
                                        cell_capacity=cell_capacity)
    f_d = jax.jit(lambda p: compute_d(p, box_arr, gvals, data))
    print(f"direct only:         {timeit(f_d, pos):8.3f} ms")

    # ---- reciprocal only
    compute_r = engine_mod.make_compute(plan, False, True,
                                        cell_capacity=cell_capacity,
                                        hoist_eterm=True)
    f_r = jax.jit(lambda p: compute_r(p, box_arr, gvals, data))
    print(f"reciprocal only:     {timeit(f_r, pos):8.3f} ms")

    # ---- direct-space decomposition: tile prep vs pair kernel
    cell_kw = dict(mode=2, cutoff=plan.cutoff, counts=counts,
                   capacity=cell_capacity, ewald_alpha=plan.ewald_alpha,
                   num_slices=plan.num_slices)
    base = neighbors.make_cell_direct_space(**cell_kw)
    charge, sig_half, eps2 = particle_params(data, gvals)

    def prep(p):
        return base.prepare_tiles(p, box_arr, charge, sig_half, eps2,
                                  data["subsets"], data["exclusion_list"], 3)
    f_prep = jax.jit(prep)
    print(f"  XLA tile prep:     {timeit(f_prep, pos):8.3f} ms")

    # exclusion corrections standalone
    lam = slice_lambdas(plan.lam_source, gvals)
    sl_tab = plan.slice_table

    def excl(p):
        return bonded.exclusion_corrections(
            p, box_arr, data["exclusion_pairs"], charge, sig_half, eps2,
            data["subsets"], sl_tab, lam[:, 0], lam[:, 1],
            alpha=plan.ewald_alpha, periodic_exceptions=plan.exceptions_periodic,
            ljpme=False, dispersion_alpha=0.0, num_slices=plan.num_slices,
            num_particles=n)
    print(f"  excl standalone:   {timeit(jax.jit(excl), pos):8.3f} ms")

    # ---- PME decomposition
    recip = recip_box_vectors(box_arr)
    grid_shape = plan.pme_grid
    eterm = pme.coulomb_eterm(grid_shape, plan.pme_moduli, box_arr, recip,
                              plan.ewald_alpha, dtype, half=True)

    def pme_parts(p):
        index, frac = pme.grid_index_and_fraction(p, recip, grid_shape)
        theta, dtheta = pme.bsplines(frac, 5)
        return index, theta, dtheta
    f_parts = jax.jit(pme_parts)
    print(f"  pme idx+bsplines:  {timeit(f_parts, pos):8.3f} ms")
    index, theta, dtheta = f_parts(pos)

    def spread(p, idx, th, dth):
        return pme.spread_charges_dense(charge, data["subsets"], idx, th, dth,
                                        grid_shape, 3, 5)
    f_spread = jax.jit(spread)
    print(f"  spread dense:      {timeit(f_spread, pos, index, theta, dtheta):8.3f} ms")
    grid = f_spread(pos, index, theta, dtheta)

    def ffts(g):
        s_re, s_im = pme.rfft3_matmul(g)
        w = pme.rfft_energy_weights(grid_shape[2], dtype)
        import jax.numpy as jnp
        se = pme.pme_slice_energies_ri(
            s_re, s_im, eterm * w[None, None, :],
            jnp.asarray([[0, 0], [0, 1], [1, 1], [0, 2], [1, 2], [2, 2]]))
        phi = pme.irfft3_matmul(s_re * eterm[None], s_im * eterm[None],
                                grid_shape)
        return se, phi
    f_fft = jax.jit(ffts)
    print(f"  fft+conv+energy:   {timeit(f_fft, grid):8.3f} ms")
    _, phi = f_fft(grid)

    lam_nn = lam[:, 0][jnp.asarray(sl_tab)]

    def interp(ph, idx, th, dth):
        return pme.interpolate_forces_dense(ph, charge, data["subsets"], idx,
                                            th, dth, recip, lam_nn, grid_shape, 5)
    f_int = jax.jit(interp)
    print(f"  interp dense:      {timeit(f_int, phi, index, theta, dtheta):8.3f} ms")


if __name__ == "__main__":
    main()
