#!/usr/bin/env python
"""Sequential TPU measurement probe. Waits for device health, then times
each compute component at bench scale, printing results incrementally."""
import sys
import time

import numpy as np

def wait_healthy(max_wait=600):
    import jax, jax.numpy as jnp
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            x = float(jnp.ones((8, 8)).sum())
            print(f"device healthy after {time.time()-t0:.0f}s", flush=True)
            return True
        except Exception as e:
            print(f"health check failed: {type(e).__name__}", flush=True)
            time.sleep(30)
    return False

def main():
    stages = sys.argv[1:] or ["direct_np", "recip", "full", "md"]
    import jax
    import jax.numpy as jnp
    if not wait_healthy():
        print("device never became healthy", flush=True)
        return
    sys.path.insert(0, ".")
    import bench
    from nonbondedslicing_tpu.ops import engine as engine_mod
    from nonbondedslicing_tpu.ops import plan as plan_mod

    system, force, positions, box, bonds, constraints = bench.build_system()
    plan = plan_mod.build_plan(force, system)
    print("PME grid:", plan.pme_grid, "alpha:", round(plan.ewald_alpha, 4),
          flush=True)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    data = jax.device_put(data)
    pos = jax.device_put(jnp.asarray(positions, dtype))
    box_arr = jax.device_put(jnp.asarray(np.diag([box, box, box]), dtype))
    gvals = jax.device_put(jnp.asarray([1.0, 1.0], dtype))

    def run(tag, include_direct, include_reciprocal, neighbor="auto", reps=5):
        t0 = time.time()
        fn = jax.jit(engine_mod.make_compute(plan, include_direct,
                                             include_reciprocal,
                                             neighbor=neighbor))
        e, f = fn(pos, box_arr, gvals, data)
        jax.block_until_ready((e, f))
        t1 = time.time()
        print(f"{tag}: compile+run={t1-t0:.1f}s", flush=True)
        times = []
        for _ in range(reps):
            ta = time.time()
            e, f = fn(pos, box_arr, gvals, data)
            jax.block_until_ready((e, f))
            times.append(time.time() - ta)
        print(f"{tag}: per-call={[round(t*1e3,1) for t in times]}ms "
              f"E={float(jnp.sum(e)):.2f}", flush=True)

    for st in stages:
        if st == "direct_np":
            run("direct-allpairs", True, False, neighbor="all_pairs")
        elif st == "direct_cell":
            run("direct-cell", True, False, neighbor="cell")
        elif st == "recip":
            run("reciprocal-only", False, True)
        elif st == "full":
            run("full", True, True)
        elif st.startswith("scan_part"):
            # scan_part:direct / scan_part:recip / scan_part:direct_xla
            from functools import partial
            which = st.split(":")[1]
            if which == "direct":
                compute = engine_mod.make_compute(plan, True, False)
            elif which == "direct_xla":
                compute = engine_mod.make_compute(plan, True, False,
                                                  neighbor="cell")
            elif which == "direct_np":
                compute = engine_mod.make_compute(plan, True, False,
                                                  neighbor="all_pairs")
            else:
                compute = engine_mod.make_compute(plan, False, True)

            @partial(jax.jit, static_argnums=(4,))
            def scan_part(pos, box, gvals, data, n_steps):
                def step(carry, _):
                    p = carry
                    _, forces = compute(p, box, gvals, data)
                    return p + 1e-12 * forces, None
                out, _ = jax.lax.scan(step, pos, None, length=n_steps)
                return out

            t0 = time.time()
            out = scan_part(pos, box_arr, gvals, data, 20)
            jax.block_until_ready(out)
            t1 = time.time()
            out = scan_part(pos, box_arr, gvals, data, 20)
            jax.block_until_ready(out)
            t2 = time.time()
            print(f"scan_part[{which}]: compile={t1-t0:.1f}s "
                  f"per-step={(t2-t1)/20*1e3:.2f}ms", flush=True)
        elif st == "pme_parts":
            from functools import partial
            from nonbondedslicing_tpu.ops import pme as pme_ops
            from nonbondedslicing_tpu.ops import params as params_mod
            from nonbondedslicing_tpu.ops.geometry import recip_box_vectors
            from nonbondedslicing_tpu.utils.indexing import slice_subsets
            gs = plan.pme_grid
            charge, _, _ = params_mod.particle_params(data, gvals)
            spairs = jnp.asarray(slice_subsets(3))

            def measure(tag, fn, *aux):
                jfn = jax.jit(fn)
                out = jfn(pos, *aux)
                jax.block_until_ready(out)
                t0 = time.time()
                for _ in range(5):
                    out = jfn(pos, *aux)
                jax.block_until_ready(out)
                t1 = time.time()
                print(f"pme[{tag}]: {(t1-t0)/5*1e3:.2f}ms", flush=True)

            def spread_only(p):
                recip = recip_box_vectors(box_arr)
                index, frac = pme_ops.grid_index_and_fraction(p, recip, gs)
                theta, dtheta = pme_ops.bsplines(frac, 5)
                return pme_ops.spread_charges_dense(
                    charge, data["subsets"], index, theta, dtheta, gs, 3, 5)
            measure("spread", spread_only)

            grid0 = jax.jit(spread_only)(pos)
            measure("fft", lambda p, g: jnp.fft.rfftn(
                g + 1e-30 * p[0, 0], axes=(1, 2, 3)), grid0)
            spec0 = jnp.fft.rfftn(grid0, axes=(1, 2, 3))
            measure("ifft", lambda p, s: jnp.fft.irfftn(
                s * (1 + 1e-30 * p[0, 0]), axes=(1, 2, 3), s=gs), spec0)

            def interp_only(p, s):
                recip = recip_box_vectors(box_arr)
                index, frac = pme_ops.grid_index_and_fraction(p, recip, gs)
                theta, dtheta = pme_ops.bsplines(frac, 5)
                phi = jnp.fft.irfftn(s, axes=(1, 2, 3), s=gs)
                lam_nn = jnp.ones((3, 3), jnp.float32)
                return pme_ops.interpolate_forces_dense(
                    phi, charge, data["subsets"], index, theta, dtheta,
                    recip, lam_nn, gs, 5)
            measure("ifft+interp", interp_only, spec0)
        elif st == "scan_prep":
            # cost of cell-list tile preparation alone, in-scan
            from functools import partial
            from nonbondedslicing_tpu.ops import neighbors, direct
            from nonbondedslicing_tpu.ops import params as params_mod
            counts, capacity = neighbors.choose_cell_grid(
                plan.box0, plan.cutoff, plan.num_particles)
            dfn = neighbors.make_cell_direct_space(
                mode=direct.EWALD_DIRECT, cutoff=plan.cutoff, counts=counts,
                capacity=capacity, ewald_alpha=plan.ewald_alpha,
                num_slices=plan.num_slices)

            @partial(jax.jit, static_argnums=(4,))
            def scan_prep(pos, box, gvals, data, n_steps):
                charge, sig_half, eps2 = params_mod.particle_params(data, gvals)

                def step(carry, _):
                    p = carry
                    tiles = dfn.prepare_tiles(p, box, charge, sig_half, eps2,
                                              data["subsets"],
                                              data["exclusion_list"], 3)
                    bump = tiles["rows_feat"][0, 0, 0] + tiles["cand_feat"][0, 0, 0]
                    return p + 1e-30 * bump, None
                out, _ = jax.lax.scan(step, pos, None, length=n_steps)
                return out

            t0 = time.time()
            out = scan_prep(pos, box_arr, gvals, data, 20)
            jax.block_until_ready(out)
            t1 = time.time()
            out = scan_prep(pos, box_arr, gvals, data, 20)
            jax.block_until_ready(out)
            t2 = time.time()
            print(f"scan_prep: compile={t1-t0:.1f}s "
                  f"per-step={(t2-t1)/20*1e3:.2f}ms", flush=True)
        elif st == "scan_diag":
            # separate fixed vs per-step cost of the scan
            from functools import partial
            compute = engine_mod.make_compute(plan, True, True)

            @partial(jax.jit, static_argnums=(4,))
            def scan_only(pos, box, gvals, data, n_steps):
                def step(carry, _):
                    p = carry
                    _, forces = compute(p, box, gvals, data)
                    return p + 1e-12 * forces, None
                out, _ = jax.lax.scan(step, pos, None, length=n_steps)
                return out

            for steps in (1, 5, 20):
                t0 = time.time()
                out = scan_only(pos, box_arr, gvals, data, steps)
                jax.block_until_ready(out)
                t1 = time.time()
                out = scan_only(pos, box_arr, gvals, data, steps)
                jax.block_until_ready(out)
                t2 = time.time()
                print(f"scan_diag[{steps}]: compile+run={t1-t0:.1f}s "
                      f"run={(t2-t1)*1e3:.1f}ms "
                      f"per-step={(t2-t1)/steps*1e3:.1f}ms", flush=True)
        elif st == "md":
            from nonbondedslicing_tpu.runtime.fastpath import make_md_step
            masses = np.full(plan.num_particles, 15.999)
            masses[1::3] = 1.008
            masses[2::3] = 1.008
            runf = make_md_step(plan, masses, dt=0.001, dtype=dtype,
                                bonds=bonds)
            vel = jnp.zeros_like(pos)
            t0 = time.time()
            p1, v1, en = runf(pos, vel, box_arr, gvals, data, 3)
            jax.block_until_ready(p1)
            t1 = time.time()
            print(f"md-step: compile={t1-t0:.1f}s", flush=True)
            prev = None
            for steps in (1, 5, 20, 100):
                ta = time.time()
                p1, v1, en = runf(p1, v1, box_arr, gvals, data, steps)
                jax.block_until_ready(p1)
                tb = time.time()
                ms = (tb - ta) / steps * 1e3
                ns_day = 0.001 * 86400 / ((tb - ta) / steps) / 1000
                print(f"md-step[{steps}]: total={(tb-ta)*1e3:.0f}ms "
                      f"per-step={ms:.2f}ms ns/day={ns_day:.1f} "
                      f"E={float(en):.1f}", flush=True)

if __name__ == "__main__":
    main()
