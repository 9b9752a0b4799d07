#!/usr/bin/env python
"""Pair-kernel cost attribution at the 23k bench shapes: slope-time the
column kernel with (a) the production EWALD_DIRECT math, (b) CUTOFF/RF math
(no erfc/exp — bounds what replacing the transcendentals could save),
(c) EWALD with emax=0 (no exclusion compares).  Run on the TPU."""

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
    from nonbondedslicing_tpu.ops import direct
    from nonbondedslicing_tpu.ops import engine as engine_mod
    from nonbondedslicing_tpu.ops import fused as fused_mod
    from nonbondedslicing_tpu.ops import plan as plan_mod
    from nonbondedslicing_tpu.ops.pallas_direct import (
        make_pallas_column_kernel)
    from nonbondedslicing_tpu.ops.neighbors import choose_cell_grid
    from nonbondedslicing_tpu.runtime import native

    system, force, positions, box, bonds, constraints = bench.build_system()
    blob = np.load(os.path.join(os.path.dirname(__file__),
                                "bench_state_rigid.npz"))
    positions = blob["positions"]
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
    cap = max(8, int(np.ceil((occ + 6) / 4) * 4))
    prepare, apply, cfg = fused_mod.make_fused_engine(
        plan, hoist_eterm=True, energies=False, cell_capacity=cap,
        target_skin=0.1)
    counts, capacity = cfg["counts"], cfg["capacity"]
    state = jax.jit(prepare)(pos, box_arr, gvals, data)
    nsub = plan.num_subsets
    emax = plan.exclusion_list.shape[1]
    print(f"counts={counts} capacity={capacity} emax={emax}", flush=True)

    # slot tensors the column kernel consumes (mirror fused.apply)
    ncx, ncy, ncz = counts
    sfeat = state["sfeat"]
    nf = sfeat.shape[1]
    slot_feat0 = jnp.swapaxes(
        jnp.concatenate([jnp.zeros((ncx * ncy * ncz, 3, capacity), dtype),
                         sfeat], axis=1), 0, 0)
    # positions: wrapped + padfix, like apply()
    pos_p = jnp.concatenate([state["pos0w"], jnp.zeros((1, 3), dtype)],
                            axis=0)
    pos_fm = jnp.swapaxes(
        pos_p[state["slots"]].reshape(ncx * ncy * ncz, capacity, 3), 1, 2)
    pos_fm = pos_fm + state["padfix3"]
    feat_all = jnp.concatenate([pos_fm, sfeat], axis=1)
    F = feat_all.shape[1]
    slot_feat = feat_all.reshape(ncx, ncy, ncz, F, capacity)
    slot_ids = state["slots"].astype(jnp.int32).reshape(
        ncx, ncy, ncz, 1, capacity)
    excl_p = jnp.concatenate(
        [data["exclusion_list"],
         jnp.full((1, emax), -1, data["exclusion_list"].dtype)], axis=0)
    sexcl = jnp.swapaxes(
        excl_p[state["slots"]].reshape(ncx * ncy * ncz, capacity, emax),
        1, 2).astype(jnp.int32).reshape(ncx, ncy, ncz, emax, capacity)
    lam_nn = jnp.ones((nsub, nsub), dtype)

    variants = {
        "ewald (prod)": dict(mode=direct.EWALD_DIRECT,
                             ewald_alpha=plan.ewald_alpha, krf=0.0, crf=0.0,
                             emax=emax),
        "cutoff/rf   ": dict(mode=direct.CUTOFF, ewald_alpha=0.0,
                             krf=1.23, crf=0.5, emax=emax),
        "ewald emax=0": dict(mode=direct.EWALD_DIRECT,
                             ewald_alpha=plan.ewald_alpha, krf=0.0, crf=0.0,
                             emax=0),
    }
    for name, kw in variants.items():
        emax_v = kw.pop("emax")
        kern = make_pallas_column_kernel(
            cutoff=plan.cutoff, counts=counts, capacity=capacity,
            nsub=nsub, emax=emax_v, use_switch=False, switch_distance=0.0,
            ljpme=False, dispersion_alpha=0.0, interpret=False,
            exceptions_periodic=False, fuse_exclusions=False,
            compute_energies=False, assume_pads_far=True, **kw)
        sexcl_v = sexcl[:, :, :, :emax_v]

        def step(sf, kern=kern, sexcl_v=sexcl_v):
            slot_fc, m_c, m_v = kern(sf, slot_ids, sexcl_v, lam_nn, lam_nn,
                                     box_arr, n)
            return sf + 1e-12 * slot_fc.reshape(
                ncx, ncy, ncz, 3, capacity).astype(dtype)[:, :, :, :3]

        # carry shape must match: add force into the position rows only
        def step2(sf, kern=kern, sexcl_v=sexcl_v):
            slot_fc, m_c, m_v = kern(sf, slot_ids, sexcl_v, lam_nn, lam_nn,
                                     box_arr, n)
            upd = jnp.concatenate(
                [slot_fc.reshape(ncx, ncy, ncz, 3, capacity),
                 jnp.zeros((ncx, ncy, ncz, F - 3, capacity), dtype)], axis=3)
            return sf + 1e-12 * upd

        print(f"{name}: {slope_ms(step2, slot_feat):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
