#!/usr/bin/env python
"""Slope-measured decomposition of the fused MD step at bench scale (r3).

Each phase is timed inside a lax.scan with a real additive dependency (the
only reliable protocol on the axon-tunneled TPU, docs/devnotes.md).  Unlike
the round-2 table this isolates the candidate-ASSEMBLY cost (gather + 14
position rolls + concats) from the Pallas pair kernel itself.
"""

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


def main(which="all"):
    import bench
    from nonbondedslicing_tpu.ops import engine as engine_mod
    from nonbondedslicing_tpu.ops import fused as fused_mod
    from nonbondedslicing_tpu.ops import plan as plan_mod
    from nonbondedslicing_tpu.ops.pallas_direct import HALF_OFFSETS
    from nonbondedslicing_tpu.ops.geometry import recip_box_vectors
    from nonbondedslicing_tpu.runtime.constraints import make_constrainer

    system, force, positions, box, bonds, constraints = bench.build_system()
    state_file = os.path.join(os.path.dirname(__file__),
                              "bench_state_rigid.npz")
    if os.path.exists(state_file):
        blob = np.load(state_file)
        positions = blob["positions"]
        velocities = blob["velocities"]
    else:
        velocities = np.zeros_like(positions)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    n = plan.num_particles
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    pos = jnp.asarray(positions, dtype)
    box_arr = jnp.asarray(np.diag([box, box, box]), dtype)
    gvals = jnp.asarray([1.0, 1.0], dtype)

    from nonbondedslicing_tpu.ops.neighbors import choose_cell_grid
    from nonbondedslicing_tpu.runtime import native
    cfg0 = choose_cell_grid(plan.box0, plan.cutoff, n, target_skin=0.1)
    occ = native.max_cell_occupancy(positions, plan.box0, cfg0[0])
    cell_capacity = max(8, int(np.ceil((occ + 6) / 4) * 4))
    eng = fused_mod.make_fused_engine(plan, hoist_eterm=True, energies=False,
                                      cell_capacity=cell_capacity,
                                      target_skin=0.1)
    prepare, apply, cfg = eng
    counts = cfg["counts"]
    capacity = cfg["capacity"]
    print(f"n={n} counts={counts} capacity={capacity} "
          f"pme_grid={cfg['pme_grid']} bricks={cfg['bricks']}")

    state = jax.jit(prepare)(pos, box_arr, gvals, data)
    state = jax.device_put(state)

    # ---- 1. full force-only apply
    if which in ("all", "apply"):
        def step_apply(p):
            _, f, _ = apply(p, box_arr, gvals, data, state)
            return p + 1e-9 * f
        print(f"apply (force-only, full): {slope_ms(step_apply, pos):8.3f} ms",
              flush=True)

    # ---- 2. prepare
    if which in ("all", "prepare"):
        def step_prepare(p):
            st = prepare(p, box_arr, gvals, data)
            return p + 1e-9 * st["sfeat"][:1, :3, :1].reshape(1, 3)
        print(f"prepare:                  {slope_ms(step_prepare, pos):8.3f} ms",
              flush=True)

    # ---- 3. candidate-position assembly only (gather + wrap + 14 rolls +
    #         concat, i.e. apply's per-step work upstream of the kernel)
    ncx, ncy, ncz = counts
    n_cells = ncx * ncy * ncz
    slots = state["slots"]
    _wrap = {}
    for off in HALF_OFFSETS:
        fac = []
        for axis, (d, nc) in enumerate(zip(off, counts)):
            fac.append(((np.arange(nc) + d) // nc).astype(np.float32))
        _wrap[off] = fac

    def step_assembly(p):
        pos_in = state["pos0w"] + (p - state["pos0"])
        pos_p = jnp.concatenate([pos_in, jnp.zeros((1, 3), dtype)], axis=0)
        pos_fm = jnp.swapaxes(pos_p[slots].reshape(n_cells, capacity, 3),
                              1, 2)
        grid_pos = pos_fm.reshape(ncx, ncy, ncz, 3, capacity)
        blocks = []
        for off in HALF_OFFSETS:
            dx, dy, dz = off
            rolled = jnp.roll(grid_pos, (-dx, -dy, -dz), axis=(0, 1, 2))
            wx, wy, wz = _wrap[off]
            shift = (jnp.asarray(wx, dtype)[:, None, None, None] * box_arr[0]
                     + jnp.asarray(wy, dtype)[None, :, None, None] * box_arr[1]
                     + jnp.asarray(wz, dtype)[None, None, :, None] * box_arr[2])
            rolled = rolled + shift[..., None]
            blocks.append(rolled.reshape(n_cells, 3, capacity))
        cand_pos = jnp.concatenate(blocks, axis=2)
        rows_feat = jnp.concatenate([pos_fm, state["sfeat"]], axis=1)
        cand_feat = jnp.concatenate([cand_pos, state["cand_static"]], axis=1)
        return p + 1e-12 * (jnp.sum(cand_feat[:1, :3, :1])
                            + jnp.sum(rows_feat[:1, :3, :1]))
    if which in ("all", "assembly") and "cand_static" in state:
        print(f"  cand assembly only:     {slope_ms(step_assembly, pos):8.3f} ms",
              flush=True)

    # ---- 3b. pair kernel alone (gather + column kernel + roll-back +
    #          unsort, no PME/excl/14/self)
    from nonbondedslicing_tpu.ops.pallas_direct import (
        make_pallas_column_kernel)
    from nonbondedslicing_tpu.ops.direct import EWALD_DIRECT
    ncx, ncy, ncz = counts
    if which in ("all", "pairk"):
        sl_tab0 = jnp.asarray(plan.slice_table)
        lam1 = jnp.ones((plan.num_slices,), dtype)
        lam_nn = lam1[sl_tab0]
        sexcl = state["sexcl"]
        emax = sexcl.shape[1]
        kern = make_pallas_column_kernel(
            mode=EWALD_DIRECT, cutoff=plan.cutoff, counts=counts,
            capacity=capacity, nsub=plan.num_subsets, emax=emax,
            ewald_alpha=plan.ewald_alpha, fuse_exclusions=False,
            compute_energies=False)

        def step_pairk(p):
            pos_in = state["pos0w"] + (p - state["pos0"])
            pos_p = jnp.concatenate([pos_in, jnp.zeros((1, 3), dtype)],
                                    axis=0)
            pos_fm = jnp.swapaxes(pos_p[slots].reshape(n_cells, capacity, 3),
                                  1, 2)
            rows_feat = jnp.concatenate([pos_fm, state["sfeat"]], axis=1)
            nf_all = rows_feat.shape[1]
            slot_fc, _, _ = kern(
                rows_feat.reshape(ncx, ncy, ncz, nf_all, capacity),
                state["table"].reshape(ncx, ncy, ncz, 1, capacity),
                sexcl.reshape(ncx, ncy, ncz, emax, capacity),
                lam_nn, lam_nn, box_arr, n)
            slot_f = jnp.swapaxes(slot_fc, 1, 2)
            f = jnp.zeros((n + 1, 3), dtype).at[slots].add(
                slot_f.reshape(-1, 3))[:n]
            return p + 1e-9 * f
        print(f"  pair kernel+unsort:     {slope_ms(step_pairk, pos):8.3f} ms",
              flush=True)

        def step_pairk2(p):
            # kernel only: no unsort (forces reduced to a scalar)
            pos_in = state["pos0w"] + (p - state["pos0"])
            pos_p = jnp.concatenate([pos_in, jnp.zeros((1, 3), dtype)],
                                    axis=0)
            pos_fm = jnp.swapaxes(pos_p[slots].reshape(n_cells, capacity, 3),
                                  1, 2)
            rows_feat = jnp.concatenate([pos_fm, state["sfeat"]], axis=1)
            nf_all = rows_feat.shape[1]
            slot_fc, _, _ = kern(
                rows_feat.reshape(ncx, ncy, ncz, nf_all, capacity),
                state["table"].reshape(ncx, ncy, ncz, 1, capacity),
                sexcl.reshape(ncx, ncy, ncz, emax, capacity),
                lam_nn, lam_nn, box_arr, n)
            s = jnp.sum(slot_fc[:, :, :1])
            return p + 1e-12 * s
        print(f"  pair kernel only:       {slope_ms(step_pairk2, pos):8.3f} ms",
              flush=True)

    # ---- 4. PME reciprocal alone (slot inputs fixed)
    from nonbondedslicing_tpu.ops import pallas_pme
    from nonbondedslicing_tpu.utils.indexing import slice_subsets
    bricks = cfg["bricks"]
    spairs = np.asarray(slice_subsets(plan.num_subsets))
    sfeat = state["sfeat"]
    q_b0 = fused_mod._cells_to_bricks(sfeat, counts, bricks)[:, 0, :]
    soh_b0 = fused_mod._cells_to_bricks(sfeat, counts, bricks)[:, 3:6, :]
    from nonbondedslicing_tpu.ops import pme as pme_mod
    eterm0 = pme_mod.coulomb_eterm_np(cfg["pme_grid"], cfg["pme_moduli"],
                                      plan.box0, plan.ewald_alpha,
                                      half=True).astype(np.float32)
    lam = jnp.ones((plan.num_slices,), dtype)

    def step_pme(p):
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), dtype)], axis=0)
        pos_fm = jnp.swapaxes(pos_p[slots].reshape(n_cells, capacity, 3),
                              1, 2)
        pos_b = fused_mod._cells_to_bricks(pos_fm, counts, bricks)
        e_k, f_kb = pallas_pme.pme_reciprocal_pallas(
            pos_b, q_b0, soh_b0, box_arr, lam, alpha=plan.ewald_alpha,
            grid_shape=cfg["pme_grid"], moduli=cfg["pme_moduli"],
            bricks=bricks, slice_subset_pairs=spairs,
            slice_table=plan.slice_table, energies=False,
            eterm=jnp.asarray(eterm0))
        f = fused_mod._bricks_to_cells(f_kb, counts, bricks)
        return p + 1e-9 * jnp.zeros((n, 3), dtype).at[slots].add(
            f.reshape(-1, 3))[:n]
    if which in ("all", "pme"):
        print(f"  PME reciprocal:         {slope_ms(step_pme, pos):8.3f} ms",
              flush=True)

    # ---- 5. constraints + integration
    masses = np.array([system.getParticleMass(i) for i in range(n)])
    c_pairs, c_dists = constraints
    proj_x, proj_v = make_constrainer(c_pairs, c_dists, masses, n,
                                      dtype=dtype)
    inv_m = jnp.asarray(
        np.where(masses > 0, 1.0 / np.maximum(masses, 1e-300), 0.0),
        dtype)[:, None]
    vel = jnp.asarray(velocities, dtype)

    def step_constr(p):
        v = vel + 0.002 * inv_m * 1e-3
        pn = proj_x(p, p + 0.002 * v)
        v2 = proj_v(pn, (pn - p) / 0.002)
        return pn + 1e-9 * v2
    if which in ("all", "constr"):
        print(f"  SHAKE/RATTLE+integ:     {slope_ms(step_constr, pos):8.3f} ms",
              flush=True)

    # ---- 5b. the EXACT inner-step body (apply + integrate w/ constraints)
    # and a full K-window (prepare + K inner steps) — ground truth for the
    # bench's per-step cost
    if which in ("all", "step", "window"):
        from nonbondedslicing_tpu.runtime.constraints import (
            make_constrainer as _mkc)
        masses2 = np.array([system.getParticleMass(i) for i in range(n)])
        cp2, cd2 = constraints
        px2, pv2 = _mkc(cp2, cd2, masses2, n, dtype=dtype)
        inv_m2 = jnp.asarray(
            np.where(masses2 > 0, 1.0 / np.maximum(masses2, 1e-300), 0.0),
            dtype)[:, None]
        dt2 = jnp.asarray(0.002, dtype)
        vel2 = jnp.asarray(velocities, dtype)

        def inner_body(carry):
            p, v = carry
            _, f, aux = apply(p, box_arr, gvals, data, state)
            v = v + dt2 * inv_m2 * f
            pn = px2(p, p + dt2 * v)
            v = pv2(pn, (pn - p) / dt2)
            return (pn, v)
        if which in ("all", "step"):
            print(f"  inner step (apply+integ): "
                  f"{slope_ms(inner_body, (pos, vel2)):8.3f} ms", flush=True)

        def window_body(carry):
            p, v = carry
            st = prepare(p, box_arr, gvals, data)
            def ib(c, _):
                p2, v2 = c
                _, f, aux = apply(p2, box_arr, gvals, data, st)
                v2 = v2 + dt2 * inv_m2 * f
                pn = px2(p2, p2 + dt2 * v2)
                v2 = pv2(pn, (pn - p2) / dt2)
                return (pn, v2), None
            (p, v), _ = jax.lax.scan(ib, (p, v), None, length=3)
            return (p, v)
        if which in ("all", "window"):
            ms = slope_ms(window_body, (pos, vel2))
            print(f"  K=3 window:             {ms:8.3f} ms"
                  f"  ({ms / 3.0:6.3f} ms/step)", flush=True)

    # ---- 6. exclusions + 1-4 + self/plasma (row layout)
    from nonbondedslicing_tpu.ops import bonded
    from nonbondedslicing_tpu.ops.params import particle_params
    charge, sig_half, eps2 = particle_params(data, gvals)
    subsets = data["subsets"]
    m_mol = n // 3
    sl_tab = jnp.asarray(plan.slice_table)
    sub3 = subsets.reshape(m_mol, 3)
    pair_slices = jnp.stack([sl_tab[sub3[:, 0], sub3[:, 1]],
                             sl_tab[sub3[:, 0], sub3[:, 2]],
                             sl_tab[sub3[:, 1], sub3[:, 2]]], axis=1)
    lam_s = jnp.ones((plan.num_slices,), dtype)

    def step_excl(p):
        e_x, f_x = bonded.exclusion_corrections_rows(
            p, charge, sig_half, eps2, pair_slices, lam_s, lam_s,
            alpha=plan.ewald_alpha, ljpme=False, dispersion_alpha=0.0,
            num_slices=plan.num_slices)
        return p + 1e-9 * f_x
    if which in ("all", "excl"):
        print(f"  excl rows:              {slope_ms(step_excl, pos):8.3f} ms",
              flush=True)




def pme_subphases():
    """Granular PME stage costs at bench config (full-output dependencies so
    nothing is DCE'd)."""
    import bench
    from nonbondedslicing_tpu.ops import engine as engine_mod
    from nonbondedslicing_tpu.ops import fused as fused_mod
    from nonbondedslicing_tpu.ops import plan as plan_mod
    from nonbondedslicing_tpu.ops import pme as pme_mod
    from nonbondedslicing_tpu.ops import pme_bricks, pallas_pme
    from nonbondedslicing_tpu.ops.geometry import recip_box_vectors
    from nonbondedslicing_tpu.ops.neighbors import choose_cell_grid
    from nonbondedslicing_tpu.runtime import native

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
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dtype)], axis=0)
    pos_fm = jnp.swapaxes(pos_p[slots].reshape(n_cells, capacity, 3), 1, 2)
    pos_b = jax.device_put(
        fused_mod._cells_to_bricks(pos_fm, counts, bricks))
    sfeat_b = fused_mod._cells_to_bricks(state["sfeat"], counts, bricks)
    q_b = jax.device_put(sfeat_b[:, 0, :])
    soh_b = jax.device_put(sfeat_b[:, 3:6, :])
    nsub = 3
    order = 5
    g = bricks[0] * bricks[1] * bricks[2]
    (px, wx), (py, wy), (pz, wz) = pme_bricks.brick_window(grid_shape,
                                                           bricks, order)
    spread_k = pallas_pme.make_spread_kernel(grid_shape=grid_shape,
                                             bricks=bricks, nsub=nsub,
                                             order=order)
    interp_k = pallas_pme.make_interp_kernel(grid_shape=grid_shape,
                                             bricks=bricks, nsub=nsub,
                                             order=order)
    recip0 = recip_box_vectors(box_arr)
    qoh0 = soh_b * q_b[:, None, :]
    eterm0 = jnp.asarray(pme_mod.coulomb_eterm_np(
        grid_shape, cfg["pme_moduli"], plan.box0, plan.ewald_alpha,
        half=True).astype(np.float32))

    # (a) spread kernel only
    def step_spread(pb):
        w = spread_k(pb, qoh0, recip0)
        return pb + 1e-20 * jnp.sum(w)
    print(f"  spread_k:        {slope_ms(step_spread, pos_b):8.3f} ms",
          flush=True)

    windows0 = jax.device_put(spread_k(pos_b, qoh0, recip0))

    # (b) scatter_windows only
    def step_scatter(w):
        grid = pme_bricks.scatter_windows(
            w.reshape(g, nsub, wx, wy * wz), bricks, grid_shape)
        return w + 1e-20 * jnp.sum(grid)
    print(f"  scatter_windows: {slope_ms(step_scatter, windows0):8.3f} ms",
          flush=True)

    grid0 = jax.device_put(pme_bricks.scatter_windows(
        windows0.reshape(g, nsub, wx, wy * wz), bricks, grid_shape))

    # (c) matmul-DFT roundtrip + convolution
    def step_fft(gr):
        s_re, s_im = pme_mod.rfft3_matmul(gr)
        phi = pme_mod.irfft3_matmul(s_re * eterm0[None], s_im * eterm0[None],
                                    grid_shape)
        return gr + 1e-20 * jnp.sum(phi)
    print(f"  fft+conv+ifft:   {slope_ms(step_fft, grid0):8.3f} ms",
          flush=True)

    s_re, s_im = pme_mod.rfft3_matmul(grid0)
    phi0 = pme_mod.irfft3_matmul(s_re * eterm0[None], s_im * eterm0[None],
                                 grid_shape)
    lam_nn = jnp.ones((nsub, nsub), dtype)
    comb0 = jax.device_put(jnp.einsum("st,txyz->sxyz", lam_nn, phi0))

    # (d) gather_windows + interp kernel
    def step_interp(cm):
        win_phi = pme_bricks.gather_windows(cm, bricks)
        f = interp_k(win_phi.reshape(g, nsub * wx, wy * wz), pos_b, soh_b,
                     q_b[:, None, :], recip0)
        return cm + 1e-20 * jnp.sum(f)
    print(f"  gather+interp:   {slope_ms(step_interp, comb0):8.3f} ms",
          flush=True)

    # (e) gather_windows alone
    def step_gather(cm):
        win_phi = pme_bricks.gather_windows(cm, bricks)
        return cm + 1e-20 * jnp.sum(win_phi)
    print(f"  gather_windows:  {slope_ms(step_gather, comb0):8.3f} ms",
          flush=True)

    # (f) the fused window-spectrum pipeline that replaces (b)+(c)+(e):
    # windows -> spectrum -> conv+lambda -> windows, grids never materialized
    lam_nn2 = jnp.ones((nsub, nsub), dtype)
    wshape = (wx, wy, wz)

    def step_winfft(w):
        s_re, s_im = pme_mod.rfft3_matmul_windows(
            w.reshape(bricks + (nsub, wx, wy, wz)), bricks, grid_shape)
        cr = jnp.einsum("st,txyk->sxyk", lam_nn2, s_re * eterm0[None])
        ci = jnp.einsum("st,txyk->sxyk", lam_nn2, s_im * eterm0[None])
        win_phi = pme_mod.irfft3_matmul_windows(cr, ci, bricks, grid_shape,
                                                wshape)
        return w + 1e-20 * jnp.sum(win_phi)
    print(f"  windowfft rt:    {slope_ms(step_winfft, windows0):8.3f} ms",
          flush=True)


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    if arg == "pmesub":
        pme_subphases()
    else:
        main(arg)
