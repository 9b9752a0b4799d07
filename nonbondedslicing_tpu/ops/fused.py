"""Fused TPU production engine: one slot table feeding direct + reciprocal.

The round-1 engine rebuilt the cell list, re-gathered every per-atom feature,
and re-rolled the 14 half-shell candidate tensors on every MD step, and ran
PME spread/interp as full-axis dense matmuls.  This module is the restructured
hot path:

* ``prepare`` builds the slot table (cell sort) and everything that depends
  only on the *assignment* of atoms to cells: static per-atom features
  (charge, sigma/2, 2*sqrt(eps), subset one-hots) gathered to slot order, the
  14 rolled candidate copies of those features, exclusion tables, and the
  rebuild positions.  Analog of the reference's persistent neighbor-tile
  structure (OpenMM NonbondedUtilities tiles consumed at
  CommonNonbondedSlicingKernels.cpp:721) — except the reference rebuilds each
  step while MD callers here reuse it for K steps under a skin guard.
* ``apply`` does the per-step work: one gather of positions into slot order,
  14 position rolls, the fused half-shell Pallas pair kernel (with Ewald
  exclusion corrections fused in), brick-decomposed sliced PME
  (ops/pme_bricks.py) reusing the same slot ordering, self/plasma energies,
  1-4 exceptions, and a single slot->atom force unsort.  It also returns an
  ``aux`` dict: the cell-capacity overflow count (never silently drop atoms —
  the reference's voxel hash is exact,
  ReferenceNonbondedSlicingKernels.cpp:197) and the squared max displacement
  since ``prepare`` (callers must rebuild / fail when it exceeds the skin).

Validity conditions (enforced by callers via aux + static checks):
* aux["overflow"] == 0
* aux["maxdisp2"] <= (skin/2)^2 where skin = min cell width - cutoff
  capped by one PME grid spacing (window drift margin)
* runtime box == plan.box0 when the convolution kernels are hoisted
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..models.force import NonbondedForce
from ..utils.constants import COUL, EPSILON0, ONE_4PI_EPS0, SQRT_PI, VDW
from ..utils.indexing import slice_subsets
from . import bonded, direct, neighbors, params, pme, pme_bricks
from .geometry import box_volume, recip_box_vectors
from .pallas_direct import HALF_OFFSETS, make_pallas_cell_kernel


def _brick_counts(counts, capacity=None, raw_grid=None):
    """PME brick counts per axis.

    Default heuristic (round 5): at most ~6 bricks per axis — per-brick
    Pallas grid-step overhead (~2-3 us) dominates once brick counts reach
    ~1000 (measured at 100k/90^3: PME 7.87 ms with (10,10,10) bricks vs
    2.55 ms with (5,5,5)); at the 23k bench (6,6,6) cells this reduces to
    the previous one-brick-per-cell choice (its 1-cell vs 2x2x2-cell
    spread/interp measurements: 0.012/0.094 vs 0.25/0.72 ms).  Coarser
    bricks grow the per-brick interp B-plane (wy*wz x C_brick); when the
    estimate exceeds ~4 MB of VMEM the heuristic falls back to
    one-brick-per-cell (e.g. (9,9,9) cells, where 3-per-axis bricks would
    need a 23 MB plane).  NBS_BRICK_TARGET overrides the per-axis divisor
    target."""
    import os
    tgt = os.environ.get("NBS_BRICK_TARGET")
    if tgt is not None:
        target = int(tgt)
        return tuple(
            min([d for d in range(1, nc + 1) if nc % d == 0],
                key=lambda d: (abs(d - target), -d))
            for nc in counts)
    bricks = []
    for nc in counts:
        divs = [d for d in range(1, nc + 1) if nc % d == 0 and d <= 6]
        bricks.append(max(divs) if divs else nc)
    if capacity is not None and raw_grid is not None:
        cells_per_brick = 1
        for nc, d in zip(counts, bricks):
            cells_per_brick *= nc // d
        c_brick = capacity * cells_per_brick
        wy = raw_grid[1] // bricks[1] + 6
        wz = raw_grid[2] // bricks[2] + 6
        if c_brick * wy * wz * 4 > 4 * 1024 * 1024:
            return tuple(counts)
    return tuple(bricks)


def fused_config(plan, cell_capacity=None, target_skin=0.0):
    """Static sizing for the fused engine, or None when not applicable
    (non-periodic / too coarse a box for a cell list)."""
    if plan.box0 is None or plan.method in (NonbondedForce.NoCutoff,
                                            NonbondedForce.CutoffNonPeriodic):
        return None
    cfg = neighbors.choose_cell_grid(plan.box0, plan.cutoff,
                                     plan.num_particles,
                                     target_skin=target_skin)
    if cfg is None:
        return None
    counts, capacity = cfg
    if cell_capacity is not None:
        capacity = int(cell_capacity)
    widths = neighbors._perpendicular_widths(plan.box0) / np.asarray(counts)
    skin = float(np.min(widths)) - plan.cutoff
    bricks = _brick_counts(
        counts, capacity=capacity,
        raw_grid=(plan.pme_grid if plan.method in (NonbondedForce.PME,
                                                   NonbondedForce.LJPME)
                  else None))
    out = dict(counts=counts, capacity=capacity, skin=skin, bricks=bricks)
    if plan.method in (NonbondedForce.PME, NonbondedForce.LJPME):
        grid = pme_bricks.aligned_grid(plan.pme_grid, bricks)
        out["pme_grid"] = grid
        out["pme_moduli"] = pme.bspline_moduli(grid, order=plan.pme_order)
        box_diag = np.diag(np.asarray(plan.box0, dtype=np.float64))
        spacing = float(np.min(box_diag / np.asarray(grid)))
        out["skin"] = min(out["skin"], 2.0 * spacing)  # +-1 point drift margin
        if plan.method == NonbondedForce.LJPME:
            dgrid = pme_bricks.aligned_grid(plan.dispersion_grid, bricks)
            out["dispersion_grid"] = dgrid
            out["dpme_moduli"] = pme.bspline_moduli(dgrid, order=plan.pme_order)
            dspacing = float(np.min(box_diag / np.asarray(dgrid)))
            out["skin"] = min(out["skin"], 2.0 * dspacing)
    return out


def _cells_to_bricks(x, counts, bricks):
    """(g_cells, F, C) cell-major slot tensor -> (g_bricks, F, C*f^3)
    brick-major, where f = counts/bricks per axis."""
    ncx, ncy, ncz = counts
    bx, by, bz = bricks
    fx, fy, fz = ncx // bx, ncy // by, ncz // bz
    g, F, C = x.shape
    t = x.reshape(bx, fx, by, fy, bz, fz, F, C)
    t = t.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return t.reshape(bx * by * bz, F, fx * fy * fz * C)


def _bricks_to_cells(x, counts, bricks):
    """Inverse of _cells_to_bricks for (g_bricks, C*f^3, F) force tensors."""
    ncx, ncy, ncz = counts
    bx, by, bz = bricks
    fx, fy, fz = ncx // bx, ncy // by, ncz // bz
    gb, CF, F = x.shape
    C = CF // (fx * fy * fz)
    t = x.reshape(bx, by, bz, fx, fy, fz, C, F)
    t = t.transpose(0, 3, 1, 4, 2, 5, 6, 7)
    return t.reshape(ncx * ncy * ncz, C, F)


def make_fused_engine(plan, *, cell_capacity=None, hoist_eterm=False,
                      interpret=False, target_skin=0.0, energies=True):
    """Build (prepare, apply, config) for the fused TPU engine.

    prepare(positions, box, gvals, data) -> state
    apply(positions, box, gvals, data, state)
        -> (slice_energies (S, 2), forces (N, 3), aux)

    ``energies=False`` builds a force-only variant: the direct-space pair
    energies (and their per-slice moment contractions) are skipped in the
    kernel — the returned slice_energies then lack the direct pair terms.
    MD inner steps only consume forces; callers wanting the energy run one
    full-variant evaluation at the end.
    """
    cfg = fused_config(plan, cell_capacity, target_skin=target_skin)
    if cfg is None:
        return None
    method = plan.method
    is_ewald_family = method in (NonbondedForce.Ewald, NonbondedForce.PME,
                                 NonbondedForce.LJPME)
    is_pme = method in (NonbondedForce.PME, NonbondedForce.LJPME)
    counts = cfg["counts"]
    capacity = cfg["capacity"]
    ncx, ncy, ncz = counts
    n_cells = ncx * ncy * ncz
    n = plan.num_particles
    nsub = plan.num_subsets
    nslices = plan.num_slices
    slice_pairs_np = np.asarray(slice_subsets(nsub))
    slice_pairs = slice_pairs_np
    slice_table = plan.slice_table
    emax = plan.exclusion_list.shape[1]

    eps_rf = plan.rf_dielectric
    krf = plan.cutoff ** -3 * (eps_rf - 1.0) / (2.0 * eps_rf + 1.0)
    crf = (1.0 / plan.cutoff) * (3.0 * eps_rf) / (2.0 * eps_rf + 1.0)
    mode = direct.EWALD_DIRECT if is_ewald_family else direct.CUTOFF

    import os
    # exclusion corrections: fusing them into the pair tiles costs a second
    # transcendental pass over EVERY pair slot (~35% of the pair kernel);
    # when the exclusions are rigid-water contiguous triples, a row-layout
    # pass over the actual pair list is gather/scatter-free and ~10x cheaper
    # than either, so prefer it. NBS_FUSE_EXCL=0/1 overrides.
    tri_excl = None
    if is_ewald_family and not plan.exceptions_periodic:
        tri_excl = bonded.triangle_exclusions(plan.exclusion_pairs, n)
    fuse_env = os.environ.get("NBS_FUSE_EXCL")
    if fuse_env is not None:
        fuse_exclusions = fuse_env != "0"
    else:
        fuse_exclusions = tri_excl is None
    # bake periodic-image shifts into the rolled candidate positions (static
    # per roll offset) so the kernel skips per-slot minimum-image math; the
    # fused-exclusion path needs raw unwrapped deltas, so it keeps min-image
    preshift = not (mode == direct.EWALD_DIRECT and fuse_exclusions)
    # column kernel: in-kernel candidate assembly via index-mapped neighbor
    # column loads — removes the per-step 14-roll/concat HBM materialization
    # (measured at ~the cost of the pair math itself).  Requires preshifted
    # images, so the fused-exclusion (min-image) variant keeps the cell
    # kernel.  NBS_COLUMN_KERNEL=0 opts out.
    # (A third structure — the z-band kernel, contiguous z-window candidates
    # over (column, z)-sorted slots — was built and measured in round 4 and
    # RETIRED in round 5: it lost on hardware, 4.58-5.40 vs 3.00 ms/step at
    # the 23k bench, because Mosaic's dynamic lane-offset slices are slow
    # and 16-32-row bands under-occupy the VPU.  docs/devnotes.md round-4
    # notes record the evidence; git history has the code.)
    use_column = (preshift
                  and os.environ.get("NBS_COLUMN_KERNEL", "1") != "0")
    if use_column:
        from .pallas_direct import make_pallas_column_kernel
        kernel = make_pallas_column_kernel(
            mode=mode, cutoff=plan.cutoff, counts=counts, capacity=capacity,
            nsub=nsub, emax=emax, krf=krf, crf=crf,
            use_switch=plan.use_switch,
            switch_distance=plan.switch_distance,
            ewald_alpha=plan.ewald_alpha,
            ljpme=(method == NonbondedForce.LJPME),
            dispersion_alpha=plan.dispersion_alpha, interpret=interpret,
            exceptions_periodic=plan.exceptions_periodic,
            fuse_exclusions=False, compute_energies=energies,
            assume_pads_far=True)
    else:
        kernel = make_pallas_cell_kernel(
            mode=mode, cutoff=plan.cutoff, counts=counts, capacity=capacity,
            nsub=nsub, emax=emax, krf=krf, crf=crf,
            use_switch=plan.use_switch,
            switch_distance=plan.switch_distance,
            ewald_alpha=plan.ewald_alpha,
            ljpme=(method == NonbondedForce.LJPME),
            dispersion_alpha=plan.dispersion_alpha, interpret=interpret,
            exceptions_periodic=plan.exceptions_periodic,
            fuse_exclusions=fuse_exclusions, images_preshifted=preshift,
            # the min-image (non-preshift) variant would wrap the far pad
            # offsets back into the box, so only the preshifted layout may
            # drop its real-slot mask
            compute_energies=energies, assume_pads_far=preshift)
    # per-offset wrap indicators: cand cell c receives cell (c+d) mod nc,
    # whose true image sits at +floor((c+d)/nc) box vectors
    _wrap = {}
    for off in HALF_OFFSETS:
        fac = []
        for axis, (d, nc) in enumerate(zip(off, counts)):
            fac.append(((np.arange(nc) + d) // nc).astype(np.float64))
        _wrap[off] = fac

    # box-static convolution kernels for the MD fastpath (valid only while
    # the runtime box equals plan.box0 — callers must enforce)
    # numpy, NOT device arrays: closure constants that are device arrays get
    # fetched element-wise over the TPU tunnel during lowering (minutes for a
    # PME grid)
    eterm0 = dterm0 = None
    if hoist_eterm and is_pme:
        eterm0 = pme.coulomb_eterm_np(cfg["pme_grid"], cfg["pme_moduli"],
                                      plan.box0, plan.ewald_alpha,
                                      half=True).astype(np.float32)
        if method == NonbondedForce.LJPME:
            dterm0 = pme.dispersion_eterm_np(
                cfg["dispersion_grid"], cfg["dpme_moduli"], plan.box0,
                plan.dispersion_alpha, half=True).astype(np.float32)

    # pad-slot offset base: clears the box (hence every real atom and every
    # preshift image shift) by a wide margin
    _pad_base = 64.0 * (1.0 + float(np.sum(np.abs(np.asarray(plan.box0)))))

    def prepare(positions, box, gvals, data):
        """Slot table + assignment-static tensors (rebuild every K steps)."""
        dtype = positions.dtype
        subsets = data["subsets"]
        charge, sig_half, eps2 = params.particle_params(data, gvals)
        cell = neighbors.cell_ids(positions, box, counts)
        table, overflow = neighbors.build_occupancy(cell, n, counts, capacity)
        slots = table.reshape(-1)
        if preshift:
            # canonical in-box wrap consistent with the cell assignment above
            # (cell_ids wraps with the same floor(frac) expression); apply()
            # keeps drifted atoms in THIS image for the whole reuse window
            frac0 = positions @ recip_box_vectors(box).astype(dtype)
            pos0w = positions - jnp.floor(frac0) @ box
        else:
            pos0w = positions

        oh = (subsets[:, None]
              == jnp.arange(nsub, dtype=subsets.dtype)).astype(dtype)
        feat = jnp.concatenate([charge[:, None], sig_half[:, None],
                                eps2[:, None], oh], axis=1)   # (N, 3+nsub)
        nf = feat.shape[1]
        feat_p = jnp.concatenate([feat, jnp.zeros((1, nf), dtype)], axis=0)
        sfeat = jnp.swapaxes(feat_p[slots].reshape(n_cells, capacity, nf),
                             1, 2)                             # (g, Fs, C)
        # inverse slot map: atom -> its (unique) slot, so the per-step
        # slot->atom force unsort is a GATHER instead of a scatter-add
        # (measured ~0.34 ms/step as a scatter at the 23k bench; XLA lowers
        # unique-index gathers much faster).  Pad slots carry exact zeros
        # (masked pairs contribute zero force), and an atom dropped by a
        # cell overflow reads garbage — irrelevant, the overflow guard
        # raises before any caller can use those forces.
        inv_slots = jnp.zeros((n + 1,), jnp.int32).at[slots].set(
            jnp.arange(slots.shape[0], dtype=jnp.int32))[:n]
        # unique far-away x offsets for pad slots (assume_pads_far contract:
        # every pad sits > cutoff from every other slot, letting the pair
        # kernels drop their (C, ncand)-wide real-slot masks).  Spacing 64 nm
        # dominates the +-1-box preshift image shifts; exact in f32 up to
        # ~2^24/64 slots, and degraded ULPs still leave >> cutoff gaps.
        padfix = jnp.where(
            slots == n,
            _pad_base + 64.0 * jnp.arange(slots.shape[0], dtype=jnp.float32),
            0.0).astype(dtype)
        state = dict(slots=slots, inv_slots=inv_slots, table=table,
                     sfeat=sfeat, pos0=positions, pos0w=pos0w,
                     padfix3=jnp.concatenate(
                         [padfix.reshape(n_cells, 1, capacity),
                          jnp.zeros((n_cells, 2, capacity), dtype)], axis=1),
                     overflow=overflow.astype(jnp.int32))
        excl_p = jnp.concatenate(
            [data["exclusion_list"],
             jnp.full((1, emax), -1, data["exclusion_list"].dtype)], axis=0)
        state["sexcl"] = jnp.swapaxes(
            excl_p[slots].reshape(n_cells, capacity, emax), 1, 2)
        if not use_column:
            # the cell kernel consumes materialized candidate tensors; the
            # column kernel assembles candidates in VMEM instead
            grid_feat = sfeat.reshape(ncx, ncy, ncz, nf, capacity)
            grid_idx = slots.reshape(ncx, ncy, ncz, capacity)
            state["cand_static"] = jnp.concatenate(
                [jnp.roll(grid_feat, (-dx, -dy, -dz), axis=(0, 1, 2))
                 .reshape(n_cells, nf, capacity)
                 for (dx, dy, dz) in HALF_OFFSETS], axis=2)    # (g, Fs, 14C)
            state["cand_idx"] = jnp.concatenate(
                [jnp.roll(grid_idx, (-dx, -dy, -dz), axis=(0, 1, 2))
                 .reshape(n_cells, capacity)
                 for (dx, dy, dz) in HALF_OFFSETS], axis=1)    # (g, 14C)
        return state

    def apply(positions, box, gvals, data, state):
        dtype = positions.dtype
        subsets = data["subsets"]
        charge, sig_half, eps2 = params.particle_params(data, gvals)
        lam = params.slice_lambdas(plan.lam_source, gvals)
        lam_c = lam[:, COUL]
        lam_v = lam[:, VDW]
        sl_tab = jnp.asarray(slice_table)
        lam_c_nn = lam_c[sl_tab]
        lam_v_nn = lam_v[sl_tab]

        slots = state["slots"]
        sfeat = state["sfeat"]

        # ---- the per-step gather: positions into slot order
        if preshift:
            # the baked per-offset image shifts assume positions in the SAME
            # periodic image the cell assignment saw at prepare() time.
            # Re-wrapping here would teleport an atom that crosses a box face
            # during the reuse window one box length away from its frozen
            # cell, silently dropping its in-range pairs — so keep each atom
            # in its prepare-time image: wrapped prepare position + raw
            # drift.  (PME is indifferent: fractional coordinates are
            # re-wrapped per atom inside the spline kernels.)
            pos_in = state["pos0w"] + (positions - state["pos0"])
        else:
            pos_in = positions
        pos_p = jnp.concatenate([pos_in, jnp.zeros((1, 3), dtype)], axis=0)
        pos_fm = jnp.swapaxes(pos_p[slots].reshape(n_cells, capacity, 3),
                              1, 2) + state["padfix3"]         # (g, 3, C)
        if use_column:
            rows_feat = jnp.concatenate([pos_fm, sfeat], axis=1)
            nf_all = rows_feat.shape[1]
            # slot_fc includes Newton reactions (pre-rolled outputs)
            slot_fc, m_c, m_v = kernel(
                rows_feat.reshape(ncx, ncy, ncz, nf_all, capacity),
                state["table"].reshape(ncx, ncy, ncz, 1, capacity),
                state["sexcl"].reshape(ncx, ncy, ncz, emax, capacity),
                lam_c_nn, lam_v_nn, box, n)
        else:
            rows_feat = jnp.concatenate([pos_fm, sfeat], axis=1)
            grid_pos = pos_fm.reshape(ncx, ncy, ncz, 3, capacity)
            cand_blocks = []
            for off in HALF_OFFSETS:
                dx, dy, dz = off
                rolled = jnp.roll(grid_pos, (-dx, -dy, -dz), axis=(0, 1, 2))
                if preshift:
                    wx, wy, wz = _wrap[off]
                    shift = (jnp.asarray(wx, dtype)[:, None, None, None]
                             * box[0]
                             + jnp.asarray(wy, dtype)[None, :, None, None]
                             * box[1]
                             + jnp.asarray(wz, dtype)[None, None, :, None]
                             * box[2])
                    rolled = rolled + shift[..., None]
                cand_blocks.append(rolled.reshape(n_cells, 3, capacity))
            cand_pos = jnp.concatenate(cand_blocks, axis=2)    # (g, 3, 14C)
            cand_feat = jnp.concatenate([cand_pos, state["cand_static"]],
                                        axis=1)
            (row_f, col_f, m_c, m_v), pad = kernel(
                rows_feat, state["table"], state["sexcl"], cand_feat,
                state["cand_idx"], lam_c_nn, lam_v_nn, box, n)
            row_f = row_f[:n_cells]
            col_f = col_f[:n_cells]
        # f64 per-slice accumulation; only materialized on energy
        # evaluations (force-only inner steps DCE all of it)
        slice_energies = jnp.zeros((nslices, 2), jnp.float64)
        if energies:
            # cross-tile moment reduction in f64 (see ops/pallas_direct.py)
            mc = jnp.sum(m_c, axis=0, dtype=jnp.float64)
            mv = jnp.sum(m_v, axis=0, dtype=jnp.float64)
            a = slice_pairs_np[:, 0]
            b = slice_pairs_np[:, 1]
            ec = jnp.where(a == b, mc[a, a], mc[a, b] + mc[b, a])
            ev = jnp.where(a == b, mv[a, a], mv[a, b] + mv[b, a])
            slice_energies = slice_energies.at[:, COUL].add(ec)
            slice_energies = slice_energies.at[:, VDW].add(ev)

        if use_column:
            slot_f = jnp.swapaxes(slot_fc, 1, 2)
        else:
            # roll per-offset column forces back onto their home cells
            slot_f = row_f.reshape(ncx, ncy, ncz, 3, capacity)
            col_g = col_f.reshape(ncx, ncy, ncz, 3, 14, capacity)
            for k, (dx, dy, dz) in enumerate(HALF_OFFSETS):
                slot_f = slot_f + jnp.roll(col_g[:, :, :, :, k],
                                           (dx, dy, dz), axis=(0, 1, 2))
            slot_f = jnp.swapaxes(slot_f.reshape(n_cells, 3, capacity), 1, 2)

        if is_ewald_family:
            alpha = plan.ewald_alpha
            onehot = (subsets[:, None]
                      == jnp.arange(nsub)[None, :]).astype(dtype)
            diag_ids = np.array([s * (s + 3) // 2 for s in range(nsub)])
            # self energy (ReferenceSlicedLJCoulombIxn.cpp:203-213)
            charge64 = charge.astype(jnp.float64)
            onehot64 = onehot.astype(jnp.float64)
            self_coul = -ONE_4PI_EPS0 * charge64 * charge64 * alpha / SQRT_PI
            slice_energies = slice_energies.at[diag_ids, COUL].add(
                self_coul @ onehot64)
            if method == NonbondedForce.LJPME:
                self_vdw = (plan.dispersion_alpha ** 6 * 64.0
                            * sig_half.astype(jnp.float64) ** 6
                            * eps2.astype(jnp.float64) ** 2 / 12.0)
                slice_energies = slice_energies.at[diag_ids, VDW].add(
                    self_vdw @ onehot64)
            # neutralizing plasma (cpp:214-221)
            volume = box_volume(box).astype(jnp.float64)
            q_sub = charge64 @ onehot64
            factor = (-1.0 / (4.0 * alpha * alpha)) / (2.0 * EPSILON0 * volume)
            qi = q_sub[slice_pairs[:, 0]]
            qj = q_sub[slice_pairs[:, 1]]
            w = jnp.where(slice_pairs[:, 0] == slice_pairs[:, 1],
                          1.0, 2.0).astype(jnp.float64)
            slice_energies = slice_energies.at[:, COUL].add(w * qi * qj * factor)

        if is_pme:
            from . import pallas_pme
            bricks = cfg["bricks"]
            pos_b = _cells_to_bricks(pos_fm, counts, bricks)
            feat_b = _cells_to_bricks(sfeat, counts, bricks)
            q_b = feat_b[:, 0, :]
            soh_b = feat_b[:, 3:3 + nsub, :]
            e_k, f_kb = pallas_pme.pme_reciprocal_pallas(
                pos_b, q_b, soh_b, box, lam_c, alpha=plan.ewald_alpha,
                grid_shape=cfg["pme_grid"], moduli=cfg["pme_moduli"],
                bricks=bricks, slice_subset_pairs=slice_pairs,
                slice_table=slice_table, interpret=interpret,
                energies=energies,
                eterm=(None if eterm0 is None else eterm0.astype(dtype)))
            slice_energies = slice_energies.at[:, COUL].add(
                e_k.astype(jnp.float64))
            slot_f = slot_f + _bricks_to_cells(f_kb, counts, bricks)
            if method == NonbondedForce.LJPME:
                c6_b = 8.0 * feat_b[:, 1, :] ** 3 * feat_b[:, 2, :]
                e_d, f_db = pallas_pme.pme_reciprocal_pallas(
                    pos_b, c6_b, soh_b, box, lam_v,
                    alpha=plan.dispersion_alpha,
                    grid_shape=cfg["dispersion_grid"],
                    moduli=cfg["dpme_moduli"], bricks=bricks,
                    slice_subset_pairs=slice_pairs, slice_table=slice_table,
                    dispersion=True, interpret=interpret, energies=energies,
                    eterm=(None if dterm0 is None else dterm0.astype(dtype)))
                slice_energies = slice_energies.at[:, VDW].add(
                    e_d.astype(jnp.float64))
                slot_f = slot_f + _bricks_to_cells(f_db, counts, bricks)
        elif method == NonbondedForce.Ewald:
            from . import ewald as ewald_mod
            kvec_ints = ewald_mod.half_space_kvectors(plan.ewald_kmax)
            e_k, f_k = ewald_mod.ewald_reciprocal(
                positions, box, charge, subsets, lam_c, kvec_ints=kvec_ints,
                alpha=plan.ewald_alpha, num_subsets=nsub, num_slices=nslices,
                slice_subset_pairs=slice_pairs)
            slice_energies = slice_energies.at[:, COUL].add(
                e_k.astype(jnp.float64))

        # single slot->atom unsort: gather by the inverse permutation
        # (each real atom occupies exactly one slot; pad slots hold zeros)
        forces = slot_f.reshape(-1, 3)[state["inv_slots"]]
        if method == NonbondedForce.Ewald:
            forces = forces + f_k

        if is_ewald_family and not fuse_exclusions:
            if tri_excl is not None:
                m_mol = n // 3
                sub3 = subsets.reshape(m_mol, 3)
                pair_slices = jnp.stack(
                    [sl_tab[sub3[:, 0], sub3[:, 1]],
                     sl_tab[sub3[:, 0], sub3[:, 2]],
                     sl_tab[sub3[:, 1], sub3[:, 2]]], axis=1)
                e_x, f_x = bonded.exclusion_corrections_rows(
                    positions, charge, sig_half, eps2, pair_slices,
                    lam_c, lam_v, alpha=plan.ewald_alpha,
                    ljpme=(method == NonbondedForce.LJPME),
                    dispersion_alpha=plan.dispersion_alpha,
                    num_slices=nslices)
            else:
                e_x, f_x = bonded.exclusion_corrections(
                    positions, box, data["exclusion_pairs"], charge, sig_half,
                    eps2, subsets, slice_table, lam_c, lam_v,
                    alpha=plan.ewald_alpha,
                    periodic_exceptions=plan.exceptions_periodic,
                    ljpme=(method == NonbondedForce.LJPME),
                    dispersion_alpha=plan.dispersion_alpha,
                    num_slices=nslices, num_particles=n)
            slice_energies = slice_energies + e_x
            forces = forces + f_x

        # 1-4 exceptions
        sigma14, four_eps14, qq14 = params.nb14_params(data, gvals)
        e_14, f_14 = bonded.nb14_interactions(
            positions, box, data["nb14_atoms"], sigma14, four_eps14, qq14,
            data["nb14_slice"], lam_c, lam_v,
            periodic=plan.exceptions_periodic, num_slices=nslices,
            num_particles=n)
        slice_energies = slice_energies + e_14
        forces = forces + f_14

        # per-slice long-range dispersion correction / volume
        if method in (NonbondedForce.CutoffPeriodic, NonbondedForce.Ewald,
                      NonbondedForce.PME):
            slice_energies = slice_energies.at[:, VDW].add(
                data["dispersion_coefficients"].astype(jnp.float64)
                / box_volume(box).astype(jnp.float64))

        disp = positions - state["pos0"]
        maxdisp2 = jnp.max(jnp.sum(disp * disp, axis=-1))
        aux = dict(overflow=state["overflow"], maxdisp2=maxdisp2)
        return slice_energies, forces, aux

    return prepare, apply, cfg
