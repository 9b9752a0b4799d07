"""Z-banded column pair kernel: half-shell over (x, y) columns with
contiguous z-window candidates.

The cell kernels (ops/pallas_direct.py) quantize space into 3D cells and
process (capacity, 14*capacity) tiles: at liquid density that visits ~2,400
candidate slots per real atom for ~150 half-counted in-cutoff neighbors —
the 27-cell prism is ~9.5x the cutoff sphere and the static cell capacity
pads every row AND every candidate panel.  This module is the tighter
TPU-native structure (the analog of the reference GPU platforms' compacted
tile lists, OpenMM NonbondedUtilities consumed at
CommonNonbondedSlicingKernels.cpp:721):

* atoms are sorted by (column, z) where a column is an (x, y) cell of width
  >= cutoff+skin — one argsort, no 3D cell capacity;
* each column carries ghost copies of its first/last atoms shifted by -+Lz,
  so z-periodic wrap is plain storage (windows never branch on wrap);
* the kernel processes one column per grid step with the 4 half-shell
  neighbor columns resident in VMEM, looping over z-bands of R consecutive
  real atoms; per band the candidates are ONE contiguous z-window per
  neighbor column, located by prepare-time ``searchsorted`` and sliced with
  dynamic lane offsets, then concat-packed into a dense
  (R, Ws + 4*Wn) pair tile — no 128-lane quantization per window;
* same-column pairs dedup by storage rank (cand_rank > row_rank), which is
  exactly the visit-once rule under z-sorted storage and stays correct for
  ghost candidates; cross-column pairs dedup by the half-column set;
* Newton reactions accumulate by read-modify-write into 5 per-destination
  output arrays (index-mapped like the column kernel's pre-rolled outputs).

Candidate slots per atom at the 23k bench: ~1,400 vs ~2,400 for the cell
column kernel (windows track the local z-extent instead of whole cells).

Structure validity matches the cell engine's contracts: windows are sized
from prepare-time positions with reach = cutoff + skin, so they stay exact
for max displacement skin/2 between rebuilds (the fastpath guard);
overflowing a static window raises, never drops pairs.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .direct import CUTOFF, EWALD_DIRECT
from .geometry import recip_box_vectors
from .neighbors import _perpendicular_widths
from .pallas_direct import _make_pair_block

# self + 4 half-shell neighbor columns: each unordered column pair once
HALF_COLS = [(0, 0), (1, 0), (0, 1), (1, 1), (1, -1)]


def _r8(x):
    return int(math.ceil(x / 8.0) * 8)


def band_config(box, cutoff, num_particles, target_skin=0.0,
                rows_per_band=None, window_scale=1.0):
    """Static sizing for the band structure, or None when not applicable.

    Applicability mirrors choose_cell_grid: >=3 columns per (x, y) axis at
    width >= cutoff (+skin), and a z height >= 3x the reach so a z-window
    can never see both images of the same atom.
    """
    import os
    if rows_per_band is None:
        rows_per_band = int(os.environ.get("NBS_BAND_ROWS", "16"))
    R = max(8, _r8(rows_per_band))
    widths = _perpendicular_widths(box)
    ncx = int(widths[0] // (cutoff + target_skin))
    ncy = int(widths[1] // (cutoff + target_skin))
    if target_skin > 0.0 and (ncx < 3 or ncy < 3):
        ncx = int(widths[0] // cutoff)
        ncy = int(widths[1] // cutoff)
    if ncx < 3 or ncy < 3:
        return None
    skin = min(widths[0] / ncx, widths[1] / ncy) - cutoff
    reach = cutoff + skin
    if widths[2] < 3.0 * reach:
        return None
    ncol = ncx * ncy
    mean_col = num_particles / ncol
    rho = mean_col / widths[2]              # atoms per nm of column height
    # a band whose z-window spans >= Lz would see both periodic images of an
    # atom (the build_band_structure span guard); keep the EXPECTED span of
    # R rows at 2.5x below that threshold, shrinking R for sparse columns
    # and rejecting systems where even R=8 cannot fit
    span_budget = widths[2] - 2.0 * reach
    r_allowed = int(rho * span_budget / 2.5 // 8) * 8
    if r_allowed < 8:
        return None
    R = min(R, max(8, r_allowed))
    wrho = reach * rho
    s = window_scale
    # window_scale grows creal too: per-column overflow is packed into the
    # same band-overflow counter the rebuild hook reacts to, so every
    # capacity it reports must actually grow under the hook
    creal = _r8(s * (mean_col + 6.0 * math.sqrt(mean_col) + 8))
    wg = _r8(s * (wrho + 4.0 * math.sqrt(wrho) + 8))
    wn = _r8(s * (R + 2.0 * wrho + 4.0 * math.sqrt(2.0 * wrho) + 8))
    ws = _r8(s * (R + wrho + 4.0 * math.sqrt(wrho) + 8))
    nbands = -(-creal // R)
    # +256 headroom: dynamic window accesses load an aligned frame of
    # round_up(cap + 128, 128) lanes starting at floor(start/128)*128 (the
    # live Mosaic backend rejects unaligned dynamic lane offsets,
    # extras/probe_mosaic_dyn.py) — every frame must stay in bounds for any
    # start <= 2*wg + creal (the largest searchsorted result over finite z)
    lext = int(math.ceil((2 * wg + creal + wn + 256) / 128.0) * 128)
    return dict(ncx=ncx, ncy=ncy, creal=creal, wg=wg, ws=ws, wn=wn,
                lext=lext, nbands=nbands, rows=R, skin=skin, reach=reach)


def neighbor_columns(bcfg):
    """(ncol, 5) int32: column index of each half-shell neighbor (self
    first), with periodic x/y wrap."""
    ncx, ncy = bcfg["ncx"], bcfg["ncy"]
    cx, cy = np.divmod(np.arange(ncx * ncy), ncy)
    cols = []
    for dx, dy in HALF_COLS:
        cols.append(((cx + dx) % ncx) * ncy + (cy + dy) % ncy)
    return np.stack(cols, axis=1).astype(np.int32)


def build_band_structure(positions, box, n, bcfg):
    """In-trace (jittable) band structure from prepare-time positions.

    Returns a dict:
      slots_ext (ncol*lext,) int32 — atom index per extended slot (n = pad)
      zsign (ncol*lext,) f32 — ghost image sign (-1/0/+1) x box z-vector
      windows (ncol, nbands, 5, 2) int32 — (start, valid) per band/neighbor
      overflow () int32 — column-capacity + window-capacity violations
    """
    ncx, ncy = bcfg["ncx"], bcfg["ncy"]
    ncol = ncx * ncy
    creal, wg, lext = bcfg["creal"], bcfg["wg"], bcfg["lext"]
    ws, wn = bcfg["ws"], bcfg["wn"]
    R, nbands = bcfg["rows"], bcfg["nbands"]
    reach = bcfg["reach"]
    dtype = positions.dtype
    f64 = jnp.float64 if jnp.asarray(box).dtype == jnp.float64 else dtype

    recip = recip_box_vectors(box).astype(dtype)
    frac = positions @ recip
    frac = frac - jnp.floor(frac)
    cx = jnp.clip((frac[:, 0] * ncx).astype(jnp.int32), 0, ncx - 1)
    cy = jnp.clip((frac[:, 1] * ncy).astype(jnp.int32), 0, ncy - 1)
    col = cx * ncy + cy
    lz = box[2, 2]
    z = frac[:, 2] * lz
    # one sort by (column, z)
    order = jnp.argsort(col.astype(f64) * (2.0 * lz) + z.astype(f64))
    col_sorted = col[order]
    starts = jnp.searchsorted(col_sorted, jnp.arange(ncol, dtype=col.dtype))
    counts = (jnp.append(starts[1:], n) - starts).astype(jnp.int32)
    col_overflow = jnp.sum(jnp.maximum(counts - creal, 0))
    counts_c = jnp.minimum(counts, creal)

    # extended per-column slot layout:
    #   [ghost_top (wg) | real (count) | ghost_bottom (min(wg,count)) | pad]
    k = jnp.arange(lext, dtype=jnp.int32)[None, :]           # (1, lext)
    cnt = counts_c[:, None]
    st = starts.astype(jnp.int32)[:, None]
    gb = jnp.minimum(wg, cnt)
    is_gt = k < wg
    gt_rank = cnt - wg + k
    is_real = (k >= wg) & (k < wg + cnt)
    is_gbot = (k >= wg + cnt) & (k < wg + cnt + gb)
    rank = jnp.where(is_gt, gt_rank,
                     jnp.where(is_real, k - wg, k - wg - cnt))
    valid = (is_gt & (gt_rank >= 0)) | is_real | is_gbot
    idx = st + jnp.clip(rank, 0, jnp.maximum(cnt - 1, 0))
    idx = jnp.clip(idx, 0, max(n - 1, 0))
    order32 = order.astype(jnp.int32)
    slots_ext = jnp.where(valid, order32[idx], n).reshape(-1)
    zsign = jnp.where(is_gt, -1.0, jnp.where(is_gbot, 1.0, 0.0))
    zsign = jnp.where(valid, zsign, 0.0).astype(dtype).reshape(-1)
    # sorted z per extended slot (pads ordered: ghost-top pads lowest,
    # tail pads highest, so every column row of z_ext is non-decreasing)
    z_sorted = z[order]
    z_ext = jnp.where(valid, z_sorted[idx] + zsign.reshape(ncol, lext) * lz,
                      jnp.where(is_gt, -1e8, 1e9).astype(dtype))
    # the f32 sort key col*(2Lz)+z can tie-break near-equal z out of true z
    # order by ~key-granularity (~3e-5 nm at bench scale); binary search
    # needs a genuinely sorted array, so clamp z_ext monotone (distortion
    # <= the key wiggle) and widen the window bounds by a slack that
    # dominates it (see reach_w below)
    z_ext = jax.lax.cummax(z_ext, axis=1)
    reach_w = reach + 1e-3

    # per-band z ranges from the REAL rows
    b = jnp.arange(nbands, dtype=jnp.int32)
    lo_idx = wg + R * b[None, :]                              # (1, nbands)
    hi_idx = jnp.minimum(lo_idx + R - 1, wg + jnp.maximum(cnt, 1) - 1)
    z_lo = jnp.take_along_axis(z_ext, lo_idx.astype(jnp.int32)
                               * jnp.ones((ncol, 1), jnp.int32), axis=1)
    z_hi = jnp.take_along_axis(z_ext, hi_idx, axis=1)         # (ncol, nbands)

    ncols_map = jnp.asarray(neighbor_columns(bcfg))           # (ncol, 5)
    win_starts = []
    win_valids = []
    overflow = col_overflow
    # a band whose window spans >= Lz - would see both images of an atom;
    # window capacities are far below a full column, so this is covered by
    # the capacity check below except in tiny systems — check explicitly
    span_bad = (z_hi - z_lo + 2.0 * reach_w) >= lz
    overflow = overflow + jnp.sum(span_bad & (z_hi >= z_lo))
    for j in range(5):
        zj = z_ext[ncols_map[:, j]]                           # (ncol, lext)
        cap = ws if j == 0 else wn
        if j == 0:
            s0 = lo_idx * jnp.ones((ncol, 1), jnp.int32)
        else:
            s0 = jax.vmap(jnp.searchsorted)(
                zj, z_lo - reach_w).astype(jnp.int32)
        e0 = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(
            zj, z_hi + reach_w).astype(jnp.int32)
        v0 = jnp.maximum(e0 - s0, 0)
        overflow = overflow + jnp.sum(jnp.maximum(v0 - cap, 0))
        win_starts.append(s0)
        win_valids.append(jnp.minimum(v0, cap))
    windows = jnp.stack(
        [jnp.stack(win_starts, axis=-1), jnp.stack(win_valids, axis=-1)],
        axis=-1)                                              # (ncol, nb, 5, 2)
    return dict(slots_ext=slots_ext, zsign=zsign,
                windows=windows.astype(jnp.int32),
                counts=counts_c.astype(jnp.int32),
                overflow=overflow.astype(jnp.int32))


def make_pallas_band_kernel(*, mode, cutoff, bcfg, nsub, emax, krf=0.0,
                            crf=0.0, use_switch=False, switch_distance=0.0,
                            ewald_alpha=0.0, ljpme=False,
                            dispersion_alpha=0.0, interpret=False,
                            exceptions_periodic=False, compute_energies=True):
    """Build the z-band pair kernel.

    f(cand_pos (ncol, 3, lext), cand_stat (ncol, Fs, lext),
      cand_ids (ncol, 1+emax, lext) int32, windows (ncol, nbands, 5, 2)
      int32, counts (ncol,) int32, lam_c (nsub, nsub), lam_v (nsub, nsub),
      box (3, 3), n_real)
      -> (slot_f (ncol, 3, lext), m_c (ncol, nsub, nsub), m_v (...))

    cand_stat rows: [q, sigma/2, 2*sqrt(eps), subset one-hots];
    cand_ids rows: [atom id, exclusion ids...].  slot_f includes Newton
    reactions (accumulated via 5 destination-mapped outputs).
    """
    assert mode in (CUTOFF, EWALD_DIRECT)
    ncx, ncy = bcfg["ncx"], bcfg["ncy"]
    ncol = ncx * ncy
    lext, wg = bcfg["lext"], bcfg["wg"]
    ws, wn = bcfg["ws"], bcfg["wn"]
    R, nbands = bcfg["rows"], bcfg["nbands"]
    caps = [ws, wn, wn, wn, wn]
    # one pair-block call per window (self ws-wide, neighbors wn-wide): the
    # live Mosaic backend rejects the multi-way lane concatenation that a
    # single dense (R, ws+4*wn) tile would need (unaligned interior offsets,
    # extras/probe_mosaic_dyn.py); per-window tiles do the same total pair
    # math with no concat
    pair_blocks = {
        cap: _make_pair_block(
            mode=mode, cutoff=cutoff, capacity=R, nsub=nsub, emax=emax,
            krf=krf, crf=crf, use_switch=use_switch,
            switch_distance=switch_distance, ewald_alpha=ewald_alpha,
            ljpme=ljpme, dispersion_alpha=dispersion_alpha,
            exceptions_periodic=exceptions_periodic, fuse_exclusions=False,
            images_preshifted=True, compute_energies=compute_energies,
            ncand=cap, external_once=True)
        for cap in {ws, wn}}

    def kernel(box_ref, nreal_ref, win_ref, cnt_ref, *refs):
        pos_refs = refs[0:5]
        stat_refs = refs[5:10]
        id_refs = refs[10:15]
        lamc_ref = refs[15]
        lamv_ref = refs[16]
        fout_refs = refs[17:22]
        mc_ref = refs[22]
        mv_ref = refs[23]
        dtype = pos_refs[0].dtype
        i = pl.program_id(0)
        # traced int //, % lower through a sign() decomposition that Mosaic
        # retraces under the AMBIENT x64 config at compile time -> int64
        # converts it cannot legalize; lax.div/lax.rem (C semantics) skip the
        # sign path and equal floor semantics for non-negative operands
        x = jax.lax.div(i, ncy)
        y = jax.lax.rem(i, ncy)
        nreal = nreal_ref[0]
        for j in range(5):
            fout_refs[j][...] = jnp.zeros((1, 3, lext), dtype)
        lamc = lamc_ref[...]
        lamv = lamv_ref[...]
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)
        riota = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

        def shift_mat(dx, dy):
            # x+dx in [0, ncx]; y+dy in [-1, ncy] — bias by ncy so lax.div
            # matches floor division
            wx = jax.lax.div(x + dx, ncx).astype(dtype)
            wy = (jax.lax.div(y + dy + ncy, ncy) - 1).astype(dtype)
            s = [wx * box_ref[0, a] + wy * box_ref[1, a] for a in range(3)]
            return (jnp.where(rows_iota == 0, s[0], 0.0)
                    + jnp.where(rows_iota == 1, s[1], 0.0)
                    + jnp.where(rows_iota == 2, s[2], 0.0))

        shifts = [shift_mat(dx, dy) for dx, dy in HALF_COLS]

        # the live Mosaic backend rejects dynamic lane offsets unless they
        # are provably 128-aligned (extras/probe_mosaic_dyn.py): every
        # dynamic window access loads/stores an ALIGNED frame of
        # round_up(cap+128, 128) lanes at floor(s/128)*128 and rotates the
        # <=127-lane residue with tpu.dynamic_rotate (semantics verified
        # on-device for loads and RMW stores)
        def _lw(cap):
            return -(-(cap + 128) // 128) * 128

        def dyn_load(ref, rows, s, cap):
            s0 = pl.multiple_of(jax.lax.div(s, 128) * 128, 128)
            lw = _lw(cap)
            w = ref[0, rows, pl.ds(s0, lw)]
            # NEGATIVE dynamic rotate amounts misplace whole 128-lane tiles
            # on the live backend at some widths (exact at lw=512 yet off by
            # 1-2 tiles at lw=384 — extras/probe_mosaic_dyn.py case 13);
            # express the left-rotate by (s - s0) as the equivalent positive
            # rotate, which is verified exact on device at both widths
            w = pltpu.roll(w, jax.lax.rem(lw - (s - s0), lw), 1)
            return w[:, :cap]

        def dyn_store_add(ref, piece, s, cap):
            s0 = pl.multiple_of(jax.lax.div(s, 128) * 128, 128)
            lw = _lw(cap)
            frame = jnp.pad(piece, ((0, 0), (0, lw - cap)))
            frame = pltpu.roll(frame, s - s0, 1)
            sl = (0, slice(None), pl.ds(s0, lw))
            ref[sl] = ref[sl] + frame

        def band_body(b, carry):
            mc_acc, mv_acc = carry
            row_lo = wg + R * b
            rp = dyn_load(pos_refs[0], slice(None), row_lo, R)
            rs = dyn_load(stat_refs[0], slice(None), row_lo, R)
            rf = jnp.concatenate([rp, rs], axis=0)
            rid = dyn_load(id_refs[0], slice(None), row_lo, R)
            ri = rid[0]
            # the last band of a column may run past count into the
            # ghost-bottom region (real atom ids!): mask those rows out or
            # their pairs double-count
            ri = jnp.where(row_lo + riota[:, 0] < wg + cnt_ref[0, 0, 0], ri,
                           nreal)
            re = (rid[1:1 + emax]
                  if emax else jnp.zeros((0, R), jnp.int32))
            row_f = jnp.zeros((3, R), dtype)
            for j in range(5):
                s = win_ref[0, b, j, 0]
                v = win_ref[0, b, j, 1]
                cap = caps[j]
                pj = dyn_load(pos_refs[j], slice(None), s, cap)
                pj = pj + shifts[j]
                sj = dyn_load(stat_refs[j], slice(None), s, cap)
                idj = dyn_load(id_refs[j], pl.ds(0, 1), s, cap)[0]
                iota = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
                idj = jnp.where(iota[0] < v, idj, nreal)
                cf = jnp.concatenate([pj, sj], axis=0)
                if j == 0:
                    # z-sorted storage rank dedup: each same-column pair
                    # once; stays correct for ghost candidates
                    once = (s + iota) > (row_lo + riota)
                else:
                    once = jnp.ones((R, cap), jnp.bool_)
                rfj, col_f, mcb, mvb = pair_blocks[cap](
                    box_ref, nreal, rf, ri, re, cf, idj, lamc, lamv,
                    jnp.broadcast_to(once, (R, cap)))
                row_f = row_f + rfj
                dyn_store_add(fout_refs[j], col_f, s, cap)
                mc_acc = mc_acc + mcb
                mv_acc = mv_acc + mvb
            dyn_store_add(fout_refs[0], row_f, row_lo, R)
            return mc_acc, mv_acc

        nb_c = jax.lax.div(cnt_ref[0, 0, 0] + (R - 1), R)
        zero = jnp.zeros((nsub, nsub), dtype)
        mc, mv = jax.lax.fori_loop(0, nb_c, band_body, (zero, zero))
        mc_ref[0] = mc
        mv_ref[0] = mv

    def _col_spec(block_tail, j):
        dx, dy = HALF_COLS[j]

        def imap(i, dx=dx, dy=dy):
            cj = ((((i // ncy) + dx) % ncx) * ncy
                  + (jax.lax.rem(i, ncy) + dy) % ncy)
            return (cj,) + (0,) * len(block_tail)

        return pl.BlockSpec((1,) + block_tail, imap,
                            memory_space=pltpu.VMEM)

    def _call(dtype, nf_stat, nreal, cand_pos, cand_stat, cand_ids,
              windows, counts, lam_c_nn, lam_v_nn, box):
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM),        # box
             pl.BlockSpec(memory_space=pltpu.SMEM),        # n_real
             pl.BlockSpec((1, nbands, 5, 2), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.SMEM),        # windows
             pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                          memory_space=pltpu.SMEM)]        # counts
            + [_col_spec((3, lext), j) for j in range(5)]
            + [_col_spec((nf_stat, lext), j) for j in range(5)]
            + [_col_spec((1 + emax, lext), j) for j in range(5)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM),      # lam_c
               pl.BlockSpec(memory_space=pltpu.VMEM)])     # lam_v
        out_specs = [
            _col_spec((3, lext), j) for j in range(5)
        ] + [
            pl.BlockSpec((1, nsub, nsub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsub, nsub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out = pl.pallas_call(
            kernel,
            grid=(ncol,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                [jax.ShapeDtypeStruct((ncol, 3, lext), dtype)
                 for _ in range(5)]
                + [jax.ShapeDtypeStruct((ncol, nsub, nsub), dtype),
                   jax.ShapeDtypeStruct((ncol, nsub, nsub), dtype)]),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(box.astype(dtype), nreal, windows, counts.reshape(-1, 1, 1),
          *([cand_pos] * 5), *([cand_stat] * 5), *([cand_ids] * 5),
          lam_c_nn.astype(dtype), lam_v_nn.astype(dtype))
        slot_f = out[0]
        for fj in out[1:5]:
            slot_f = slot_f + fj
        return slot_f, out[5], out[6]

    def run(cand_pos, cand_stat, cand_ids, windows, counts, lam_c_nn,
            lam_v_nn, box, n_real):
        dtype = cand_pos.dtype
        nf_stat = cand_stat.shape[1]
        nreal = jnp.asarray([n_real], dtype=jnp.int32)
        # Mosaic cannot legalize the i64 index-map constants that x64 mode
        # produces; all kernel operands are f32/int32, so trace without x64
        import contextlib
        x64_off = (jax.enable_x64(False) if hasattr(jax, "enable_x64")
                   else contextlib.nullcontext())
        with x64_off:
            return _call(dtype, nf_stat, nreal, cand_pos, cand_stat,
                         cand_ids, windows, counts, lam_c_nn, lam_v_nn, box)

    return run
