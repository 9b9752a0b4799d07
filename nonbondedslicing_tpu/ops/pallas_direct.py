"""Pallas fused direct-space pair kernel (half-shell cell tiles).

The XLA cell-list engine (ops/neighbors.py) visits every unordered pair twice
(27-cell neighborhoods, row forces only) and materializes ~15 HBM-sized
intermediates per step.  This kernel is the TPU speed-of-light version:

* half-shell neighborhoods — the self cell plus the 13 lexicographically
  positive offsets — visit each unordered pair exactly ONCE (Newton's third
  law).  Column forces are emitted per offset and "rolled back" onto their
  home cells with dense ``jnp.roll``s, so no scatter is needed beyond the
  final slot->atom unsort.
* the whole per-tile pipeline — minimum image, cutoff/exclusion masking,
  LJ + Coulomb (reaction-field or Ewald-erfc), quintic switching, lambda
  application, force reduction, per-slice energy moments — is fused in VMEM,
  one cell tile per grid step.  It is the TPU analog of the reference's tiled
  GPU pair kernel (kernels/coulombLennardJones.cc) with the per-slice register
  accumulators replaced by subset one-hot matmuls (MXU).

erfc uses the same Hastings/Abramowitz-Stegun 7.1.26 polynomial the reference
compiles into its device kernels (kernels/coulombLennardJones.cc:18-24):
max abs error ~1.5e-7 — adequate for the f32 fast path (the f64 oracle path
uses the XLA engine).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import ONE_4PI_EPS0, SQRT_PI
from ..utils.indexing import slice_subsets
from .direct import CUTOFF, EWALD_DIRECT
from . import neighbors


# self cell + 13 lexicographically positive offsets: each unordered cell pair
# {c, c+off} appears exactly once
HALF_OFFSETS = [(0, 0, 0)] + [
    (dx, dy, dz)
    for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
    if (dz, dy, dx) > (0, 0, 0)
]
assert len(HALF_OFFSETS) == 14


def _erfc_gauss_hastings(x):
    """A&S 7.1.26 polynomial erfc approximation (reference GPU kernels use
    the same scheme in f32).  Returns (erfc(x), exp(-x^2)) so callers that
    also need the Gaussian reuse it instead of re-evaluating exp."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    gauss = jnp.exp(-x * x)
    return poly * gauss, gauss


def _erfc_hastings(x):
    return _erfc_gauss_hastings(x)[0]


def _make_pair_block(*, mode, cutoff, capacity, nsub, emax, krf, crf,
                     use_switch, switch_distance, ewald_alpha, ljpme,
                     dispersion_alpha, exceptions_periodic, fuse_exclusions,
                     images_preshifted, compute_energies, ncand,
                     assume_pads_far=False):
    """The per-cell pair physics shared by the tile kernels: minimum
    image / preshifted deltas, cutoff + exclusion + half-shell-once masks,
    LJ + Coulomb (RF or Ewald-erfc) with quintic switching, optional fused
    Ewald exclusion corrections, lambda application and per-slice energy
    moments.  Operates on plain arrays:

    f(box_ref, n, rf (F, C), ri (C,), re (emax, C), cf (F, ncand),
      ci (ncand,), lam_c (nsub, nsub), lam_v (nsub, nsub))
      -> (row_forces (3, C), col_forces (3, ncand), mc, mv (nsub, nsub))

    ``assume_pads_far=True``: the caller guarantees pad slots carry unique
    positions farther than the cutoff from everything (ops/fused.py prepare
    adds a per-slot x offset to pad slots), so the (C, ncand)-wide
    real-slot mask is dropped and the visit-once compare runs only on the
    self panel (first C columns) — two fewer full-width VPU passes each.
    """
    cutoff2 = cutoff * cutoff

    def pair_block(box_ref, n, rf, ri, re, cf, ci, lam_c_nn, lam_v_nn):
        dtype = rf.dtype
        dx0 = rf[0].reshape(capacity, 1) - cf[0].reshape(1, ncand)
        dy0 = rf[1].reshape(capacity, 1) - cf[1].reshape(1, ncand)
        dz0 = rf[2].reshape(capacity, 1) - cf[2].reshape(1, ncand)
        if images_preshifted:
            # the caller baked the periodic image shifts into the candidate
            # positions (static per roll offset), so raw deltas ARE
            # minimum-image deltas for in-range pairs
            dx, dy, dz = dx0, dy0, dz0
        else:
            # ---- minimum image over the reduced triclinic box (c, b, a)
            dx, dy, dz = dx0, dy0, dz0
            bzz = box_ref[2, 2]
            nz = jnp.floor(dz / bzz + 0.5)
            dx -= nz * box_ref[2, 0]
            dy -= nz * box_ref[2, 1]
            dz -= nz * bzz
            byy = box_ref[1, 1]
            ny = jnp.floor(dy / byy + 0.5)
            dx -= ny * box_ref[1, 0]
            dy -= ny * byy
            bxx = box_ref[0, 0]
            nx = jnp.floor(dx / bxx + 0.5)
            dx -= nx * bxx
        r2 = dx * dx + dy * dy + dz * dz     # (C, ncand)

        ri_col = ri.reshape(capacity, 1)
        ci_row = ci.reshape(1, ncand)
        if assume_pads_far:
            # self-block (first C columns): visit each in-cell pair once
            # (i < j); the other panels need no once mask, so compare
            # against a sentinel there (int concat — the live Mosaic
            # backend rejects i1-vector concats)
            ci_once = jnp.concatenate(
                [ci_row[:, :capacity],
                 jnp.full((1, ncand - capacity), np.int32(2 ** 30),
                          jnp.int32)], axis=1)
            once = ri_col < ci_once
        else:
            col_k = jax.lax.broadcasted_iota(jnp.int32,
                                             (capacity, ncand), 1)
            once = (col_k >= capacity) | (ri_col < ci_row)
        excluded = jnp.zeros((capacity, ncand), jnp.bool_)
        for e in range(emax):
            excluded |= ci_row == re[e].reshape(capacity, 1)
        if assume_pads_far:
            # pad slots sit > cutoff from everything: r2 < cutoff2 subsumes
            # the real-slot test
            mask = once & ~excluded & (r2 < cutoff2)
        else:
            real = (ri_col < n) & (ci_row < n)
            mask = real & once & ~excluded & (r2 < cutoff2)

        one = jnp.ones((), dtype)
        r2s = jnp.where(mask, r2, one)
        rinv = jax.lax.rsqrt(r2s)
        r = r2s * rinv

        # fold the Coulomb constant into the charges at vector width
        # (C + ncand multiplies) so qq needs no (C, ncand)-wide constant
        # multiply downstream
        sqrt_ke = jnp.asarray(math.sqrt(ONE_4PI_EPS0), dtype)
        qq = ((rf[3] * sqrt_ke).reshape(capacity, 1)
              * (cf[3] * sqrt_ke).reshape(1, ncand))
        sig = rf[4].reshape(capacity, 1) + cf[4].reshape(1, ncand)
        eps = rf[5].reshape(capacity, 1) * cf[5].reshape(1, ncand)
        sig2 = (sig * rinv) ** 2
        sig6 = sig2 * sig2 * sig2

        if use_switch:
            t = jnp.clip((r - switch_distance) / (cutoff - switch_distance),
                         0.0, 1.0)
            sw_val = 1 + t * t * t * (-10 + t * (15 - t * 6))
            sw_der = t * t * (-30 + t * (60 - t * 30)) \
                / (cutoff - switch_distance)
        else:
            sw_val, sw_der = one, jnp.zeros((), dtype)

        dedr_vdw = sw_val * eps * (12.0 * sig6 - 6.0) * sig6 * rinv * rinv
        e_vdw = (eps * (sig6 - 1.0) * sig6
                 if compute_energies or use_switch else None)

        if mode == CUTOFF:
            e_coul = (qq * (rinv + krf * r2s - crf)
                      if compute_energies else None)
            dedr_coul = qq * (rinv - 2.0 * krf * r2s) * rinv * rinv
        else:
            alpha_r = ewald_alpha * r
            erfc_ar, gauss = _erfc_gauss_hastings(alpha_r)
            e_coul = (qq * rinv * erfc_ar if compute_energies else None)
            dedr_coul = (qq * rinv * rinv * rinv
                         * (erfc_ar + (2.0 / SQRT_PI) * alpha_r * gauss))
            if ljpme:
                dar = dispersion_alpha * r
                dar2 = dar * dar
                dar4 = dar2 * dar2
                dar6 = dar4 * dar2
                rinv2 = rinv * rinv
                rinv6 = rinv2 * rinv2 * rinv2
                c6i = (8.0 * rf[4] ** 3 * rf[5]).reshape(capacity, 1)
                c6j = (8.0 * cf[4] ** 3 * cf[5]).reshape(1, ncand)
                c6ij = c6i * c6j
                expd = jnp.exp(-dar2)
                emult = c6ij * rinv6 * (1.0 - expd * (1.0 + dar2
                                                      + 0.5 * dar4))
                dedr_vdw = dedr_vdw + 6.0 * c6ij * rinv6 * rinv2 * (
                    1.0 - expd * (1.0 + dar2 + 0.5 * dar4 + dar6 / 6.0))
                inv_cut2 = 1.0 / cutoff2
                inv_cut6 = inv_cut2 * inv_cut2 * inv_cut2
                sigc6 = sig ** 6
                shift = eps * (1.0 - sigc6 * inv_cut6) * sigc6 * inv_cut6
                darc = dispersion_alpha * cutoff
                darc2 = darc * darc
                darc4 = darc2 * darc2
                shift = shift - c6ij * inv_cut6 * (
                    1.0 - math.exp(-darc2) * (1.0 + darc2 + 0.5 * darc4))
                if e_vdw is not None:
                    e_vdw = e_vdw + emult + shift

        if use_switch:
            dedr_vdw = dedr_vdw - e_vdw * sw_der * rinv
            e_vdw = e_vdw * sw_val if compute_energies else None

        oh_i = rf[6:6 + nsub]                          # (nsub, C)
        oh_j = cf[6:6 + nsub]                          # (nsub, ncand)
        lam_cp = jnp.dot(jnp.dot(oh_i.T, lam_c_nn,
                                 preferred_element_type=dtype),
                         oh_j, preferred_element_type=dtype)
        lam_vp = jnp.dot(jnp.dot(oh_i.T, lam_v_nn,
                                 preferred_element_type=dtype),
                         oh_j, preferred_element_type=dtype)
        zero = jnp.zeros((), dtype)
        factor = jnp.where(mask, lam_vp * dedr_vdw + lam_cp * dedr_coul,
                           zero)
        if compute_energies:
            e_coul = jnp.where(mask, e_coul, zero)
            e_vdw = jnp.where(mask, e_vdw, zero)

        fxe = zero
        fye = zero
        fze = zero
        if mode == EWALD_DIRECT and fuse_exclusions:
            # Ewald exclusion corrections fused into the tile: excluded pairs
            # subtract the reciprocal-space erf part (+ LJPME back-out),
            # replacing a separate pass with per-pair scatters
            # (ReferenceSlicedLJCoulombIxn.cpp:449-506).  Bonded exclusions
            # always lie within the 27-cell neighborhood.
            # pads are never excluded (their table rows are -1), so the
            # real-slot test is redundant on this mask too
            xmask = (once & excluded if assume_pads_far
                     else real & once & excluded)
            if exceptions_periodic:
                dxu, dyu, dzu = dx, dy, dz
            else:
                dxu, dyu, dzu = dx0, dy0, dz0
            r2x0 = dxu * dxu + dyu * dyu + dzu * dzu
            r2x = jnp.where(xmask, r2x0, one)
            rinvx = jax.lax.rsqrt(r2x)
            rx = r2x * rinvx
            arx = ewald_alpha * rx
            erf_ar = 1.0 - _erfc_hastings(arx)
            big = erf_ar > 1e-6
            # qq already carries ONE_4PI_EPS0 (folded at vector width above)
            e_cx = jnp.where(
                big, -qq * rinvx * erf_ar,
                -ewald_alpha * (2.0 / SQRT_PI) * qq)
            dedr_x = jnp.where(
                big,
                qq * rinvx ** 3
                * (erf_ar - 2.0 * arx * jnp.exp(-arx * arx) / SQRT_PI),
                zero)
            factor_x = jnp.where(xmask, -lam_cp * dedr_x, zero)
            if compute_energies:
                e_coul = e_coul + jnp.where(xmask, e_cx, zero)
            if ljpme:
                darx = dispersion_alpha * rx
                darx2 = darx * darx
                darx4 = darx2 * darx2
                darx6 = darx4 * darx2
                rinvx2 = rinvx * rinvx
                rinvx6 = rinvx2 * rinvx2 * rinvx2
                c6i_x = (8.0 * rf[4] ** 3 * rf[5]).reshape(capacity, 1)
                c6j_x = (8.0 * cf[4] ** 3 * cf[5]).reshape(1, ncand)
                c6ij_x = c6i_x * c6j_x
                expdx = jnp.exp(-darx2)
                e_vx = jnp.where(big, c6ij_x * rinvx6
                                 * (1.0 - expdx * (1.0 + darx2
                                                   + 0.5 * darx4)),
                                 zero)
                dedr_vx = jnp.where(
                    big,
                    -6.0 * c6ij_x * rinvx6 * rinvx2
                    * (1.0 - expdx * (1.0 + darx2 + 0.5 * darx4
                                      + darx6 / 6.0)),
                    zero)
                factor_x = factor_x + jnp.where(xmask, -lam_vp * dedr_vx,
                                                zero)
                if compute_energies:
                    e_vdw = e_vdw + jnp.where(xmask, e_vx, zero)
            fxe = factor_x * dxu
            fye = factor_x * dyu
            fze = factor_x * dzu

        fx = factor * dx + fxe
        fy = factor * dy + fye
        fz = factor * dz + fze
        row_f = jnp.stack(
            [jnp.sum(fx, axis=1), jnp.sum(fy, axis=1), jnp.sum(fz, axis=1)],
            axis=0)                                    # (3, C)
        # Newton's third law: column atoms get the negated sum over rows
        col_f = -jnp.stack(
            [jnp.sum(fx, axis=0), jnp.sum(fy, axis=0), jnp.sum(fz, axis=0)],
            axis=0)                                    # (3, ncand)

        if not compute_energies:
            z = jnp.zeros((nsub, nsub), dtype)
            return row_f, col_f, z, z
        mc = jnp.dot(oh_i, jnp.dot(e_coul, oh_j.T,
                                   preferred_element_type=dtype),
                     preferred_element_type=dtype)
        mv = jnp.dot(oh_i, jnp.dot(e_vdw, oh_j.T,
                                   preferred_element_type=dtype),
                     preferred_element_type=dtype)
        return row_f, col_f, mc, mv

    return pair_block


def make_pallas_cell_kernel(*, mode, cutoff, counts, capacity, nsub, emax,
                            krf=0.0, crf=0.0, use_switch=False,
                            switch_distance=0.0, ewald_alpha=0.0, ljpme=False,
                            dispersion_alpha=0.0, interpret=False,
                            cells_per_tile=None, exceptions_periodic=False,
                            fuse_exclusions=True, images_preshifted=False,
                            compute_energies=True, assume_pads_far=False):
    """Build the half-shell tile kernel.

    f(box, n_real, rows_feat, rows_idx, rows_excl, cand_feat, cand_idx,
      lam_c_nn, lam_v_nn) ->
      (row_forces (cells, C, 3), col_forces (cells, 14*C, 3),
       m_c (tiles, nsub, nsub), m_v (tiles, nsub, nsub))

    Each grid step processes ``cells_per_tile`` cells with a statically
    unrolled loop — single-cell tiles leave the core idle between grid steps.
    """
    assert mode in (CUTOFF, EWALD_DIRECT)
    ncand = 14 * capacity
    cutoff2 = cutoff * cutoff
    if cells_per_tile is None:
        import os
        cells_per_tile = int(os.environ.get("NBS_PALLAS_TILE", "4"))
    G = cells_per_tile

    def kernel(box_ref, nreal_ref, rf_ref, ri_ref, re_ref, cf_ref, ci_ref,
               lamc_ref, lamv_ref, fout_ref, cout_ref, mc_ref, mv_ref):
        mc_acc = jnp.zeros((nsub, nsub), rf_ref.dtype)
        mv_acc = jnp.zeros((nsub, nsub), rf_ref.dtype)
        for g in range(G):
            mc_g, mv_g = _one_cell(box_ref, nreal_ref, rf_ref, ri_ref, re_ref,
                                   cf_ref, ci_ref, lamc_ref, lamv_ref,
                                   fout_ref, cout_ref, g)
            mc_acc = mc_acc + mc_g
            mv_acc = mv_acc + mv_g
        mc_ref[0] = mc_acc
        mv_ref[0] = mv_acc

    pair_block = _make_pair_block(
        mode=mode, cutoff=cutoff, capacity=capacity, nsub=nsub, emax=emax,
        krf=krf, crf=crf, use_switch=use_switch,
        switch_distance=switch_distance, ewald_alpha=ewald_alpha,
        ljpme=ljpme, dispersion_alpha=dispersion_alpha,
        exceptions_periodic=exceptions_periodic,
        fuse_exclusions=fuse_exclusions,
        images_preshifted=images_preshifted,
        compute_energies=compute_energies, ncand=ncand,
        assume_pads_far=assume_pads_far)

    def _one_cell(box_ref, nreal_ref, rf_ref, ri_ref, re_ref, cf_ref, ci_ref,
                  lamc_ref, lamv_ref, fout_ref, cout_ref, g):
        row_f, col_f, mc, mv = pair_block(
            box_ref, nreal_ref[0], rf_ref[g], ri_ref[g, 0], re_ref[g],
            cf_ref[g], ci_ref[g, 0], lamc_ref[...], lamv_ref[...])
        fout_ref[g] = row_f
        cout_ref[g] = col_f
        return mc, mv

    def _call(dtype, ncp, nf, nreal, rows_feat, rows_idx, rows_excl,
              cand_feat, cand_idx, lam_c_nn, lam_v_nn, box):
        n_tiles = ncp // G
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # box (3,3)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # n_real (1,)
                pl.BlockSpec((G, nf, capacity), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 1, capacity), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, emax, capacity), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, nf, ncand), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 1, ncand), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),   # lam_c (nsub, nsub)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # lam_v
            ],
            out_specs=[
                pl.BlockSpec((G, 3, capacity), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 3, ncand), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nsub, nsub), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nsub, nsub), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ncp, 3, capacity), dtype),
                jax.ShapeDtypeStruct((ncp, 3, ncand), dtype),
                jax.ShapeDtypeStruct((n_tiles, nsub, nsub), dtype),
                jax.ShapeDtypeStruct((n_tiles, nsub, nsub), dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(box.astype(dtype), nreal, rows_feat, rows_idx[:, None, :],
          rows_excl, cand_feat, cand_idx[:, None, :],
          lam_c_nn.astype(dtype), lam_v_nn.astype(dtype))

    def run(rows_feat, rows_idx, rows_excl, cand_feat, cand_idx, lam_c_nn,
            lam_v_nn, box, n_real):
        ncp = rows_feat.shape[0]
        nf = rows_feat.shape[1]
        dtype = rows_feat.dtype
        # pad the cell dimension to a tile multiple (padded cells hold only
        # the dummy index n_real and are fully masked)
        pad = (-ncp) % G
        if pad:
            rows_feat = jnp.pad(rows_feat, ((0, pad), (0, 0), (0, 0)))
            rows_idx = jnp.pad(rows_idx, ((0, pad), (0, 0)),
                               constant_values=n_real)
            rows_excl = jnp.pad(rows_excl, ((0, pad), (0, 0), (0, 0)),
                                constant_values=-1)
            cand_feat = jnp.pad(cand_feat, ((0, pad), (0, 0), (0, 0)))
            cand_idx = jnp.pad(cand_idx, ((0, pad), (0, 0)),
                               constant_values=n_real)
            ncp += pad
        nreal = jnp.asarray([n_real], dtype=jnp.int32)
        # Mosaic cannot legalize the i64 index-map constants that x64 mode
        # produces; all kernel operands are f32/int32, so trace without x64
        import contextlib
        x64_off = (jax.enable_x64(False) if hasattr(jax, "enable_x64")
                   else contextlib.nullcontext())
        with x64_off:
            out = _call(dtype, ncp, nf, nreal, rows_feat, rows_idx,
                        rows_excl, cand_feat, cand_idx, lam_c_nn, lam_v_nn,
                        box)
        return out, pad

    return run


def make_pallas_column_kernel(*, mode, cutoff, counts, capacity, nsub, emax,
                              krf=0.0, crf=0.0, use_switch=False,
                              switch_distance=0.0, ewald_alpha=0.0,
                              ljpme=False, dispersion_alpha=0.0,
                              interpret=False, exceptions_periodic=False,
                              fuse_exclusions=False, compute_energies=True,
                              assume_pads_far=False):
    """Half-shell pair kernel over z-column tiles with IN-KERNEL candidate
    assembly.

    The original cell kernel consumes a fully materialized (cells, F, 14C)
    candidate tensor that apply() rebuilds in HBM every step (14 position
    rolls + concats) — measured at roughly the cost of the pair math itself.
    Here each grid step processes one (x, y) column of ncz cells and loads
    the 9 neighbor columns directly via BlockSpec index maps (wrap by modular
    index arithmetic); the per-z 14-offset candidate panels are assembled in
    VMEM, with periodic image shifts added from scalars (so deltas stay
    minimum-image without per-slot floor()s, as in the preshifted layout).
    No candidate tensor ever exists in HBM.

    f(slot_feat (ncx, ncy, ncz, F, C), slot_ids (ncx, ncy, ncz, 1, C) int32,
      slot_excl (ncx, ncy, ncz, emax, C) int32, lam_c (nsub, nsub),
      lam_v (nsub, nsub), box (3, 3), n_real)
      -> (slot_f (cells, 3, C), m_c (tiles, nsub, nsub),
          m_v (tiles, nsub, nsub))

    slot_f already includes the Newton reaction forces: the kernel
    accumulates them per destination (column, z-row) in registers and
    writes 9 per-column outputs whose BlockSpec index maps point at the
    destination column, so no (cells, 3, 14C) reaction tensor or roll-back
    pass exists in HBM.

    slot_feat rows: [x, y, z, q, sigma/2, 2*sqrt(eps), subset one-hots];
    positions must be in the canonical image used for the cell assignment
    (ops/fused.py preshift contract).
    """
    ncx, ncy, ncz = counts
    C = capacity
    ncand = 14 * C
    n_tiles = ncx * ncy
    # the 9 (dx, dy) neighbor columns touched by the half shell (self first)
    cols = [(0, 0)] + [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                       if (dx, dy) != (0, 0)]
    col_of = {off: cols.index((off[0], off[1])) for off in HALF_OFFSETS}
    pair_block = _make_pair_block(
        mode=mode, cutoff=cutoff, capacity=capacity, nsub=nsub, emax=emax,
        krf=krf, crf=crf, use_switch=use_switch,
        switch_distance=switch_distance, ewald_alpha=ewald_alpha,
        ljpme=ljpme, dispersion_alpha=dispersion_alpha,
        exceptions_periodic=exceptions_periodic,
        fuse_exclusions=fuse_exclusions, images_preshifted=True,
        compute_energies=compute_energies, ncand=ncand,
        assume_pads_far=assume_pads_far)

    def kernel(box_ref, nreal_ref, *refs):
        feat_cols = refs[:9]
        id_cols = refs[9:18]
        re_ref = refs[18]
        lamc_ref = refs[19]
        lamv_ref = refs[20]
        fout_refs = refs[21:30]
        mc_ref = refs[30]
        mv_ref = refs[31]
        dtype = feat_cols[0].dtype
        i = pl.program_id(0)
        x = i // ncy
        y = jax.lax.rem(i, ncy)
        n = nreal_ref[0]
        nf = feat_cols[0].shape[3]
        # periodic wrap factors per column (x, y traced; z static per
        # offset): cand cell receives (x+dx) mod ncx whose true image sits
        # at +floor((x+dx)/ncx) box vectors
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (nf, 1), 0)

        def shift_mat(dx, dy, wz):
            wx = ((x + dx) // ncx).astype(dtype)
            wy = ((y + dy) // ncy).astype(dtype)
            wzf = jnp.asarray(float(wz), dtype)
            s = [wx * box_ref[0, a] + wy * box_ref[1, a]
                 + wzf * box_ref[2, a] for a in range(3)]
            return (jnp.where(rows_iota == 0, s[0], 0.0)
                    + jnp.where(rows_iota == 1, s[1], 0.0)
                    + jnp.where(rows_iota == 2, s[2], 0.0))

        mc_acc = jnp.zeros((nsub, nsub), dtype)
        mv_acc = jnp.zeros((nsub, nsub), dtype)
        # Newton-reaction accumulation in registers: reaction forces for
        # offset (dx, dy, dz) computed at cell (x, y, z) belong to the atoms
        # of cell (x+dx, y+dy, z+dz); they are summed per destination
        # (column, z-row) here and written to 9 per-column output arrays
        # whose index maps point AT the destination column — the caller's
        # elementwise 9-array sum replaces the former 14 HBM roll passes
        # over a (cells, 3, 14C) reaction tensor.
        acc = {}
        for z in range(ncz):
            rf = feat_cols[0][0, 0, z]                 # (F, C)
            ri = id_cols[0][0, 0, z, 0]                # (C,)
            re = re_ref[0, 0, z]                       # (emax, C)
            cf_parts = []
            ci_parts = []
            for off in HALF_OFFSETS:
                c = col_of[off]
                zz = (z + off[2]) % ncz
                wz = (z + off[2]) // ncz
                cf_parts.append(feat_cols[c][0, 0, zz]
                                + shift_mat(off[0], off[1], wz))
                ci_parts.append(id_cols[c][0, 0, zz])   # (1, C)
            cf = jnp.concatenate(cf_parts, axis=1)     # (F, 14C)
            ci = jnp.concatenate(ci_parts, axis=1)[0]  # (14C,)
            row_f, col_f, mcz, mvz = pair_block(
                box_ref, n, rf, ri, re, cf, ci, lamc_ref[...], lamv_ref[...])
            key = (0, z)
            acc[key] = row_f if key not in acc else acc[key] + row_f
            for k, off in enumerate(HALF_OFFSETS):
                key = (col_of[off], (z + off[2]) % ncz)
                piece = col_f[:, k * C:(k + 1) * C]
                acc[key] = piece if key not in acc else acc[key] + piece
            mc_acc = mc_acc + mcz
            mv_acc = mv_acc + mvz
        for j in range(9):
            for zz in range(ncz):
                fout_refs[j][0, 0, zz] = acc[(j, zz)]
        mc_ref[0] = mc_acc
        mv_ref[0] = mv_acc

    def _col_spec(block_tail, dx, dy):
        return pl.BlockSpec(
            (1, 1) + block_tail,
            lambda i, dx=dx, dy=dy: (((i // ncy) + dx) % ncx,
                                     (jax.lax.rem(i, ncy) + dy) % ncy)
            + (0,) * len(block_tail),
            memory_space=pltpu.VMEM)

    def _call(dtype, nf, nreal, slot_feat, slot_ids, slot_excl, lam_c_nn,
              lam_v_nn, box):
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM),     # box
                     pl.BlockSpec(memory_space=pltpu.SMEM)]     # n_real
                    + [_col_spec((ncz, nf, C), dx, dy) for dx, dy in cols]
                    + [_col_spec((ncz, 1, C), dx, dy) for dx, dy in cols]
                    + [_col_spec((ncz, emax, C), 0, 0)]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM),   # lam_c
                       pl.BlockSpec(memory_space=pltpu.VMEM)])  # lam_v
        # per-column force outputs: array j's block sits at the DESTINATION
        # column (x+dx_j, y+dy_j), so Newton reactions land pre-rolled
        out_specs = [
            pl.BlockSpec((1, 1, ncz, 3, C),
                         lambda i, dx=dx, dy=dy: (
                             ((i // ncy) + dx) % ncx,
                             (jax.lax.rem(i, ncy) + dy) % ncy, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for dx, dy in cols
        ] + [
            pl.BlockSpec((1, nsub, nsub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsub, nsub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                [jax.ShapeDtypeStruct((ncx, ncy, ncz, 3, C), dtype)
                 for _ in cols]
                + [jax.ShapeDtypeStruct((n_tiles, nsub, nsub), dtype),
                   jax.ShapeDtypeStruct((n_tiles, nsub, nsub), dtype)]),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(box.astype(dtype), nreal,
          *( [slot_feat] * 9 ), *([slot_ids] * 9), slot_excl,
          lam_c_nn.astype(dtype), lam_v_nn.astype(dtype))
        f_cols = out[:9]
        m_c, m_v = out[9], out[10]
        n_cells = ncx * ncy * ncz
        slot_f = f_cols[0]
        for fj in f_cols[1:]:
            slot_f = slot_f + fj
        return slot_f.reshape(n_cells, 3, C), m_c, m_v

    def run(slot_feat, slot_ids, slot_excl, lam_c_nn, lam_v_nn, box, n_real):
        dtype = slot_feat.dtype
        nf = slot_feat.shape[3]
        nreal = jnp.asarray([n_real], dtype=jnp.int32)
        # Mosaic cannot legalize the i64 index-map constants that x64 mode
        # produces; all kernel operands are f32/int32, so trace without x64
        import contextlib
        x64_off = (jax.enable_x64(False) if hasattr(jax, "enable_x64")
                   else contextlib.nullcontext())
        with x64_off:
            return _call(dtype, nf, nreal, slot_feat, slot_ids, slot_excl,
                         lam_c_nn, lam_v_nn, box)

    return run


def make_pallas_direct_space(*, mode, cutoff, counts, capacity, krf=0.0,
                             crf=0.0, use_switch=False, switch_distance=0.0,
                             ewald_alpha=0.0, ljpme=False,
                             dispersion_alpha=0.0, num_slices=1,
                             interpret=False, exceptions_periodic=False,
                             exclusion_pairs=None):
    """Drop-in replacement for neighbors.make_cell_direct_space using the
    fused half-shell Pallas kernel (f32 fast path; f64 falls back to XLA).

    Unlike the XLA engine, this one also computes the Ewald-family exclusion
    corrections (fused into the tiles); callers must skip their separate
    correction pass (``handles_exclusions`` attribute)."""
    base = neighbors.make_cell_direct_space(
        mode=mode, cutoff=cutoff, counts=counts, capacity=capacity, krf=krf,
        crf=crf, use_switch=use_switch, switch_distance=switch_distance,
        ewald_alpha=ewald_alpha, ljpme=ljpme,
        dispersion_alpha=dispersion_alpha, num_slices=num_slices)
    ncx, ncy, ncz = counts
    n_cells = ncx * ncy * ncz
    kern_cache = {}
    if exclusion_pairs is None:
        exclusion_pairs = np.zeros((0, 2), dtype=np.int32)
    exclusion_pairs = np.asarray(exclusion_pairs)  # numpy: closure constant

    def _base_with_corrections(positions, box, charge, sig_half, eps2,
                               subsets, exclusion_list, slice_table, lam_coul,
                               lam_vdw):
        e, f, overflow = base(positions, box, charge, sig_half, eps2, subsets,
                              exclusion_list, slice_table, lam_coul, lam_vdw)
        if mode == EWALD_DIRECT:
            from . import bonded
            e_x, f_x = bonded.exclusion_corrections(
                positions, box, exclusion_pairs, charge, sig_half, eps2,
                subsets, slice_table, lam_coul, lam_vdw, alpha=ewald_alpha,
                periodic_exceptions=exceptions_periodic, ljpme=ljpme,
                dispersion_alpha=dispersion_alpha, num_slices=num_slices,
                num_particles=positions.shape[0])
            e = e + e_x
            f = f + f_x
        return e, f, overflow

    def direct_space(positions, box, charge, sig_half, eps2, subsets,
                     exclusion_list, slice_table, lam_coul, lam_vdw):
        if positions.dtype != jnp.float32:
            # f64 oracle path stays on the XLA engine (Pallas TPU is f32)
            return _base_with_corrections(
                positions, box, charge, sig_half, eps2, subsets,
                exclusion_list, slice_table, lam_coul, lam_vdw)
        n = positions.shape[0]
        dtype = positions.dtype
        emax = exclusion_list.shape[1]
        sl_tab = jnp.asarray(slice_table)
        nsub = int(sl_tab.shape[0])
        lam_c_nn = lam_coul[sl_tab]
        lam_v_nn = lam_vdw[sl_tab]
        spairs = np.asarray(slice_subsets(nsub))

        # ---- slot-sort features (single gather), half-shell candidates;
        # feature-major (cells, F, C) so the long atom axis rides the 128-lane
        # dimension (atoms-major would pad F~10 lanes to 128: 13x HBM blowup)
        cell = neighbors.cell_ids(positions, box, counts)
        table, overflow = neighbors.build_occupancy(cell, n, counts, capacity)
        slots = table.reshape(-1)
        oh = (subsets[:, None]
              == jnp.arange(nsub, dtype=subsets.dtype)).astype(dtype)
        feat = jnp.concatenate([positions, charge[:, None], sig_half[:, None],
                                eps2[:, None], oh], axis=1)
        nf = feat.shape[1]
        feat_p = jnp.concatenate([feat, jnp.zeros((1, nf), dtype)], axis=0)
        sfeat_t = jnp.swapaxes(
            feat_p[slots].reshape(n_cells, capacity, nf), 1, 2)
        excl_p = jnp.concatenate(
            [exclusion_list,
             jnp.full((1, emax), -1, exclusion_list.dtype)], axis=0)
        sexcl_t = jnp.swapaxes(
            excl_p[slots].reshape(n_cells, capacity, emax), 1, 2)

        grid_feat = sfeat_t.reshape(ncx, ncy, ncz, nf, capacity)
        grid_idx = slots.reshape(ncx, ncy, ncz, capacity)
        cand_feat = jnp.concatenate(
            [jnp.roll(grid_feat, (-dx, -dy, -dz), axis=(0, 1, 2))
             .reshape(n_cells, nf, capacity) for (dx, dy, dz) in HALF_OFFSETS],
            axis=2)                                     # (cells, F, 14C)
        cand_idx = jnp.concatenate(
            [jnp.roll(grid_idx, (-dx, -dy, -dz), axis=(0, 1, 2))
             .reshape(n_cells, capacity) for (dx, dy, dz) in HALF_OFFSETS],
            axis=1)

        key = (nsub, emax, nf)
        if key not in kern_cache:
            kern_cache[key] = make_pallas_cell_kernel(
                mode=mode, cutoff=cutoff, counts=counts, capacity=capacity,
                nsub=nsub, emax=emax, krf=krf, crf=crf, use_switch=use_switch,
                switch_distance=switch_distance, ewald_alpha=ewald_alpha,
                ljpme=ljpme, dispersion_alpha=dispersion_alpha,
                interpret=interpret, exceptions_periodic=exceptions_periodic)
        (row_f, col_f, m_c, m_v), _ = kern_cache[key](
            sfeat_t, table, sexcl_t, cand_feat, cand_idx, lam_c_nn, lam_v_nn,
            box, n)
        row_f = row_f[:n_cells]
        col_f = col_f[:n_cells]

        # cross-tile moment reduction in f64: per-tile partials are f32
        # (Mosaic has no f64), but the S-scalar totals feed the self-energy
        # cancellation in the total
        mc = jnp.sum(m_c, axis=0, dtype=jnp.float64)
        mv = jnp.sum(m_v, axis=0, dtype=jnp.float64)
        a = jnp.asarray(spairs[:, 0])
        b = jnp.asarray(spairs[:, 1])
        # half-shell: each unordered pair counted once -> no 1/2 weights
        ec = jnp.where(a == b, mc[a, a], mc[a, b] + mc[b, a])
        ev = jnp.where(a == b, mv[a, a], mv[a, b] + mv[b, a])
        slice_energies = jnp.stack([ec, ev], axis=-1)

        # roll per-offset column forces back onto their home cells
        slot_f = row_f.reshape(ncx, ncy, ncz, 3, capacity)
        col_f = col_f.reshape(ncx, ncy, ncz, 3, 14, capacity)
        for k, (dx, dy, dz) in enumerate(HALF_OFFSETS):
            slot_f = slot_f + jnp.roll(col_f[:, :, :, :, k], (dx, dy, dz),
                                       axis=(0, 1, 2))
        slot_f = jnp.swapaxes(slot_f.reshape(n_cells, 3, capacity), 1, 2)
        forces = jnp.zeros((n + 1, 3), dtype).at[slots].add(
            slot_f.reshape(-1, 3))
        return slice_energies, forces[:n], overflow.astype(jnp.int32)

    direct_space.returns_overflow = True
    direct_space.handles_exclusions = mode == EWALD_DIRECT
    return direct_space
