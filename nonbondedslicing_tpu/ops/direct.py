"""Direct-space pairwise interactions (Coulomb + Lennard-Jones), sliced.

TPU-first design: the N^2 pair space is processed in row blocks of size B so
that per-step memory is O(B*N) and every op is a large vectorized VPU
computation.  Per-slice energies are accumulated with ``segment_sum`` over the
(compile-time small) slice-id table — the TPU analog of the reference GPU
kernel's register-resident per-slice accumulators
(/root/reference/platforms/common/src/kernels/coulombLennardJones.cc).

Physics matches ``ReferenceSlicedLJCoulombIxn``:

* packed parameters (sigma/2, 2*sqrt(eps)) so sig_ij = si+sj (Lorentz) and
  eps_ij = ei*ej = 4*sqrt(eps_i*eps_j) (Berthelot)
  (ReferenceNonbondedSlicingKernels.cpp:364-368)
* reaction field: E = k*q1*q2*(1/r + krf*r^2 - crf), dEdR factor
  (1/r - 2*krf*r^2)/r^2 (ReferenceSlicedLJCoulombIxn.cpp:606-621)
* quintic switching S(t) = 1 + t^3*(-10 + t*(15 - 6t))
  (ReferenceSlicedLJCoulombIxn.cpp:592-599)
* Ewald-family real space: erfc kernel + optional LJPME multiplicative-C6 and
  potential-shift terms (ReferenceSlicedLJCoulombIxn.cpp:367-445)
* forces are lambda-scaled; slice energies stored unscaled
  (ReferenceSlicedLJCoulombIxn.cpp:617-630)
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

from ..utils.constants import ONE_4PI_EPS0, SQRT_PI
from .geometry import min_image

# method families handled here
PLAIN = "plain"            # NoCutoff
CUTOFF = "cutoff"          # CutoffNonPeriodic / CutoffPeriodic (reaction field)
EWALD_DIRECT = "ewald"     # Ewald / PME / LJPME real space


def _switch_terms(r, r_switch, r_cutoff):
    t = jnp.clip((r - r_switch) / (r_cutoff - r_switch), 0.0, 1.0)
    value = 1 + t * t * t * (-10 + t * (15 - t * 6))
    deriv = t * t * (-30 + t * (60 - t * 30)) / (r_cutoff - r_switch)
    return value, deriv


def _pick_block(n):
    for b in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n >= b:
            return b
    return 8


def slice_reduce(values, sl, num_slices):
    """Sum ``values`` into per-slice buckets.

    ``num_slices`` masked reductions instead of one giant scatter: TPU has no
    fast scatter over millions of duplicate indices, but S = n(n+1)/2 is
    compile-time small (the analog of the reference GPU kernels'
    register-resident per-slice accumulators, kernels/pme.cc:211).

    Accumulates in f64 regardless of the term dtype: per-slice energy
    scalars feed the total-energy cancellation (self energy ~1e6 kJ/mol vs
    total ~1e5) and dE/dlambda, and these reductions run only on energy
    evaluations, never in the force-only MD inner loop."""
    return jnp.stack([jnp.sum(jnp.where(sl == s, values, 0),
                              dtype=jnp.float64)
                      for s in range(num_slices)])


def subset_moments(e_masked, oh_i, oh_j, slice_subset_pairs):
    """Per-slice sums of a (B, M) pair-energy array via MXU matmuls.

    M[a, b] = oh_i[:, a]^T @ e @ oh_j[:, b] counts each visited ordered pair
    once; each unordered pair is visited from both rows (i-row and j-row), so
    the unordered sum for slice (a, b) is 0.5 * (M[a, b] + M[b, a]) off the
    diagonal and 0.5 * M[a, a] on it (both visits land in the same entry).
    This replaces per-pair slice-id gathers — near-scalar on TPU — with two
    small matmuls.
    """
    m = jnp.einsum("ba,bm,mc->ac", oh_i, e_masked, oh_j)
    a = slice_subset_pairs[:, 0]
    b = slice_subset_pairs[:, 1]
    return jnp.where(a == b, 0.5 * m[a, a], 0.5 * (m[a, b] + m[b, a]))


def pair_lambdas(lam_nn, oh_i, oh_j):
    """Per-pair lambda factors (B, M) = oh_i @ lam_nn @ oh_j^T — the gather
    table lookup lam[slice(sub_i, sub_j)] expressed as MXU matmuls."""
    return (oh_i @ lam_nn) @ oh_j.T


def make_pair_terms(*, mode, cutoff=None, krf=0.0, crf=0.0, use_switch=False,
                    switch_distance=0.0, ewald_alpha=0.0, ljpme=False,
                    dispersion_alpha=0.0):
    """Shared per-pair physics used by both the O(N^2) and the cell-list
    engines (ReferenceSlicedLJCoulombIxn.cpp:578-630 semantics)."""

    def pair_terms(r2, rinv, sh_i, sh_j, e2_i, e2_j, qq):
        """Per-pair energies and dE/dR*(1/r) factors (before lambda scaling)."""
        r = r2 * rinv
        sig = sh_i + sh_j
        sig2 = (sig * rinv) ** 2
        sig6 = sig2 * sig2 * sig2
        eps = e2_i * e2_j

        if use_switch:
            sw_val, sw_der = _switch_terms(r, switch_distance, cutoff)
        else:
            sw_val, sw_der = 1.0, 0.0

        dedr_vdw = sw_val * eps * (12.0 * sig6 - 6.0) * sig6 * rinv * rinv
        e_vdw = eps * (sig6 - 1.0) * sig6

        if mode == PLAIN:
            e_coul = ONE_4PI_EPS0 * qq * rinv
            dedr_coul = ONE_4PI_EPS0 * qq * rinv * rinv * rinv
        elif mode == CUTOFF:
            e_coul = ONE_4PI_EPS0 * qq * (rinv + krf * r2 - crf)
            dedr_coul = ONE_4PI_EPS0 * qq * (rinv - 2.0 * krf * r2) * rinv * rinv
        else:  # EWALD_DIRECT
            alpha_r = ewald_alpha * r
            erfc_ar = erfc(alpha_r)
            gauss = jnp.exp(-alpha_r * alpha_r)
            e_coul = ONE_4PI_EPS0 * qq * rinv * erfc_ar
            dedr_coul = (ONE_4PI_EPS0 * qq * rinv * rinv * rinv
                         * (erfc_ar + 2.0 * alpha_r * gauss / SQRT_PI))
            if ljpme:
                # multiplicative-C6 real-space correction + potential shift
                # (ReferenceSlicedLJCoulombIxn.cpp:398-426)
                dar = dispersion_alpha * r
                dar2 = dar * dar
                dar4 = dar2 * dar2
                dar6 = dar4 * dar2
                rinv2 = rinv * rinv
                rinv6 = rinv2 * rinv2 * rinv2
                c6i = 8.0 * sh_i ** 3 * e2_i
                c6j = 8.0 * sh_j ** 3 * e2_j
                c6ij = c6i * c6j
                expd = jnp.exp(-dar2)
                emult = c6ij * rinv6 * (1.0 - expd * (1.0 + dar2 + 0.5 * dar4))
                dedr_vdw = dedr_vdw + 6.0 * c6ij * rinv6 * rinv2 * (
                    1.0 - expd * (1.0 + dar2 + 0.5 * dar4 + dar6 / 6.0))
                inv_cut2 = 1.0 / (cutoff * cutoff)
                inv_cut6 = inv_cut2 * inv_cut2 * inv_cut2
                sigc6 = (sh_i + sh_j) ** 6  # note: reference reuses sig = si+sj
                shift = eps * (1.0 - sigc6 * inv_cut6) * sigc6 * inv_cut6
                darc = dispersion_alpha * cutoff
                darc2 = darc * darc
                darc4 = darc2 * darc2
                shift = shift - c6ij * inv_cut6 * (
                    1.0 - math.exp(-darc2) * (1.0 + darc2 + 0.5 * darc4))
                e_vdw = e_vdw + emult + shift

        if use_switch:
            dedr_vdw = dedr_vdw - e_vdw * sw_der * rinv
            e_vdw = e_vdw * sw_val

        return e_coul, e_vdw, dedr_coul, dedr_vdw

    return pair_terms


def make_direct_space(*, mode, periodic, cutoff=None, krf=0.0, crf=0.0,
                      use_switch=False, switch_distance=0.0,
                      ewald_alpha=0.0, ljpme=False, dispersion_alpha=0.0,
                      num_slices=1, block_size=None):
    """Build the all-pairs direct-space function.

    Returns f(positions, box, charge, sig_half, eps2, subsets, exclusion_list,
              slice_table, lam_coul, lam_vdw) -> (slice_energies (S, 2),
              forces (N, 3)).
    """
    pair_terms = make_pair_terms(
        mode=mode, cutoff=cutoff, krf=krf, crf=crf, use_switch=use_switch,
        switch_distance=switch_distance, ewald_alpha=ewald_alpha, ljpme=ljpme,
        dispersion_alpha=dispersion_alpha)

    def pad_inputs(positions, charge, sig_half, eps2, subsets, exclusion_list,
                   block):
        """Pad per-atom arrays to a multiple of `block` rows."""
        n = positions.shape[0]
        n_pad = ((n + block - 1) // block) * block
        pad = n_pad - n
        return dict(
            pos_p=jnp.pad(positions, ((0, pad), (0, 0))),
            q_p=jnp.pad(charge, (0, pad)),
            sh_p=jnp.pad(sig_half, (0, pad)),
            e2_p=jnp.pad(eps2, (0, pad)),
            sub_p=jnp.pad(subsets, (0, pad)),
            excl_p=jnp.pad(exclusion_list, ((0, pad), (0, 0)), constant_values=-1),
            n=n, n_pad=n_pad)

    def make_block_fn(padded, box, slice_table, lam_coul, lam_vdw, block):
        """Per-row-block pair computation over all columns.

        Returns block_fn(i0) -> (slice_energy_partials (S, 2), row forces
        (block, 3)); reused by the single-chip loop and the shard_map path.
        """
        pos_p = padded["pos_p"]
        q_p = padded["q_p"]
        sh_p = padded["sh_p"]
        e2_p = padded["e2_p"]
        sub_p = padded["sub_p"]
        excl_p = padded["excl_p"]
        n = padded["n"]
        n_pad = padded["n_pad"]
        dtype = pos_p.dtype
        valid_p = jnp.arange(n_pad) < n
        idx_all = jnp.arange(n_pad)
        sl_tab = jnp.asarray(slice_table)
        nsub = sl_tab.shape[0]
        lam_c_nn = lam_coul[sl_tab]  # (nsub, nsub)
        lam_v_nn = lam_vdw[sl_tab]
        from ..utils.indexing import slice_subsets
        spairs = jnp.asarray(slice_subsets(nsub))
        oh_p = (sub_p[:, None]
                == jnp.arange(nsub, dtype=sub_p.dtype)).astype(dtype)

        def block_fn(i0):
            pi = jax.lax.dynamic_slice(pos_p, (i0, 0), (block, 3))
            qi = jax.lax.dynamic_slice(q_p, (i0,), (block,))
            shi = jax.lax.dynamic_slice(sh_p, (i0,), (block,))
            e2i = jax.lax.dynamic_slice(e2_p, (i0,), (block,))
            ohi = jax.lax.dynamic_slice(oh_p, (i0, 0), (block, nsub))
            excli = jax.lax.dynamic_slice(excl_p, (i0, 0),
                                          (block, excl_p.shape[1]))
            idx_i = i0 + jnp.arange(block)

            dr = pi[:, None, :] - pos_p[None, :, :]
            if periodic:
                dr = min_image(dr, box)
            r2 = jnp.sum(dr * dr, axis=-1)

            mask = (idx_i[:, None] != idx_all[None, :])
            mask &= valid_p[None, :] & (idx_i[:, None] < n)
            excluded = jnp.any(idx_all[None, :, None] == excli[:, None, :], axis=-1)
            mask &= ~excluded
            if mode != PLAIN:
                mask &= r2 < cutoff * cutoff

            r2s = jnp.where(mask, r2, jnp.ones((), dtype))
            rinv = jax.lax.rsqrt(r2s)

            qq = qi[:, None] * q_p[None, :]
            e_coul, e_vdw, dedr_c, dedr_v = pair_terms(
                r2s, rinv, shi[:, None], sh_p[None, :], e2i[:, None],
                e2_p[None, :], qq)

            # per-pair lambdas and per-slice sums as one-hot matmuls (MXU);
            # per-pair table gathers are near-scalar on TPU
            lam_cp = pair_lambdas(lam_c_nn, ohi, oh_p)
            lam_vp = pair_lambdas(lam_v_nn, ohi, oh_p)
            factor = jnp.where(mask, lam_vp * dedr_v + lam_cp * dedr_c, 0.0)
            f_block = jnp.einsum("ij,ijk->ik", factor, dr)

            e_coul = jnp.where(mask, e_coul, 0.0)
            e_vdw = jnp.where(mask, e_vdw, 0.0)
            ec = subset_moments(e_coul, ohi, oh_p, spairs)
            ev = subset_moments(e_vdw, ohi, oh_p, spairs)
            return jnp.stack([ec, ev], axis=-1), f_block

        return block_fn

    def direct_space(positions, box, charge, sig_half, eps2, subsets,
                     exclusion_list, slice_table, lam_coul, lam_vdw):
        n = positions.shape[0]
        block = block_size or _pick_block(n)
        padded = pad_inputs(positions, charge, sig_half, eps2, subsets,
                            exclusion_list, block)
        block_fn = make_block_fn(padded, box, slice_table, lam_coul, lam_vdw,
                                 block)
        starts = jnp.arange(0, padded["n_pad"], block)
        slice_parts, force_blocks = jax.lax.map(block_fn, starts)
        # cross-block reduction in f64 (energy path only)
        slice_energies = jnp.sum(slice_parts, axis=0, dtype=jnp.float64)
        forces = force_blocks.reshape(padded["n_pad"], 3)[:n]
        return slice_energies, forces

    direct_space.pad_inputs = pad_inputs
    direct_space.make_block_fn = make_block_fn
    return direct_space
