"""Bond-style nonbonded terms: 1-4 exceptions and Ewald exclusion corrections.

* 1-4 exceptions: E = lam_c*k*qq/r + lam_v*4*eps*((sigma/r)^12 - (sigma/r)^6)
  with parameters packed (sigma, 4*eps, qq); forces lambda-scaled, slice
  energies unscaled (ReferenceSlicedLJCoulomb14.cpp:61-95).
* Exclusion corrections subtract the reciprocal-space part of excluded pairs:
  -erf(alpha*r)*k*qq/r with a Taylor-safe branch when erf(alpha*r) <= 1e-6,
  plus the LJPME dispersion back-out term
  (ReferenceSlicedLJCoulombIxn.cpp:447-507).
"""

import jax.numpy as jnp
from jax.scipy.special import erf

from ..utils.constants import ONE_4PI_EPS0, SQRT_PI, TWO_OVER_SQRT_PI
from .geometry import min_image


def nb14_interactions(positions, box, atoms, sigma, four_eps, qq, slice_ids,
                      lam_coul_s, lam_vdw_s, *, periodic, num_slices, num_particles):
    """Compute 1-4 exception terms.

    Returns (slice_energies (S, 2), forces (N, 3)).
    """
    dtype = positions.dtype
    if atoms.shape[0] == 0:
        return (jnp.zeros((num_slices, 2), jnp.float64),
                jnp.zeros((num_particles, 3), dtype))
    i = atoms[:, 0]
    j = atoms[:, 1]
    dr = positions[i] - positions[j]
    if periodic:
        dr = min_image(dr, box)
    r2 = jnp.sum(dr * dr, axis=-1)
    rinv = jnp.where(r2 > 0, 1.0 / jnp.sqrt(jnp.where(r2 > 0, r2, 1.0)), 0.0)
    sig2 = (sigma * rinv) ** 2
    sig6 = sig2 * sig2 * sig2

    lam_c = lam_coul_s[slice_ids]
    lam_v = lam_vdw_s[slice_ids]

    dedr = (lam_v * four_eps * (12.0 * sig6 - 6.0) * sig6
            + lam_c * ONE_4PI_EPS0 * qq * rinv) * rinv * rinv
    f = dedr[:, None] * dr

    e_vdw = four_eps * (sig6 - 1.0) * sig6
    e_coul = ONE_4PI_EPS0 * qq * rinv

    # f64 per-slice accumulation (energy path only; see direct.slice_reduce)
    slice_energies = jnp.zeros((num_slices, 2), jnp.float64)
    slice_energies = slice_energies.at[slice_ids, 0].add(
        e_coul.astype(jnp.float64))
    slice_energies = slice_energies.at[slice_ids, 1].add(
        e_vdw.astype(jnp.float64))

    forces = jnp.zeros((num_particles, 3), dtype)
    forces = forces.at[i].add(f).at[j].add(-f)
    return slice_energies, forces


def exclusion_corrections(positions, box, pairs, charge, sig_half, eps2,
                          subsets, slice_table, lam_coul_s, lam_vdw_s, *,
                          alpha, periodic_exceptions, ljpme, dispersion_alpha,
                          num_slices, num_particles):
    """Subtract reciprocal-space contributions of excluded pairs."""
    dtype = positions.dtype
    if pairs.shape[0] == 0:
        return (jnp.zeros((num_slices, 2), jnp.float64),
                jnp.zeros((num_particles, 3), dtype))
    i = pairs[:, 0]
    j = pairs[:, 1]
    dr = positions[i] - positions[j]
    if periodic_exceptions:
        dr = min_image(dr, box)
    r2 = jnp.sum(dr * dr, axis=-1)
    r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
    r = jnp.where(r2 > 0, r, 0.0)
    alpha_r = alpha * r
    erf_ar = erf(alpha_r)
    big = erf_ar > 1e-6  # Taylor-safe branch (ReferenceSlicedLJCoulombIxn.cpp:468)
    r_safe = jnp.where(big, r, jnp.ones((), dtype))
    rinv = 1.0 / r_safe

    qq = charge[i] * charge[j]
    sl = jnp.asarray(slice_table)[subsets[i], subsets[j]]
    lam_c = lam_coul_s[sl]
    lam_v = lam_vdw_s[sl]

    e_coul = jnp.where(
        big,
        -ONE_4PI_EPS0 * qq * rinv * erf_ar,
        -alpha * TWO_OVER_SQRT_PI * ONE_4PI_EPS0 * qq)
    dedr = jnp.where(
        big,
        ONE_4PI_EPS0 * qq * rinv ** 3
        * (erf_ar - 2.0 * alpha_r * jnp.exp(-alpha_r * alpha_r) / SQRT_PI),
        0.0)
    # reference subtracts: forces[i] -= lam*dedr*dr (cpp:473-478)
    f = -(lam_c * dedr)[:, None] * dr

    # f64 per-slice accumulation (energy path only; see direct.slice_reduce)
    slice_energies = jnp.zeros((num_slices, 2), jnp.float64)
    slice_energies = slice_energies.at[sl, 0].add(e_coul.astype(jnp.float64))

    forces = jnp.zeros((num_particles, 3), dtype)
    forces = forces.at[i].add(f).at[j].add(-f)

    if ljpme:
        # back out reciprocal-space dispersion for excluded pairs (cpp:487-504)
        dar = dispersion_alpha * r
        dar2 = dar * dar
        dar4 = dar2 * dar2
        dar6 = dar4 * dar2
        rinv2 = rinv * rinv
        rinv6 = rinv2 * rinv2 * rinv2
        c6i = 8.0 * sig_half[i] ** 3 * eps2[i]
        c6j = 8.0 * sig_half[j] ** 3 * eps2[j]
        c6ij = c6i * c6j
        expd = jnp.exp(-dar2)
        e_vdw = jnp.where(big, c6ij * rinv6 * (1.0 - expd * (1.0 + dar2 + 0.5 * dar4)), 0.0)
        dedr_v = jnp.where(
            big,
            -6.0 * c6ij * rinv6 * rinv2
            * (1.0 - expd * (1.0 + dar2 + 0.5 * dar4 + dar6 / 6.0)),
            0.0)
        fv = -(lam_v * dedr_v)[:, None] * dr
        slice_energies = slice_energies.at[sl, 1].add(
            e_vdw.astype(jnp.float64))
        forces = forces.at[i].add(fv).at[j].add(-fv)

    return slice_energies, forces


def triangle_exclusions(pairs, num_particles):
    """(E, 2) exclusion pairs -> (M, 3, 2) contiguous-triple clusters, or
    None if the exclusions are not exactly the rigid-water pattern
    ((3m, 3m+1), (3m, 3m+2), (3m+1, 3m+2) for every molecule m covering all
    particles).  Enables the gather/scatter-free row-layout correction pass."""
    import numpy as np

    pairs = np.asarray(pairs)
    e = pairs.shape[0]
    if e == 0 or e % 3 != 0 or num_particles != e:
        return None
    m = e // 3
    tri = np.sort(pairs.reshape(m, 3, 2), axis=2)
    order = np.lexsort((tri[:, 0, 1], tri[:, 0, 0]))
    tri = tri[order]
    base = 3 * np.arange(m, dtype=tri.dtype)[:, None, None]
    expect = base + np.array([[[0, 1], [0, 2], [1, 2]]], dtype=tri.dtype)
    return tri if np.array_equal(tri, expect) else None


def exclusion_corrections_rows(positions, charge, sig_half, eps2, pair_slices,
                               lam_coul_s, lam_vdw_s, *, alpha, ljpme,
                               dispersion_alpha, num_slices):
    """Ewald exclusion corrections for contiguous-triple clusters in
    molecule-last (9, M) layout: no gathers or scatters (TPU scatters on the
    exclusion pair list cost more than the whole correction).  Assumes
    non-periodic exception deltas (molecules kept whole — OpenMM semantics);
    same math as exclusion_corrections (ReferenceSlicedLJCoulombIxn.cpp:449-506).

    pair_slices: (M, 3) int32 slice id per local pair (0-1, 0-2, 1-2).
    Returns (slice_energies (S, 2), forces (N, 3)).
    """
    dtype = positions.dtype
    n = positions.shape[0]
    m = n // 3
    P = positions.reshape(m, 9).T              # (9, M)
    a, b, c = P[0:3], P[3:6], P[6:9]           # xyz rows per local atom
    q = charge.reshape(m, 3).T                 # (3, M)
    sh = sig_half.reshape(m, 3).T
    ep = eps2.reshape(m, 3).T
    LI = (0, 0, 1)
    LJ = (1, 2, 2)
    atoms = (a, b, c)
    # per-slice one-hot for energy contraction (precomputable but cheap)
    sl = jnp.asarray(pair_slices)              # (M, 3)
    oh = [(sl[:, k][None, :, None]
           == jnp.arange(num_slices)[None, None, :]).astype(dtype)[0]
          for k in range(3)]                   # 3 x (M, S)
    lam_c = [jnp.einsum("ms,s->m", oh[k], lam_coul_s)[None, :]
             for k in range(3)]
    lam_v = [jnp.einsum("ms,s->m", oh[k], lam_vdw_s)[None, :]
             for k in range(3)]

    e_c_rows = []
    e_v_rows = []
    f_acc = [jnp.zeros_like(a), jnp.zeros_like(b), jnp.zeros_like(c)]
    for k in range(3):
        i, j = LI[k], LJ[k]
        dr = atoms[i] - atoms[j]               # (3, M), unwrapped
        r2 = jnp.sum(dr * dr, axis=0, keepdims=True)
        r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
        r = jnp.where(r2 > 0, r, 0.0)
        ar = alpha * r
        erf_ar = erf(ar)
        big = erf_ar > 1e-6
        rinv = 1.0 / jnp.where(big, r, jnp.ones((), dtype))
        qq = q[i:i + 1] * q[j:j + 1]
        e_c = jnp.where(big, -ONE_4PI_EPS0 * qq * rinv * erf_ar,
                        -alpha * TWO_OVER_SQRT_PI * ONE_4PI_EPS0 * qq)
        dedr = jnp.where(
            big,
            ONE_4PI_EPS0 * qq * rinv ** 3
            * (erf_ar - 2.0 * ar * jnp.exp(-ar * ar) / SQRT_PI), 0.0)
        f = -(lam_c[k] * dedr) * dr            # (3, M)
        e_c_rows.append(e_c)
        e_v = None
        if ljpme:
            dar = dispersion_alpha * r
            dar2 = dar * dar
            dar4 = dar2 * dar2
            dar6 = dar4 * dar2
            rinv2 = rinv * rinv
            rinv6 = rinv2 * rinv2 * rinv2
            c6ij = (8.0 * sh[i:i + 1] ** 3 * ep[i:i + 1]
                    * 8.0 * sh[j:j + 1] ** 3 * ep[j:j + 1])
            expd = jnp.exp(-dar2)
            e_v = jnp.where(big, c6ij * rinv6
                            * (1.0 - expd * (1.0 + dar2 + 0.5 * dar4)), 0.0)
            dedr_v = jnp.where(
                big,
                -6.0 * c6ij * rinv6 * rinv2
                * (1.0 - expd * (1.0 + dar2 + 0.5 * dar4 + dar6 / 6.0)), 0.0)
            f = f - (lam_v[k] * dedr_v) * dr
        e_v_rows.append(e_v)
        f_acc[i] = f_acc[i] + f
        f_acc[j] = f_acc[j] - f

    # f64 per-slice reduction (XLA DCEs it on force-only evaluations)
    slice_e = jnp.zeros((num_slices, 2), jnp.float64)
    for k in range(3):
        slice_e = slice_e.at[:, 0].add(
            jnp.einsum("m,ms->s", e_c_rows[k][0], oh[k],
                       preferred_element_type=jnp.float64))
        if ljpme:
            slice_e = slice_e.at[:, 1].add(
                jnp.einsum("m,ms->s", e_v_rows[k][0], oh[k],
                           preferred_element_type=jnp.float64))
    forces = jnp.concatenate(f_acc, axis=0).T.reshape(n, 3)
    return slice_e, forces
