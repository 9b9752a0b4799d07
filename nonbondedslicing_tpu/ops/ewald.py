"""Bare Ewald reciprocal-space sum, sliced over particle subsets.

TPU-first reformulation of the reference's per-k loop
(ReferenceSlicedLJCoulombIxn.cpp:256-357): the half-space k-vector list is
enumerated statically on the host; per-subset structure factors
``S_j(k) = sum_{n in j} q_n exp(i k.r_n)`` are computed as one dense complex
outer product (MXU-friendly einsums over the (N, K) phase matrix); slice
energies are cross-products of subset structure factors; forces use the
lambda-combined per-atom weight ``Im(t_n(k) * conj(sum_j lam(s_n,j) S_j(k)))``.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import ONE_4PI_EPS0


def half_space_kvectors(kmax):
    """Integer k-triples matching the reference's loop enumeration:
    rx in [0, numRx); ry in [0 or 1-numRy, numRy); rz likewise, starting at
    (0, 0, 1) and excluding the origin and conjugate duplicates."""
    numRx, numRy, numRz = kmax
    ks = []
    lowry, lowrz = 0, 1
    for rx in range(numRx):
        for ry in range(lowry, numRy):
            for rz in range(lowrz, numRz):
                ks.append((rx, ry, rz))
                lowrz = 1 - numRz
            lowry = 1 - numRy
    return np.array(ks, dtype=np.int64).reshape(-1, 3)


def ewald_reciprocal(positions, box, charge, subsets, lam_coul_s, *,
                     kvec_ints, alpha, num_subsets, num_slices,
                     slice_subset_pairs, psum_axis=None):
    """Returns (slice_coul_energies (S,), forces (N, 3)).

    With ``psum_axis`` set, the call must be inside ``shard_map`` with the
    particle arrays holding one atom shard per device: the per-subset
    structure factors are all-reduced over the mesh axis, after which the
    slice energies are computed replicated and the forces cover only the
    local shard (parallel/pme_shard.py wraps this)."""
    dtype = positions.dtype
    n = positions.shape[0]
    recip_size = 2.0 * math.pi / jnp.stack([box[0, 0], box[1, 1], box[2, 2]])
    kvecs = jnp.asarray(kvec_ints, dtype) * recip_size[None, :]  # (K, 3)
    k2 = jnp.sum(kvecs * kvecs, axis=-1)
    factor = -1.0 / (4.0 * alpha * alpha)
    volume = box[0, 0] * box[1, 1] * box[2, 2]
    recip_coeff = ONE_4PI_EPS0 * 4.0 * math.pi / volume
    ak = jnp.exp(k2 * factor) / k2  # (K,)

    phase = positions @ kvecs.T  # (N, K)
    t_re = charge[:, None] * jnp.cos(phase)
    t_im = charge[:, None] * jnp.sin(phase)

    onehot = (subsets[:, None] == jnp.arange(num_subsets)[None, :]).astype(dtype)
    s_re = onehot.T @ t_re  # (nsub, K)
    s_im = onehot.T @ t_im
    if psum_axis is not None:
        s_re = jax.lax.psum(s_re, psum_axis)
        s_im = jax.lax.psum(s_im, psum_axis)

    # slice energies: diag gets 1x, off-diag 2x (cpp:347-351);
    # f64 accumulation over k (energy path only; DCE'd when unused)
    emat = (jnp.matmul(s_re * ak, s_re.T, preferred_element_type=jnp.float64)
            + jnp.matmul(s_im * ak, s_im.T,
                         preferred_element_type=jnp.float64))
    pair_i = slice_subset_pairs[:, 0]
    pair_j = slice_subset_pairs[:, 1]
    weights = jnp.where(pair_i == pair_j, 1.0, 2.0).astype(dtype)
    slice_coul = recip_coeff * weights * emat[pair_i, pair_j]

    # forces (cpp:336-345): f_n += 2*rc*ak*Im(t_n * conj(L_n)) * k
    lam_nn = lam_coul_s[jnp.asarray(_slice_table_cache(num_subsets))]  # (nsub, nsub)
    lam_rows = lam_nn[subsets]  # (N, nsub)
    l_re = lam_rows @ s_re  # (N, K)
    l_im = lam_rows @ s_im
    w = t_im * l_re - t_re * l_im  # Im(t * conj(L))
    forces = 2.0 * recip_coeff * jnp.einsum("nk,k,kd->nd", w, ak, kvecs)
    return slice_coul, forces


_TABLES = {}


def _slice_table_cache(num_subsets):
    from ..utils.indexing import slice_pair_table
    if num_subsets not in _TABLES:
        _TABLES[num_subsets] = slice_pair_table(num_subsets)
    return _TABLES[num_subsets]
