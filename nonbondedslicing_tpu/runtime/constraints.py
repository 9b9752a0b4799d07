"""Holonomic distance constraints (vectorized M-SHAKE / RATTLE).

The reference relies on OpenMM core for constraints (SETTLE/CCMA live outside
the plugin repo); rigid 3-site water at a 2 fs step is the standard regime the
reference's CUDA platform is benchmarked in.  This module provides the
TPU-native equivalent: a fully vectorized matrix-SHAKE solver over independent
constraint clusters (e.g. one rigid triangle per water), run inside the
compiled MD step.

Algorithm (standard published form): for cluster constraints
sigma_k = |r_ij|^2 - d_k^2 = 0, iterate Newton steps on the lambda vector
using reference-direction gradients; each iteration solves the small
(n_cons x n_cons) coupling system per cluster in closed form (n_cons <= 3
here, so an explicit 3x3 inverse).  Starting from an unconstrained update of
an already-satisfied configuration, 4-6 iterations reach ~1e-10 relative.

RATTLE velocity stage: project velocities onto the constraint manifold by
solving  J lambda = -r_now . v_rel  with the same coupling matrices.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _solve3(A, b):
    """Batched closed-form solve of (..., 3, 3) systems (adjugate/det)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / det
    x0 = (c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]) * inv_det
    x1 = (c10 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]) * inv_det
    x2 = (c20 * b[..., 0] + c21 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def _contiguous_triangles(pairs, n_particles):
    """True if cluster m constrains exactly atoms (3m, 3m+1, 3m+2) as the
    triangle [[0,1],[0,2],[1,2]] and every particle belongs to one cluster —
    the rigid-water layout.  Enables the gather/scatter-free dense solver."""
    m = pairs.shape[0]
    if n_particles != 3 * m:
        return False
    base = 3 * np.arange(m, dtype=pairs.dtype)[:, None, None]
    expect = base + np.array([[[0, 1], [0, 2], [1, 2]]], dtype=pairs.dtype)
    return bool(np.array_equal(pairs, expect))


def cluster_constraints(constraints, n_particles):
    """Group (i, j, distance) constraints into independent clusters of
    coupled constraints.  Clusters of at most three constraints (the common
    rigid-water case) use the closed-form 3x3 M-SHAKE block; larger clusters
    (rigid CH3/CH4, constraint chains — the topologies the reference covers
    via OpenMM core's SHAKE/CCMA) pad every cluster to the largest size C
    and the solver switches to a batched (C x C) Newton solve.  Clusters
    smaller than C are padded with inert rows (pair (0, 0), distance 0,
    mask 0).

    Returns (pairs (M, C, 2) int32, dists (M, C) f64, mask (M, C) f64) with
    C >= 3, or None when ``constraints`` is empty.
    """
    cons = [(int(i), int(j), float(d)) for i, j, d in constraints]
    if not cons:
        return None
    parent = list(range(len(cons)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    atom_owner = {}
    for k, (i, j, _) in enumerate(cons):
        for a in (i, j):
            if a in atom_owner:
                ra, rk = find(atom_owner[a]), find(k)
                if ra != rk:
                    parent[rk] = ra
            else:
                atom_owner[a] = k
    clusters = {}
    for k in range(len(cons)):
        clusters.setdefault(find(k), []).append(k)
    width = max(3, max(len(members) for members in clusters.values()))
    pairs, dists, mask = [], [], []
    for members in clusters.values():
        p = [[cons[k][0], cons[k][1]] for k in members]
        d = [cons[k][2] for k in members]
        m = [1.0] * len(members)
        while len(p) < width:
            p.append([0, 0])
            d.append(0.0)
            m.append(0.0)
        pairs.append(p)
        dists.append(d)
        mask.append(m)
    return (np.asarray(pairs, dtype=np.int32),
            np.asarray(dists, dtype=np.float64),
            np.asarray(mask, dtype=np.float64))


def _isoceles_triangles(pairs, dists, masses):
    """True when every contiguous-triangle cluster is a SETTLE-shaped rigid
    body: |AB| == |AC| (two equal legs) and m_B == m_C.  Geometry may differ
    between molecules; only the per-molecule symmetry matters."""
    d = np.asarray(dists, dtype=np.float64).reshape(-1, 3)
    m3 = np.asarray(masses, dtype=np.float64).reshape(-1, 3)
    return bool(np.all(np.abs(d[:, 0] - d[:, 1]) <= 1e-12 * d[:, 0])
                and np.all(m3[:, 1] == m3[:, 2])
                and np.all(m3 > 0.0))


def make_constrainer(pairs, dists, masses, n_particles, iterations=8,
                     dtype=jnp.float32, mask=None, mixed=False):
    """``mixed=True`` (round 5) builds CORRECTION-style projectors for the
    mixed-precision MD path's double-single (hi, lo) f32-pair positions:
    the f32 solver core runs in a PER-CLUSTER LOCAL FRAME (coordinates
    relative to the cluster's representative atom, ~0.1 nm scale where the
    f32 ulp is ~1e-8 nm) and the caller compensated-adds the returned
    correction into the (hi, lo) state (runtime/fastpath._ds_add).
    Solving at f32 on ABSOLUTE ~box-scale coordinates instead injects
    ~f32-ulp (2.4e-7 nm) position noise every step, which measured as the
    DOMINANT NVE heating of the 23k bench (+540 kJ/mol/ps -> ~-1 with the
    local frame, extras/probe_nve_tpu.py; a full-f64 path also fixes it
    but f64 elementwise on this TPU runs ~250x slower than f32 and cost
    6-9% of throughput).  Returns (px_corr, pv) — see _local_frame_ds."""
    pairs = np.asarray(pairs, dtype=np.int32)
    if pairs.ndim != 3:
        pairs = pairs.reshape(-1, 3, 2)
    if mask is not None and np.all(np.asarray(mask) == 1.0):
        mask = None
    if pairs.shape[1] != 3:
        # clusters wider than 3 coupled constraints (rigid CH3/CH4, chains):
        # generic batched-Newton M-SHAKE with a (C x C) linear solve
        px, pv = _make_gather_constrainer(pairs, dists, masses, iterations,
                                          dtype, mask=mask)
        if mixed:
            rep = _rep_atoms(pairs, n_particles)
            return _local_frame_ds(px, pv, lambda hi: hi[rep], dtype)
        return px, pv
    if mask is None and _contiguous_triangles(pairs, n_particles):
        if _isoceles_triangles(pairs, dists, masses):
            px, pv = _make_dense_settle_constrainer(pairs, dists, masses,
                                                    dtype)
        else:
            px, pv = _make_dense_triangle_constrainer(pairs, dists, masses,
                                                      iterations, dtype)
        if mixed:
            m = pairs.shape[0]

            def shift_of(hi):
                # contiguous triples: the molecule's first atom, by pure
                # reshape/broadcast — no gather
                return jnp.broadcast_to(
                    hi.reshape(m, 3, 3)[:, 0:1, :], (m, 3, 3)
                ).reshape(3 * m, 3)

            return _local_frame_ds(px, pv, shift_of, dtype)
        return px, pv
    px, pv = _make_gather_constrainer(pairs, dists, masses, iterations, dtype,
                                      mask=mask)
    if mixed:
        rep = _rep_atoms(pairs, n_particles)
        return _local_frame_ds(px, pv, lambda hi: hi[rep], dtype)
    return px, pv


def _rep_atoms(pairs, n_particles):
    """Per-atom cluster-representative index (min atom of the atom's
    constraint cluster; unconstrained atoms map to themselves) — the
    local-frame shift source for the gather-family mixed projectors."""
    rep = np.arange(n_particles, dtype=np.int32)
    flat = pairs.reshape(-1, 2)
    # union by min over a few sweeps (cluster diameters are tiny)
    for _ in range(4):
        lo = np.minimum(rep[flat[:, 0]], rep[flat[:, 1]])
        np.minimum.at(rep, flat[:, 0], lo)
        np.minimum.at(rep, flat[:, 1], lo)
        rep = rep[rep]
    return rep


def _local_frame_ds(proj_x, proj_v, shift_of, dtype):
    """Wrap f32 projectors for DOUBLE-SINGLE (hi, lo) f32-pair positions:
    translate each cluster to its representative atom's frame (``shift_of``
    maps an hi array to per-atom shifts), reconstruct exact-enough local
    coordinates as (hi - shift) + lo (hi - shift is exact by Sterbenz for
    nearby values; locals are ~0.1 nm where the f32 ulp is ~1e-8 nm), run
    the unchanged f32 solver, and return the CORRECTION for the caller to
    compensated-add into the (hi, lo) state.  The solvers are
    translation-invariant, so this is exact up to the harmless
    non-accumulating f32 rounding of the local geometry.

    Returns (px_corr(hi_r, lo_r, hi_n, lo_n) -> corr (n, 3),
             pv(hi, lo, vel32) -> vel32)."""

    def _local(hi, lo, shift):
        return (hi - shift) + lo

    def px_corr(hi_r, lo_r, hi_n, lo_n):
        shift = shift_of(hi_r)
        base = _local(hi_r, lo_r, shift)
        cand = _local(hi_n, lo_n, shift)
        return proj_x(base, cand) - cand

    def pv(hi, lo, vel):
        p = _local(hi, lo, shift_of(hi))
        return proj_v(p, vel)

    return px_corr, pv


def _solve3_rows(J, b):
    """Closed-form 3x3 solve with components given as (..., M) lane-major
    rows: J is a 3x3 nested list, b a list of 3."""
    c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1]
    c01 = J[0][2] * J[2][1] - J[0][1] * J[2][2]
    c02 = J[0][1] * J[1][2] - J[0][2] * J[1][1]
    c10 = J[1][2] * J[2][0] - J[1][0] * J[2][2]
    c11 = J[0][0] * J[2][2] - J[0][2] * J[2][0]
    c12 = J[0][2] * J[1][0] - J[0][0] * J[1][2]
    c20 = J[1][0] * J[2][1] - J[1][1] * J[2][0]
    c21 = J[0][1] * J[2][0] - J[0][0] * J[2][1]
    c22 = J[0][0] * J[1][1] - J[0][1] * J[1][0]
    inv_det = 1.0 / (J[0][0] * c00 + J[0][1] * c01 + J[0][2] * c02)
    return [(c00 * b[0] + c01 * b[1] + c02 * b[2]) * inv_det,
            (c10 * b[0] + c11 * b[1] + c12 * b[2]) * inv_det,
            (c20 * b[0] + c21 * b[1] + c22 * b[2]) * inv_det]


def _make_dense_triangle_constrainer(pairs, dists, masses, iterations, dtype):
    """Rigid-triangle clusters over contiguous atom triples in molecule-last
    (9, M) layout: every per-iteration op is full-lane elementwise arithmetic
    — no gathers/scatters (a scatter per SHAKE iteration costs more than the
    whole force evaluation on TPU) and no 3-wide trailing dims (which pad to
    128 lanes and waste ~98% of the VPU)."""
    m = pairs.shape[0]
    # numpy closure constants (device arrays lower element-wise over the
    # TPU tunnel)
    np_dt = np.dtype(jnp.dtype(dtype).name)
    dists_arr = np.asarray(dists, dtype=np.float64).reshape(m, 3)
    d2_rows = [(dists_arr[:, k] ** 2).astype(np_dt)[None, :]
               for k in range(3)]
    inv3 = np.where(np.asarray(masses) > 0,
                    1.0 / np.maximum(np.asarray(masses), 1e-300),
                    0.0).reshape(m, 3)
    im_rows = [inv3[:, a].astype(np_dt)[None, :] for a in range(3)]
    LI = (0, 0, 1)
    LJ = (1, 2, 2)
    s_rows = [[(
        inv3[:, LI[k]] * ((LI[k] == LI[l]) - (LI[k] == LJ[l]))
        - inv3[:, LJ[k]] * ((LJ[k] == LI[l]) - (LJ[k] == LJ[l]))
        ).astype(np_dt)[None, :] for l in range(3)] for k in range(3)]

    def _to_rows(x):
        # (N, 3) -> atoms a/b/c as (3, M) xyz slabs
        p = x.reshape(m, 9).T
        return p[0:3], p[3:6], p[6:9]

    def _rel(abc):
        a, b, c = abc
        return [a - b, a - c, b - c]            # 3 x (3, M)

    def _dot(u, v):
        return jnp.sum(u * v, axis=0, keepdims=True)   # (1, M)

    def _apply(abc, lam, r_dir, scale):
        a, b, c = abc
        t = [lam[k] * scale * r_dir[k] for k in range(3)]   # (3, M)
        a = a - (t[0] + t[1]) * im_rows[0]
        b = b - (-t[0] + t[2]) * im_rows[1]
        c = c - (-t[1] - t[2]) * im_rows[2]
        return a, b, c

    def _from_rows(abc):
        return jnp.concatenate(abc, axis=0).T.reshape(-1, 3)

    def project_positions(pos_ref, pos_new):
        rm = _rel(_to_rows(pos_ref))

        def body(_, abc):
            rn = _rel(abc)
            sigma = [_dot(rn[k], rn[k]) - d2_rows[k] for k in range(3)]
            J = [[4.0 * s_rows[k][l] * _dot(rn[k], rm[l])
                  for l in range(3)] for k in range(3)]
            lam = _solve3_rows(J, sigma)
            return _apply(abc, lam, rm, 2.0)

        out = jax.lax.fori_loop(0, iterations, body, _to_rows(pos_new))
        return _from_rows(out)

    def project_velocities(pos, vel):
        rn = _rel(_to_rows(pos))
        vabc = _to_rows(vel)
        vrel = _rel(vabc)
        rhs = [_dot(rn[k], vrel[k]) for k in range(3)]
        J = [[s_rows[k][l] * _dot(rn[k], rn[l]) for l in range(3)]
             for k in range(3)]
        lam = _solve3_rows(J, rhs)
        return _from_rows(_apply(vabc, lam, rn, 1.0))

    return project_positions, project_velocities


def _make_dense_settle_constrainer(pairs, dists, masses, dtype):
    """Closed-form SETTLE position projection for isoceles rigid triangles
    (Miyamoto & Kollman, J. Comput. Chem. 13:952, 1992) in the same
    molecule-last (rows, M) layout as the dense M-SHAKE solver: one analytic
    pass (two normalized cross products, a frame rotation, three
    quadrant-free sin/cos extractions) replaces the 8 Newton iterations —
    every operation is full-lane elementwise arithmetic over the molecule
    axis, no gathers/scatters/trig.

    The velocity stage keeps the exact one-shot 3x3 RATTLE solve from the
    M-SHAKE module (already non-iterative).

    The reference gets this from OpenMM core's SETTLE for rigid waters; this
    is the TPU-native equivalent (reference repo itself carries no
    constraint code)."""
    m = pairs.shape[0]
    np_dt = np.dtype(jnp.dtype(dtype).name)
    d = np.asarray(dists, dtype=np.float64).reshape(m, 3)
    m3 = np.asarray(masses, dtype=np.float64).reshape(m, 3)
    ma, mb = m3[:, 0], m3[:, 1]                   # m_C == m_B (checked)
    # canonical triangle: A at (0, ra), B/C at (-+rc, -rb); COM at origin
    rc = 0.5 * d[:, 2]
    t = np.sqrt(d[:, 0] ** 2 - rc ** 2)
    ra = 2.0 * mb * t / (ma + 2.0 * mb)
    rb = t - ra
    ra_r = ra.astype(np_dt)[None, :]
    rb_r = rb.astype(np_dt)[None, :]
    rc_r = rc.astype(np_dt)[None, :]
    wa = (ma / (ma + 2.0 * mb)).astype(np_dt)[None, :]
    wb = (mb / (ma + 2.0 * mb)).astype(np_dt)[None, :]

    def _to_rows(x):
        p = x.reshape(m, 9).T
        return p[0:3], p[3:6], p[6:9]             # each (3, M) xyz slabs

    def _dot(u, v):
        return jnp.sum(u * v, axis=0, keepdims=True)

    def _cross(u, v):
        return jnp.stack([u[1] * v[2] - u[2] * v[1],
                          u[2] * v[0] - u[0] * v[2],
                          u[0] * v[1] - u[1] * v[0]])

    def project_positions(pos_ref, pos_new):
        a0, b0, c0 = _to_rows(pos_ref)
        a1, b1, c1 = _to_rows(pos_new)
        com = wa * a1 + wb * (b1 + c1)            # (3, M)
        a1 = a1 - com
        b1 = b1 - com
        c1 = c1 - com
        b0a = b0 - a0
        c0a = c0 - a0
        # primed frame: Z' normal to the OLD triangle plane, X' = a1 x Z'
        # (so the new A sits in the Y'Z' plane), Y' = Z' x X'
        ez = _cross(b0a, c0a)
        ez = ez * jax.lax.rsqrt(_dot(ez, ez))
        ex = _cross(a1, ez)
        ex = ex * jax.lax.rsqrt(_dot(ex, ex))
        ey = _cross(ez, ex)

        def rot(v):                               # world -> primed
            return _dot(ex, v), _dot(ey, v), _dot(ez, v)

        xb0, yb0, _ = rot(b0a)
        xc0, yc0, _ = rot(c0a)
        _, ya1, za1 = rot(a1)
        xb1, yb1, zb1 = rot(b1)
        xc1, yc1, zc1 = rot(c1)

        # out-of-plane tilt phi and HH twist psi from the unconstrained
        # z-coordinates (momentum conservation along the old plane normal)
        sinphi = za1 / ra_r
        cosphi = jnp.sqrt(jnp.maximum(1.0 - sinphi * sinphi, 0.0))
        sinpsi = (zb1 - zc1) / (2.0 * rc_r * cosphi)
        cospsi = jnp.sqrt(jnp.maximum(1.0 - sinpsi * sinpsi, 0.0))

        ya2 = ra_r * cosphi
        xb2 = -rc_r * cospsi
        yb2 = -rb_r * cosphi - rc_r * sinpsi * sinphi
        yc2 = -rb_r * cosphi + rc_r * sinpsi * sinphi

        # in-plane rotation theta from the SHAKE-displacement condition
        al = xb2 * (xb0 - xc0) + yb0 * yb2 + yc0 * yc2
        be = xb2 * (yc0 - yb0) + xb0 * yb2 + xc0 * yc2
        ga = xb0 * yb1 - xb1 * yb0 + xc0 * yc1 - xc1 * yc0
        a2b2 = al * al + be * be
        sinth = ((al * ga - be * jnp.sqrt(jnp.maximum(a2b2 - ga * ga, 0.0)))
                 / a2b2)
        costh = jnp.sqrt(jnp.maximum(1.0 - sinth * sinth, 0.0))

        xa3 = -ya2 * sinth
        ya3 = ya2 * costh
        za3 = ra_r * sinphi
        xb3 = xb2 * costh - yb2 * sinth
        yb3 = xb2 * sinth + yb2 * costh
        zb3 = -rb_r * sinphi + rc_r * sinpsi * cosphi
        xc3 = -xb2 * costh - yc2 * sinth
        yc3 = -xb2 * sinth + yc2 * costh
        zc3 = -rb_r * sinphi - rc_r * sinpsi * cosphi

        def unrot(x, y, z):                       # primed -> world + COM
            return ex * x + ey * y + ez * z + com

        a = unrot(xa3, ya3, za3)
        b = unrot(xb3, yb3, zb3)
        c = unrot(xc3, yc3, zc3)
        return jnp.concatenate([a, b, c], axis=0).T.reshape(-1, 3)

    _, project_velocities = _make_dense_triangle_constrainer(
        pairs, dists, masses, 1, dtype)
    return project_positions, project_velocities


def _make_gather_constrainer(pairs, dists, masses, iterations, dtype,
                             mask=None):
    """Build position/velocity constraint projectors.

    pairs: (M, C, 2) int — per-cluster constraint atom pairs (clusters of
    up to C coupled constraints; C == 3 covers rigid 3-site water: O-H1,
    O-H2, H1-H2, and uses a closed-form 3x3 solve; larger C uses a batched
    LU solve).  dists: (M, C) target distances.  mask: optional (M, C) with
    0.0 marking padded (inert) constraint rows in clusters of fewer than C
    constraints.  Returns (project_positions, project_velocities):

    project_positions(pos_ref, pos_new) -> pos_constrained
    project_velocities(pos, vel) -> vel_constrained
    """
    pairs = np.asarray(pairs, dtype=np.int32)
    if pairs.ndim != 3:
        pairs = pairs.reshape(-1, 3, 2)
    m, width = pairs.shape[0], pairs.shape[1]
    if width == 3:
        solve = _solve3
    else:
        # minimum-norm least-squares: wide clusters are often redundant
        # (rigid CH4 = 10 distance constraints on 9 rigid-body-removed DOF),
        # making the Newton matrix singular but the system consistent
        def solve(A, b):
            return jnp.einsum("...kl,...l->...k", jnp.linalg.pinv(A), b)
    np_dt = np.dtype(jnp.dtype(dtype).name)
    i_idx = pairs[..., 0]                    # (M, C)
    j_idx = pairs[..., 1]
    d2 = (np.asarray(dists, dtype=np.float64).reshape(m, width) ** 2
          ).astype(np_dt)
    inv_mass = np.where(np.asarray(masses) > 0,
                        1.0 / np.maximum(np.asarray(masses), 1e-300), 0.0)
    im_i = inv_mass.astype(np_dt)[i_idx]     # (M, C)
    im_j = inv_mass.astype(np_dt)[j_idx]

    # coupling sparsity: S[k, l] = +invm on shared atoms with sign from
    # orientation — precompute per cluster as (M, C, C) scalar factors
    s = np.zeros((m, width, width))
    for k in range(width):
        for l in range(width):
            ik, jk = pairs[:, k, 0], pairs[:, k, 1]
            il, jl = pairs[:, l, 0], pairs[:, l, 1]
            s[:, k, l] = (inv_mass[ik] * (ik == il) - inv_mass[ik] * (ik == jl)
                          - inv_mass[jk] * (jk == il)
                          + inv_mass[jk] * (jk == jl))
    s_mat = s.astype(np_dt)
    if mask is not None:
        # padded rows: unit diagonal + zero rhs -> lambda = 0 (inert), and
        # zero coupling so they never perturb the real constraints
        mask = np.asarray(mask, dtype=np.float64).reshape(m, width)
        mm = (mask[:, :, None] * mask[:, None, :]).astype(np_dt)
        jfill = (np.eye(width)[None] * (1.0 - mask[:, :, None])).astype(np_dt)
        row_mask = mask.astype(np_dt)
        # zero the padded pairs' inverse masses so _apply_lambda is a no-op
        # for them even with nonzero lambda round-off
        im_i = im_i * row_mask
        im_j = im_j * row_mask
    else:
        mm = jfill = row_mask = None

    def _mask_J(J):
        return J if mm is None else J * mm + jfill

    def _mask_rhs(r):
        return r if row_mask is None else r * row_mask

    def _apply_lambda(pos, lam, r_dir):
        """pos -= invM * sum_k lam_k * grad sigma_k (grad = 2 r_dir)."""
        dp_i = (lam * 2.0)[..., None] * r_dir * im_i[..., None]   # (M, 3, 3)
        dp_j = -(lam * 2.0)[..., None] * r_dir * im_j[..., None]
        flat_idx = jnp.concatenate([i_idx.reshape(-1), j_idx.reshape(-1)])
        flat_dp = jnp.concatenate([dp_i.reshape(-1, 3), dp_j.reshape(-1, 3)])
        return pos.at[flat_idx].add(-flat_dp.astype(pos.dtype))

    def project_positions(pos_ref, pos_new):
        """Iteratively restore |r_ij| = d using reference directions."""
        r_ref = pos_ref[i_idx] - pos_ref[j_idx]       # (M, 3, 3)

        def body(_, pos):
            r_now = pos[i_idx] - pos[j_idx]
            sigma = jnp.sum(r_now * r_now, axis=-1) - d2          # (M, 3)
            # J[k, l] = 4 * s[k, l] * (r_now_k . r_ref_l)
            dots = jnp.einsum("mkx,mlx->mkl", r_now, r_ref)
            J = _mask_J(4.0 * s_mat * dots)
            lam = solve(J, _mask_rhs(sigma))
            return _apply_lambda(pos, lam, r_ref)

        return jax.lax.fori_loop(0, iterations, body, pos_new)

    def project_velocities(pos, vel):
        """RATTLE stage: remove velocity components along constraints."""
        r_now = pos[i_idx] - pos[j_idx]
        v_rel = vel[i_idx] - vel[j_idx]
        rhs = _mask_rhs(jnp.sum(r_now * v_rel, axis=-1))          # (M, 3)
        dots = jnp.einsum("mkx,mlx->mkl", r_now, r_now)
        J = _mask_J(s_mat * dots)
        lam = solve(J, rhs)
        dv_i = lam[..., None] * r_now * im_i[..., None]
        dv_j = -lam[..., None] * r_now * im_j[..., None]
        flat_idx = jnp.concatenate([i_idx.reshape(-1), j_idx.reshape(-1)])
        flat_dv = jnp.concatenate([dv_i.reshape(-1, 3), dv_j.reshape(-1, 3)])
        # the mixed path solves at f64 but carries f32 velocities — cast
        # the correction explicitly (implicit downcast scatters error out
        # in future JAX)
        return vel.at[flat_idx].add(-flat_dv.astype(vel.dtype))

    return project_positions, project_velocities
