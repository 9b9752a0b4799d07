"""M-SHAKE / RATTLE constraint projector unit tests."""

import numpy as np
import jax.numpy as jnp

from nonbondedslicing_tpu.runtime.constraints import make_constrainer

D_OH = 0.09572
D_HH = 0.15139


def _waters(n_mol, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.zeros((3 * n_mol, 3))
    pairs = []
    dists = []
    masses = np.tile([15.999, 1.008, 1.008], n_mol)
    for k in range(n_mol):
        o = 3 * k
        center = rng.random(3) * 3.0
        # exact rigid geometry, randomly oriented
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        perp = np.cross(axis, rng.normal(size=3))
        perp /= np.linalg.norm(perp)
        half = D_HH / 2
        h = np.sqrt(D_OH ** 2 - half ** 2)
        pos[o] = center
        pos[o + 1] = center + h * axis + half * perp
        pos[o + 2] = center + h * axis - half * perp
        pairs.append([[o, o + 1], [o, o + 2], [o + 1, o + 2]])
        dists.append([D_OH, D_OH, D_HH])
    return pos, np.asarray(pairs), np.asarray(dists), masses


def test_positions_restored_to_constraints():
    pos0, pairs, dists, masses = _waters(40)
    proj_x, proj_v = make_constrainer(pairs, dists, masses, len(masses),
                                      iterations=12, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    pos1 = pos0 + rng.normal(scale=0.004, size=pos0.shape)  # ~ a 2 fs kick
    pos_c = np.asarray(proj_x(jnp.asarray(pos0), jnp.asarray(pos1)))
    i = pairs[..., 0].reshape(-1)
    j = pairs[..., 1].reshape(-1)
    d = np.linalg.norm(pos_c[i] - pos_c[j], axis=-1)
    np.testing.assert_allclose(d, dists.reshape(-1), rtol=1e-8)
    # the correction must be small (projection, not a jump)
    assert np.max(np.abs(pos_c - pos1)) < 0.02


def test_settle_matches_converged_mshake():
    """The closed-form SETTLE projection (auto-dispatched for isoceles
    triangle clusters) equals the converged M-SHAKE solution of the same
    Lagrange equations to machine precision (Miyamoto & Kollman 1992:
    SETTLE is the analytic SHAKE solution for rigid water)."""
    from nonbondedslicing_tpu.runtime.constraints import (
        _make_dense_settle_constrainer, _make_dense_triangle_constrainer)

    pos0, pairs, dists, masses = _waters(50, seed=5)
    rng = np.random.default_rng(6)
    pos1 = pos0 + rng.normal(scale=0.004, size=pos0.shape)
    pp_s, _ = _make_dense_settle_constrainer(pairs, dists, masses,
                                             jnp.float64)
    pp_m, _ = _make_dense_triangle_constrainer(pairs, dists, masses, 60,
                                               jnp.float64)
    out_s = np.asarray(pp_s(jnp.asarray(pos0), jnp.asarray(pos1)))
    out_m = np.asarray(pp_m(jnp.asarray(pos0), jnp.asarray(pos1)))
    np.testing.assert_allclose(out_s, out_m, atol=1e-12)
    # per-molecule momentum identical to the unconstrained update
    dp = (out_s - pos1).reshape(-1, 3, 3)
    m3 = masses.reshape(-1, 3)
    np.testing.assert_allclose(np.einsum("mi,mix->mx", m3, dp), 0.0,
                               atol=1e-12)
    # auto-dispatch: water geometry (isoceles, contiguous) picks SETTLE
    proj_x, _ = make_constrainer(pairs, dists, masses, len(masses),
                                 dtype=jnp.float64)
    out_auto = np.asarray(proj_x(jnp.asarray(pos0), jnp.asarray(pos1)))
    np.testing.assert_allclose(out_auto, out_s, atol=0.0)


def test_position_projection_conserves_momentum():
    pos0, pairs, dists, masses = _waters(10, seed=3)
    proj_x, _ = make_constrainer(pairs, dists, masses, len(masses),
                                 iterations=12, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    pos1 = pos0 + rng.normal(scale=0.003, size=pos0.shape)
    pos_c = np.asarray(proj_x(jnp.asarray(pos0), jnp.asarray(pos1)))
    p_before = (masses[:, None] * pos1).sum(0)
    p_after = (masses[:, None] * pos_c).sum(0)
    np.testing.assert_allclose(p_after, p_before, atol=1e-10)


def test_velocities_projected_off_constraints():
    pos0, pairs, dists, masses = _waters(25, seed=5)
    _, proj_v = make_constrainer(pairs, dists, masses, len(masses),
                                 iterations=12, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    vel = rng.normal(scale=1.5, size=pos0.shape)
    vel_c = np.asarray(proj_v(jnp.asarray(pos0), jnp.asarray(vel)))
    i = pairs[..., 0].reshape(-1)
    j = pairs[..., 1].reshape(-1)
    r = pos0[i] - pos0[j]
    proj = np.sum(r * (vel_c[i] - vel_c[j]), axis=-1)
    scale = np.abs(np.sum(r * (vel[i] - vel[j]), axis=-1)).max()
    assert np.max(np.abs(proj)) < 1e-10 * max(scale, 1.0)
    # momentum conserved
    np.testing.assert_allclose((masses[:, None] * vel_c).sum(0),
                               (masses[:, None] * vel).sum(0), atol=1e-10)


def test_gather_path_matches_dense_path():
    """Non-contiguous cluster indexing must give the same projection as the
    dense contiguous fast path."""
    pos0, pairs, dists, masses = _waters(12, seed=7)
    rng = np.random.default_rng(8)
    pos1 = pos0 + rng.normal(scale=0.003, size=pos0.shape)
    proj_dense, _ = make_constrainer(pairs, dists, masses, len(masses),
                                     iterations=12, dtype=jnp.float64)
    out_dense = np.asarray(proj_dense(jnp.asarray(pos0), jnp.asarray(pos1)))

    # permute atoms -> generic gather path
    perm = rng.permutation(len(masses))
    inv = np.argsort(perm)
    pairs_p = inv[pairs]
    proj_g, _ = make_constrainer(pairs_p, dists, masses[perm], len(masses),
                                 iterations=12, dtype=jnp.float64)
    out_g = np.asarray(proj_g(jnp.asarray(pos0[perm]), jnp.asarray(pos1[perm])))
    np.testing.assert_allclose(out_g[inv], out_dense, atol=1e-12)


def test_cluster_constraints_padding_and_wide_clusters():
    from nonbondedslicing_tpu.runtime.constraints import cluster_constraints

    assert cluster_constraints([], 10) is None
    # one lone pair + one triangle -> two clusters, the first padded
    cons = [(4, 5, 0.1),
            (0, 1, 0.09572), (0, 2, 0.09572), (1, 2, 0.15139)]
    pairs, dists, mask = cluster_constraints(cons, 6)
    assert pairs.shape == (2, 3, 2) and mask.shape == (2, 3)
    by_count = sorted(mask.sum(axis=1))
    assert by_count == [1.0, 3.0]
    # a 4-constraint coupled cluster widens every cluster to C=4
    wide = [(0, 1, 0.1), (1, 2, 0.1), (2, 3, 0.1), (3, 0, 0.1),
            (5, 6, 0.2)]
    pairs, dists, mask = cluster_constraints(wide, 7)
    assert pairs.shape == (2, 4, 2) and mask.shape == (2, 4)
    assert sorted(mask.sum(axis=1)) == [1.0, 4.0]


def test_wide_cluster_projection_rigid_methane():
    """Rigid CH4 (4 C-H + 6 H-H = 10 coupled constraints) — the cluster
    shape the reference handles via OpenMM core's SHAKE/CCMA
    (/root/reference relies on OpenMM for constraints).  Exercises the
    batched (C x C) Newton solve for C > 3."""
    from nonbondedslicing_tpu.runtime.constraints import cluster_constraints

    d_ch = 0.1087
    # tetrahedral H positions around C at origin
    verts = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                     dtype=np.float64)
    verts *= d_ch / np.sqrt(3.0)
    d_hh = float(np.linalg.norm(verts[0] - verts[1]))
    n_mol = 6
    rng = np.random.default_rng(9)
    masses = np.tile([12.011] + [1.008] * 4, n_mol)
    pos0 = np.zeros((5 * n_mol, 3))
    cons = []
    for m in range(n_mol):
        c = 5 * m
        center = rng.random(3) * 3.0
        # random rotation via QR keeps the geometry exactly rigid
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        pos0[c] = center
        pos0[c + 1:c + 5] = center + verts @ q.T
        for a in range(4):
            cons.append((c, c + 1 + a, d_ch))
        for a in range(4):
            for b in range(a + 1, 4):
                cons.append((c + 1 + a, c + 1 + b, d_hh))
    pairs, dists, mask = cluster_constraints(cons, len(masses))
    assert pairs.shape[1] == 10
    proj_x, proj_v = make_constrainer(pairs, dists, masses, len(masses),
                                      iterations=16, dtype=jnp.float64,
                                      mask=mask)
    pos1 = pos0 + rng.normal(scale=0.002, size=pos0.shape)
    pos_c = np.asarray(proj_x(jnp.asarray(pos0), jnp.asarray(pos1)))
    i = pairs[..., 0].reshape(-1)
    j = pairs[..., 1].reshape(-1)
    d = np.linalg.norm(pos_c[i] - pos_c[j], axis=-1)
    sel = mask.reshape(-1) > 0
    np.testing.assert_allclose(d[sel], np.asarray(dists).reshape(-1)[sel],
                               rtol=1e-8)
    # momentum conserved, projection small
    np.testing.assert_allclose((masses[:, None] * pos_c).sum(0),
                               (masses[:, None] * pos1).sum(0), atol=1e-10)
    assert np.max(np.abs(pos_c - pos1)) < 0.01
    # RATTLE stage removes all constraint-direction velocity components
    vel = rng.normal(scale=1.0, size=pos0.shape)
    vel_c = np.asarray(proj_v(jnp.asarray(pos_c), jnp.asarray(vel)))
    r = pos_c[i] - pos_c[j]
    proj = np.abs(np.sum(r * (vel_c[i] - vel_c[j]), axis=-1))
    assert np.max(proj[sel]) < 1e-10


def test_padded_cluster_projection():
    """A lone-pair cluster (padded to the 3x3 block) must satisfy its
    constraint without perturbing anything else."""
    masses = np.array([12.0, 1.008, 12.0, 1.008])
    pairs = np.array([[[0, 1], [0, 0], [0, 0]],
                      [[2, 3], [0, 0], [0, 0]]])
    dists = np.array([[0.109, 0.0, 0.0], [0.109, 0.0, 0.0]])
    mask = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    pos0 = np.array([[0.0, 0.0, 0.0], [0.109, 0.0, 0.0],
                     [1.0, 0.0, 0.0], [1.0, 0.109, 0.0]])
    proj_x, proj_v = make_constrainer(pairs, dists, masses, 4,
                                      iterations=12, dtype=jnp.float64,
                                      mask=mask)
    rng = np.random.default_rng(3)
    pos1 = pos0 + rng.normal(scale=0.004, size=pos0.shape)
    pos_c = np.asarray(proj_x(jnp.asarray(pos0), jnp.asarray(pos1)))
    for (i, j) in ((0, 1), (2, 3)):
        np.testing.assert_allclose(np.linalg.norm(pos_c[i] - pos_c[j]),
                                   0.109, rtol=1e-9)
    vel = rng.normal(scale=1.0, size=pos0.shape)
    vel_c = np.asarray(proj_v(jnp.asarray(pos_c), jnp.asarray(vel)))
    for (i, j) in ((0, 1), (2, 3)):
        r = pos_c[i] - pos_c[j]
        assert abs(np.dot(r, vel_c[i] - vel_c[j])) < 1e-10


def test_context_step_applies_system_constraints():
    """Regression: integrator.step() must honor System.addConstraint on
    every integration path (previously both the fused fast path and the
    host fallback silently integrated unconstrained)."""
    import nonbondedslicing_tpu as nbs

    d0 = 0.12
    system = nbs.System()
    force = nbs.SlicedNonbondedForce(1)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.NoCutoff)
    rng = np.random.default_rng(11)
    n_mol = 8
    positions = []
    for m in range(n_mol):
        a = system.addParticle(12.0)
        b = system.addParticle(1.008)
        force.addParticle(-0.2, 0.3, 0.5)
        force.addParticle(0.2, 0.1, 0.05)
        force.addException(a, b, 0.0, 1.0, 0.0)
        system.addConstraint(a, b, d0)
        o = np.array([m % 2, (m // 2) % 2, m // 4]) * 1.2 + 0.3
        positions.append(o + rng.normal(scale=0.02, size=3))
        positions.append(o + [d0, 0.0, 0.0])
    system.addForce(force)
    integ = nbs.VerletIntegrator(0.001)
    ctx = nbs.Context(system, integ)
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=1)
    integ.step(20)
    pos = np.asarray(ctx.getState(getPositions=True).getPositions())
    d = np.linalg.norm(pos[0::2] - pos[1::2], axis=-1)
    # unconstrained integration drifts these by ~10-50%; the f32 M-SHAKE
    # path holds them to ~1e-4
    np.testing.assert_allclose(d, d0, rtol=1e-3)
