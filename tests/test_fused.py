"""Fused prepare/apply engine vs the all-pairs oracle (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops import engine as engine_mod
from nonbondedslicing_tpu.ops import fused
from nonbondedslicing_tpu.ops import plan as plan_mod
from nonbondedslicing_tpu.ops.params import slice_lambdas


def _system(method, n_mol=400, box=4.8, seed=2, nsub=3):
    rng = np.random.default_rng(seed)
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(nsub)
    force.setNonbondedMethod(method)
    force.setCutoffDistance(0.9)
    n = 2 * n_mol
    positions = rng.random((n, 3)) * box
    for k in range(n_mol):
        system.addParticle(16.0)
        system.addParticle(1.0)
        force.addParticle(-0.5, 0.31, 0.6)
        force.addParticle(0.5, 0.1, 0.05)
        # keep the excluded pair bonded-range
        positions[2 * k + 1] = positions[2 * k] + rng.normal(scale=0.03, size=3)
        force.addException(2 * k, 2 * k + 1, 0.0, 1.0, 0.0)
        force.setParticleSubset(2 * k, k % nsub)
        force.setParticleSubset(2 * k + 1, (k + 1) % nsub)
    force.addGlobalParameter("lam01", 0.8)
    force.addScalingParameter("lam01", 0, 1, True, True)
    system.addForce(force)
    return system, force, positions


@pytest.mark.parametrize("method", [
    nbs.SlicedNonbondedForce.CutoffPeriodic,
    nbs.SlicedNonbondedForce.PME,
    nbs.SlicedNonbondedForce.LJPME,
])
def test_fused_matches_all_pairs_oracle(method):
    system, force, positions = _system(method)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    pos = jnp.asarray(positions, dtype)
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()), dtype)
    gvals = jnp.asarray([0.8], dtype)

    oracle = engine_mod.make_compute(plan, True, True, neighbor="all_pairs")
    e_o, f_o = oracle(pos, box, gvals, data)

    out = fused.make_fused_engine(plan, interpret=True)
    assert out is not None, "fused engine must apply to this system"
    prepare, apply, cfg = out
    state = prepare(pos, box, gvals, data)
    e_f, f_f, aux = apply(pos, box, gvals, data, state)
    assert int(aux["overflow"]) == 0
    assert float(aux["maxdisp2"]) == 0.0

    scale = float(jnp.max(jnp.abs(e_o))) + 1.0
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_o),
                               atol=2e-4 * scale)
    fscale = float(jnp.max(jnp.abs(f_o))) + 1.0
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_o),
                               atol=2e-4 * fscale)


def test_fused_reuse_under_drift():
    """State prepared at pos0 must stay valid for positions drifted by less
    than the skin/window margin."""
    system, force, positions = _system(nbs.SlicedNonbondedForce.PME)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    pos0 = jnp.asarray(positions, dtype)
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()), dtype)
    gvals = jnp.asarray([0.8], dtype)

    out = fused.make_fused_engine(plan, interpret=True)
    prepare, apply, cfg = out
    assert cfg["skin"] > 0
    rng = np.random.default_rng(5)
    # coherent per-molecule drift below skin/2 (exclusion pairs move together)
    drift_mol = rng.uniform(-1, 1, (positions.shape[0] // 2, 3))
    drift_mol *= 0.45 * cfg["skin"] / np.linalg.norm(drift_mol, axis=1).max()
    pos1 = pos0 + jnp.asarray(np.repeat(drift_mol, 2, axis=0), dtype)

    state = prepare(pos0, box, gvals, data)
    e_r, f_r, aux = apply(pos1, box, gvals, data, state)
    assert float(aux["maxdisp2"]) <= (cfg["skin"] / 2) ** 2 + 1e-12

    # oracle at the drifted positions
    oracle = engine_mod.make_compute(plan, True, True, neighbor="all_pairs")
    e_o, f_o = oracle(pos1, box, gvals, data)
    scale = float(jnp.max(jnp.abs(e_o))) + 1.0
    np.testing.assert_allclose(np.asarray(e_r), np.asarray(e_o),
                               atol=2e-4 * scale)
    fscale = float(jnp.max(jnp.abs(f_o))) + 1.0
    np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_o),
                               atol=2e-4 * fscale)


def _water_system(n_mol=150, box=4.8, seed=7, nsub=3):
    """Rigid-water-style triples whose exclusions are contiguous triangles —
    this selects the production path (row-layout exclusion corrections ->
    fuse_exclusions=False -> images_preshifted=True in the fused engine)."""
    rng = np.random.default_rng(seed)
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(nsub)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.setCutoffDistance(0.9)
    # lattice placement: random placement creates overlapping pairs with
    # ~1e8 forces that swamp any relative force tolerance
    grid = int(np.ceil(n_mol ** (1 / 3)))
    sites = np.stack(np.meshgrid(*[np.arange(grid)] * 3,
                                 indexing="ij"), -1).reshape(-1, 3)
    sites = (sites[:n_mol] + 0.5) * (box / grid)
    positions = np.empty((3 * n_mol, 3))
    for m in range(n_mol):
        system.addParticle(16.0)
        system.addParticle(1.0)
        system.addParticle(1.0)
        force.addParticle(-0.8, 0.31, 0.6)
        force.addParticle(0.4, 0.1, 0.05)
        force.addParticle(0.4, 0.1, 0.05)
        o = sites[m] + rng.normal(scale=0.03, size=3)
        positions[3 * m] = o
        positions[3 * m + 1] = o + rng.normal(scale=0.06, size=3)
        positions[3 * m + 2] = o + rng.normal(scale=0.06, size=3)
        for a, b in ((0, 1), (0, 2), (1, 2)):
            force.addException(3 * m + a, 3 * m + b, 0.0, 1.0, 0.0)
        for a in range(3):
            force.setParticleSubset(3 * m + a, (m + a) % nsub)
    force.addGlobalParameter("lam01", 0.8)
    force.addScalingParameter("lam01", 0, 1, True, True)
    system.addForce(force)
    return system, force, positions


def test_fused_preshift_face_crossing_during_reuse():
    """Regression: an atom crossing a periodic box face during the reuse
    window must keep its prepare-time image on the preshifted path.
    (Previously apply() re-wrapped positions each step while the cell
    assignment stayed frozen, so the crossing atom's pairs got r ~ L and
    were silently dropped: ~70% force error with all guards green.)"""
    system, force, positions = _water_system()
    plan = plan_mod.build_plan(force, system)
    assert len(plan.exclusion_pairs) == 3 * (positions.shape[0] // 3)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()), dtype)
    gvals = jnp.asarray([0.8], dtype)

    # put molecule 0 just inside the x=0 face, pointing inward
    positions[0] = [0.005, 2.0, 2.0]
    positions[1] = [0.08, 2.05, 2.0]
    positions[2] = [0.08, 1.95, 2.0]
    pos0 = jnp.asarray(positions, dtype)

    out = fused.make_fused_engine(plan, cell_capacity=32, interpret=True)
    prepare, apply, cfg = out
    state = prepare(pos0, box, gvals, data)
    # drift the molecule across the face (x of atom 0: 0.005 -> -0.015),
    # well under the skin/2 guard
    drift = np.zeros_like(positions)
    drift[0:3, 0] = -0.02
    pos1 = pos0 + jnp.asarray(drift, dtype)
    e_r, f_r, aux = apply(pos1, box, gvals, data, state)
    assert float(aux["maxdisp2"]) <= (cfg["skin"] / 2) ** 2 + 1e-12
    assert int(state["overflow"]) == 0

    oracle = engine_mod.make_compute(plan, True, True, neighbor="all_pairs")
    e_o, f_o = oracle(pos1, box, gvals, data)
    scale = float(jnp.max(jnp.abs(e_o))) + 1.0
    np.testing.assert_allclose(np.asarray(e_r), np.asarray(e_o),
                               atol=2e-3 * scale)
    # pre-fix the crossing atom's error was ~100% of fmax (371 vs 365);
    # post-fix it is ~5e-4 relative (f32 path vs f32 all-pairs oracle)
    fscale = float(jnp.max(jnp.abs(f_o))) + 1.0
    np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_o),
                               atol=2e-3 * fscale)


def test_fused_overflow_reported():
    """Cramming atoms into one cell must be reported, not silently dropped."""
    system, force, positions = _system(nbs.SlicedNonbondedForce.PME,
                                       n_mol=300)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()), dtype)
    gvals = jnp.asarray([0.8], dtype)
    # all atoms into one cell corner
    pos = jnp.asarray(np.random.default_rng(0).random((600, 3)) * 0.4, dtype)
    out = fused.make_fused_engine(plan, interpret=True)
    prepare, apply, cfg = out
    state = prepare(pos, box, gvals, data)
    assert int(state["overflow"]) > 0


def test_fused_matches_oracle_bare_ewald():
    """The fused engine's bare-Ewald (k-space sum) branch vs the oracle."""
    system, force, positions = _system(nbs.SlicedNonbondedForce.Ewald,
                                       n_mol=250, box=4.2)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    pos = jnp.asarray(positions, dtype)
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()), dtype)
    gvals = jnp.asarray([0.8], dtype)
    oracle = engine_mod.make_compute(plan, True, True, neighbor="all_pairs")
    e_o, f_o = oracle(pos, box, gvals, data)
    out = fused.make_fused_engine(plan, interpret=True)
    assert out is not None
    prepare, apply, cfg = out
    state = prepare(pos, box, gvals, data)
    e_f, f_f, aux = apply(pos, box, gvals, data, state)
    scale = float(jnp.max(jnp.abs(e_o))) + 1.0
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_o),
                               atol=2e-4 * scale)
    fscale = float(jnp.max(jnp.abs(f_o))) + 1.0
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_o),
                               atol=2e-4 * fscale)


def test_fused_coarse_bricks_match_oracle():
    """cells != bricks regrouping path (round 5): at > 6 cells per axis the
    brick heuristic groups multiple cells per PME brick (_brick_counts caps
    bricks at ~6/axis; the 100k bench runs (10,10,10) cells with (5,5,5)
    bricks).  Exercise _cells_to_bricks/_bricks_to_cells + the multi-cell
    brick spread/interp against the all-pairs oracle on an 8-cells-per-axis
    box, which no smaller test reaches."""
    box = 8.2            # 8 cells of 1.025 nm at cutoff 0.9 + skin 0.1
    system, force, positions = _system(nbs.SlicedNonbondedForce.PME,
                                       n_mol=500, box=box)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    pos = jnp.asarray(positions, dtype)
    box_arr = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()),
                          dtype)
    gvals = jnp.asarray([0.8], dtype)

    out = fused.make_fused_engine(plan, interpret=True, target_skin=0.1,
                                  cell_capacity=24)
    assert out is not None
    prepare, apply, cfg = out
    assert cfg["counts"] == (8, 8, 8)
    assert cfg["bricks"] == (4, 4, 4), cfg["bricks"]   # heuristic: <= 6/axis
    state = prepare(pos, box_arr, gvals, data)
    e_f, f_f, aux = apply(pos, box_arr, gvals, data, state)
    assert int(aux["overflow"]) == 0

    oracle = engine_mod.make_compute(plan, True, True, neighbor="all_pairs")
    e_o, f_o = oracle(pos, box_arr, gvals, data)
    scale = float(jnp.max(jnp.abs(e_o))) + 1.0
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_o),
                               atol=2e-4 * scale)
    fscale = float(jnp.max(jnp.abs(f_o))) + 1.0
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_o),
                               atol=2e-4 * fscale)
