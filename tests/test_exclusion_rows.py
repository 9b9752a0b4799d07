"""Row-layout exclusion corrections vs the generic pair-list oracle."""

import jax.numpy as jnp
import numpy as np

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops import bonded, engine as engine_mod
from nonbondedslicing_tpu.ops import fused, plan as plan_mod
from nonbondedslicing_tpu.utils.indexing import slice_pair_table


def test_rows_match_generic_pass():
    rng = np.random.default_rng(5)
    m = 80
    n = 3 * m
    positions = jnp.asarray(rng.random((n, 3)) * 3.0)
    charge = jnp.asarray(rng.normal(size=n))
    sig_half = jnp.asarray(0.1 + 0.2 * rng.random(n))
    eps2 = jnp.asarray(rng.random(n))
    subsets = jnp.asarray(rng.integers(0, 3, n), dtype=jnp.int32)
    sl_tab = jnp.asarray(slice_pair_table(3).astype(np.int32))
    lam_c = jnp.asarray(rng.random(6))
    lam_v = jnp.asarray(rng.random(6))
    pairs = np.concatenate([np.stack([
        [3 * k, 3 * k + 1], [3 * k, 3 * k + 2], [3 * k + 1, 3 * k + 2]])
        for k in range(m)]).astype(np.int32)
    assert bonded.triangle_exclusions(pairs, n) is not None

    box = jnp.asarray(np.diag([3.0, 3.0, 3.0]))
    e_o, f_o = bonded.exclusion_corrections(
        positions, box, jnp.asarray(pairs), charge, sig_half, eps2, subsets,
        sl_tab, lam_c, lam_v, alpha=2.7, periodic_exceptions=False,
        ljpme=True, dispersion_alpha=2.0, num_slices=6, num_particles=n)

    sub3 = subsets.reshape(m, 3)
    pair_slices = jnp.stack([sl_tab[sub3[:, 0], sub3[:, 1]],
                             sl_tab[sub3[:, 0], sub3[:, 2]],
                             sl_tab[sub3[:, 1], sub3[:, 2]]], axis=1)
    e_r, f_r = bonded.exclusion_corrections_rows(
        positions, charge, sig_half, eps2, pair_slices, lam_c, lam_v,
        alpha=2.7, ljpme=True, dispersion_alpha=2.0, num_slices=6)

    np.testing.assert_allclose(np.asarray(e_r), np.asarray(e_o),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_o),
                               rtol=1e-9, atol=1e-12)


def test_triangle_detection_rejects_non_water():
    pairs = np.array([[0, 1], [0, 2], [1, 2], [3, 4], [3, 5], [4, 6]],
                     dtype=np.int32)
    assert bonded.triangle_exclusions(pairs, 7) is None
    assert bonded.triangle_exclusions(np.zeros((0, 2), np.int32), 4) is None


def test_fused_engine_water_pattern_matches_oracle():
    """Fused engine with the auto-selected row-exclusion path vs all-pairs."""
    rng = np.random.default_rng(9)
    m = 220
    n = 3 * m
    box = 4.0
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(2)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.setCutoffDistance(0.9)
    positions = np.zeros((n, 3))
    for k in range(m):
        o = 3 * k
        c = rng.random(3) * box
        positions[o] = c
        positions[o + 1] = c + rng.normal(scale=0.02, size=3)
        positions[o + 2] = c + rng.normal(scale=0.02, size=3)
        system.addParticle(16.0)
        system.addParticle(1.0)
        system.addParticle(1.0)
        force.addParticle(-0.8, 0.31, 0.6)
        force.addParticle(0.4, 0.05, 0.1)
        force.addParticle(0.4, 0.05, 0.1)
        for a, b in ((o, o + 1), (o, o + 2), (o + 1, o + 2)):
            force.addException(a, b, 0, 1, 0)
        for a in range(3):
            force.setParticleSubset(o + a, k % 2)
    force.addGlobalParameter("lam", 0.6)
    force.addScalingParameter("lam", 0, 1, True, True)
    system.addForce(force)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    pos = jnp.asarray(positions, dtype)
    box_arr = jnp.asarray(np.diag([box] * 3), dtype)
    gvals = jnp.asarray([0.6], dtype)

    oracle = engine_mod.make_compute(plan, True, True, neighbor="all_pairs")
    e_o, f_o = oracle(pos, box_arr, gvals, data)
    out = fused.make_fused_engine(plan, interpret=True)
    prepare, apply, cfg = out
    state = prepare(pos, box_arr, gvals, data)
    e_f, f_f, aux = apply(pos, box_arr, gvals, data, state)
    scale = float(jnp.max(jnp.abs(e_o))) + 1.0
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_o),
                               atol=2e-4 * scale)
    fscale = float(jnp.max(jnp.abs(f_o))) + 1.0
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_o),
                               atol=2e-4 * fscale)
