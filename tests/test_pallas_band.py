"""Z-band direct-space kernel vs the all-pairs oracle (CPU interpret mode).

Same parity strategy as test_fused.py (the reference validates platform
kernels against its Reference platform, TestSlicedNonbondedForce.h): the
band-structured fused engine must reproduce the all-pairs engine bit-tight
in f32, stay valid under sub-skin drift including z-face crossings, and
raise on window overflow instead of dropping pairs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops import engine as engine_mod
from nonbondedslicing_tpu.ops import fused
from nonbondedslicing_tpu.ops import pallas_band
from nonbondedslicing_tpu.ops import plan as plan_mod

from test_fused import _system as _system_fused


def _system(method, n_mol=600, box=3.8, seed=2, nsub=3):
    """Denser than test_fused's system: the band structure needs columns
    populated enough that an R-row band spans well under Lz - 2*reach
    (band_config rejects sparse gases)."""
    return _system_fused(method, n_mol=n_mol, box=box, seed=seed, nsub=nsub)


def _band_engine(plan, monkeypatch, energies=True, window_scale=1.0):
    monkeypatch.setenv("NBS_BAND_KERNEL", "1")
    out = fused.make_fused_engine(plan, interpret=True, energies=energies,
                                  band_window_scale=window_scale)
    assert out is not None and "band" in out[2], \
        "band engine must apply to this system"
    return out


@pytest.mark.parametrize("method", [
    nbs.SlicedNonbondedForce.CutoffPeriodic,
    nbs.SlicedNonbondedForce.PME,
    nbs.SlicedNonbondedForce.LJPME,
])
def test_band_matches_all_pairs_oracle(method, monkeypatch):
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

    prepare, apply, cfg = _band_engine(plan, monkeypatch)
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


def test_band_reuse_under_drift_with_z_crossing(monkeypatch):
    """Prepare-time windows must stay exact for drift below skin/2 — in
    particular for molecules crossing the z periodic face (ghost bands)."""
    system, force, positions = _system(nbs.SlicedNonbondedForce.PME)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    box_np = np.array(system.getDefaultPeriodicBoxVectors())
    # put some molecules right at the z faces so drift crosses them
    n = positions.shape[0]
    rng = np.random.default_rng(7)
    for k in rng.choice(n // 2, 20, replace=False):
        z_face = 0.0 if k % 2 else box_np[2, 2]
        positions[2 * k, 2] = z_face + rng.normal(scale=0.01)
        positions[2 * k + 1] = positions[2 * k] + rng.normal(scale=0.03,
                                                             size=3)
    pos0 = jnp.asarray(positions, dtype)
    box = jnp.asarray(box_np, dtype)
    gvals = jnp.asarray([0.8], dtype)

    prepare, apply, cfg = _band_engine(plan, monkeypatch)
    assert cfg["skin"] > 0
    drift_mol = rng.uniform(-1, 1, (n // 2, 3))
    drift_mol *= 0.45 * cfg["skin"] / np.linalg.norm(drift_mol, axis=1).max()
    pos1 = pos0 + jnp.asarray(np.repeat(drift_mol, 2, axis=0), dtype)

    state = prepare(pos0, box, gvals, data)
    assert int(state["overflow"]) == 0
    e_f, f_f, aux = apply(pos1, box, gvals, data, state)
    assert float(aux["maxdisp2"]) <= (0.5 * cfg["skin"]) ** 2 + 1e-12

    oracle = engine_mod.make_compute(plan, True, True, neighbor="all_pairs")
    e_o, f_o = oracle(pos1, box, gvals, data)
    scale = float(jnp.max(jnp.abs(e_o))) + 1.0
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_o),
                               atol=2e-4 * scale)
    fscale = float(jnp.max(jnp.abs(f_o))) + 1.0
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_o),
                               atol=2e-4 * fscale)


def test_band_structure_covers_all_pairs_once():
    """Structure-level invariant: every in-cutoff pair appears in exactly
    one (row band, window) slot pair — brute-force coverage count over the
    built structure (no kernel involved)."""
    rng = np.random.default_rng(3)
    n = 700
    box_l = 3.6
    cutoff = 0.9
    positions = rng.random((n, 3)) * box_l
    box = jnp.asarray(np.diag([box_l] * 3))
    bcfg = pallas_band.band_config(np.diag([box_l] * 3), cutoff, n,
                                   target_skin=0.1)
    assert bcfg is not None
    bs = pallas_band.build_band_structure(jnp.asarray(positions), box, n,
                                          bcfg)
    assert int(bs["overflow"]) == 0
    slots = np.asarray(bs["slots_ext"]).reshape(-1, bcfg["lext"])
    windows = np.asarray(bs["windows"])
    counts = np.asarray(bs["counts"])
    ncols = pallas_band.neighbor_columns(bcfg)
    R, wg = bcfg["rows"], bcfg["wg"]

    seen = {}
    for c in range(slots.shape[0]):
        nb = -(-int(counts[c]) // R)
        for b in range(nb):
            row_lo = wg + R * b
            rows = slots[c, row_lo:row_lo + R]
            for j in range(5):
                s, v = windows[c, b, j]
                cand = slots[ncols[c, j], s:s + v]
                ranks = np.arange(s, s + v)
                for ri, i in enumerate(rows):
                    # rows past count are ghost-bottom slots, not rows
                    if i >= n or row_lo + ri >= wg + counts[c]:
                        continue
                    row_rank = row_lo + ri
                    for q, jat in zip(ranks, cand):
                        if jat >= n:
                            continue
                        if j == 0 and q <= row_rank:
                            continue
                        key = (min(i, jat), max(i, jat))
                        seen[key] = seen.get(key, 0) + 1

    # brute-force minimum-image in-cutoff pairs
    reach = bcfg["reach"]
    d = positions[:, None, :] - positions[None, :, :]
    d -= np.round(d / box_l) * box_l
    r = np.sqrt((d ** 2).sum(-1))
    iu = np.triu_indices(n, 1)
    in_cut = r[iu] < cutoff
    pairs_needed = set(zip(iu[0][in_cut], iu[1][in_cut]))
    for p in pairs_needed:
        assert seen.get(p, 0) >= 1, f"pair {p} not covered (r={r[p]:.3f})"
    # no pair (in cutoff or not) may be visited twice
    dup = {k: v for k, v in seen.items() if v > 1}
    assert not dup, f"{len(dup)} pairs double-counted, e.g. {next(iter(dup))}"


def test_band_window_overflow_raises(monkeypatch):
    """An undersized static window must raise through the MD fastpath, not
    silently drop pairs."""
    from nonbondedslicing_tpu.runtime.fastpath import make_md_step

    # box 4.0: the band structure must be applicable at make_md_step's
    # default target_skin (3.8 fails the z >= 3*reach check there)
    system, force, positions = _system(nbs.SlicedNonbondedForce.PME, box=4.0)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()), dtype)
    gvals = jnp.asarray([0.8], dtype)
    masses = np.tile([16.0, 1.0], len(positions) // 2)
    monkeypatch.setenv("NBS_BAND_KERNEL", "1")
    run = make_md_step(plan, masses, 0.001, dtype=dtype, interpret=True,
                       band_window_scale=0.2)
    assert "band" in run.config, "band path must engage for this test"
    with pytest.raises(nbs.OpenMMException, match="band window overflow"):
        run(jnp.asarray(positions, dtype), jnp.zeros_like(positions, dtype),
            box, gvals, data, 2)


def test_band_md_step_matches_cell_md_step(monkeypatch):
    """A few MD steps through make_md_step with the band kernel must track
    the cell-kernel path (same physics, different neighbor structure).

    Lattice start: the _system random-uniform positions overlap at this
    density and explode under MD regardless of neighbor structure (the
    static-parity tests above don't integrate, so they don't care)."""
    from nonbondedslicing_tpu.runtime.fastpath import make_md_step

    system, force, positions = _system(nbs.SlicedNonbondedForce.PME,
                                       n_mol=512, box=4.0)
    rng = np.random.default_rng(11)
    grid = (np.stack(np.meshgrid(*[np.arange(8)] * 3, indexing="ij"),
                     axis=-1).reshape(-1, 3) + 0.5) * 0.5
    positions[0::2] = grid + rng.normal(scale=0.01, size=grid.shape)
    positions[1::2] = positions[0::2] + rng.normal(scale=0.03,
                                                   size=grid.shape)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()), dtype)
    gvals = jnp.asarray([0.8], dtype)
    masses = np.tile([16.0, 1.0], len(positions) // 2)

    outs = {}
    for band in ("0", "1"):
        monkeypatch.setenv("NBS_BAND_KERNEL", band)
        run = make_md_step(plan, masses, 0.0005, dtype=dtype, interpret=True,
                           reuse_steps=2)
        assert ("band" in run.config) == (band == "1")
        # run_scan donates its position/velocity buffers: fresh arrays per call
        outs[band] = run(jnp.asarray(positions, dtype),
                         jnp.zeros(positions.shape, dtype),
                         box, gvals, data, 4)
    p0, _, e0 = outs["0"]
    p1, _, e1 = outs["1"]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=5e-5)
    np.testing.assert_allclose(float(e1), float(e0), rtol=2e-5)


def test_band_matches_oracle_triclinic(monkeypatch):
    """Reduced-form triclinic box: z = frac_z * c_z is exactly the
    perpendicular coordinate, so the z-window containment argument holds;
    prove it against the all-pairs oracle (the band analog of
    test_box_change's triclinic PME checks)."""
    rng = np.random.default_rng(13)
    system = nbs.System()
    box_np = np.array([[4.8, 0.0, 0.0],
                       [1.2, 4.6, 0.0],
                       [-0.9, 1.1, 4.5]])
    system.setDefaultPeriodicBoxVectors(*[tuple(v) for v in box_np])
    force = nbs.SlicedNonbondedForce(3)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.setCutoffDistance(0.9)
    n = 1200
    for i in range(n):
        system.addParticle(16.0)
        force.addParticle(0.25 * (-1) ** i, 0.28, 0.3)
        force.setParticleSubset(i, i % 3)
    force.addGlobalParameter("lam01", 0.8)
    force.addScalingParameter("lam01", 0, 1, True, True)
    system.addForce(force)
    positions = rng.random((n, 3)) @ box_np

    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    pos = jnp.asarray(positions, dtype)
    box = jnp.asarray(box_np, dtype)
    gvals = jnp.asarray([0.8], dtype)

    oracle = engine_mod.make_compute(plan, True, True, neighbor="all_pairs")
    e_o, f_o = oracle(pos, box, gvals, data)

    prepare, apply, cfg = _band_engine(plan, monkeypatch)
    state = prepare(pos, box, gvals, data)
    assert int(state["overflow"]) == 0
    e_f, f_f, aux = apply(pos, box, gvals, data, state)

    scale = float(jnp.max(jnp.abs(e_o))) + 1.0
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_o),
                               atol=2e-4 * scale)
    fscale = float(jnp.max(jnp.abs(f_o))) + 1.0
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_o),
                               atol=2e-4 * fscale)
