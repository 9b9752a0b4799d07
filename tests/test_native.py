"""Native C++ host runtime vs pure-Python oracles."""

import numpy as np
import pytest

from nonbondedslicing_tpu.runtime import native
from nonbondedslicing_tpu.utils.ewald_params import find_legal_dimension


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def test_legal_dimension(lib):
    for minimum in (1, 5, 6, 97, 121, 144, 1009):
        for mf in (7, 13):
            assert (native.find_legal_dimension(minimum, mf)
                    == find_legal_dimension(minimum, mf))


def test_dispersion_matches_python(lib):
    import nonbondedslicing_tpu as nbs
    from nonbondedslicing_tpu.ops.dispersion import calc_dispersion_corrections

    rng = np.random.default_rng(5)
    force = nbs.SlicedNonbondedForce(3)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.CutoffPeriodic)
    force.setCutoffDistance(1.0)
    force.setUseSwitchingFunction(True)
    force.setSwitchingDistance(0.85)
    n = 200
    sigma = np.zeros(n)
    epsilon = np.zeros(n)
    subset = np.zeros(n, dtype=np.int32)
    for i in range(n):
        sigma[i] = 0.2 + 0.2 * (i % 4)
        epsilon[i] = 0.1 + 0.3 * (i % 3)
        subset[i] = i % 3
        force.addParticle(0.0, sigma[i], epsilon[i])
        force.setParticleSubset(i, int(subset[i]))
    py = calc_dispersion_corrections(force)
    nat = native.dispersion_corrections(sigma, epsilon, subset, 3, True,
                                        1.0, 0.85)
    # class iteration order and FMA contraction differ between the C++ and
    # numpy paths; agreement is to roundoff, not bitwise
    np.testing.assert_allclose(nat, py, rtol=1e-8)


@pytest.mark.parametrize("periodic", [True, False])
def test_neighbor_pairs_vs_brute_force(lib, periodic):
    rng = np.random.default_rng(11)
    n = 400
    box = np.diag([4.0, 3.5, 3.8])
    pos = rng.random((n, 3)) * 3.4
    cutoff = 0.9
    pairs = native.neighbor_pairs(pos, box, cutoff, periodic=periodic)
    got = {tuple(p) for p in pairs.tolist()}
    dr = pos[:, None, :] - pos[None, :, :]
    if periodic:
        for d in range(3):
            w = box[d, d]
            dr[..., d] -= w * np.floor(dr[..., d] / w + 0.5)
    r2 = np.sum(dr * dr, axis=-1)
    want = {(i, j) for i in range(n) for j in range(i + 1, n)
            if r2[i, j] < cutoff * cutoff}
    assert got == want


def test_max_cell_occupancy(lib):
    rng = np.random.default_rng(3)
    pos = rng.random((500, 3)) * 5.0
    box = np.diag([5.0, 5.0, 5.0])
    counts = (5, 5, 5)
    nat = native.max_cell_occupancy(pos, box, counts)
    frac = pos / 5.0
    ci = np.minimum((frac * 5).astype(int), 4)
    cell = (ci[:, 0] * 5 + ci[:, 1]) * 5 + ci[:, 2]
    assert nat == int(np.bincount(cell).max())
