"""PME spread/interpolate path equivalence, FFT oracle checks, determinism.

Mirrors the reference's FFT unit tests (TestCudaVkFFT3D.cpp:37-164, with
pocketfft as CPU oracle — here numpy.fft is the oracle for jnp.fft) and
testDeterministicForces (TestCudaSlicedNonbondedForce.cpp:109-141; on TPU
determinism is by construction, so repeated evaluation must be bitwise equal).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops import pme
from nonbondedslicing_tpu.utils.indexing import slice_pair_table, slice_subsets


def _setup(n=700, nsub=3, grid_shape=(24, 20, 18), seed=0):
    rng = np.random.default_rng(seed)
    box = jnp.asarray(np.diag([3.1, 2.9, 2.7]))
    pos = jnp.asarray(rng.random((n, 3)) * 3.0)
    q = jnp.asarray(rng.normal(size=n))
    subs = jnp.asarray(rng.integers(0, nsub, n).astype(np.int32))
    lam = jnp.asarray(rng.random(nsub * (nsub + 1) // 2))
    kw = dict(alpha=2.5, grid_shape=grid_shape,
              moduli=pme.bspline_moduli(grid_shape), num_subsets=nsub,
              slice_subset_pairs=jnp.asarray(slice_subsets(nsub)),
              slice_table=slice_pair_table(nsub).astype(np.int32))
    return pos, box, q, subs, lam, kw


@pytest.mark.parametrize("dispersion", [False, True])
def test_dense_matches_scatter(dispersion):
    pos, box, q, subs, lam, kw = _setup()
    if dispersion:
        q = jnp.abs(q)
    e1, f1 = pme.pme_reciprocal(pos, box, q, subs, lam, dense=False,
                                dispersion=dispersion, **kw)
    e2, f2 = pme.pme_reciprocal(pos, box, q, subs, lam, dense=True,
                                dispersion=dispersion, **kw)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("shape", [(28, 25, 30), (27, 16, 25), (8, 8, 8)])
def test_batched_fft_against_numpy(shape):
    """Batched 3D c2c transforms (the sliced-PME building block: one grid per
    subset, one batched transform — docs/theory.rst:150-156) vs numpy."""
    rng = np.random.default_rng(1)
    batch = 3
    x = rng.normal(size=(batch,) + shape) + 1j * rng.normal(size=(batch,) + shape)
    got = np.asarray(jnp.fft.fftn(jnp.asarray(x), axes=(1, 2, 3)))
    want = np.fft.fftn(x, axes=(1, 2, 3))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    # roundtrip with 1/N scaling
    back = np.asarray(jnp.fft.ifftn(jnp.asarray(got), axes=(1, 2, 3)))
    np.testing.assert_allclose(back, x, rtol=1e-9, atol=1e-9)


def test_deterministic_forces():
    pos, box, q, subs, lam, kw = _setup()
    f = jax.jit(lambda p: pme.pme_reciprocal(p, box, q, subs, lam, dense=True,
                                             **kw))
    e1, f1 = f(pos)
    e2, f2 = f(pos)
    assert np.array_equal(np.asarray(f1), np.asarray(f2))
    assert np.array_equal(np.asarray(e1), np.asarray(e2))


def test_permutation_invariance():
    """Atom reordering must not change the physics (the analog of the
    reference's testReordering, TestCudaSlicedNonbondedForce.cpp:82-107)."""
    pos, box, q, subs, lam, kw = _setup(n=300)
    rng = np.random.default_rng(3)
    perm = rng.permutation(300)
    e1, f1 = pme.pme_reciprocal(pos, box, q, subs, lam, **kw)
    e2, f2 = pme.pme_reciprocal(pos[perm], box, q[perm], subs[perm], lam, **kw)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1)[perm], rtol=1e-7,
                               atol=1e-10)


def test_matmul_dft_matches_fft_backend():
    """FFT-backend agreement (the analog of the reference's testUseCuFFT,
    TestCudaSlicedNonbondedForce.cpp:164-224): the MXU matmul-DFT pipeline
    must match jnp.fft's rfftn/irfftn on the same grids."""
    import jax.numpy as jnp
    from nonbondedslicing_tpu.ops import pme

    rng = np.random.default_rng(3)
    for shape in [(2, 12, 10, 8), (3, 9, 9, 9)]:
        grid = jnp.asarray(rng.standard_normal(shape))
        s_re, s_im = pme.rfft3_matmul(grid)
        ref = np.fft.rfftn(np.asarray(grid), axes=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(s_re), ref.real,
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(s_im), ref.imag,
                                   rtol=1e-9, atol=1e-9)
        # unnormalized synthesis: irfftn * N
        n = shape[1] * shape[2] * shape[3]
        back = pme.irfft3_matmul(s_re, s_im, shape[1:])
        ref_back = np.fft.irfftn(ref, s=shape[1:], axes=(1, 2, 3)) * n
        np.testing.assert_allclose(np.asarray(back), ref_back,
                                   rtol=1e-8, atol=1e-8)


def test_windows_dft_v2_matches_v1():
    """The flat block-complex windows-DFT formulation (v2, the production
    default) must reproduce the einsum-chain formulation (v1) in both
    directions — same folded overlap-add math, different matmul packing.
    f64 here makes the comparison exact to accumulation order."""
    rng = np.random.default_rng(11)
    cases = [((3, 2, 2), (12, 10, 8), (8, 9, 8)),   # uneven everything
             ((2, 2, 2), (8, 8, 8), (8, 8, 8)),
             ((2, 3, 2), (10, 9, 14), (9, 7, 11))]
    for bricks, grid, w in cases:
        W = jnp.asarray(rng.standard_normal(
            (bricks[0], bricks[1], bricks[2], 2) + w))
        r1, i1 = pme._rfft3_matmul_windows_v1(W, bricks, grid)
        r2, i2 = pme._rfft3_matmul_windows_v2(W, bricks, grid)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(i2), np.asarray(i1),
                                   rtol=1e-8, atol=1e-8)
        o1 = pme._irfft3_matmul_windows_v1(r1, i1, bricks, grid, w)
        o2 = pme._irfft3_matmul_windows_v2(r1, i1, bricks, grid, w)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   rtol=1e-8, atol=1e-8)
