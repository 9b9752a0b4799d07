"""Sliced smooth Particle-Mesh Ewald on TPU.

Design (SURVEY.md section 7 step 4, reference ReferencePME.cpp):

* one charge grid per subset, shaped (nsub, nx, ny, nz) — the batched-FFT
  trick that makes reciprocal cost ~linear in the number of subsets
  (docs/theory.rst:147-156); XLA batches the 3D c2c transforms natively
* order-5 cardinal B-splines via the Essmann et al. recursions
  (ReferencePME.cpp:264-317), fully vectorized over atoms
* charge spreading as one scatter-add of (N, 5, 5, 5) stencils into the
  flattened grid (deterministic on TPU — no atomics, unlike the reference's
  fixed-point workaround in kernels/pme.cc:108-118)
* slice energies from cross-products of subset spectra: diagonal slice
  0.5*eterm*|S_j|^2, off-diagonal eterm*Re(S_i conj(S_j))
  (ReferencePME.cpp:473-492)
* force interpolation gathers from lambda-precombined grids
  C_s = sum_j lam(s, j) * phi_j, combining the n (small) subset grids once
  per step instead of per atom (the reference reads all n grids per atom,
  kernels/pme.cc:356-371)

The known index quirk at ReferencePME.cpp:682 (subset stride using ngrid[2]
in interpolation vs ngrid[0] in spreading) is intentionally NOT replicated;
we use consistent (subset, x, y, z) indexing.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import ONE_4PI_EPS0
from .geometry import recip_box_vectors


# --------------------------------------------------------------------- host

def _bspline_coeffs(order):
    """Values of the order-`order` cardinal B-spline at integer nodes 1..order
    evaluated at fraction 0 (ReferencePME.cpp:115-144)."""
    data = np.zeros(order)
    data[0] = 1.0
    for k in range(3, order):
        div = 1.0 / (k - 1)
        data[k - 1] = 0.0
        for l in range(1, k - 1):
            data[k - l - 1] = div * (l * data[k - l - 2] + (k - l) * data[k - l - 1])
        data[0] = div * data[0]
    div = 1.0 / (order - 1)
    data[order - 1] = 0.0
    for l in range(1, order - 1):
        data[order - l - 1] = div * (l * data[order - l - 2] + (order - l) * data[order - l - 1])
    data[0] = div * data[0]
    return data


def bspline_moduli(grid_shape, order=5):
    """|DFT of the B-spline stencil|^2 per axis (ReferencePME.cpp:146-177)."""
    data = _bspline_coeffs(order)
    out = []
    for ndata in grid_shape:
        bsp = np.zeros(max(ndata, order + 1))
        bsp[1:order + 1] = data
        bsp = bsp[:ndata] if ndata >= order + 1 else bsp[:ndata]
        j = np.arange(ndata)
        angles = 2.0 * np.pi * np.outer(j, j) / ndata
        sc = bsp[:ndata] @ np.cos(angles)
        ss = bsp[:ndata] @ np.sin(angles)
        mod = sc * sc + ss * ss
        small = mod < 1e-7
        if small.any():
            fixed = mod.copy()
            for i in np.nonzero(small)[0]:
                fixed[i] = (mod[(i - 1) % ndata] + mod[(i + 1) % ndata]) / 2
            mod = fixed
        out.append(mod)
    return tuple(out)


# ---------------------------------------------------------------------- jax

def bsplines(frac, order=5):
    """Order-`order` B-spline values and derivatives at fractional offsets.

    frac: (..., ) array in [0, 1).  Returns (theta, dtheta), each
    (..., order).  Recursions follow ReferencePME.cpp:264-317.
    """
    zero = jnp.zeros_like(frac)
    data = [zero] * order
    data[1] = frac
    data[0] = 1.0 - frac
    for k in range(3, order):
        div = 1.0 / (k - 1)
        data[k - 1] = div * frac * data[k - 2]
        for l in range(1, k - 1):
            data[k - l - 1] = div * ((frac + l) * data[k - l - 2]
                                     + (k - l - frac) * data[k - l - 1])
        data[0] = div * (1.0 - frac) * data[0]
    ddata = [zero] * order
    ddata[0] = -data[0]
    for k in range(1, order):
        ddata[k] = data[k - 1] - data[k]
    div = 1.0 / (order - 1)
    data[order - 1] = div * frac * data[order - 2]
    for l in range(1, order - 1):
        data[order - l - 1] = div * ((frac + l) * data[order - l - 2]
                                     + (order - l - frac) * data[order - l - 1])
    data[0] = div * (1.0 - frac) * data[0]
    return jnp.stack(data, axis=-1), jnp.stack(ddata, axis=-1)


def grid_index_and_fraction(positions, recip, grid_shape):
    """Grid indices and fractional offsets (ReferencePME.cpp:196-256)."""
    ng = jnp.asarray(grid_shape, dtype=positions.dtype)
    t = positions @ recip  # (N, 3) fractional coordinates
    t = (t - jnp.floor(t)) * ng
    ti = t.astype(jnp.int32)
    frac = t - ti
    index = ti % jnp.asarray(grid_shape, dtype=jnp.int32)
    return index, frac


def spread_charges(charges, subsets, index, theta, grid_shape, num_subsets, order=5):
    """Scatter B-spline stencils into per-subset grids -> (nsub, nx, ny, nz)."""
    nx, ny, nz = grid_shape
    offs = jnp.arange(order, dtype=jnp.int32)
    ix = (index[:, 0:1] + offs) % nx  # (N, order)
    iy = (index[:, 1:2] + offs) % ny
    iz = (index[:, 2:3] + offs) % nz
    vals = (charges[:, None, None, None]
            * theta[:, 0, :, None, None]
            * theta[:, 1, None, :, None]
            * theta[:, 2, None, None, :])
    lin = (((subsets[:, None, None, None] * nx + ix[:, :, None, None]) * ny
            + iy[:, None, :, None]) * nz + iz[:, None, None, :])
    grid = jnp.zeros((num_subsets * nx * ny * nz,), dtype=charges.dtype)
    grid = grid.at[lin.reshape(-1)].add(vals.reshape(-1))
    return grid.reshape(num_subsets, nx, ny, nz)


def _dense_chunk_size(grid_shape, n):
    """Atom-chunk size for the dense spread/interp paths, keeping the
    (B, ny*nz) plane intermediate under ~128 MB (large chunks keep the MXU
    matmuls off the latency floor)."""
    ny, nz = grid_shape[1], grid_shape[2]
    b = 4096
    while b > 128 and b * ny * nz * 4 > 128 * 1024 * 1024:
        b //= 2
    return min(b, max(8, n))


# --------------------------------------------------- DFT-by-matmul (MXU FFT)

_MATMUL_DFT_MAX = 512  # use MXU DFT matmuls for axes up to this size


def _np_dtype(dtype):
    return np.dtype(jnp.dtype(dtype).name)


def _dft_mats(n, dtype):
    # numpy (host) constants: device-array constants captured in jitted
    # closures are fetched element-wise over the TPU tunnel at lowering time
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    d = _np_dtype(dtype)
    return (np.cos(ang).astype(d), (-np.sin(ang)).astype(d))


def _rdft_mats(n, dtype):
    nr = n // 2 + 1
    ang = 2.0 * np.pi * np.outer(np.arange(n), np.arange(nr)) / n
    d = _np_dtype(dtype)
    return (np.cos(ang).astype(d), (-np.sin(ang)).astype(d))


def _irdft_mats(n, dtype):
    """(nr, n) matrices for the UNNORMALIZED real synthesis from a z-half
    spectrum: x[z] = sum_k w_k (Re S_k cos(2 pi k z / n) - Im S_k sin(...))
    with conjugate-pair weights w."""
    nr = n // 2 + 1
    w = np.full(nr, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    ang = 2.0 * np.pi * np.outer(np.arange(nr), np.arange(n)) / n
    d = _np_dtype(dtype)
    return ((np.cos(ang) * w[:, None]).astype(d),
            (np.sin(ang) * w[:, None]).astype(d))


def _cmatmul_last(re, im, mats):
    """Complex contraction of the last axis with a complex DFT matrix given
    as (cos, -sin) real parts — 4 real MXU matmuls at HIGH precision."""
    br, bi = mats
    prec = jax.lax.Precision.HIGH
    out_re = (jnp.einsum("...z,zk->...k", re, br, precision=prec)
              - jnp.einsum("...z,zk->...k", im, bi, precision=prec))
    out_im = (jnp.einsum("...z,zk->...k", re, bi, precision=prec)
              + jnp.einsum("...z,zk->...k", im, br, precision=prec))
    return out_re, out_im


def rfft3_matmul(grid):
    """jnp.fft.rfftn(grid, axes=(1,2,3)) computed as per-axis DFT matmuls on
    the MXU — XLA's TPU FFT is latency-bound at MD grid sizes (~80^3), while
    the equivalent (n, n) matmuls are a few GFLOP.  Returns (re, im)."""
    _, nx, ny, nz = grid.shape
    dtype = grid.dtype
    prec = jax.lax.Precision.HIGH
    zr, zi = _rdft_mats(nz, dtype)
    re = jnp.einsum("sxyz,zk->sxyk", grid, zr, precision=prec)
    im = jnp.einsum("sxyz,zk->sxyk", grid, zi, precision=prec)
    re, im = _cmatmul_last(re.swapaxes(2, 3), im.swapaxes(2, 3),
                           _dft_mats(ny, dtype))       # now (s, x, kz, ky)
    re, im = _cmatmul_last(re.swapaxes(1, 3), im.swapaxes(1, 3),
                           _dft_mats(nx, dtype))       # now (s, ky, kz, kx)
    return re.transpose(0, 3, 1, 2), im.transpose(0, 3, 1, 2)


def _window_grid_lines(b, p, w, n):
    """Grid line hit by window point (brick, u): b*p - 1 + u (periodic) —
    the overlap-add map of pme_bricks.scatter_windows."""
    bb = np.arange(b)[:, None]
    uu = np.arange(w)[None, :]
    return ((bb * p - 1 + uu) % n).reshape(-1)


def rfft3_matmul_windows(W, bricks, grid_shape):
    """Brick-window charge tensor -> half spectrum (overlap-add folded into
    the DFT matmuls).  Dispatches between the einsum-chain formulation (v1)
    and the flat block-complex formulation (v2, default — measured ~2-3x
    faster on v5e at the 23k bench; NBS_WIN_DFT=v1 restores the old path).

    W: (bx, by, bz, nsub, wx, wy, wz) -> (re, im): (nsub, nx, ny, nz//2+1).
    """
    import os
    mode = os.environ.get("NBS_WIN_DFT", "v3")
    if mode == "v1":
        return _rfft3_matmul_windows_v1(W, bricks, grid_shape)
    if mode == "v2":
        return _rfft3_matmul_windows_v2(W, bricks, grid_shape)
    return _rfft3_matmul_windows_v3(W, bricks, grid_shape)


def _rfft3_matmul_windows_v1(W, bricks, grid_shape):
    """``rfft3_matmul(scatter_windows(W))`` with the periodic overlap-add
    FOLDED into the DFT matrices: window point (b, u) lands on grid line
    (b*p - 1 + u) mod n, so gathering the (host numpy) DFT matrices' rows by
    that map and contracting the (brick, window) axis pair directly turns
    the brick-major window tensor into the spectrum.  The charge grid never
    exists in grid-major layout — the XLA overlap-add pass it replaces
    measured ~0.5 ms at the 23k bench (~25x this formulation's MXU cost).

    W: (bx, by, bz, nsub, wx, wy, wz) -> (re, im): (nsub, nx, ny, nz//2+1).
    """
    bxc, byc, bzc = bricks
    nx, ny, nz = grid_shape
    dtype = W.dtype
    wx, wy, wz = W.shape[4:7]
    px, py, pz = nx // bxc, ny // byc, nz // bzc
    prec = jax.lax.Precision.HIGH
    zr, zi = _rdft_mats(nz, dtype)
    idz = _window_grid_lines(bzc, pz, wz, nz)
    zr_w = zr[idz].reshape(bzc, wz, -1)
    zi_w = zi[idz].reshape(bzc, wz, -1)
    re = jnp.einsum("XYZsxyz,Zzk->XYsxyk", W, zr_w, precision=prec)
    im = jnp.einsum("XYZsxyz,Zzk->XYsxyk", W, zi_w, precision=prec)
    yc, ys = _dft_mats(ny, dtype)
    idy = _window_grid_lines(byc, py, wy, ny)
    yc_w = yc[idy].reshape(byc, wy, -1)
    ys_w = ys[idy].reshape(byc, wy, -1)
    re2 = (jnp.einsum("XYsxyk,Yyj->Xsxkj", re, yc_w, precision=prec)
           - jnp.einsum("XYsxyk,Yyj->Xsxkj", im, ys_w, precision=prec))
    im2 = (jnp.einsum("XYsxyk,Yyj->Xsxkj", re, ys_w, precision=prec)
           + jnp.einsum("XYsxyk,Yyj->Xsxkj", im, yc_w, precision=prec))
    xc, xs = _dft_mats(nx, dtype)
    idx_ = _window_grid_lines(bxc, px, wx, nx)
    xc_w = xc[idx_].reshape(bxc, wx, -1)
    xs_w = xs[idx_].reshape(bxc, wx, -1)
    re3 = (jnp.einsum("Xsxkj,Xxi->skji", re2, xc_w, precision=prec)
           - jnp.einsum("Xsxkj,Xxi->skji", im2, xs_w, precision=prec))
    im3 = (jnp.einsum("Xsxkj,Xxi->skji", re2, xs_w, precision=prec)
           + jnp.einsum("Xsxkj,Xxi->skji", im2, xc_w, precision=prec))
    return re3.transpose(0, 3, 2, 1), im3.transpose(0, 3, 2, 1)


def _pad8(n):
    return int(-(-int(n) // 8) * 8)


def _win_fwd_blocks(bricks, window, grid_shape, dtname):
    """Host-numpy block matrices for the v2 forward windows DFT.

    Each transform stage is one flat (M, K) @ (K, 2*N) matmul: the complex
    output rides a stacked [re | im] column pair and complex inputs a
    stacked [re; im] row pair, so the 4-real-matmul einsum chain of v1
    collapses to a single MXU dot per axis with a full-width N dimension
    (v1's per-part N of 31-60 columns left the systolic array ~90% idle).
    The window->grid-line overlap-add map is folded in exactly as in v1."""
    key = (bricks, window, grid_shape, dtname)
    hit = _WIN_BLOCK_CACHE.get(("f",) + key)
    if hit is not None:
        return hit
    bxc, byc, bzc = bricks
    wx, wy, wz = window
    nx, ny, nz = grid_shape
    d = np.dtype(dtname)
    # z stage FIRST: the rfft halving runs on the real input before the
    # y/x stages, so every complex intermediate carries NZ=pad8(nz/2+1)
    # z-lines instead of bzc*wz window points (x-first left a ~100 MB
    # mid-pipeline tensor at the 23k bench; z-first peaks under 10 MB)
    zr, zi = _rdft_mats(nz, d)
    idz = _window_grid_lines(bzc, nz // bzc, wz, nz)
    nzh = nz // 2 + 1
    NZ = _pad8(nzh)
    Az = np.zeros((bzc * wz, 2, NZ), d)
    Az[:, 0, :nzh] = zr[idz]
    Az[:, 1, :nzh] = zi[idz]
    # y stage: complex block [[br, bi], [-bi, br]] with (br, bi) = (cos, -sin)
    yc, ys = _dft_mats(ny, d)
    idy = _window_grid_lines(byc, ny // byc, wy, ny)
    NY = _pad8(ny)
    My = np.zeros((2, byc * wy, 2, NY), d)
    My[0, :, 0, :ny] = yc[idy]
    My[0, :, 1, :ny] = ys[idy]
    My[1, :, 0, :ny] = -ys[idy]
    My[1, :, 1, :ny] = yc[idy]
    # x stage: same complex block form
    xc, xs = _dft_mats(nx, d)
    idx_ = _window_grid_lines(bxc, nx // bxc, wx, nx)
    NX = _pad8(nx)
    Mx = np.zeros((2, bxc * wx, 2, NX), d)
    Mx[0, :, 0, :nx] = xc[idx_]
    Mx[0, :, 1, :nx] = xs[idx_]
    Mx[1, :, 0, :nx] = -xs[idx_]
    Mx[1, :, 1, :nx] = xc[idx_]
    out = (Az.reshape(bzc * wz, 2 * NZ),
           My.reshape(2 * byc * wy, 2 * NY),
           Mx.reshape(2 * bxc * wx, 2 * NX), NX, NY, NZ)
    _WIN_BLOCK_CACHE[("f",) + key] = out
    return out


_WIN_BLOCK_CACHE = {}


def _rfft3_matmul_windows_v2(W, bricks, grid_shape):
    """v2 of rfft3_matmul_windows: one flat block-complex dot per axis.

    Same math and HIGH (bf16x3) precision as v1; the padded spectrum
    columns (NX/NY beyond nx/ny) carry exact zeros and are sliced off."""
    bxc, byc, bzc = bricks
    nx, ny, nz = grid_shape
    s = W.shape[3]
    wx, wy, wz = W.shape[4:7]
    Az, My, Mx, NX, NY, NZ = _win_fwd_blocks(
        bricks, (wx, wy, wz), grid_shape, jnp.dtype(W.dtype).name)
    prec = jax.lax.Precision.HIGH
    nzh = nz // 2 + 1
    # z: contract (Z, z) on the real input (the rfft halving, first)
    t = W.transpose(0, 1, 3, 4, 5, 2, 6)          # (X, Y, s, x, y, Z, z)
    t = t.reshape(bxc * byc * s * wx * wy, bzc * wz)
    t = jnp.dot(t, Az, precision=prec)
    t = t.reshape(bxc, byc, s, wx, wy, 2, NZ)
    # y: contract (c, Y, y)
    t = t.transpose(0, 2, 3, 6, 5, 1, 4)          # (X, s, x, NZ, c, Y, y)
    t = t.reshape(bxc * s * wx * NZ, 2 * byc * wy)
    t = jnp.dot(t, My, precision=prec)
    t = t.reshape(bxc, s, wx, NZ, 2, NY)
    # x: contract (c, X, x)
    t = t.transpose(1, 5, 3, 4, 0, 2)             # (s, NY, NZ, c, X, x)
    t = t.reshape(s * NY * NZ, 2 * bxc * wx)
    t = jnp.dot(t, Mx, precision=prec)
    t = t.reshape(s, NY, NZ, 2, NX)
    t = t[:, :ny, :nzh].transpose(0, 3, 4, 1, 2)  # (s, c, NX, ny, nzh)
    return t[:, 0, :nx], t[:, 1, :nx]


def _rfft3_matmul_windows_v3(W, bricks, grid_shape):
    """v3 of rfft3_matmul_windows: v2's block-complex matrices fed through
    einsums instead of explicit transpose+reshape+dot, letting XLA fuse the
    inter-stage relayouts into the matmul operand loads (slope-measured
    0.361 vs 0.419 ms for v2 at the 23k bench shapes; the same rewrite of
    the INVERSE measured worse — blown-up einsum intermediates — so only the
    forward uses it, extras/probe_windft_r5.py)."""
    bxc, byc, bzc = bricks
    nx, ny, nz = grid_shape
    s = W.shape[3]
    wx, wy, wz = W.shape[4:7]
    Az, My, Mx, NX, NY, NZ = _win_fwd_blocks(
        bricks, (wx, wy, wz), grid_shape, jnp.dtype(W.dtype).name)
    Az3 = jnp.asarray(Az.reshape(bzc, wz, 2 * NZ))
    My4 = jnp.asarray(My.reshape(2, byc, wy, 2 * NY))
    Mx4 = jnp.asarray(Mx.reshape(2, bxc, wx, 2 * NX))
    prec = jax.lax.Precision.HIGH
    nzh = nz // 2 + 1
    t = jnp.einsum("XYZsxyz,Zzk->XYsxyk", W, Az3, precision=prec)
    t = t.reshape(bxc, byc, s, wx, wy, 2, NZ)
    t = jnp.einsum("XYsxyck,cYyj->Xsxkj", t, My4, precision=prec)
    t = t.reshape(bxc, s, wx, NZ, 2, NY)
    t = jnp.einsum("XsxkcJ,cXxi->sJki", t, Mx4, precision=prec)
    # (s, NY, NZ, 2*NX) -> split complex pair, crop pads
    t = t.reshape(s, NY, NZ, 2, NX)
    t = t[:, :ny, :nzh].transpose(0, 3, 4, 1, 2)  # (s, c, NX, ny, nzh)
    return t[:, 0, :nx], t[:, 1, :nx]


def _win_inv_blocks(bricks, window, grid_shape, dtname):
    """Host-numpy block matrices for the v2 inverse windows DFT (conjugate
    synthesis per axis, window gather folded into the output columns)."""
    key = (bricks, window, grid_shape, dtname)
    hit = _WIN_BLOCK_CACHE.get(("i",) + key)
    if hit is not None:
        return hit
    bxc, byc, bzc = bricks
    wx, wy, wz = window
    nx, ny, nz = grid_shape
    d = np.dtype(dtname)
    nzh = nz // 2 + 1
    # x/y stages: B = cos + i sin (conjugate of the analysis matrix)
    c, nsin = _dft_mats(nx, d)
    sx = -nsin
    idx_ = _window_grid_lines(bxc, nx // bxc, wx, nx)
    cx, sxg = c[:, idx_], sx[:, idx_]             # (nx, bxc*wx)
    XW = bxc * wx
    Mx = np.zeros((2, nx, 2, XW), d)
    Mx[0, :, 0] = cx
    Mx[0, :, 1] = sxg
    Mx[1, :, 0] = -sxg
    Mx[1, :, 1] = cx
    c, nsin = _dft_mats(ny, d)
    sy = -nsin
    idy = _window_grid_lines(byc, ny // byc, wy, ny)
    cy, syg = c[:, idy], sy[:, idy]
    YW = byc * wy
    My = np.zeros((2, ny, 2, YW), d)
    My[0, :, 0] = cy
    My[0, :, 1] = syg
    My[1, :, 0] = -syg
    My[1, :, 1] = cy
    # z stage: real synthesis out = re . (w cos) - im . (w sin)
    zr, zi = _irdft_mats(nz, d)                   # (nzh, nz)
    idz = _window_grid_lines(bzc, nz // bzc, wz, nz)
    ZW = bzc * wz
    Mz = np.zeros((2, nzh, ZW), d)
    Mz[0] = zr[:, idz]
    Mz[1] = -zi[:, idz]
    out = (Mx.reshape(2 * nx, 2 * XW), My.reshape(2 * ny, 2 * YW),
           Mz.reshape(2 * nzh, ZW))
    _WIN_BLOCK_CACHE[("i",) + key] = out
    return out


def _irfft3_matmul_windows_v2(re, im, bricks, grid_shape, window_shape):
    """v2 of irfft3_matmul_windows: one flat block-complex dot per axis."""
    bxc, byc, bzc = bricks
    nx, ny, nz = grid_shape
    wx, wy, wz = window_shape
    s = re.shape[0]
    nzh = nz // 2 + 1
    Mx, My, Mz = _win_inv_blocks(bricks, (wx, wy, wz), grid_shape,
                                 jnp.dtype(re.dtype).name)
    prec = jax.lax.Precision.HIGH
    XW, YW, ZW = bxc * wx, byc * wy, bzc * wz
    t = jnp.stack([re, im], axis=1)               # (s, c, nx, ny, nzh)
    # x: contract (c, kx)
    t = t.transpose(0, 3, 4, 1, 2).reshape(s * ny * nzh, 2 * nx)
    t = jnp.dot(t, Mx, precision=prec)
    t = t.reshape(s, ny, nzh, 2, XW)
    # y: contract (c, ky)
    t = t.transpose(0, 2, 4, 3, 1).reshape(s * nzh * XW, 2 * ny)
    t = jnp.dot(t, My, precision=prec)
    t = t.reshape(s, nzh, XW, 2, YW)
    # z: contract (c, kz) -> real window points
    t = t.transpose(0, 2, 4, 3, 1).reshape(s * XW * YW, 2 * nzh)
    t = jnp.dot(t, Mz, precision=prec)
    t = t.reshape(s, bxc, wx, byc, wy, bzc, wz)
    t = t.transpose(1, 3, 5, 0, 2, 4, 6)
    return t.reshape(bxc * byc * bzc, s, wx, wy, wz)


def rfft3_matmul_blocked(gb, bricks, grid_shape):
    """``rfft3_matmul`` of a grid held in the BLOCKED (brick, point) layout
    (nsub, bx, by, bz, px, py, pz) produced by
    pme_bricks.fold_windows_blocked: blocked entry (b, u) holds true grid
    line (b*p - 1 + u) mod n, so gathering the DFT matrices' rows by that
    map and contracting the (brick, point) axis pair yields the standard
    spectrum with grid-DFT FLOPs — the grid never exists in grid-major
    layout and no interleave transpose is paid anywhere.

    Returns (re, im): (nsub, nx, ny, nz//2+1)."""
    bxc, byc, bzc = bricks
    nx, ny, nz = grid_shape
    dtype = gb.dtype
    px, py, pz = nx // bxc, ny // byc, nz // bzc
    prec = jax.lax.Precision.HIGH
    zr, zi = _rdft_mats(nz, dtype)
    idz = _window_grid_lines(bzc, pz, pz, nz)
    zr_b = zr[idz].reshape(bzc, pz, -1)
    zi_b = zi[idz].reshape(bzc, pz, -1)
    re = jnp.einsum("sXYZxyz,Zzk->sXYxyk", gb, zr_b, precision=prec)
    im = jnp.einsum("sXYZxyz,Zzk->sXYxyk", gb, zi_b, precision=prec)
    yc, ys = _dft_mats(ny, dtype)
    idy = _window_grid_lines(byc, py, py, ny)
    yc_b = yc[idy].reshape(byc, py, -1)
    ys_b = ys[idy].reshape(byc, py, -1)
    re2 = (jnp.einsum("sXYxyk,Yyj->sXxkj", re, yc_b, precision=prec)
           - jnp.einsum("sXYxyk,Yyj->sXxkj", im, ys_b, precision=prec))
    im2 = (jnp.einsum("sXYxyk,Yyj->sXxkj", re, ys_b, precision=prec)
           + jnp.einsum("sXYxyk,Yyj->sXxkj", im, yc_b, precision=prec))
    xc, xs = _dft_mats(nx, dtype)
    idx_ = _window_grid_lines(bxc, px, px, nx)
    xc_b = xc[idx_].reshape(bxc, px, -1)
    xs_b = xs[idx_].reshape(bxc, px, -1)
    re3 = (jnp.einsum("sXxkj,Xxi->skji", re2, xc_b, precision=prec)
           - jnp.einsum("sXxkj,Xxi->skji", im2, xs_b, precision=prec))
    im3 = (jnp.einsum("sXxkj,Xxi->skji", re2, xs_b, precision=prec)
           + jnp.einsum("sXxkj,Xxi->skji", im2, xc_b, precision=prec))
    return re3.transpose(0, 3, 2, 1), im3.transpose(0, 3, 2, 1)


def irfft3_matmul_windows(re, im, bricks, grid_shape, window_shape):
    """Half spectrum -> brick-window potential tensor (window gather folded
    into the synthesis matmuls).  Dispatches v1/v2 like
    rfft3_matmul_windows (NBS_WIN_DFT).

    Returns (g, nsub, wx, wy, wz)."""
    import os
    if os.environ.get("NBS_WIN_DFT", "v2") == "v1":
        return _irfft3_matmul_windows_v1(re, im, bricks, grid_shape,
                                         window_shape)
    return _irfft3_matmul_windows_v2(re, im, bricks, grid_shape,
                                     window_shape)


def _irfft3_matmul_windows_v1(re, im, bricks, grid_shape, window_shape):
    """``gather_windows(irfft3_matmul(re, im), bricks)`` with the window
    gather FOLDED into the synthesis matrices — the mirror of
    rfft3_matmul_windows.  Window point (b, u) reads grid line
    (b*p - 1 + u) mod n (pme_bricks.gather_windows:143-161), so gathering the
    synthesis matrices' output columns by that map yields the brick-major
    window tensor directly; the potential grid never exists in grid-major
    layout.  Returns (g, nsub, wx, wy, wz)."""
    bxc, byc, bzc = bricks
    nx, ny, nz = grid_shape
    wx, wy, wz = window_shape
    px, py, pz = nx // bxc, ny // byc, nz // bzc
    dtype = re.dtype
    prec = jax.lax.Precision.HIGH

    # x axis: unnormalized conj full DFT, output lines gathered by window map
    c, nsin = _dft_mats(nx, dtype)
    s = -nsin
    idx_ = _window_grid_lines(bxc, px, wx, nx)
    cx = c[:, idx_].reshape(nx, bxc, wx)
    sx = s[:, idx_].reshape(nx, bxc, wx)
    # re/im: (s, kx, ky, kz)
    re1 = (jnp.einsum("sabc,aXi->sXibc", re, cx, precision=prec)
           - jnp.einsum("sabc,aXi->sXibc", im, sx, precision=prec))
    im1 = (jnp.einsum("sabc,aXi->sXibc", re, sx, precision=prec)
           + jnp.einsum("sabc,aXi->sXibc", im, cx, precision=prec))
    c, nsin = _dft_mats(ny, dtype)
    s = -nsin
    idy = _window_grid_lines(byc, py, wy, ny)
    cy = c[:, idy].reshape(ny, byc, wy)
    sy = s[:, idy].reshape(ny, byc, wy)
    re2 = (jnp.einsum("sXibc,bYj->sXiYjc", re1, cy, precision=prec)
           - jnp.einsum("sXibc,bYj->sXiYjc", im1, sy, precision=prec))
    im2 = (jnp.einsum("sXibc,bYj->sXiYjc", re1, sy, precision=prec)
           + jnp.einsum("sXibc,bYj->sXiYjc", im1, cy, precision=prec))
    # z axis: real synthesis from the half spectrum, gathered the same way
    zr, zi = _irdft_mats(nz, dtype)
    idz = _window_grid_lines(bzc, pz, wz, nz)
    zrw = zr[:, idz].reshape(nz // 2 + 1, bzc, wz)
    ziw = zi[:, idz].reshape(nz // 2 + 1, bzc, wz)
    out = (jnp.einsum("sXiYjc,cZk->XYZsijk", re2, zrw, precision=prec)
           - jnp.einsum("sXiYjc,cZk->XYZsijk", im2, ziw, precision=prec))
    nsub = re.shape[0]
    return out.reshape(bxc * byc * bzc, nsub, wx, wy, wz)


def irfft3_matmul(re, im, grid_shape):
    """Unnormalized inverse of rfft3_matmul (= irfftn * nx*ny*nz, the
    synthesis convention the PME potential grid uses)."""
    nx, ny, nz = grid_shape
    dtype = re.dtype
    prec = jax.lax.Precision.HIGH

    def icmatmul(re, im, n):
        # unnormalized inverse along the last axis: multiply by conj(F)
        # where F = (cos) + i(-sin); conj(F) = cos + i sin
        c, nsin = _dft_mats(n, dtype)
        s = -nsin
        out_re = (jnp.einsum("...z,zk->...k", re, c, precision=prec)
                  - jnp.einsum("...z,zk->...k", im, s, precision=prec))
        out_im = (jnp.einsum("...z,zk->...k", re, s, precision=prec)
                  + jnp.einsum("...z,zk->...k", im, c, precision=prec))
        return out_re, out_im

    # (s, kx, ky, kz) -> contract kx (move to last)
    re, im = icmatmul(re.swapaxes(1, 3), im.swapaxes(1, 3), nx)
    # now (s, kz, ky, x); contract ky
    re, im = icmatmul(re.swapaxes(2, 3), im.swapaxes(2, 3), ny)
    # now (s, kz, x, y); contract kz with the real synthesis matrices
    zr, zi = _irdft_mats(nz, dtype)
    return (jnp.einsum("skxy,kz->sxyz", re, zr, precision=prec)
            - jnp.einsum("skxy,kz->sxyz", im, zi, precision=prec))


def _dense_axis_splines(index, theta, dtheta, grid_shape, order):
    """Expand per-atom B-spline stencils into dense per-axis matrices.

    Returns (Tx, Ty, Tz, dTx, dTy, dTz), each (B, n_axis): T[n, x] holds the
    B-spline weight of atom n at grid line x (5 non-zeros per row, placed by
    comparison against an iota — no scatter).
    """
    outs = []
    offs = jnp.arange(order, dtype=jnp.int32)
    for axis in range(3):
        na = grid_shape[axis]
        cols = (index[:, axis:axis + 1] + offs) % na          # (B, order)
        onehot = (cols[:, :, None]
                  == jnp.arange(na, dtype=jnp.int32)[None, None, :])
        onehot = onehot.astype(theta.dtype)                    # (B, order, na)
        outs.append(jnp.einsum("bt,bta->ba", theta[:, axis], onehot))
        outs.append(jnp.einsum("bt,bta->ba", dtheta[:, axis], onehot))
    return outs[0], outs[2], outs[4], outs[1], outs[3], outs[5]


def spread_charges_dense(charges, subsets, index, theta, dtheta, grid_shape,
                         num_subsets, order=5):
    """MXU-friendly charge spreading: per-chunk dense separable B-spline
    matrices contracted as two matmuls instead of a 125-point scatter-add
    (TPU has no fast scatter; the MXU is the fastest path to the grid).

    grid[s, x, y, z] = sum_n q_n [sub_n == s] Tx[n,x] Ty[n,y] Tz[n,z]
    """
    nx, ny, nz = grid_shape
    n = charges.shape[0]
    b = _dense_chunk_size(grid_shape, n)
    n_pad = ((n + b - 1) // b) * b
    pad = n_pad - n
    q_p = jnp.pad(charges, (0, pad))
    sub_p = jnp.pad(subsets, (0, pad))
    idx_p = jnp.pad(index, ((0, pad), (0, 0)))
    th_p = jnp.pad(theta, ((0, pad), (0, 0), (0, 0)))
    dth_p = jnp.pad(dtheta, ((0, pad), (0, 0), (0, 0)))

    sub_oh = (sub_p[:, None] == jnp.arange(num_subsets, dtype=sub_p.dtype)
              ).astype(charges.dtype)

    def chunk(c0):
        idx = jax.lax.dynamic_slice(idx_p, (c0, 0), (b, 3))
        th = jax.lax.dynamic_slice(th_p, (c0, 0, 0), (b, 3, order))
        dth = jax.lax.dynamic_slice(dth_p, (c0, 0, 0), (b, 3, order))
        q = jax.lax.dynamic_slice(q_p, (c0,), (b,))
        soh = jax.lax.dynamic_slice(sub_oh, (c0, 0), (b, num_subsets))
        tx, ty, tz, _, _, _ = _dense_axis_splines(idx, th, dth, grid_shape, order)
        qsx = jnp.einsum("bs,bx->bsx", soh * q[:, None], tx).reshape(
            b, num_subsets * nx)
        plane = jnp.einsum("by,bz->byz", ty, tz).reshape(b, ny * nz)
        # HIGH (bf16x3) keeps ~1e-6 relative accuracy at 2x the speed of the
        # global HIGHEST default; the spread sum is well conditioned
        return jnp.dot(qsx.T, plane, preferred_element_type=charges.dtype,
                       precision=jax.lax.Precision.HIGH)

    starts = jnp.arange(0, n_pad, b)
    grid = jax.lax.map(chunk, starts).sum(axis=0)
    return grid.reshape(num_subsets, nx, ny, nz)


def interpolate_forces_dense(phi, charges, subsets, index, theta, dtheta,
                             recip, lam_nn, grid_shape, order=5):
    """Force interpolation as dense matmuls (gather-free counterpart of
    ``interpolate_forces``): contract the lambda-combined potential grids with
    per-chunk dense B-spline matrices."""
    nx, ny, nz = grid_shape
    dtype = charges.dtype
    n = charges.shape[0]
    nsub = phi.shape[0]
    combined = jnp.einsum("st,txyz->sxyz", lam_nn, phi)
    phi_mat = combined.reshape(nsub * nx, ny * nz)

    b = _dense_chunk_size(grid_shape, n)
    n_pad = ((n + b - 1) // b) * b
    pad = n_pad - n
    q_p = jnp.pad(charges, (0, pad))
    sub_p = jnp.pad(subsets, (0, pad))
    idx_p = jnp.pad(index, ((0, pad), (0, 0)))
    th_p = jnp.pad(theta, ((0, pad), (0, 0), (0, 0)))
    dth_p = jnp.pad(dtheta, ((0, pad), (0, 0), (0, 0)))
    sub_oh = (sub_p[:, None] == jnp.arange(nsub, dtype=sub_p.dtype)
              ).astype(dtype)

    def chunk(c0):
        idx = jax.lax.dynamic_slice(idx_p, (c0, 0), (b, 3))
        th = jax.lax.dynamic_slice(th_p, (c0, 0, 0), (b, 3, order))
        dth = jax.lax.dynamic_slice(dth_p, (c0, 0, 0), (b, 3, order))
        soh = jax.lax.dynamic_slice(sub_oh, (c0, 0), (b, nsub))
        tx, ty, tz, dtx, dty, dtz = _dense_axis_splines(
            idx, th, dth, grid_shape, order)
        sx = jnp.einsum("bs,bx->bsx", soh, tx).reshape(b, nsub * nx)
        sdx = jnp.einsum("bs,bx->bsx", soh, dtx).reshape(b, nsub * nx)
        # transpose factorization: P = phi @ plane^T keeps the large matmul
        # output at (s*nx, 3B) instead of materializing (B, ny*nz) potential
        # slabs that round-trip HBM (that layout cost ~2x the whole PME)
        planes = jnp.concatenate([
            jnp.einsum("by,bz->byz", ty, tz).reshape(b, ny * nz),
            jnp.einsum("by,bz->byz", dty, tz).reshape(b, ny * nz),
            jnp.einsum("by,bz->byz", ty, dtz).reshape(b, ny * nz),
        ], axis=0)
        p_all = jnp.dot(phi_mat, planes.T, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGH)  # (s*nx, 3B)
        p_t, p_dy, p_dz = p_all[:, :b], p_all[:, b:2 * b], p_all[:, 2 * b:]
        fx = jnp.einsum("bs,sb->b", sdx, p_t)
        fy = jnp.einsum("bs,sb->b", sx, p_dy)
        fz = jnp.einsum("bs,sb->b", sx, p_dz)
        return jnp.stack([fx, fy, fz], axis=-1)

    starts = jnp.arange(0, n_pad, b)
    grads = jax.lax.map(chunk, starts).reshape(n_pad, 3)[:n]
    fx, fy, fz = grads[:, 0], grads[:, 1], grads[:, 2]
    f0 = -charges * (fx * nx * recip[0, 0])
    f1 = -charges * (fx * nx * recip[1, 0] + fy * ny * recip[1, 1])
    f2 = -charges * (fx * nx * recip[2, 0] + fy * ny * recip[2, 1]
                     + fz * nz * recip[2, 2])
    return jnp.stack([f0, f1, f2], axis=-1)


def _freq_components(grid_shape, recip, dtype, half=False):
    """Scaled frequency vectors mh and |m|^2 over the full (or z-half) grid."""
    nx, ny, nz = grid_shape
    def freqs(n):
        k = np.arange(n)
        return np.where(k < (n + 1) // 2, k, k - n)
    mx = jnp.asarray(freqs(nx), dtype)[:, None, None]
    my = jnp.asarray(freqs(ny), dtype)[None, :, None]
    if half:
        mz = jnp.asarray(np.arange(nz // 2 + 1), dtype)[None, None, :]
    else:
        mz = jnp.asarray(freqs(nz), dtype)[None, None, :]
    mhx = mx * recip[0, 0]
    mhy = mx * recip[1, 0] + my * recip[1, 1]
    mhz = mx * recip[2, 0] + my * recip[2, 1] + mz * recip[2, 2]
    m2 = mhx * mhx + mhy * mhy + mhz * mhz
    return m2


def rfft_energy_weights(nz, dtype):
    """Full-spectrum equivalence weights for the z-half-space layout: modes
    0 and (even) nz/2 are self-conjugate (weight 1), the rest represent a
    +/-k pair (weight 2) — same convention as the reference's R2C kernels
    (kernels/pme.cc:138-189)."""
    nzr = nz // 2 + 1
    w = np.full(nzr, 2.0)
    w[0] = 1.0
    if nz % 2 == 0:
        w[-1] = 1.0
    return w.astype(_np_dtype(dtype))


def coulomb_eterm(grid_shape, moduli, box, recip, alpha, dtype, half=False):
    """Reciprocal-space convolution kernel (ReferencePME.cpp:400-496)."""
    nx, ny, nz = grid_shape
    m2 = _freq_components(grid_shape, recip, dtype, half)
    volume = box[0, 0] * box[1, 1] * box[2, 2]
    boxfactor = math.pi * volume
    bx = boxfactor * jnp.asarray(moduli[0], dtype)[:, None, None]
    by = jnp.asarray(moduli[1], dtype)[None, :, None]
    bz = jnp.asarray(moduli[2][:nz // 2 + 1] if half else moduli[2],
                     dtype)[None, None, :]
    factor = math.pi * math.pi / (alpha * alpha)
    denom = m2 * bx * by * bz
    safe = denom != 0
    eterm = jnp.where(safe,
                      ONE_4PI_EPS0 * jnp.exp(-factor * jnp.where(safe, m2, 1.0))
                      / jnp.where(safe, denom, 1.0),
                      0.0)
    # zero frequency excluded (handled by the plasma correction)
    return eterm.at[0, 0, 0].set(0.0)


def dispersion_eterm(grid_shape, moduli, box, recip, alpha, dtype, half=False):
    """LJPME dispersion convolution kernel, including the m=0 term
    (ReferencePME.cpp:499-595)."""
    nz = grid_shape[2]
    m2 = _freq_components(grid_shape, recip, dtype, half)
    volume = box[0, 0] * box[1, 1] * box[2, 2]
    boxfactor = -2.0 * math.pi * math.sqrt(math.pi) / (6.0 * volume)
    bx = jnp.asarray(moduli[0], dtype)[:, None, None]
    by = jnp.asarray(moduli[1], dtype)[None, :, None]
    bz = jnp.asarray(moduli[2][:nz // 2 + 1] if half else moduli[2],
                     dtype)[None, None, :]
    bfac = math.pi / alpha
    fac1 = 2.0 * math.pi ** 3 * math.sqrt(math.pi)
    fac2 = alpha ** 3
    fac3 = -2.0 * alpha * math.pi ** 2
    m = jnp.sqrt(m2)
    m3 = m * m2
    b = bfac * m
    from jax.scipy.special import erfc
    eterm = (fac1 * erfc(b) * m3 + jnp.exp(-b * b) * (fac2 + fac3 * m2)) \
        * boxfactor / (bx * by * bz)
    return eterm


def pme_slice_energies_ri(re, im, eterm_weighted, slice_subset_pairs):
    """pme_slice_energies for spectra given as (re, im) real pairs."""
    nsub = re.shape[0]
    fr = re.reshape(nsub, -1)
    fi = im.reshape(nsub, -1)
    ew = eterm_weighted.reshape(-1)[None, :]
    # f64 accumulation over the grid: the (S,) scalars feed the total-energy
    # cancellation; this runs only when energies are requested
    emat = (jnp.matmul(fr * ew, fr.T, preferred_element_type=jnp.float64)
            + jnp.matmul(fi * ew, fi.T, preferred_element_type=jnp.float64))
    pair_i = slice_subset_pairs[:, 0]
    pair_j = slice_subset_pairs[:, 1]
    scale = jnp.where(pair_i == pair_j, 0.5, 1.0).astype(emat.dtype)
    return scale * emat[pair_i, pair_j]


def pme_slice_energies(spectra, eterm, slice_subset_pairs):
    """Per-slice reciprocal energies from subset spectra.

    diag: 0.5*sum eterm*|S_j|^2; off-diag: sum eterm*Re(S_i conj(S_j)),
    summed over the full complex grid (counts +k and -k, matching
    ReferencePME.cpp:485-491).
    """
    nsub = spectra.shape[0]
    flat = spectra.reshape(nsub, -1)
    weighted = flat * eterm.reshape(-1)[None, :]
    # f64 accumulation over the grid (energy path only)
    wr, wi = jnp.real(weighted), jnp.imag(weighted)
    fr, fi = jnp.real(flat), jnp.imag(flat)
    emat = (jnp.matmul(wr, fr.T, preferred_element_type=jnp.float64)
            + jnp.matmul(wi, fi.T, preferred_element_type=jnp.float64))
    pair_i = slice_subset_pairs[:, 0]
    pair_j = slice_subset_pairs[:, 1]
    scale = jnp.where(pair_i == pair_j, 0.5, 1.0).astype(emat.dtype)
    return scale * emat[pair_i, pair_j]


def interpolate_forces(phi, charges, subsets, index, theta, dtheta, recip,
                       lam_nn, grid_shape, order=5):
    """Gather forces from lambda-combined potential grids
    (ReferencePME.cpp:598-702, with the subset combination hoisted out of the
    per-atom loop)."""
    nx, ny, nz = grid_shape
    dtype = charges.dtype
    # lambda-combined grid per target subset: C[s] = sum_j lam(s, j) phi[j]
    combined = jnp.einsum("st,txyz->sxyz", lam_nn, phi)
    offs = jnp.arange(order, dtype=jnp.int32)
    ix = (index[:, 0:1] + offs) % nx
    iy = (index[:, 1:2] + offs) % ny
    iz = (index[:, 2:3] + offs) % nz
    vals = combined[subsets[:, None, None, None],
                    ix[:, :, None, None], iy[:, None, :, None], iz[:, None, None, :]]
    tx, ty, tz = theta[:, 0], theta[:, 1], theta[:, 2]
    dtx, dty, dtz = dtheta[:, 0], dtheta[:, 1], dtheta[:, 2]
    fx = jnp.einsum("nijk,ni,nj,nk->n", vals, dtx, ty, tz)
    fy = jnp.einsum("nijk,ni,nj,nk->n", vals, tx, dty, tz)
    fz = jnp.einsum("nijk,ni,nj,nk->n", vals, tx, ty, dtz)
    f0 = -charges * (fx * nx * recip[0, 0])
    f1 = -charges * (fx * nx * recip[1, 0] + fy * ny * recip[1, 1])
    f2 = -charges * (fx * nx * recip[2, 0] + fy * ny * recip[2, 1] + fz * nz * recip[2, 2])
    return jnp.stack([f0, f1, f2], axis=-1)


_DENSE_MIN_PARTICLES = 1024


def pme_reciprocal(positions, box, charges, subsets, lam_s, *, alpha, grid_shape,
                   moduli, num_subsets, slice_subset_pairs, slice_table,
                   dispersion=False, order=5, dense=None, eterm=None):
    """Full sliced-PME pipeline for one term (Coulomb charges or LJPME c6s).

    Returns (slice_energies (S,), forces (N, 3)).  ``dense`` selects the
    MXU matmul spread/interp path (default: automatic by particle count;
    scatter/gather is faster for small systems, matmuls for large ones).
    ``eterm`` optionally supplies a precomputed convolution kernel (valid
    only while the box is unchanged — the MD fastpath hoists it out of the
    step loop).
    """
    if dense is None:
        dense = positions.shape[0] >= _DENSE_MIN_PARTICLES
    recip = recip_box_vectors(box)
    index, frac = grid_index_and_fraction(positions, recip, grid_shape)
    theta, dtheta = bsplines(frac, order)
    if dense:
        grid = spread_charges_dense(charges, subsets, index, theta, dtheta,
                                    grid_shape, num_subsets, order)
    else:
        grid = spread_charges(charges, subsets, index, theta, grid_shape,
                              num_subsets, order)
    nx, ny, nz = grid_shape
    if eterm is None:
        if dispersion:
            eterm = dispersion_eterm(grid_shape, moduli, box, recip, alpha,
                                     positions.dtype, half=True)
        else:
            eterm = coulomb_eterm(grid_shape, moduli, box, recip, alpha,
                                  positions.dtype, half=True)
    w = rfft_energy_weights(nz, positions.dtype)
    # real-input transforms: z-half-space spectrum, half the FFT/convolution
    # work (the R2C layout of the reference GPU path, kernels/pme.cc:138-189)
    if max(grid_shape) <= _MATMUL_DFT_MAX:
        # per-axis DFT matmuls on the MXU: XLA's TPU FFT is latency-bound at
        # MD grid sizes, the equivalent (n, n) matmuls are ~100x faster
        s_re, s_im = rfft3_matmul(grid)
        slice_energies = pme_slice_energies_ri(
            s_re, s_im, eterm * w[None, None, :], slice_subset_pairs)
        phi = irfft3_matmul(s_re * eterm[None], s_im * eterm[None],
                            grid_shape)
    else:
        spectra = jnp.fft.rfftn(grid, axes=(1, 2, 3))
        slice_energies = pme_slice_energies(spectra, eterm * w[None, None, :],
                                            slice_subset_pairs)
        # unnormalized inverse: phi(r) = sum_k eterm*S(k) e^{+ik.r}
        phi = jnp.fft.irfftn(spectra * eterm[None], axes=(1, 2, 3),
                             s=grid_shape) * (nx * ny * nz)
    lam_nn = lam_s[jnp.asarray(slice_table)]
    if dense:
        forces = interpolate_forces_dense(phi, charges, subsets, index, theta,
                                          dtheta, recip, lam_nn, grid_shape,
                                          order)
    else:
        forces = interpolate_forces(phi, charges, subsets, index, theta,
                                    dtheta, recip, lam_nn, grid_shape, order)
    return slice_energies, forces


# ------------------------------------------------- host (numpy) eterm builds
# Build-time convolution kernels hoisted into jitted closures MUST be numpy:
# a device-array closure constant is fetched element-wise over the TPU tunnel
# during MLIR lowering (~4 ms/element — minutes for a PME grid).

def coulomb_eterm_np(grid_shape, moduli, box, alpha, half=True):
    """numpy twin of coulomb_eterm for a static (host) box."""
    box = np.asarray(box, dtype=np.float64)
    recip = np.linalg.inv(box).T
    nx, ny, nz = grid_shape

    def freqs(n):
        k = np.arange(n)
        return np.where(k < (n + 1) // 2, k, k - n)

    mx = freqs(nx)[:, None, None]
    my = freqs(ny)[None, :, None]
    mz = (np.arange(nz // 2 + 1) if half else freqs(nz))[None, None, :]
    mhx = mx * recip[0, 0]
    mhy = mx * recip[1, 0] + my * recip[1, 1]
    mhz = mx * recip[2, 0] + my * recip[2, 1] + mz * recip[2, 2]
    m2 = mhx * mhx + mhy * mhy + mhz * mhz
    volume = box[0, 0] * box[1, 1] * box[2, 2]
    bx = math.pi * volume * np.asarray(moduli[0])[:, None, None]
    by = np.asarray(moduli[1])[None, :, None]
    bz = np.asarray(moduli[2][:nz // 2 + 1] if half else moduli[2])[None, None, :]
    factor = math.pi * math.pi / (alpha * alpha)
    denom = m2 * bx * by * bz
    safe = denom != 0
    eterm = np.where(safe,
                     ONE_4PI_EPS0 * np.exp(-factor * np.where(safe, m2, 1.0))
                     / np.where(safe, denom, 1.0), 0.0)
    eterm[0, 0, 0] = 0.0
    return eterm


def dispersion_eterm_np(grid_shape, moduli, box, alpha, half=True):
    """numpy twin of dispersion_eterm for a static (host) box."""
    box = np.asarray(box, dtype=np.float64)
    recip = np.linalg.inv(box).T
    nx, ny, nz = grid_shape

    def freqs(n):
        k = np.arange(n)
        return np.where(k < (n + 1) // 2, k, k - n)

    mx = freqs(nx)[:, None, None]
    my = freqs(ny)[None, :, None]
    mz = (np.arange(nz // 2 + 1) if half else freqs(nz))[None, None, :]
    mhx = mx * recip[0, 0]
    mhy = mx * recip[1, 0] + my * recip[1, 1]
    mhz = mx * recip[2, 0] + my * recip[2, 1] + mz * recip[2, 2]
    m2 = mhx * mhx + mhy * mhy + mhz * mhz
    volume = box[0, 0] * box[1, 1] * box[2, 2]
    boxfactor = -2.0 * math.pi * math.sqrt(math.pi) / (6.0 * volume)
    bx = np.asarray(moduli[0])[:, None, None]
    by = np.asarray(moduli[1])[None, :, None]
    bz = np.asarray(moduli[2][:nz // 2 + 1] if half else moduli[2])[None, None, :]
    bfac = math.pi / alpha
    fac1 = 2.0 * math.pi ** 3 * math.sqrt(math.pi)
    fac2 = alpha ** 3
    fac3 = -2.0 * alpha * math.pi ** 2
    m = np.sqrt(m2)
    m3 = m * m2
    b = bfac * m
    erfc_b = np.vectorize(math.erfc)(b)
    return ((fac1 * erfc_b * m3 + np.exp(-b * b) * (fac2 + fac3 * m2))
            * boxfactor / (bx * by * bz))
