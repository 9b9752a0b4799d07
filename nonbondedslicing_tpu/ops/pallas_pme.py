"""Pallas fused PME spread / interpolation kernels (brick windows).

The XLA brick path (ops/pme_bricks.py) materializes per-brick B-spline plane
tensors in HBM — ~0.5 GB of intermediates per step at the 23k-atom scale.
These kernels fuse the whole per-brick pipeline in VMEM: fractional
coordinates -> order-5 B-splines -> local window spline matrices ->
MXU contractions, one brick per grid step.  Only the window tensors
(bricks, s*wx, wy*wz) touch HBM; window<->grid assembly is folded into the
DFT/synthesis matrices (pme.rfft3_matmul_windows / irfft3_matmul_windows),
so the charge and potential grids never exist in grid-major layout.

Math identical to pme_bricks.spread_bricks / interp_bricks (which remain the
oracle in tests); reference pipeline: ReferencePME.cpp:320-396 (spread),
598-702 (interpolation), with per-subset grids and the lambda-combined
interpolation grid of the sliced formulation (kernels/pme.cc:356-371).
All in-kernel tensors are kept >= 2D with the long atom axis in lanes.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pme
from . import pme_bricks
from .geometry import recip_box_vectors
from .pme_bricks import brick_window

_PREC = jax.lax.Precision.HIGHEST  # Mosaic rejects Precision.HIGH in-kernel


import os as _os
_DOT_SCHEME = _os.environ.get("NBS_PME_DOT", "3pass")


def _dot_f32_3pass(a, b, dims):
    """f32-accurate dot via 3 bf16 MXU passes — the bfloat16x3 scheme XLA
    uses for Precision.HIGH, which Mosaic rejects in-kernel; HIGHEST costs
    6 passes (measured 2x on the interp kernel's 4.1 GMAC/step).
    a@b ~ hi(a)@hi(b) + lo(a)@hi(b) + hi(a)@lo(b); the dropped lo@lo term
    is O(2^-16) relative."""
    if _DOT_SCHEME == "highest":
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=a.dtype,
                                   precision=_PREC)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(a.dtype)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(b.dtype)).astype(jnp.bfloat16)

    def d(x, y):
        # explicit DEFAULT: the package-global jax_default_matmul_precision
        # of "highest" would otherwise attach fp32 contract precision to
        # these bf16 operands, which Mosaic rejects ("Bad lhs type")
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    return d(ah, bh) + d(al, bh) + d(ah, bl)


def _bspline_lists(frac, order):
    """Order-`order` B-spline values/derivatives at fractional offsets as
    LISTS of (1, C) rows (avoids 3D stacks in Mosaic).  Same recursions as
    pme.bsplines (ReferencePME.cpp:264-317)."""
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
    return data, ddata


def _axis_splines(pos_ref, recip_ref, axis, grid_n, brick_p, brick_coord,
                  order, dtype):
    """(theta list, dtheta list, rel (1, C)) for one axis."""
    f = (pos_ref[0:1] * recip_ref[0, axis]
         + pos_ref[1:2] * recip_ref[1, axis]
         + pos_ref[2:3] * recip_ref[2, axis])          # (1, C)
    t = (f - jnp.floor(f)) * jnp.asarray(float(grid_n), dtype)
    ti = jnp.floor(t)
    frac = t - ti
    theta, dtheta = _bspline_lists(frac, order)
    start = brick_coord * brick_p - 1
    rel = jnp.remainder(ti.astype(jnp.int32) - start, jnp.int32(grid_n))
    return theta, dtheta, rel


def _axis_T(rel, theta_list, w, order, dtype):
    """(w, C) dense local spline matrix by masked accumulation.
    rel: (1, C) int32; theta_list: order entries of (1, C)."""
    c = rel.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, c), 0)
    T = jnp.zeros((w, c), dtype)
    for k in range(order):
        T = T + jnp.where(rows == rel + k, theta_list[k], 0.0)
    return T


def make_spread_kernel(*, grid_shape, bricks, nsub, order=5, interpret=False):
    """f(pos_b (g,3,C), qoh_b (g,nsub,C), recip (3,3)) ->
    windows (g, nsub*wx, wy*wz)."""
    (px, wx), (py, wy), (pz, wz) = brick_window(grid_shape, bricks, order)
    g = bricks[0] * bricks[1] * bricks[2]
    nby, nbz = bricks[1], bricks[2]

    def kernel(recip_ref, pos_ref, qoh_ref, out_ref):
        dtype = pos_ref.dtype
        i = pl.program_id(0)
        bz = jax.lax.rem(i, nbz)
        by = jax.lax.rem(jax.lax.div(i, nbz), nby)
        bx = jax.lax.div(i, nbz * nby)
        pos = pos_ref[0]
        thx, _, relx = _axis_splines(pos, recip_ref, 0, grid_shape[0], px,
                                     bx, order, dtype)
        thy, _, rely = _axis_splines(pos, recip_ref, 1, grid_shape[1], py,
                                     by, order, dtype)
        thz, _, relz = _axis_splines(pos, recip_ref, 2, grid_shape[2], pz,
                                     bz, order, dtype)
        tx = _axis_T(relx, thx, wx, order, dtype)      # (wx, C)
        ty = _axis_T(rely, thy, wy, order, dtype)
        tz = _axis_T(relz, thz, wz, order, dtype)
        qoh = qoh_ref[0]                               # (nsub, C)
        A = (qoh[:, None, :] * tx[None, :, :]).reshape(nsub * wx, -1)
        B = (ty[:, None, :] * tz[None, :, :]).reshape(wy * wz, -1)
        out_ref[0] = _dot_f32_3pass(A, B, (((1,), (1,)), ((), ())))

    def run(pos_b, qoh_b, recip):
        dtype = pos_b.dtype
        cap = pos_b.shape[2]
        # Mosaic cannot legalize i64 index-map constants from x64 mode
        import contextlib
        x64_off = (jax.enable_x64(False) if hasattr(jax, "enable_x64")
                   else contextlib.nullcontext())
        with x64_off:
            return _call(dtype, cap, pos_b, qoh_b, recip)

    def _call(dtype, cap, pos_b, qoh_b, recip):
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),      # recip (3,3)
                pl.BlockSpec((1, 3, cap), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nsub, cap), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nsub * wx, wy * wz),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, nsub * wx, wy * wz), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(recip.astype(dtype), pos_b, qoh_b)

    return run


def make_fold_kernel(*, grid_shape, bricks, nsub, order=5, interpret=False):
    """window -> grid overlap-add as a Pallas kernel, no scatter, no
    interleave transpose.

    Works on the +1-SHIFTED grid convention: window point (b, u) of brick b
    covers shifted-grid line b*p + u (the unshifted window origin is
    b*p - 1, pme_bricks.scatter_windows; the global shift is a pure phase in
    the spectrum, which cancels in |S|^2 energies and round-trips through
    the convolution, so no correction is needed anywhere).  With
    w = p + order + 1 <= 2p (requires p >= order + 1), each p-point grid
    block receives contributions from exactly 2 bricks per axis.

    Layout trick: the output is declared 7-D as (nsub, bx, px, by, py, bz,
    pz) — flattening each adjacent (brick, point) pair IS grid-major order,
    so the caller gets (nsub, nx, ny, nz) by a free reshape.  Each program
    instance owns one full (X, Y) z-column of grid blocks (Mosaic requires
    the trailing two block dims to be full-array), reads the 4 neighbor
    window columns, and sums the 8 overlapping pieces per z-block in VMEM —
    the XLA roll-based overlap-add + (brick, point) interleave transpose
    this replaces measured ~2.1 ms at the 23k bench config.

    f(W (bx, by, bz, nsub, wx, wy, wz)) -> grid_shifted (nsub, nx, ny, nz)
    """
    (px, wx), (py, wy), (pz, wz) = brick_window(grid_shape, bricks, order)
    bx, by, bz = bricks
    for p, w in ((px, wx), (py, wy), (pz, wz)):
        if w > 2 * p:
            raise ValueError("fold kernel requires w <= 2p per axis")
    lx2, ly2, lz2 = wx - px, wy - py, wz - pz   # second-brick chunk lengths
    pairs = [(dx, dy) for dx in (0, 1) for dy in (0, 1)]

    ref_of = {p: i for i, p in enumerate(pairs)}
    # block region [0 : w-p) receives both bricks (B-1 window rows [p : w)
    # and B rows [0 : w-p)); region [w-p : p) receives only brick B —
    # disjoint static regions avoid in-kernel pads (Mosaic cannot lower
    # pad-to-block concats on sublane dims)
    regions = lambda l2, p: [r for r in ((0, l2, (0, 1)), (l2, p, (0,)))
                             if r[1] > r[0]]

    def kernel(*refs):
        out_ref = refs[4]
        for Z in range(bz):
            for (x0, x1, dxs) in regions(lx2, px):
                for (y0, y1, dys) in regions(ly2, py):
                    for (z0, z1, dzs) in regions(lz2, pz):
                        acc = None
                        for dx in dxs:
                            for dy in dys:
                                r = refs[ref_of[(dx, dy)]]
                                for dz in dzs:
                                    piece = r[0, 0, (Z - dz) % bz][
                                        :, dx * px + x0:dx * px + x1,
                                        dy * py + y0:dy * py + y1,
                                        dz * pz + z0:dz * pz + z1]
                                    acc = (piece if acc is None
                                           else acc + piece)
                        out_ref[:, 0, x0:x1, 0, y0:y1, Z, z0:z1] = acc

    def _wspec(dx, dy):
        return pl.BlockSpec(
            (1, 1, bz, nsub, wx, wy, wz),
            lambda X, Y, dx=dx, dy=dy: (
                (X - dx) % bx, (Y - dy) % by, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM)

    def run(W):
        dtype = W.dtype
        import contextlib
        x64_off = (jax.enable_x64(False) if hasattr(jax, "enable_x64")
                   else contextlib.nullcontext())
        with x64_off:
            out = pl.pallas_call(
                kernel,
                grid=(bx, by),
                in_specs=[_wspec(*c) for c in pairs],
                out_specs=pl.BlockSpec(
                    (nsub, 1, px, 1, py, bz, pz),
                    lambda X, Y: (0, X, 0, Y, 0, 0, 0),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (nsub, bx, px, by, py, bz, pz), dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(*([W] * 4))
        # (brick, point) pairs are adjacent: this reshape IS grid-major
        return out.reshape((nsub,) + tuple(grid_shape))

    return run


def make_extract_kernel(*, grid_shape, bricks, nsub, order=5,
                        interpret=False):
    """grid -> window extraction as a Pallas kernel (inverse layout of
    make_fold_kernel, same +1-shifted grid convention): window point (b, u)
    reads shifted-grid line b*p + u, i.e. grid blocks b and b+1 per axis.

    f(grid_shifted (nsub, nx, ny, nz)) -> W (bx, by, bz, nsub, wx, wy, wz)
    """
    (px, wx), (py, wy), (pz, wz) = brick_window(grid_shape, bricks, order)
    bx, by, bz = bricks
    for p, w in ((px, wx), (py, wy), (pz, wz)):
        if w > 2 * p:
            raise ValueError("extract kernel requires w <= 2p per axis")
    lx2, ly2, lz2 = wx - px, wy - py, wz - pz
    pairs = [(dx, dy) for dx in (0, 1) for dy in (0, 1)]

    ref_of = {p: i for i, p in enumerate(pairs)}

    def kernel(*refs):
        out_ref = refs[4]
        # window rows [d*p : d*p + len) copy grid block (B + d) rows
        # [0 : len) — 8 disjoint corner regions, no overlap, no pads
        for Z in range(bz):
            for dx, lx in ((0, px), (1, lx2)):
                for dy, ly in ((0, py), (1, ly2)):
                    r = refs[ref_of[(dx, dy)]]
                    for dz, lz in ((0, pz), (1, lz2)):
                        piece = r[:, 0, :lx, 0, :ly, (Z + dz) % bz, :lz]
                        out_ref[0, 0, Z, :,
                                dx * px:dx * px + lx,
                                dy * py:dy * py + ly,
                                dz * pz:dz * pz + lz] = piece

    def _gspec(dx, dy):
        return pl.BlockSpec(
            (nsub, 1, px, 1, py, bz, pz),
            lambda X, Y, dx=dx, dy=dy: (
                0, (X + dx) % bx, 0, (Y + dy) % by, 0, 0, 0),
            memory_space=pltpu.VMEM)

    def run(grid):
        dtype = grid.dtype
        g7 = grid.reshape(nsub, bx, px, by, py, bz, pz)  # free reshape
        import contextlib
        x64_off = (jax.enable_x64(False) if hasattr(jax, "enable_x64")
                   else contextlib.nullcontext())
        with x64_off:
            return pl.pallas_call(
                kernel,
                grid=(bx, by),
                in_specs=[_gspec(*c) for c in pairs],
                out_specs=pl.BlockSpec(
                    (1, 1, bz, nsub, wx, wy, wz),
                    lambda X, Y: (X, Y, 0, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (bx, by, bz, nsub, wx, wy, wz), dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(*([g7] * 4))

    return run


def make_interp_kernel(*, grid_shape, bricks, nsub, order=5, interpret=False):
    """f(windows (g, nsub*wx, wy*wz), pos_b (g,3,C), soh_b (g,nsub,C),
    q_b (g,1,C), recip) -> forces feature-major (g, 3, C)."""
    (px, wx), (py, wy), (pz, wz) = brick_window(grid_shape, bricks, order)
    g = bricks[0] * bricks[1] * bricks[2]
    nby, nbz = bricks[1], bricks[2]
    nx, ny, nz = grid_shape

    def kernel(recip_ref, w_ref, pos_ref, soh_ref, q_ref, out_ref):
        dtype = pos_ref.dtype
        i = pl.program_id(0)
        bz = jax.lax.rem(i, nbz)
        by = jax.lax.rem(jax.lax.div(i, nbz), nby)
        bx = jax.lax.div(i, nbz * nby)
        pos = pos_ref[0]
        thx, dthx, relx = _axis_splines(pos, recip_ref, 0, nx, px, bx,
                                        order, dtype)
        thy, dthy, rely = _axis_splines(pos, recip_ref, 1, ny, py, by,
                                        order, dtype)
        thz, dthz, relz = _axis_splines(pos, recip_ref, 2, nz, pz, bz,
                                        order, dtype)
        tx = _axis_T(relx, thx, wx, order, dtype)
        ty = _axis_T(rely, thy, wy, order, dtype)
        tz = _axis_T(relz, thz, wz, order, dtype)
        dtx = _axis_T(relx, dthx, wx, order, dtype)
        dty = _axis_T(rely, dthy, wy, order, dtype)
        dtz = _axis_T(relz, dthz, wz, order, dtype)
        soh = soh_ref[0]                      # (nsub, C)
        W = w_ref[0]                          # (nsub*wx, wy*wz)

        def contract(By, Bz, Tx):
            B = (By[:, None, :] * Bz[None, :, :]).reshape(wy * wz, -1)
            P = _dot_f32_3pass(W, B, (((1,), (0,)), ((), ())))  # (s*wx, C)
            S = (soh[:, None, :] * Tx[None, :, :]).reshape(nsub * wx, -1)
            return jnp.sum(S * P, axis=0, keepdims=True)        # (1, C)

        fx = contract(ty, tz, dtx)
        fy = contract(dty, tz, tx)
        fz = contract(ty, dtz, tx)
        q = q_ref[0]                           # (1, C)
        r = recip_ref
        f0 = -q * (fx * nx * r[0, 0])
        f1 = -q * (fx * nx * r[1, 0] + fy * ny * r[1, 1])
        f2 = -q * (fx * nx * r[2, 0] + fy * ny * r[2, 1]
                   + fz * nz * r[2, 2])
        out_ref[0] = jnp.concatenate([f0, f1, f2], axis=0)

    def run(windows, pos_b, soh_b, q_b, recip):
        dtype = pos_b.dtype
        cap = pos_b.shape[2]
        import contextlib
        x64_off = (jax.enable_x64(False) if hasattr(jax, "enable_x64")
                   else contextlib.nullcontext())
        with x64_off:
            return _call(dtype, cap, windows, pos_b, soh_b, q_b, recip)

    def _call(dtype, cap, windows, pos_b, soh_b, q_b, recip):
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),      # recip
                pl.BlockSpec((1, nsub * wx, wy * wz), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, cap), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nsub, cap), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, cap), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 3, cap), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, 3, cap), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(recip.astype(dtype), windows, pos_b, soh_b, q_b)

    return run


def pme_reciprocal_pallas(pos_b, q_b, soh_b, box, lam_s, *, alpha, grid_shape,
                          moduli, bricks, slice_subset_pairs, slice_table,
                          dispersion=False, order=5, eterm=None,
                          interpret=False, energies=True, _cache={}):
    """pme_bricks.pme_reciprocal_bricks with Pallas spread/interp stages.

    pos_b/q_b/soh_b are brick-major slot tensors (g_bricks, ., C_brick);
    returns (slice_energies (S,), forces (g_bricks, C_brick, 3)).
    """
    dtype = pos_b.dtype
    nsub = soh_b.shape[1]
    nz = grid_shape[2]
    # Spectrum pipeline choice (NBS_PME_PIPELINE overrides).  Whole-path
    # slope measurements at the 23k bench config (60^3 grid, 6^3 bricks,
    # v5e): "windows" 0.90 ms (0.94 before the r5 einsum forward,
    # pme._rfft3_matmul_windows_v3), "grid" 1.67 ms, "blocked" 2.73 ms;
    # no brick shape beats (6,6,6) here (extras/probe_pme_bricks_r5.py).
    #   "windows" (default): DFT straight from the window layout with the
    #     overlap-add folded into gathered DFT matrix rows
    #     (pme.rfft3_matmul_windows) — pays (w/p)x the grid-DFT FLOPs per
    #     axis but zero layout passes, and MXU FLOPs are cheap here;
    #   "grid": Pallas fold/extract kernels around a grid-major DFT — the
    #     kernels' 10-wide lane blocks run at ~8% lane utilization
    #     (fold 0.69 ms / extract 0.43 ms measured);
    #   "blocked": XLA roll-add fold into the blocked (brick, point)
    #     layout + permuted-row DFT matrices (pme.rfft3_matmul_blocked) —
    #     grid-DFT FLOPs, but the 8 roll-adds alone measure 1.13 ms.
    # "grid" needs each brick window to span <= 2 grid blocks per axis.
    mode = _os.environ.get("NBS_PME_PIPELINE", "windows")
    pieces = [w <= 2 * p for (p, w) in brick_window(grid_shape, bricks,
                                                    order)]
    if mode == "grid" and not all(pieces):
        mode = "blocked"
    key = (grid_shape, bricks, nsub, order, interpret, mode)
    if key not in _cache:
        fold_k = extract_k = None
        if mode == "grid":
            fold_k = make_fold_kernel(grid_shape=grid_shape, bricks=bricks,
                                      nsub=nsub, order=order,
                                      interpret=interpret)
            extract_k = make_extract_kernel(grid_shape=grid_shape,
                                            bricks=bricks, nsub=nsub,
                                            order=order, interpret=interpret)
        _cache[key] = (
            make_spread_kernel(grid_shape=grid_shape, bricks=bricks,
                               nsub=nsub, order=order, interpret=interpret),
            make_interp_kernel(grid_shape=grid_shape, bricks=bricks,
                               nsub=nsub, order=order, interpret=interpret),
            fold_k, extract_k)
    spread_k, interp_k, fold_k, extract_k = _cache[key]

    recip = recip_box_vectors(box)
    qoh = soh_b * q_b[:, None, :]
    g = bricks[0] * bricks[1] * bricks[2]
    (px, wx), (py, wy), (pz, wz) = brick_window(grid_shape, bricks, order)
    windows = spread_k(pos_b, qoh, recip)

    if eterm is None:
        if dispersion:
            eterm = pme.dispersion_eterm(grid_shape, moduli, box, recip,
                                         alpha, dtype, half=True)
        else:
            eterm = pme.coulomb_eterm(grid_shape, moduli, box, recip, alpha,
                                      dtype, half=True)
    lam_nn = lam_s[jnp.asarray(slice_table)]
    W7 = windows.reshape(bricks + (nsub, wx, wy, wz))
    if mode == "blocked":
        # overlap-add into the BLOCKED (brick, point) layout with XLA
        # roll-adds (no interleave transpose, no Pallas), then a forward
        # DFT whose matrices absorb the (brick, point) -> grid-line
        # permutation — grid-DFT FLOPs, zero layout passes
        gb = pme_bricks.fold_windows_blocked(W7, bricks, grid_shape)
        s_re, s_im = pme.rfft3_matmul_blocked(gb, bricks, grid_shape)
    elif mode == "grid":
        # windows -> (+1-shifted) grid via the fold kernel; the global +1
        # shift is a pure spectral phase that cancels in the |S|^2 energy
        # products and round-trips through the (diagonal) convolution, so
        # the whole pipeline runs in the shifted frame without correction
        grid = fold_k(W7)
        s_re, s_im = pme.rfft3_matmul(grid)
    else:
        # overlap-add folded into the DFT matrices: the charge grid never
        # exists in grid-major layout (see pme.rfft3_matmul_windows)
        s_re, s_im = pme.rfft3_matmul_windows(W7, bricks, grid_shape)
    if energies:
        w = pme.rfft_energy_weights(nz, dtype)
        slice_energies = pme.pme_slice_energies_ri(
            s_re, s_im, eterm * w[None, None, :], slice_subset_pairs)
    else:
        nsl = np.asarray(slice_subset_pairs).shape[0]
        slice_energies = jnp.zeros((nsl,), dtype)
    # lambda-combination commutes with the linear inverse transform, so it
    # runs in (half-size) spectrum space
    cr = jnp.einsum("st,txyk->sxyk", lam_nn, s_re * eterm[None])
    ci = jnp.einsum("st,txyk->sxyk", lam_nn, s_im * eterm[None])
    if mode == "grid":
        phi = pme.irfft3_matmul(cr, ci, grid_shape)
        win_phi = extract_k(phi)
    else:
        # the window gather is folded into the synthesis matrices so the
        # potential grid never exists in grid-major layout
        win_phi = pme.irfft3_matmul_windows(cr, ci, bricks, grid_shape,
                                            (wx, wy, wz))
    forces_fm = interp_k(win_phi.reshape(g, nsub * wx, wy * wz), pos_b,
                         soh_b, q_b[:, None, :], recip)
    return slice_energies, jnp.swapaxes(forces_fm, 1, 2)
