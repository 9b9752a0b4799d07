#!/usr/bin/env python
"""Stage decomposition of the v2 windows-DFT (the 0.74 ms that dominates
PME at the 23k bench): forward vs inverse, matmul vs transpose vs precision.
Run on the TPU."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_traceback_in_locations_limit", 0)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_nbs"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def slope_ms(make_step, x0, n1=6, n2=30):
    @partial(jax.jit, static_argnums=(1,))
    def run(x, n):
        def body(c, _):
            return make_step(c), None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0)

    for n in (n1, n2):
        float(run(x0, n))
    ts = {}
    for n in (n1, n2, n1, n2):
        t0 = time.perf_counter()
        float(run(x0, n))
        ts.setdefault(n, []).append(time.perf_counter() - t0)
    return (min(ts[n2]) - min(ts[n1])) / (n2 - n1) * 1e3


def main():
    from nonbondedslicing_tpu.ops import pme as pme_mod
    from nonbondedslicing_tpu.ops.pme import (
        _win_fwd_blocks, _win_inv_blocks, _pad8)

    bricks = (6, 6, 6)
    grid_shape = (60, 60, 60)
    nsub = 3
    wx = wy = wz = 16
    bxc, byc, bzc = bricks
    nx, ny, nz = grid_shape
    nzh = nz // 2 + 1
    rng = np.random.default_rng(0)
    dtype = jnp.float32
    W = jnp.asarray(rng.normal(size=(bxc, byc, bzc, nsub, wx, wy, wz)),
                    dtype)
    re0 = jnp.asarray(rng.normal(size=(nsub, nx, ny, nzh)), dtype)
    im0 = jnp.asarray(rng.normal(size=(nsub, nx, ny, nzh)), dtype)

    def step_fwd(w):
        r, i = pme_mod._rfft3_matmul_windows_v2(w, bricks, grid_shape)
        return w + 1e-20 * (jnp.sum(r[:1, :1, :1]) + jnp.sum(i[:1, :1, :1]))
    print(f"fwd v2 (HIGH):     {slope_ms(step_fwd, W):8.3f} ms", flush=True)

    def step_inv(x):
        r, i = x
        wout = pme_mod._irfft3_matmul_windows_v2(r, i, bricks, grid_shape,
                                                 (wx, wy, wz))
        return (r + 1e-20 * jnp.sum(wout[:1, :1, :1]), i)
    print(f"inv v2 (HIGH):     {slope_ms(step_inv, (re0, im0)):8.3f} ms",
          flush=True)

    # same structure, DEFAULT precision (isolates the bf16x3 cost)
    Az, My, Mx, NX, NY, NZ = _win_fwd_blocks(
        bricks, (wx, wy, wz), grid_shape, "float32")
    prec = jax.lax.Precision.DEFAULT

    def fwd_prec(w, prec):
        t = w.transpose(0, 1, 3, 4, 5, 2, 6)
        t = t.reshape(bxc * byc * nsub * wx * wy, bzc * wz)
        t = jnp.dot(t, jnp.asarray(Az), precision=prec)
        t = t.reshape(bxc, byc, nsub, wx, wy, 2, NZ)
        t = t.transpose(0, 2, 3, 6, 5, 1, 4)
        t = t.reshape(bxc * nsub * wx * NZ, 2 * byc * wy)
        t = jnp.dot(t, jnp.asarray(My), precision=prec)
        t = t.reshape(bxc, nsub, wx, NZ, 2, NY)
        t = t.transpose(1, 5, 3, 4, 0, 2)
        t = t.reshape(nsub * NY * NZ, 2 * bxc * wx)
        t = jnp.dot(t, jnp.asarray(Mx), precision=prec)
        return t

    def step_fwd_def(w):
        t = fwd_prec(w, jax.lax.Precision.DEFAULT)
        return w + 1e-20 * jnp.sum(t[:1, :1])
    print(f"fwd v2 (DEFAULT):  {slope_ms(step_fwd_def, W):8.3f} ms",
          flush=True)

    # transposes only (no dots): how much is pure layout?
    def step_tr(w):
        t = w.transpose(0, 1, 3, 4, 5, 2, 6)
        t = t.reshape(bxc * byc * nsub * wx * wy, bzc * wz)
        t2 = t.reshape(bxc, byc, nsub, wx, wy, bzc, wz)[..., :2, :]
        t2 = t2.transpose(0, 2, 3, 6, 5, 1, 4)
        s = jnp.sum(t2[:1])
        return w + 1e-20 * s
    print(f"fwd transposes~:   {slope_ms(step_tr, W):8.3f} ms", flush=True)

    # dots only, pre-laid-out operands
    t0 = jnp.asarray(rng.normal(size=(bxc * byc * nsub * wx * wy,
                                      bzc * wz)), dtype)
    t1 = jnp.asarray(rng.normal(size=(bxc * nsub * wx * NZ,
                                      2 * byc * wy)), dtype)
    t2 = jnp.asarray(rng.normal(size=(nsub * NY * NZ, 2 * bxc * wx)), dtype)
    for prec, name in ((jax.lax.Precision.HIGH, "HIGH"),
                       (jax.lax.Precision.DEFAULT, "DEF ")):
        def step_dots(x, prec=prec):
            a = jnp.dot(x, jnp.asarray(Az), precision=prec)
            b = jnp.dot(t1 + a[0, 0], jnp.asarray(My), precision=prec)
            c = jnp.dot(t2 + b[0, 0], jnp.asarray(Mx), precision=prec)
            return x + 1e-20 * jnp.sum(c[:1])
        print(f"fwd dots only {name}: {slope_ms(step_dots, t0):8.3f} ms",
              flush=True)


def v3_einsum():
    """v3 candidate: same block-complex matrices, einsum instead of explicit
    transpose+reshape+dot (XLA may fuse operand relayouts into the matmul)."""
    from nonbondedslicing_tpu.ops.pme import _win_fwd_blocks

    bricks = (6, 6, 6)
    grid_shape = (60, 60, 60)
    nsub = 3
    wx = wy = wz = 16
    bxc, byc, bzc = bricks
    nx, ny, nz = grid_shape
    rng = np.random.default_rng(0)
    dtype = jnp.float32
    W = jnp.asarray(rng.normal(size=(bxc, byc, bzc, nsub, wx, wy, wz)),
                    dtype)
    Az, My, Mx, NX, NY, NZ = _win_fwd_blocks(
        bricks, (wx, wy, wz), grid_shape, "float32")
    Az3 = jnp.asarray(Az.reshape(bzc, wz, 2 * NZ))
    My4 = jnp.asarray(My.reshape(2, byc, wy, 2 * NY))
    Mx4 = jnp.asarray(Mx.reshape(2, bxc, wx, 2 * NX))
    prec = jax.lax.Precision.HIGH

    def step(w):
        t = jnp.einsum("XYZsxyz,Zzk->XYsxyk", w, Az3, precision=prec)
        t = t.reshape(bxc, byc, nsub, wx, wy, 2, NZ)
        t = jnp.einsum("XYsxyck,cYyj->Xsxkj", t, My4, precision=prec)
        t = t.reshape(bxc, nsub, wx, NZ, 2, NY)
        t = jnp.einsum("XsxkcJ,cXxi->sJki", t, Mx4, precision=prec)
        return w + 1e-20 * jnp.sum(t[:1, :1])
    print(f"fwd v3 einsum:     {slope_ms(step, W):8.3f} ms", flush=True)



if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "v3":
        v3_einsum()
        raise SystemExit
    main()
