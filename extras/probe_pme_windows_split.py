#!/usr/bin/env python
"""Stage decomposition of the windows PME pipeline at the 23k bench config:
spread kernel / forward windows-DFT / eterm+lambda combine / inverse
windows-DFT / interp kernel, each slope-timed in isolation on the TPU."""

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
    from nonbondedslicing_tpu.ops import pallas_pme, pme_bricks, pme
    from nonbondedslicing_tpu.ops.pme_bricks import brick_window
    from nonbondedslicing_tpu.ops.geometry import recip_box_vectors

    bricks = (6, 6, 6)
    grid_shape = (60, 60, 60)
    order = 5
    nsub = 3
    C = 136
    g = 216
    nz = grid_shape[2]
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    L = 6.12
    pos_b = jnp.asarray(rng.random((g, 3, C)) * L, dtype)
    soh_b = jnp.asarray(rng.random((g, nsub, C)), dtype)
    q_b = jnp.asarray(rng.random((g, C)), dtype)
    box = jnp.asarray(np.diag([L] * 3), dtype)
    recip = recip_box_vectors(box).astype(dtype)
    (px, wx), (py, wy), (pz, wz) = brick_window(grid_shape, bricks, order)
    print(f"bricks={bricks} grid={grid_shape} w=({wx},{wy},{wz}) C={C}")

    spread_k = pallas_pme.make_spread_kernel(grid_shape=grid_shape,
                                             bricks=bricks, nsub=nsub,
                                             order=order)
    interp_k = pallas_pme.make_interp_kernel(grid_shape=grid_shape,
                                             bricks=bricks, nsub=nsub,
                                             order=order)
    qoh0 = soh_b * q_b[:, None, :]
    W0 = spread_k(pos_b, qoh0, recip)
    W7_0 = W0.reshape(bricks + (nsub, wx, wy, wz))
    s_re0, s_im0 = pme.rfft3_matmul_windows(W7_0, bricks, grid_shape)
    moduli = pme.bspline_moduli(grid_shape, order=order)
    eterm = pme.coulomb_eterm(grid_shape, moduli, box, recip, 3.1,
                              dtype, half=True)
    lam_nn = jnp.ones((nsub * (nsub + 1) // 2, nsub), dtype)[:nsub, :nsub]
    cr0 = jnp.einsum("st,txyk->sxyk", lam_nn, s_re0 * eterm[None])
    ci0 = jnp.einsum("st,txyk->sxyk", lam_nn, s_im0 * eterm[None])
    win_phi0 = pme.irfft3_matmul_windows(cr0, ci0, bricks, grid_shape,
                                         (wx, wy, wz))

    def step_spread(p):
        W = spread_k(p, qoh0, recip)
        return p + 1e-12 * jnp.sum(W[:, :1, :1])

    def step_fwd(w):
        sr, si = pme.rfft3_matmul_windows(
            w.reshape(bricks + (nsub, wx, wy, wz)), bricks, grid_shape)
        return w + 1e-12 * jnp.sum(sr[:, :1, :1, :1] + si[:, :1, :1, :1])

    def step_comb(sr):
        cr = jnp.einsum("st,txyk->sxyk", lam_nn, sr * eterm[None])
        ci = jnp.einsum("st,txyk->sxyk", lam_nn, sr * eterm[None])
        return sr + 1e-12 * (cr + ci)

    def step_inv(cr):
        wp = pme.irfft3_matmul_windows(cr, cr, bricks, grid_shape,
                                       (wx, wy, wz))
        return cr + 1e-12 * jnp.sum(wp[:1, :1, :1, :1, :1])

    def step_interp(wp):
        f = interp_k(wp.reshape(g, nsub * wx, wy * wz), pos_b, soh_b,
                     q_b[:, None, :], recip)
        return wp + 1e-12 * jnp.sum(f[:1, :1, :3])

    print(f"spread kernel:    {slope_ms(step_spread, pos_b):8.3f} ms",
          flush=True)
    print(f"forward win-DFT:  {slope_ms(step_fwd, W0):8.3f} ms", flush=True)
    print(f"eterm+lam comb:   {slope_ms(step_comb, s_re0):8.3f} ms",
          flush=True)
    print(f"inverse win-DFT:  {slope_ms(step_inv, cr0):8.3f} ms", flush=True)
    wp_flat = win_phi0.reshape(g, nsub * wx, wy * wz)
    print(f"interp kernel:    {slope_ms(step_interp, wp_flat):8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
