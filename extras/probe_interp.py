#!/usr/bin/env python
"""Ablation probe for the Pallas PME interp kernel: which part of the
per-brick pipeline (spline build / window dot / S-reduce) dominates.

Run on the TPU: python extras/probe_interp.py [bricks_per_axis]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    from nonbondedslicing_tpu.ops import pallas_pme, pme_bricks
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    bricks = (nb, nb, nb)
    grid_shape = tuple(pme_bricks.aligned_grid((57, 57, 57), bricks))
    order = 5
    (px, wx), (py, wy), (pz, wz) = pme_bricks.brick_window(grid_shape, bricks,
                                                           order)
    g = nb * nb * nb
    nsub = 3
    C = (136 * (6 // nb) ** 3)
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    L = 6.12
    pos_b = jnp.asarray(rng.random((g, 3, C)) * L, dtype)
    soh_b = jnp.asarray(rng.random((g, nsub, C)), dtype)
    q_b = jnp.asarray(rng.random((g, 1, C)), dtype)
    W0 = jnp.asarray(rng.normal(size=(g, nsub * wx, wy * wz)), dtype)
    recip = jnp.asarray(np.diag([1.0 / L] * 3), dtype)
    print(f"bricks={bricks} grid={grid_shape} w=({wx},{wy},{wz}) C={C}")

    # full interp kernel (the real one)
    interp = pallas_pme.make_interp_kernel(grid_shape=grid_shape,
                                           bricks=bricks, nsub=nsub)

    def step_full(w):
        f = interp(w, pos_b, soh_b, q_b, recip)
        return w + 1e-12 * jnp.sum(f[:, :, :1])
    print(f"full interp:      {slope_ms(step_full, W0):8.3f} ms", flush=True)

    # ablation variants
    from nonbondedslicing_tpu.ops.pallas_pme import (_axis_splines, _axis_T,
                                                     _dot_f32_3pass)
    nby, nbz = bricks[1], bricks[2]
    nx, ny, nz = grid_shape

    def make_variant(do_splines, n_dots, do_reduce, dot3pass=True):
        def kernel(recip_ref, w_ref, pos_ref, soh_ref, q_ref, out_ref):
            i = pl.program_id(0)
            bz = jax.lax.rem(i, nbz)
            by = jax.lax.rem(jax.lax.div(i, nbz), nby)
            bx = jax.lax.div(i, nbz * nby)
            pos = pos_ref[0]
            if do_splines:
                thx, dthx, relx = _axis_splines(pos, recip_ref, 0, nx, px,
                                                bx, order, dtype)
                thy, dthy, rely = _axis_splines(pos, recip_ref, 1, ny, py,
                                                by, order, dtype)
                thz, dthz, relz = _axis_splines(pos, recip_ref, 2, nz, pz,
                                                bz, order, dtype)
                tx = _axis_T(relx, thx, wx, order, dtype)
                ty = _axis_T(rely, thy, wy, order, dtype)
                tz = _axis_T(relz, thz, wz, order, dtype)
                dtx = _axis_T(relx, dthx, wx, order, dtype)
                dty = _axis_T(rely, dthy, wy, order, dtype)
                dtz = _axis_T(relz, dthz, wz, order, dtype)
            else:
                tx = dtx = pos[0:1] * jnp.ones((wx, C), dtype)
                ty = dty = pos[0:1] * jnp.ones((wy, C), dtype)
                tz = dtz = pos[0:1] * jnp.ones((wz, C), dtype)
            soh = soh_ref[0]
            W = w_ref[0]
            acc = jnp.zeros((1, C), dtype)
            combos = [(ty, tz, dtx), (dty, tz, tx), (ty, dtz, tx)][:n_dots]
            for By, Bz, Tx in combos:
                B = (By[:, None, :] * Bz[None, :, :]).reshape(wy * wz, -1)
                if dot3pass:
                    P = _dot_f32_3pass(W, B, (((1,), (0,)), ((), ())))
                else:
                    P = jax.lax.dot_general(
                        W, B, (((1,), (0,)), ((), ())),
                        preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)
                if do_reduce:
                    S = (soh[:, None, :] * Tx[None, :, :]).reshape(
                        nsub * wx, -1)
                    acc = acc + jnp.sum(S * P, axis=0, keepdims=True)
                else:
                    acc = acc + P[:1]
            out_ref[0] = jnp.concatenate([acc, acc, acc], axis=0)

        def run(windows):
            import contextlib
            x64_off = (jax.enable_x64(False) if hasattr(jax, "enable_x64")
                       else contextlib.nullcontext())
            with x64_off:
                return pl.pallas_call(
                    kernel,
                    grid=(g,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((1, nsub * wx, wy * wz),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 3, C), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, nsub, C), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, 3, C), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((g, 3, C), dtype),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(recip, windows, pos_b, soh_b, q_b)
        return run

    for name, kw in [
        ("splines only (0 dots)", dict(do_splines=True, n_dots=0,
                                       do_reduce=False)),
        ("1 dot, no splines", dict(do_splines=False, n_dots=1,
                                   do_reduce=False)),
        ("3 dots, no splines", dict(do_splines=False, n_dots=3,
                                    do_reduce=False)),
        ("3 dots + reduce, no splines", dict(do_splines=False, n_dots=3,
                                             do_reduce=True)),
        ("full pipeline (variant)", dict(do_splines=True, n_dots=3,
                                         do_reduce=True)),
        ("3 dots HIGHEST, no splines", dict(do_splines=False, n_dots=3,
                                            do_reduce=False, dot3pass=False)),
    ]:
        v = make_variant(**kw)

        def step(w, v=v):
            f = v(w)
            return w + 1e-12 * jnp.sum(f[:, :, :1])
        print(f"{name:30s} {slope_ms(step, W0):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
