#!/usr/bin/env python
"""XLA gather/scatter throughput at the shapes a compacted (cluster-pair)
neighbor structure would need per MD step on this TPU.

The round-5 candidate design packs, at prepare time, a per-i-cluster list of
candidate slot ids (static capacity C').  Per step it must materialize
candidate POSITIONS for the pair kernel: a gather of M = n_clusters * C'
elements from the ~29k slot-ordered position table.  Whether that gather is
~0.1 ms or ~1.5 ms decides the whole structure.  Variants:

  flat-row   out[m] = src[idx[m]] with src (S, 3)
  flat-xyz   three scalar gathers from (S,) arrays
  jcl-8      block gather of 8-row clusters: src (S/8, 8, 3), idx (M/8,)
  jcl-16     16-row blocks
  jcl-32     32-row blocks
  scatter    zeros(S,3).at[idx].add(vals) (Newton half-list force return)
  take2d     jnp.take of (T, Cp) index matrix from flat (S,) x3

Run on the real TPU: python extras/probe_gather_r5.py
"""

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


def slope_ms(make_step, x0, n1=4, n2=20):
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
    S = 29377                      # slots at the 23k bench (216*136 + pad)
    rng = np.random.default_rng(0)
    # local-ish indices: like a real neighbor list, each row's candidates
    # cluster around the row's own region of slot space
    def local_idx(M, width=4096):
        base = rng.integers(0, S, size=(M // 256, 1))
        off = rng.integers(-width // 2, width // 2, size=(M // 256, 256))
        return ((base + off) % S).astype(np.int32).reshape(-1)

    for M in (1_179_648, 2_359_296, 4_718_592):     # 2912x{405,810,1620}
        idx = jnp.asarray(local_idx(M))
        print(f"--- M = {M/1e6:.2f}M gathered elements "
              f"({M*12/1e6:.0f} MB out) ---", flush=True)

        src3 = jnp.asarray(rng.random((S, 3), dtype=np.float32))

        def g_flat(x):
            out = x[idx]
            return x + 1e-12 * jnp.sum(out) * jnp.ones_like(x)
        print(f"flat-row : {slope_ms(g_flat, src3):7.3f} ms", flush=True)

        sx = jnp.asarray(rng.random((S,), dtype=np.float32))

        def g_xyz(x):
            a = x[idx]
            b = (x * 2)[idx]
            c = (x * 3)[idx]
            return x + 1e-12 * (jnp.sum(a) + jnp.sum(b) + jnp.sum(c)) \
                * jnp.ones_like(x)
        print(f"flat-xyz : {slope_ms(g_xyz, sx):7.3f} ms", flush=True)

        for B in (8, 16, 32):
            nblk = (S // B)
            srcb = jnp.asarray(rng.random((nblk, B, 3), dtype=np.float32))
            idxb = jnp.asarray(
                (local_idx(M // B, width=4096 // B) % nblk).astype(np.int32))

            def g_blk(x, idxb=idxb):
                out = x[idxb]
                return x + 1e-12 * jnp.sum(out) * jnp.ones_like(x)
            print(f"jcl-{B:<2d}   : {slope_ms(g_blk, srcb):7.3f} ms",
                  flush=True)

        vals = jnp.asarray(rng.random((M, 3), dtype=np.float32))

        def s_add(x):
            out = jnp.zeros((S, 3), jnp.float32).at[idx].add(vals + x[0, 0])
            return x + 1e-12 * out
        print(f"scatter  : {slope_ms(s_add, src3):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
