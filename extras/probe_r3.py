"""Round-3 design probes: measure the TPU primitives that the candidate
direct-space redesigns depend on, before committing to one.

Slope methodology (docs/devnotes.md): run inside lax.scan with a real
additive dependency, fetch one scalar, difference two scan lengths.

Probes:
  1. row gather: positions[idx] for ~1M random indices (compacted-candidate
     design pays this every step)
  2. argsort over the candidate axis (compaction build cost, every rebuild)
  3. pair-kernel slot scaling: the existing Pallas half-shell kernel at
     reduced capacity (does time scale ~linearly with candidate slots?)
  4. dense roll-based candidate assembly cost at bench scale (prepare())
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def slope_ms(make_step, x0, n1=6, n2=30):
    """Per-iteration ms via two scan lengths."""
    @partial(jax.jit, static_argnums=(1,))
    def run(x, n):
        def body(c, _):
            return make_step(c), None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0)

    for n in (n1, n2):
        float(run(x0, n))  # compile both lengths
    ts = {}
    for n in (n1, n2, n1, n2):
        t0 = time.perf_counter()
        float(run(x0, n))
        ts.setdefault(n, []).append(time.perf_counter() - t0)
    t1 = min(ts[n1])
    t2 = min(ts[n2])
    return (t2 - t1) / (n2 - n1) * 1e3


def probe_gather(n_atoms=23296, n_idx=931840):
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((n_atoms, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n_atoms, n_idx), jnp.int32)

    def step(c):
        g = c[idx]                      # (n_idx, 3) row gather
        return c + 1e-12 * jnp.sum(g, axis=0)

    ms = slope_ms(step, pos)
    print(f"gather {n_idx} rows x12B: {ms:8.3f} ms")


def probe_gather_flat(n_atoms=23296, n_idx=931840):
    """Same volume as probe_gather but flat f32 elements (3 separate 1D
    gathers) — XLA sometimes lowers these differently."""
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((3, n_atoms)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n_atoms, n_idx), jnp.int32)

    def step(c):
        g = c[:, idx]                   # (3, n_idx)
        return c + 1e-12 * jnp.sum(g, axis=1, keepdims=True)

    ms = slope_ms(step, pos)
    print(f"gather flat 3x{n_idx}: {ms:8.3f} ms")


def probe_argsort(rows=2912, width=2016):
    rng = np.random.default_rng(1)
    keys = jnp.asarray(rng.random((rows, width)), jnp.float32)

    def step(c):
        o = jnp.argsort(c, axis=-1)
        return c + 1e-12 * o.astype(jnp.float32)

    ms = slope_ms(step, keys, n1=3, n2=9)
    print(f"argsort ({rows},{width}): {ms:8.3f} ms")


def probe_topk_via_where(rows=2912, width=2016, w=320):
    """Compaction alternative: cumsum-based stable partition of a boolean
    mask into the first w slots (no sort)."""
    rng = np.random.default_rng(2)
    mask = jnp.asarray(rng.random((rows, width)) < 0.15)

    def step(m):
        pos = jnp.cumsum(m.astype(jnp.int32), axis=-1) - 1
        dest = jnp.where(m, pos, w)
        src = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
        out = jnp.full((rows, w + 1), -1, jnp.int32)
        out = out.at[jnp.arange(rows)[:, None], dest].set(src)
        return m ^ (out[:, :1] < -1)

    ms = slope_ms(step, mask, n1=3, n2=9)
    print(f"mask-compact ({rows},{width})->{w}: {ms:8.3f} ms")


def probe_kernel_capacity():
    """Pair-kernel cost vs capacity at bench geometry (6,6,6 cells)."""
    from nonbondedslicing_tpu.ops.pallas_direct import make_pallas_cell_kernel
    from nonbondedslicing_tpu.ops import direct

    rng = np.random.default_rng(3)
    counts = (6, 6, 6)
    n_cells = 216
    nsub, emax = 3, 4
    for capacity in (64, 104, 136):
        ncand = 14 * capacity
        nf = 6 + nsub
        rows_feat = jnp.asarray(rng.random((n_cells, nf, capacity)), jnp.float32)
        rows_idx = jnp.zeros((n_cells, capacity), jnp.int32)
        rows_excl = jnp.full((n_cells, emax, capacity), -1, jnp.int32)
        cand_feat = jnp.asarray(rng.random((n_cells, nf, ncand)), jnp.float32)
        cand_idx = jnp.ones((n_cells, ncand), jnp.int32)
        lam = jnp.ones((nsub, nsub), jnp.float32)
        box = jnp.eye(3, dtype=jnp.float32) * 6.1
        kern = make_pallas_cell_kernel(
            mode=direct.EWALD_DIRECT, cutoff=0.9, counts=counts,
            capacity=capacity, nsub=nsub, emax=emax, ewald_alpha=3.2,
            fuse_exclusions=False, images_preshifted=True,
            compute_energies=False)

        def step(c):
            (rf, cf, mc, mv), _ = kern(c, rows_idx, rows_excl, cand_feat,
                                       cand_idx, lam, lam, box, 23289)
            return c.at[:, :3, :].add(1e-9 * rf[:n_cells])

        ms = slope_ms(step, rows_feat)
        slots = n_cells * capacity * ncand
        print(f"pair kernel cap={capacity}: {ms:8.3f} ms "
              f"({slots/1e6:.1f}M slots, {slots/ms/1e9:.2f}G slots/ms)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend())
    if which in ("all", "gather"):
        probe_gather()
        probe_gather_flat()
    if which in ("all", "sort"):
        probe_argsort()
        probe_topk_via_where()
    if which in ("all", "kernel"):
        probe_kernel_capacity()
