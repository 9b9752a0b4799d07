"""Fused MD step loop for throughput benchmarking.

One jitted ``lax.scan`` over leapfrog-Verlet steps with the full sliced
nonbonded evaluation inside — the TPU analog of the reference's
integrator.step() loop, but with zero host round-trips per step (the
reference launches ~10 kernels per step from the host,
CommonNonbondedSlicingKernels.cpp:846-1402).

Optionally includes harmonic bonds (for flexible intramolecular geometry)
computed inside the same compiled step.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import engine as engine_mod
from ..ops.params import slice_lambdas


def make_md_step(plan, masses, dt, dtype=jnp.float32, block_size=None,
                 bonds=None, cell_capacity=None):
    """Returns run(pos, vel, box, gvals, data, n_steps) -> (pos, vel, energy).

    Leapfrog Verlet: v += dt*F/m; x += dt*v.  ``bonds`` is an optional
    (M, 4) array-like of (i, j, r0, k) harmonic bonds evaluated inside the
    step (periodic minimum image is NOT applied — bonded pairs are assumed
    never to straddle half the box).
    """
    compute = engine_mod.make_compute(plan, True, True, block_size=block_size,
                                      cell_capacity=cell_capacity,
                                      hoist_eterm=True)
    inv_m = jnp.asarray(np.where(masses > 0, 1.0 / np.maximum(masses, 1e-300), 0.0),
                        dtype)[:, None]
    lam_source = plan.lam_source
    n = plan.num_particles

    if bonds is not None and len(bonds) > 0:
        bonds = np.asarray(bonds, dtype=np.float64)
        b_i = jnp.asarray(bonds[:, 0].astype(np.int32))
        b_j = jnp.asarray(bonds[:, 1].astype(np.int32))
        b_r0 = jnp.asarray(bonds[:, 2], dtype)
        b_k = jnp.asarray(bonds[:, 3], dtype)

        def bond_forces(pos):
            dr = pos[b_i] - pos[b_j]
            r = jnp.sqrt(jnp.sum(dr * dr, axis=-1))
            dedr = b_k * (r - b_r0) / jnp.maximum(r, 1e-12)
            f = -dedr[:, None] * dr
            out = jnp.zeros((n, 3), dtype)
            return out.at[b_i].add(f).at[b_j].add(-f)
    else:
        bond_forces = None

    @partial(jax.jit, static_argnums=(5,), donate_argnums=(0, 1))
    def run(pos, vel, box, gvals, data, n_steps):
        def step(carry, _):
            pos, vel = carry
            _, forces = compute(pos, box, gvals, data)
            if bond_forces is not None:
                forces = forces + bond_forces(pos)
            vel = vel + dt * forces * inv_m
            pos = pos + dt * vel
            return (pos, vel), None

        (pos, vel), _ = jax.lax.scan(step, (pos, vel), None, length=n_steps)
        slice_e, _ = compute(pos, box, gvals, data)
        lam = slice_lambdas(lam_source, gvals)
        energy = engine_mod.contract_energy(slice_e, lam)
        return pos, vel, energy

    return run
