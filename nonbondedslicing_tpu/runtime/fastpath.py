"""Fused MD step loop for throughput benchmarking.

One jitted ``lax.scan`` over leapfrog-Verlet steps with the full sliced
nonbonded evaluation inside — the TPU analog of the reference's
integrator.step() loop, but with zero host round-trips per step (the
reference launches ~10 kernels per step from the host,
CommonNonbondedSlicingKernels.cpp:846-1402).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import engine as engine_mod
from ..ops.params import slice_lambdas


def make_md_step(plan, masses, dt, dtype=jnp.float32, block_size=None):
    """Returns run(pos, vel, box, gvals, data, n_steps) -> (pos, vel, energy).

    Leapfrog Verlet: v += dt*F/m; x += dt*v.
    """
    compute = engine_mod.make_compute(plan, True, True, block_size=block_size)
    inv_m = jnp.asarray(np.where(masses > 0, 1.0 / np.maximum(masses, 1e-300), 0.0),
                        dtype)[:, None]
    lam_source = plan.lam_source

    @partial(jax.jit, static_argnums=(5,))
    def run(pos, vel, box, gvals, data, n_steps):
        def step(carry, _):
            pos, vel = carry
            _, forces = compute(pos, box, gvals, data)
            vel = vel + dt * forces * inv_m
            pos = pos + dt * vel
            return (pos, vel), None

        (pos, vel), _ = jax.lax.scan(step, (pos, vel), None, length=n_steps)
        slice_e, _ = compute(pos, box, gvals, data)
        lam = slice_lambdas(lam_source, gvals)
        energy = engine_mod.contract_energy(slice_e, lam)
        return pos, vel, energy

    return run
