"""Diagnose the f32 force-parity residual: pair math vs accumulation.

Computes all-pairs PME-direct forces on the parity-test config
(tests/test_platform_parity.py) three ways from the SAME f32 positions:

  A. f32 pair math, f32 sum over neighbors      (the fast-path behavior)
  B. f32 pair math, f64 sum over neighbors      (perfect accumulation)
  C. f64 pair math, f64 sum                     (oracle)

If |A-C| ~ |B-C|, the residual is per-pair f32 *math* rounding and
compensated accumulation in the Pallas kernel cannot close it; if
|B-C| << |A-C|, accumulation order is the culprit and a two-float
accumulator would pay.  Run on CPU (JAX_PLATFORMS=cpu).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops import direct as direct_mod
from nonbondedslicing_tpu.ops import plan as plan_mod
from nonbondedslicing_tpu.ops import engine as engine_mod


def build(n=1200, seed=2024):
    rng = np.random.default_rng(seed)
    box = 4.5
    system = nbs.System()
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    force = nbs.SlicedNonbondedForce(3)
    force.setNonbondedMethod(nbs.SlicedNonbondedForce.PME)
    force.setCutoffDistance(1.0)
    for i in range(n):
        system.addParticle(10.0)
        q = 0.3 if i % 2 == 0 else -0.3
        force.addParticle(q, 0.25 + 0.05 * (i % 3), 0.4)
        force.setParticleSubset(i, i % 3)
    system.addForce(force)
    positions = rng.random((n, 3)) * box
    return system, force, positions


def direct_forces(plan, data, pos_f32, box, dtype, accum):
    """All-pairs Ewald-direct forces with explicit math/accum dtypes."""
    pt = direct_mod.make_pair_terms(
        mode=direct_mod.EWALD_DIRECT, cutoff=plan.cutoff,
        ewald_alpha=plan.ewald_alpha)
    pos = pos_f32.astype(dtype)
    n = pos.shape[0]
    d = pos[:, None, :] - pos[None, :, :]
    b = jnp.diag(jnp.asarray(box, dtype))
    d = d - jnp.round(d / b) * b
    r2 = jnp.sum(d * d, axis=-1)
    rinv = jnp.where(r2 > 0, 1.0 / jnp.sqrt(jnp.maximum(r2, 1e-30)), 0.0)
    from nonbondedslicing_tpu.ops.params import particle_params
    gvals = jnp.zeros((0,), dtype)
    data_t = {k: (v.astype(dtype) if hasattr(v, "dtype")
                  and v.dtype.kind == "f" else v) for k, v in data.items()}
    q, sh, e2 = (a.astype(dtype) for a in particle_params(data_t, gvals))
    qq = q[:, None] * q[None, :]
    _, _, dedr_c, dedr_v = pt(r2, rinv, sh[:, None], sh[None, :],
                              e2[:, None], e2[None, :], qq)
    mask = (r2 < plan.cutoff ** 2) & (r2 > 0)
    dedr = jnp.where(mask, dedr_c + dedr_v, 0.0)
    fvec = dedr[:, :, None] * d                     # (n, n, 3) f(i<-j)
    return jnp.sum(fvec.astype(accum), axis=1)


def main():
    system, force, positions = build()
    plan = plan_mod.build_plan(force, system)
    data = engine_mod.plan_data(plan)
    box = np.array(system.getDefaultPeriodicBoxVectors())
    pos32 = jnp.asarray(positions, jnp.float32)

    fA = np.asarray(direct_forces(plan, data, pos32, box,
                                  jnp.float32, jnp.float32), np.float64)
    fB = np.asarray(direct_forces(plan, data, pos32, box,
                                  jnp.float32, jnp.float64), np.float64)
    fC = np.asarray(direct_forces(plan, data, pos32, box,
                                  jnp.float64, jnp.float64), np.float64)
    scale = np.abs(fC).max()
    print(f"force scale (max |F|): {scale:.4e}")
    print(f"A (f32 math, f32 sum) vs C: {np.abs(fA - fC).max() / scale:.3e}")
    print(f"B (f32 math, f64 sum) vs C: {np.abs(fB - fC).max() / scale:.3e}")
    print(f"A vs B (pure accumulation): {np.abs(fA - fB).max() / scale:.3e}")


if __name__ == "__main__":
    main()
