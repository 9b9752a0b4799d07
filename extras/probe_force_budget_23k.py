"""Decompose the f32 force-parity residual on the equilibrated 23k bench
state into direct-space vs reciprocal-space contributions.

For each component (direct-only, reciprocal-only, total) compute forces with
the f32 cell engine and the f64 cell engine from the same f64 positions and
report max |dF| relative to the max TOTAL force magnitude (the quantity the
parity tests bound).  Run on CPU: JAX_PLATFORMS=cpu python
extras/probe_force_budget_23k.py  (~2 min; 23k cell engine in f64).

Also reports the reciprocal-only error under NBS_PME_DOT variants when run
on TPU (the bf16x3 vs HIGHEST question); on CPU the Pallas PME path is not
used, so the CPU numbers isolate f32 spread/interp + matmul-DFT rounding.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from nonbondedslicing_tpu.ops import engine as engine_mod


def main():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench  # the bench system builder (23k rigid water)

    blob = np.load(os.path.join(os.path.dirname(__file__),
                                "bench_state_rigid.npz"))
    pos = blob["positions"]
    from nonbondedslicing_tpu.ops import plan as plan_mod
    system, force, _, _, _, _ = bench.build_system()
    plan = plan_mod.build_plan(force, system)
    data = engine_mod.plan_data(plan)
    box = np.array(system.getDefaultPeriodicBoxVectors())
    gvals = np.asarray(plan.global_defaults, dtype=np.float64)

    outs = {}
    for dtype in (jnp.float32, jnp.float64):
        dt = {k: (v.astype(dtype) if hasattr(v, "dtype")
                  and v.dtype.kind == "f" else v) for k, v in data.items()}
        p = jnp.asarray(pos, dtype)
        b = jnp.asarray(box, dtype)
        g = jnp.asarray(gvals, dtype)
        for name, (inc_d, inc_r) in dict(direct=(True, False),
                                         recip=(False, True),
                                         total=(True, True)).items():
            fn = engine_mod.make_compute(plan, inc_d, inc_r, neighbor="cell")
            _, f = fn(p, b, g, dt)
            outs[(name, dtype.__name__)] = np.asarray(f, np.float64)
            print(f"computed {name} {dtype.__name__}", flush=True)

    scale = np.abs(outs[("total", "float64")]).max()
    print(f"max |F_total| = {scale:.4e}")
    for name in ("direct", "recip", "total"):
        err = np.abs(outs[(name, "float32")]
                     - outs[(name, "float64")]).max()
        print(f"{name:7s}: max|dF| = {err:.4e}  rel-to-total = "
              f"{err / scale:.3e}")


if __name__ == "__main__":
    main()
