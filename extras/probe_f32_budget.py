"""Per-term f32-vs-f64 error budget on the 1200-particle parity config
(VERDICT r2 'missing #5').  Runs on CPU; prints absolute/relative error per
term (direct, reciprocal, total, forces, dE/dlambda)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops.plan import build_plan
from nonbondedslicing_tpu.ops import engine as eng
import jax.numpy as jnp

import sys; sys.path.insert(0, "tests"); from test_platform_parity import _build

for method_name in ("PME",):
    method = getattr(nbs.SlicedNonbondedForce, method_name)
    system, positions = _build(method)
    force = system.getForce(0)
    box = np.asarray(system.getDefaultPeriodicBoxVectors(), dtype=np.float64)

    plan = build_plan(force, system)
    data64 = eng.plan_data(plan)
    gvals = np.asarray(plan.global_defaults, dtype=np.float64)

    rows = {}
    for tag, (ind, inr) in {"direct": (True, False),
                            "recip": (False, True),
                            "total": (True, True)}.items():
        out = {}
        for prec, dt in (("f64", jnp.float64), ("f32", jnp.float32)):
            f = eng.make_compute(plan, ind, inr)
            se, F = f(jnp.asarray(positions, dt), jnp.asarray(box, dt),
                      jnp.asarray(gvals, dt), jax.tree.map(lambda x: x, data64))[:2]
            lam = eng.lambda_matrix(plan, jnp.asarray(gvals, dt)) if hasattr(eng, "lambda_matrix") else None
            out[prec] = (np.asarray(se, np.float64), np.asarray(F, np.float64))
        se64, F64 = out["f64"]; se32, F32 = out["f32"]
        E64, E32 = se64.sum(), se32.sum()  # lam=uniform-ish proxy; per-slice moments matter
        rows[tag] = (E64, E32 - E64, np.abs(se32 - se64).max(),
                     np.abs(F32 - F64).max() / max(np.abs(F64).max(), 1e-30))
    for tag, (E64, dE, dse, df) in rows.items():
        print(f"{tag:7s} E64={E64:16.6f} dE={dE:+.4e} max|dSlice|={dse:.4e} relF={df:.3e}")
