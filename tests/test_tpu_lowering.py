"""AOT cross-lowering of the Pallas MD paths for the *tpu* platform.

`jax.jit(f).trace(...).lower(lowering_platforms=("tpu",))` runs the full
Mosaic kernel lowering on any host, catching TPU-only constraint violations
(SMEM block-shape rules, value-vs-ref dynamic slices, i64 index maps, ...)
that interpret-mode tests cannot see.  This is the no-hardware analog of
the reference CI's CUDA compile gate (.github/workflows/CudaToolkit.yml).
Mosaic's *backend* compile still only happens on a real device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops import engine as engine_mod
from nonbondedslicing_tpu.ops import fused
from nonbondedslicing_tpu.ops import plan as plan_mod

from test_fused import _system as _system_fused


def test_fused_md_step_lowers_for_tpu():
    system, force, positions = _system_fused(
        nbs.SlicedNonbondedForce.PME, n_mol=600, box=4.0)
    plan = plan_mod.build_plan(force, system)
    dtype = jnp.float32
    data = {k: (v.astype(dtype) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    pos = jnp.asarray(positions, dtype)
    box = jnp.asarray(np.array(system.getDefaultPeriodicBoxVectors()), dtype)
    gvals = jnp.asarray([0.8], dtype)

    out = fused.make_fused_engine(plan, hoist_eterm=True, energies=False,
                                  interpret=False, target_skin=0.1)
    prepare, apply, cfg = out

    def step(p):
        st = prepare(p, box, gvals, data)
        _, f, aux = apply(p, box, gvals, data, st)
        return p + 1e-9 * f

    lowered = jax.jit(step).trace(pos).lower(lowering_platforms=("tpu",))
    text = lowered.as_text()
    assert "tpu_custom_call" in text  # the Pallas kernels actually lowered
