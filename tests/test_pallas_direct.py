"""Pallas fused pair kernel vs the XLA cell-list engine, compared at the
full make_compute level (exclusion corrections are fused into the Pallas
tiles, so the comparison must include them).  Interpret mode on CPU; the
same kernel compiles natively on TPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.ops import engine as engine_mod
from nonbondedslicing_tpu.ops import plan as plan_mod
from tests.test_neighbors import _random_system


@pytest.mark.parametrize("method,switching", [
    (nbs.SlicedNonbondedForce.CutoffPeriodic, False),
    (nbs.SlicedNonbondedForce.CutoffPeriodic, True),
    (nbs.SlicedNonbondedForce.PME, False),
    (nbs.SlicedNonbondedForce.LJPME, False),
])
def test_pallas_matches_xla_cell_engine(method, switching):
    force, system, positions, box = _random_system(method, n=300,
                                                   switching=switching)
    plan = plan_mod.build_plan(force, system)
    data = {k: (v.astype(jnp.float32) if v.dtype.kind == "f" else v)
            for k, v in engine_mod.plan_data(plan).items()}
    gvals = jnp.asarray(plan.global_defaults, jnp.float32)
    pos = jnp.asarray(positions, jnp.float32)
    boxj = jnp.asarray(box, jnp.float32)

    ref_fn = jax.jit(engine_mod.make_compute(plan, True, False,
                                             neighbor="cell"))
    pls_fn = engine_mod.make_compute(plan, True, False, neighbor="pallas")
    e_ref, f_ref = ref_fn(pos, boxj, gvals, data)
    e_pls, f_pls = pls_fn(pos, boxj, gvals, data)
    np.testing.assert_allclose(np.asarray(e_pls), np.asarray(e_ref),
                               rtol=2e-4, atol=2e-2)
    scale = np.abs(np.asarray(f_ref)).max()
    np.testing.assert_allclose(np.asarray(f_pls), np.asarray(f_ref),
                               rtol=2e-3, atol=2e-4 * max(scale, 1.0))


def test_pallas_f64_falls_back_with_corrections():
    method = nbs.SlicedNonbondedForce.PME
    force, system, positions, box = _random_system(method, n=300)
    plan = plan_mod.build_plan(force, system)
    data = engine_mod.plan_data(plan)
    gvals = jnp.asarray(plan.global_defaults)
    pos = jnp.asarray(positions)
    boxj = jnp.asarray(box)
    ref_fn = jax.jit(engine_mod.make_compute(plan, True, False,
                                             neighbor="cell"))
    pls_fn = jax.jit(engine_mod.make_compute(plan, True, False,
                                             neighbor="pallas"))
    e_ref, f_ref = ref_fn(pos, boxj, gvals, data)
    e_pls, f_pls = pls_fn(pos, boxj, gvals, data)
    np.testing.assert_allclose(np.asarray(e_pls), np.asarray(e_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f_pls), np.asarray(f_ref),
                               rtol=1e-12, atol=1e-12)
