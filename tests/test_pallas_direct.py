"""Pallas fused pair kernel vs the XLA cell-list engine (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import nonbondedslicing_tpu as nbs
from nonbondedslicing_tpu.models.force import NonbondedForce
from nonbondedslicing_tpu.ops import engine as engine_mod
from nonbondedslicing_tpu.ops import neighbors, pallas_direct
from nonbondedslicing_tpu.ops import plan as plan_mod
from nonbondedslicing_tpu.ops.plan import EWALD_METHODS
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
    data = engine_mod.plan_data(plan)
    gvals = jnp.asarray(plan.global_defaults, jnp.float32)
    pos = jnp.asarray(positions, jnp.float32)
    boxj = jnp.asarray(box, jnp.float32)

    from nonbondedslicing_tpu.ops import direct, params
    counts, capacity = neighbors.choose_cell_grid(plan.box0, plan.cutoff,
                                                  plan.num_particles)
    mode = (direct.CUTOFF if method == NonbondedForce.CutoffPeriodic
            else direct.EWALD_DIRECT)
    eps_rf = plan.rf_dielectric
    krf = plan.cutoff ** -3 * (eps_rf - 1) / (2 * eps_rf + 1)
    crf = (1 / plan.cutoff) * (3 * eps_rf) / (2 * eps_rf + 1)
    kw = dict(mode=mode, cutoff=plan.cutoff, counts=counts, capacity=capacity,
              krf=krf, crf=crf, use_switch=plan.use_switch,
              switch_distance=plan.switch_distance,
              ewald_alpha=plan.ewald_alpha,
              ljpme=(method == NonbondedForce.LJPME),
              dispersion_alpha=plan.dispersion_alpha,
              num_slices=plan.num_slices)
    xla_fn = neighbors.make_cell_direct_space(**kw)
    pls_fn = pallas_direct.make_pallas_direct_space(interpret=True, **kw)

    f32 = {k: (v.astype(jnp.float32) if v.dtype.kind == "f" else v)
           for k, v in data.items()}
    charge, sig_half, eps2 = params.particle_params(f32, gvals)
    lam = params.slice_lambdas(plan.lam_source, gvals)
    args = (pos, boxj, charge, sig_half, eps2, f32["subsets"],
            f32["exclusion_list"], plan.slice_table, lam[:, 0], lam[:, 1])
    e_ref, f_ref = jax.jit(xla_fn)(*args)
    e_pls, f_pls = pls_fn(*args)
    np.testing.assert_allclose(np.asarray(e_pls), np.asarray(e_ref),
                               rtol=2e-4, atol=2e-3)
    scale = np.abs(np.asarray(f_ref)).max()
    np.testing.assert_allclose(np.asarray(f_pls), np.asarray(f_ref),
                               rtol=2e-3, atol=2e-4 * max(scale, 1.0))
