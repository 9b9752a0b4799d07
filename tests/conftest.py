"""Test configuration: CPU backend with 8 virtual devices for sharding tests,
double precision enabled (the Reference-parity oracle)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

# sitecustomize.py may have imported jax at interpreter startup with the TPU
# platform selected; override at the config level before any computation runs.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # persistent compile cache: repeat suite runs skip recompiles
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_nbs"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    # line-shift-stable cache keys for Pallas programs (docs/devnotes.md)
    jax.config.update("jax_traceback_in_locations_limit", 0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------- smoke set
# The <5-min CI subset (devtools/run_ci.sh smoke): every fast unit file in
# full, plus one representative integration test per heavy subsystem.
_SMOKE_FILES = {
    "test_api.py", "test_box.py", "test_constraints.py", "test_direct.py",
    "test_ewald_params.py", "test_native.py", "test_platform_parity.py",
    "test_pme_paths.py", "test_runtime.py", "test_two_forces.py",
    "test_update_parameters.py",
}
_SMOKE_TESTS = {
    "test_fused.py::test_fused_matches_all_pairs_oracle[4]",
    "test_slicing.py::test_nonbonded_slicing[PME-off-exc-coulomb]",
    "test_parallel.py::test_sharded_md_step_matches_host_loop",
    "test_pallas_pme.py::test_pallas_pme_matches_brick_oracle",
    "test_pallas_direct.py::test_pallas_matches_xla_cell_engine[2-False]",
    "test_md_conservation.py::test_nve_energy_conservation_rigid_water",
    "test_tpu_lowering.py::test_fused_md_step_lowers_for_tpu",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = os.path.basename(str(item.fspath))
        nodeid = f"{base}::{item.nodeid.split('::', 1)[1]}" \
            if "::" in item.nodeid else base
        if base in _SMOKE_FILES or nodeid in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)


def assert_equal_to(expected, found, tol):
    """Relative-tolerance assert with scale max(|expected|, 1), mirroring the
    reference's assertEqualTo (AssertionUtilities.h:7-14)."""
    scale = max(abs(expected), 1.0)
    assert abs(expected - found) / scale <= tol, f"expected {expected}, found {found}"


def assert_equal_vec(expected, found, tol):
    expected = np.asarray(expected, dtype=float)
    found = np.asarray(found, dtype=float)
    scale = max(np.linalg.norm(expected), 1.0)
    assert np.all(np.abs(expected - found) / scale <= tol), \
        f"expected {expected}, found {found}"


def assert_forces(state0, state1, tol):
    for f0, f1 in zip(state0.getForces(), state1.getForces()):
        assert_equal_vec(f0, f1, tol)


def assert_energy(state0, state1, tol):
    assert_equal_to(state0.getPotentialEnergy(), state1.getPotentialEnergy(), tol)


def assert_forces_and_energy(context, tol):
    state0 = context.getState(getForces=True, getEnergy=True, groups={0})
    state1 = context.getState(getForces=True, getEnergy=True, groups={1})
    assert_energy(state0, state1, tol)
    assert_forces(state0, state1, tol)


@pytest.fixture
def helpers():
    class H:
        assert_equal_to = staticmethod(assert_equal_to)
        assert_equal_vec = staticmethod(assert_equal_vec)
        assert_forces = staticmethod(assert_forces)
        assert_energy = staticmethod(assert_energy)
        assert_forces_and_energy = staticmethod(assert_forces_and_energy)
    return H
