"""Test config: 8 virtual CPU devices (multi-chip sharding tests) + f64.

Mirrors the reference's testing approach of running `mpirun -np N` on one
machine (ref: cmake/functions/four_c_testing_functions.cmake:119-151):
partition-invariance is checked on a virtual 8-device CPU mesh.

Note: this environment pre-registers a remote TPU ("axon") backend via
sitecustomize before pytest starts; jax.config.update after import is the
reliable way to pin the CPU platform for tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# -- minimal tier (the reference's `minimal` CTest label analog, ref:
# doc/4Cwiki testing.rst): a < 5-minute inner-loop gate. Run with
#   python -m pytest tests/ -m minimal -q
_MINIMAL_MODULES = {
    "test_cells", "test_linalg_extras", "test_partition_graph",
    "test_output", "test_exodus", "test_gmsh", "test_cut", "test_lattice",
    "test_scalar", "test_materials", "test_elasthyper_summands",
    "test_plasticity_advanced", "test_volmortar", "test_nurbs",
    "test_particles_interactions", "test_airways", "test_crosslinking",
}
# individually slow outliers excluded from the tier
_MINIMAL_EXCLUDE = {"test_pallas_force_jvp_interpret"}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for it in items:
        mod = it.module.__name__.rsplit(".", 1)[-1]
        base = it.name.split("[")[0]
        if mod in _MINIMAL_MODULES and base not in _MINIMAL_EXCLUDE:
            it.add_marker(_pytest.mark.minimal)
