"""Test configuration: run on a virtual 8-device CPU mesh (multi-chip
sharding is validated without TPU hardware; single-chip tests just use
device 0).  Must set env before jax import."""
import os

# The hosting environment pre-imports jax (sitecustomize) with its TPU
# plugin selected, so env mutation alone is too late — but backends
# initialize lazily, so the config update below still takes effect as long
# as no device has been touched yet.  Tests run on a virtual 8-device CPU
# mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402

# Test tiers (see README "Running the tests" for the CI recipe):
#
#   `pytest -m smoke` — the review-loop tier: small-graph modules only
#     (no engine-scale compiles), ~4 min on a 1-CPU box.
#   `pytest -m quick` — core coverage of every layer once: geometry/
#     cells, the cellpad engine + invariants, forces, the OBMD stage,
#     the deck front end, IO round-trips, and the C ABI.  ~25 min on a
#     1-CPU box (the engine/deck modules compile large XLA graphs;
#     compile time dominates).
#   full suite — CI's job (~45 min on 1 CPU).
SMOKE_MODULES = {
    "test_geometry", "test_cells", "test_forces", "test_observe",
    "test_io", "test_c_api", "test_expr", "test_dump_dcd",
}
QUICK_MODULES = SMOKE_MODULES | {
    "test_integrate", "test_cellpad", "test_obmd_stage", "test_invariants",
    "test_script", "test_charged",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)
        if mod in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
        else:
            item.add_marker(pytest.mark.slow)
