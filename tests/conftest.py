"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4).

Note: the environment's sitecustomize registers the 'axon' TPU backend and
programmatically sets jax_platforms, so plain JAX_PLATFORMS=cpu is not enough —
we override via jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert jax.device_count() == 8

# NO persistent compilation cache on CPU: jaxlib 0.9.0's XLA:CPU AOT
# deserialization reloads executables whose recorded machine-feature set
# does not match the host (cpu_aot_loader.cc warns "could lead to
# execution errors such as SIGILL") — reloading cached jit_cond
# executables around interpret-mode Pallas calls segfaulted the suite.
# TPU runs (bench.py) keep their own cache; CPU recompiles are cheap
# enough at test sizes.

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers. The `slow` marker tags compile-heavy integration tests (full
# model jit / train loops / CLI roundtrips); everything else is the fast
# oracle tier (~2 min cold). Usage:
#   pytest -m "not slow" -q    # fast tier
#   pytest -q                  # everything (~25 min cold on 8-dev CPU)
# Whole modules that only contain integration tests are listed here; mixed
# modules mark individual tests with @pytest.mark.slow.
# ---------------------------------------------------------------------------
SLOW_MODULES = {
    "test_cli", "test_trainer", "test_train_step", "test_spatial_sharding",
    "test_e2e_eval", "test_multitask", "test_models", "test_longtail",
    "test_tools", "test_pallas_gather", "test_dense_middle",
    "test_two_stage_e2e",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
