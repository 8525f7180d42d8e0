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
