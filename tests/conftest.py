"""Test configuration: force an 8-virtual-device CPU platform so
sharding/mesh tests run without TPU hardware (SURVEY.md section 4: the
TPU-world substitute for multi-node testing).

Note: the sandbox's sitecustomize registers an 'axon' TPU backend and calls
``jax.config.update('jax_platforms', 'axon,cpu')`` at interpreter start, so
an env-var JAX_PLATFORMS is not enough - we must update the config after
importing jax (backends are initialised lazily, so this is still early
enough)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 1-core host: collective participants arrive serially; stretch the CPU
# rendezvous timeouts (default 40 s termination aborts mid-all-reduce).
if "collective_call_terminate_timeout" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules. The full suite builds
    dozens of models in one process; on the CPU backend the accumulated
    executables + weakref caches can abort the interpreter (SIGABRT in
    array materialization) near the end of the run."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
