"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests
run without TPU hardware (SURVEY.md §4: CPU --xla_force_host_platform_device_count
fakes for CI without TPUs).  Must run before jax is imported."""

import os

# Force CPU: the session env may pin JAX_PLATFORMS to a tunneled TPU
# (e.g. "axon") via sitecustomize, which is far too slow for many small
# unit-test programs.  The env var alone is overridden by that hook, so set
# the jax config explicitly before any backend is touched.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Cap per-process accumulation across the full suite: running all
    ~180 tests in one process piles up compiled CPU executables until a
    late XLA:CPU compile segfaults (reproducibly, at ~test 130; any
    subset of the suite passes).  Dropping the compiled-program caches
    at module boundaries keeps within-module reuse (where nearly all
    sharing is) and bounds the footprint."""
    yield
    import jax

    jax.clear_caches()
