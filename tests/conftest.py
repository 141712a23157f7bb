"""Test harness: force the CPU backend with 8 virtual devices.

The container boots with an axon TPU backend pre-registered by
sitecustomize (jax is already imported when pytest starts); tests must run
on the CPU backend with a virtual 8-device mesh so multi-chip sharding is
exercised without hardware.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)
os.environ.setdefault("JAX_ENABLE_X64", "0")

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/loam_jax_cache_cpu"
)

import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _release_executables_between_modules():
    """Running the whole suite in ONE process accumulates dozens of
    large compiled executables; on this container's jaxlib the
    accumulation eventually segfaults a later big XLA:CPU compile
    (reproduced at ~the same suite position across cache states, never
    in module-sized runs).  Dropping the in-process executable caches
    after each module bounds that pressure; the persistent compile
    cache still makes cross-run recompiles cheap."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
# this jax build ignores the JAX_COMPILATION_CACHE_DIR env var — only the
# config update enables the persistent cache (big win: the golden-parity
# and long-sequence tests are compile-heavy)
jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
