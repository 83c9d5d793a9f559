"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, as SURVEY.md's test strategy prescribes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the axon site hook re-forces JAX_PLATFORMS=axon; the config update is
# what actually sticks, so apply it before any backend is touched
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the wavefront recon step is a large jit
# program; caching makes repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jit_caches():
    """Drop live compiled executables between test modules: a full-suite
    run accumulates hundreds of XLA CPU programs in one process, which
    has produced allocator segfaults inside backend_compile. The
    persistent on-disk cache keeps recompiles cheap."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running conformance tier")
