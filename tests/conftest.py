"""Test configuration: force the CPU JAX backend with 8 virtual devices so
sharding tests run anywhere (and tests never grab the real TPU)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache for the CPU test programs (separate from the
# TPU cache): reruns skip hundreds of XLA CPU compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize registers the axon TPU backend and pins
# jax_platforms to it; override back to CPU for tests.
import jax

jax.config.update("jax_platforms", "cpu")

REFERENCE_DATA = "/root/reference/test/data"

import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running golden tests")


@pytest.fixture(autouse=True, scope="module")
def _release_jax_programs_between_modules():
    yield
    import gc

    import jax as _jax
    _jax.clear_caches()
    gc.collect()


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m", default=""):
        return
    skip_slow = pytest.mark.skip(reason="slow; run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
