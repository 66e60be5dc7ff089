"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The driver environment registers an 'axon' PJRT plugin (tunneled TPU) at
interpreter startup via sitecustomize, and its register() overrides the
jax_platforms config — so setting JAX_PLATFORMS in the environment here is
NOT enough. We must update the config after jax is imported (backends are
created lazily, so this still wins as long as it runs before any jax use,
which conftest import order guarantees for the test suite).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# persistent XLA compile cache: full-pipeline CPU compiles dominate suite
# time; repeat runs (the common case for the CI driver) hit the cache
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The full suite (150+ tests, each jit-compiling full pipelines) crashes
    deterministically around test #120 with a segfault inside the
    persistent-cache deserializer (jax 0.9.0 CPU client) — every subset of
    the suite passes and the cache entries involved read fine in isolation,
    so it is executable-accumulation state in the client, not a corrupt
    entry. Dropping jit caches per module keeps the client small; cache
    files make the re-compiles cheap."""
    yield
    import jax as _jax
    _jax.clear_caches()
