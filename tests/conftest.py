"""Test harness: run everything on a simulated 8-device CPU mesh.

The reference has no tests at all (SURVEY.md §4); this suite is designed from
scratch. Forcing `xla_force_host_platform_device_count=8` lets the
particle/point sharding collectives (psum, all_gather) run in CI on one host —
the exact code path that runs on a real TPU slice.

NOTE: the surrounding environment may pre-import jax and pin JAX_PLATFORMS to
a TPU plugin; `jax.config.update` after import is the reliable way to force
the CPU backend for unit tests, and must happen before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated test runs skip XLA recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/svnicp_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
