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


def _cpu_cache_dir() -> str:
    """Persistent-compile-cache dir keyed by the host CPU's feature flags:
    XLA:CPU caches AOT machine code whose required features are NOT part of
    the jax cache key, so a cache written on one machine SIGSEGVs/SIGILLs
    when this container lands on different hardware."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    tag = hashlib.md5(flags.encode()).hexdigest()[:10]
    return f"/tmp/svnicp_jax_cache_cpu_{tag}"


# persistent compile cache: repeated test runs skip XLA recompilation
jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
