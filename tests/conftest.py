"""Test configuration: force an 8-device CPU mesh.

Mirrors the reference's CPU-only test strategy (reference tests/util_test.py:14) while
adding real multi-device mesh coverage via XLA's host-platform device virtualization.

Note: this environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon (real TPU
tunnel) at interpreter start, so the platform must be overridden via jax.config — env
vars alone are too late/too early. XLA_FLAGS is still read lazily at backend init.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: most suite time is CPU jit compiles that are identical
# across runs; cache them like the TPU bench does (.jax_cache is gitignored)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
