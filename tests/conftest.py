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

# The `quick` gate tier: `pytest -m quick` runs these modules in ~2 minutes with a
# warm compile cache (cold adds one-off jit time). Covers config/registry breadth,
# tokenizers, data plumbing, transforms (host + device tiers), metrics, and core
# layer math — the places regressions usually land first. Everything else (torch
# parity oracles, CLI training smokes, multihost) runs in the full suite.
_QUICK_MODULES = {
    "test_config",
    "test_tokenizer",
    "test_metrics",
    "test_bucketing",
    "test_data",
    "test_layers",
    "test_all_configs",
    "test_misc_behavior",
    "test_device_preprocess",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__.rsplit(".", 1)[-1] in _QUICK_MODULES
                and item.get_closest_marker("slow") is None):
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
