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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
