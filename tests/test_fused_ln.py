"""Fused LayerNorm backward (ops/fused_ln.py) vs autodiff of the plain forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_clip_tpu.ops import fused_ln
from open_clip_tpu.ops.layers import layer_norm

pytestmark = pytest.mark.quick


@pytest.fixture(autouse=True)
def interpret():
    prev = fused_ln._INTERPRET
    fused_ln._INTERPRET = True
    yield
    fused_ln._INTERPRET = prev


@pytest.mark.parametrize("shape,dtype", [
    ((4, 77, 128), jnp.bfloat16),     # 308 rows — above the row threshold
    ((512, 256), jnp.float32),
    ((3, 128, 384), jnp.bfloat16),    # rows % BLOCK_ROWS != 0 (384 rows)
])
@pytest.mark.parametrize("with_bias", [True, False])
def test_fused_ln_grads_match_autodiff(shape, dtype, with_bias):
    rng = np.random.default_rng(0)
    w = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape) * 2 + 0.3, dtype)
    scale = jnp.asarray(rng.standard_normal(w) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(w) * 0.1, jnp.float32) if with_bias else None
    dy = jnp.asarray(rng.standard_normal(shape), dtype)

    def loss_ref(x, scale, bias):
        return (layer_norm(x, scale, bias).astype(jnp.float32) * dy.astype(jnp.float32)).sum()

    def loss_fused(x, scale, bias):
        return (fused_ln.layer_norm_fused_bwd(x, scale, bias).astype(jnp.float32)
                * dy.astype(jnp.float32)).sum()

    args = (x, scale, bias) if with_bias else (x, scale, None)
    y_ref = layer_norm(*args)
    y_fus = fused_ln.layer_norm_fused_bwd(*args)
    np.testing.assert_allclose(np.asarray(y_fus, np.float32),
                               np.asarray(y_ref, np.float32), atol=1e-5, rtol=1e-5)

    argnums = (0, 1, 2) if with_bias else (0, 1)
    g_ref = jax.grad(loss_ref, argnums=argnums)(x, scale, bias) if with_bias else \
        jax.grad(lambda a, s: loss_ref(a, s, None), argnums=(0, 1))(x, scale)
    g_fus = jax.grad(loss_fused, argnums=argnums)(x, scale, bias) if with_bias else \
        jax.grad(lambda a, s: loss_fused(a, s, None), argnums=(0, 1))(x, scale)

    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-4  # dx compared in the input dtype
    np.testing.assert_allclose(np.asarray(g_fus[0], np.float32),
                               np.asarray(g_ref[0], np.float32), atol=tol, rtol=tol)
    np.testing.assert_allclose(np.asarray(g_fus[1]), np.asarray(g_ref[1]),
                               atol=1e-2, rtol=1e-3)
    if with_bias:
        np.testing.assert_allclose(np.asarray(g_fus[2]), np.asarray(g_ref[2]),
                                   atol=1e-2, rtol=1e-3)


def test_unsupported_shapes_fall_back():
    """Small rows / non-128 widths route to plain autodiff (no kernel)."""
    rng = np.random.default_rng(1)
    for shape in ((2, 8, 64), (4, 5, 96)):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        scale = jnp.ones((shape[-1],), jnp.float32)
        bias = jnp.zeros((shape[-1],), jnp.float32)
        got = fused_ln.layer_norm_fused_bwd(x, scale, bias)
        want = layer_norm(x, scale, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
