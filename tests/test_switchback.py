"""SwitchBack int8 linear: quantized forward accuracy + exact bf16 backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_clip_tpu.ops.switchback import (
    int8_matmul_dequant,
    quantize_colwise,
    quantize_rowwise,
    switchback_linear,
)


def test_quantize_roundtrip(rng):
    x = rng.standard_normal((8, 64)).astype(np.float32)
    q, s = quantize_rowwise(jnp.asarray(x))
    back = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    rel = np.abs(back - x).max() / np.abs(x).max()
    assert rel < 0.01  # 1/127 rounding


def test_int8_matmul_matches_fp(rng):
    m, k, n = 64, 96, 80
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qx, sx = quantize_rowwise(jnp.asarray(x))
    qw, sw = quantize_colwise(jnp.asarray(w))
    got = np.asarray(int8_matmul_dequant(qx, qw, sx, sw, interpret=True))
    ref = x @ w
    # int8 quantization error ~1% relative
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel


def test_switchback_linear_grads(rng):
    m, k, n = 16, 32, 24
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)

    def loss(x, w, b):
        return (switchback_linear(x, w, b, True) ** 2).sum()

    gx, gw, gb = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    # backward is full-precision through the quantized forward's output
    y = switchback_linear(x, w, b, True)
    g = 2 * y
    np.testing.assert_allclose(np.asarray(gx), np.asarray(g @ w.T), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(x.T @ g), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(g.sum(0)), rtol=1e-5)
