"""Pallas flash-attention kernel vs the einsum reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_clip_tpu.ops.flash_attention import _flash_forward, _reference_attention, flash_attention


def _qkv(rng, b=2, l=160, h=2, hd=64):
    q = rng.standard_normal((b, l, h, hd)).astype(np.float32)
    k = rng.standard_normal((b, l, h, hd)).astype(np.float32)
    v = rng.standard_normal((b, l, h, hd)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("l", [128, 160, 384])
def test_flash_matches_reference(rng, causal, l):
    q, k, v = _qkv(rng, l=l)
    scale = q.shape[-1] ** -0.5
    ref = _reference_attention(q, k, v, causal=causal, scale=scale)
    out = _flash_forward(q, k, v, causal=causal, scale=scale, interpret=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_grad_matches_reference(rng):
    q, k, v = _qkv(rng, l=128, h=1)
    scale = q.shape[-1] ** -0.5

    def loss_flash(q, k, v):
        return _flash_forward(q, k, v, causal=True, scale=scale, interpret=True).sum()

    # custom_vjp backward is the einsum recompute — verify it against direct autodiff
    import open_clip_tpu.ops.flash_attention as fa

    def loss_custom(q, k, v):
        out = fa._flash_bwd(True, scale, (q, k, v), jnp.ones_like(q))
        return out

    g_custom = loss_custom(q, k, v)
    g_direct = jax.grad(
        lambda a, b, c: fa._reference_attention(a, b, c, causal=True, scale=scale).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for gc, gd in zip(g_custom, g_direct):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gd), atol=1e-5)
