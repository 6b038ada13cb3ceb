"""Pallas flash-attention fwd + bwd kernels vs the einsum reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_clip_tpu.ops.flash_attention as fa
from open_clip_tpu.ops.flash_attention import _reference_attention, flash_attention


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(fa, "_INTERPRET", True)


def _qkv(rng, b=2, l=160, h=2, hd=64):
    q = rng.standard_normal((b, l, h, hd)).astype(np.float32)
    k = rng.standard_normal((b, l, h, hd)).astype(np.float32)
    v = rng.standard_normal((b, l, h, hd)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("l", [128, 160, 384])
def test_flash_matches_reference(rng, causal, l):
    q, k, v = _qkv(rng, l=l)
    ref = _reference_attention(q, k, v, causal=causal, scale=q.shape[-1] ** -0.5)
    out = flash_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("l", [128, 160, 320])
def test_flash_grad_matches_reference(rng, causal, l):
    """Backward runs the Pallas dq/dkv kernels — compare all three grads to autodiff
    of the dense reference, including non-block-multiple lengths (padding masks)."""
    q, k, v = _qkv(rng, b=1, l=l, h=2)
    scale = q.shape[-1] ** -0.5
    # non-uniform cotangent so dq/dk/dv asymmetries show up
    g = jnp.asarray(np.linspace(-1, 1, q.size, dtype=np.float32).reshape(q.shape))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, causal=causal) * g).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v, causal=causal, scale=scale) * g).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg=f"d{name} mismatch"
        )


def test_flash_bwd_never_materializes_lxl(rng):
    """Memory assertion: no (L, L) intermediate in the backward jaxpr's shapes."""
    l = 512
    q, k, v = _qkv(rng, b=1, l=l, h=1)

    def loss(q, k, v):
        return flash_attention(q, k, v, causal=False).sum()

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for eqn in jaxpr.jaxpr.eqns:
        for var in eqn.outvars:
            shape = getattr(var.aval, "shape", ())
            assert not (len(shape) >= 2 and shape[-1] >= l and shape[-2] >= l), (
                f"(L, L) intermediate {shape} in {eqn.primitive}"
            )


def test_flash_bf16_close(rng):
    q, k, v = _qkv(rng, l=256)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = _reference_attention(q, k, v, causal=False, scale=q.shape[-1] ** -0.5)
    out = flash_attention(qb, kb, vb, causal=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_flash_key_valid_matches_masked_dense(rng):
    """key_valid in-kernel masking == dense attention with a key-padding bias,
    values and grads (the NaFlex patch_valid contract)."""
    from open_clip_tpu.ops.attention import dot_product_attention
    from open_clip_tpu.ops import flash_attention as fa

    B, L, H, hd = 2, 640, 4, 64
    q = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)
    lengths = jnp.asarray([500, 640])
    valid = jnp.arange(L)[None, :] < lengths[:, None]

    bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min * 0.5)
    bias = bias.astype(jnp.float32)[:, None, None, :]

    ref = dot_product_attention(q, k, v, bias=bias, impl="xla")
    out = fa.flash_attention(q, k, v, key_valid=valid)
    # compare only valid query rows: dense rows attend everywhere regardless,
    # invalid rows are dropped by downstream masked pooling either way
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(out) * m, np.asarray(ref) * m, atol=2e-5)

    def loss(f):
        def fn(q, k, v):
            o = f(q, k, v)
            return (o * valid[:, :, None, None]).astype(jnp.float32).sum()
        return jax.grad(fn, argnums=(0, 1, 2))

    gr = loss(lambda a, b, c: dot_product_attention(a, b, c, bias=bias, impl="xla"))(q, k, v)
    gf = loss(lambda a, b, c: fa.flash_attention(a, b, c, key_valid=valid))(q, k, v)
    for a, b_ in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=3e-4)


def test_flash_prefix_lm_matches_genlip_bias(rng):
    """flash(causal, prefix_len, key_valid) == dense attention under GenLIP's
    prefix-LM bias (image prefix bidirectional, text causal, padding masked),
    on valid positions — values and grads."""
    from open_clip_tpu.models.genlip import build_prefix_lm_bias
    from open_clip_tpu.ops.attention import dot_product_attention
    from open_clip_tpu.ops import flash_attention as fa

    B, NI, LT, H, hd = 2, 256, 320, 4, 64
    S = NI + LT
    q = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    pv = jnp.arange(NI)[None, :] < jnp.asarray([200, 256])[:, None]
    tv = jnp.arange(LT)[None, :] < jnp.asarray([320, 200])[:, None]
    valid = jnp.concatenate([pv, tv], axis=1)

    bias = build_prefix_lm_bias(pv, tv)
    ref = dot_product_attention(q, k, v, bias=bias, impl="xla")
    out = fa.flash_attention(q, k, v, causal=True, prefix_len=NI, key_valid=valid)
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(out) * m, np.asarray(ref) * m, atol=3e-5)

    def g(f):
        def fn(q, k, v):
            return (f(q, k, v) * valid[:, :, None, None]).astype(jnp.float32).sum()
        return jax.grad(fn, argnums=(0, 1, 2))

    gr = g(lambda a, b, c: dot_product_attention(a, b, c, bias=bias, impl="xla"))(q, k, v)
    gf = g(lambda a, b, c: fa.flash_attention(a, b, c, causal=True, prefix_len=NI,
                                              key_valid=valid))(q, k, v)
    for a, b_ in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=5e-4)
