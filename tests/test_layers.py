import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from open_clip_tpu.ops.layers import gelu, layer_norm, quick_gelu, rms_norm
from open_clip_tpu.ops.attention import dot_product_attention, multi_head_attention


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((4, 16, 64)).astype(np.float32)
    scale = rng.standard_normal(64).astype(np.float32)
    bias = rng.standard_normal(64).astype(np.float32)
    ours = layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    theirs = F.layer_norm(torch.from_numpy(x), (64,), torch.from_numpy(scale), torch.from_numpy(bias))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


def test_layer_norm_bf16_fp32_stats(rng):
    x = (rng.standard_normal((4, 64)) * 100 + 500).astype(np.float32)
    ours_bf16 = layer_norm(jnp.asarray(x, jnp.bfloat16), jnp.ones(64), jnp.zeros(64))
    ours_fp32 = layer_norm(jnp.asarray(x), jnp.ones(64), jnp.zeros(64))
    assert ours_bf16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ours_bf16, dtype=np.float32), np.asarray(ours_fp32), atol=0.05
    )


def test_quick_gelu_matches_torch(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    ours = quick_gelu(jnp.asarray(x))
    theirs = torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


def test_gelu_matches_torch_exact(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    ours = gelu(jnp.asarray(x))
    theirs = F.gelu(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


def test_rms_norm(rng):
    x = rng.standard_normal((2, 8, 32)).astype(np.float32)
    out = np.asarray(rms_norm(jnp.asarray(x), jnp.ones(32)))
    expected = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_sdpa_matches_torch(rng):
    b, l, h, d = 2, 10, 4, 16
    q = rng.standard_normal((b, l, h, d)).astype(np.float32)
    k = rng.standard_normal((b, l, h, d)).astype(np.float32)
    v = rng.standard_normal((b, l, h, d)).astype(np.float32)
    ours = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla")
    tq, tk, tv = (torch.from_numpy(a).permute(0, 2, 1, 3) for a in (q, k, v))
    theirs = F.scaled_dot_product_attention(tq, tk, tv).permute(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_sdpa_causal_matches_torch(rng):
    b, l, h, d = 2, 12, 2, 8
    q, k, v = (rng.standard_normal((b, l, h, d)).astype(np.float32) for _ in range(3))
    ours = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True, impl="xla")
    tq, tk, tv = (torch.from_numpy(a).permute(0, 2, 1, 3) for a in (q, k, v))
    theirs = F.scaled_dot_product_attention(tq, tk, tv, is_causal=True).permute(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_mha_matches_torch_mha(rng):
    """Full MHA vs torch nn.MultiheadAttention with identical fused-qkv weights."""
    d, h, b, l = 32, 4, 2, 7
    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    x = rng.standard_normal((b, l, d)).astype(np.float32)
    with torch.no_grad():
        theirs, _ = mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x), need_weights=False)
    params = {
        "qkv": {
            "kernel": jnp.asarray(mha.in_proj_weight.detach().numpy().T),
            "bias": jnp.asarray(mha.in_proj_bias.detach().numpy()),
        },
        "out": {
            "kernel": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
        },
    }
    ours = multi_head_attention(params, jnp.asarray(x), num_heads=h, impl="xla")
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)
