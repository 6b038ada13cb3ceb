"""Short-sequence fused Pallas attention: forward/grad parity vs dense XLA attention.

The kernel (ops/short_attention.py) serves the CLIP-length hot path that the reference
runs through F.scaled_dot_product_attention (reference transformer.py:223). Head
pairing packs two hd=64 heads per 128-lane tile with a block-diagonal mask; these
tests pin that construction to the dense oracle, including causal masking and the
fused backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_clip_tpu.ops.short_attention as sa
from open_clip_tpu.ops.attention import dot_product_attention


@pytest.fixture(autouse=True, params=["v2", "v1"])
def _interpret(request):
    old = sa._INTERPRET
    old_impl = sa._IMPL
    sa._INTERPRET = jax.default_backend() != "tpu"
    sa._IMPL = request.param
    yield
    sa._INTERPRET = old
    sa._IMPL = old_impl


CASES = [
    (4, 50, 12, 64, False),   # ViT-B-32 image tower shape
    (2, 77, 8, 64, True),     # CLIP text tower shape (causal)
    (2, 60, 4, 128, False),   # hd=128: no pairing
    (3, 16, 2, 32, False),    # hd=32: 4 heads per tile; odd batch -> group 1
    (2, 256, 2, 64, True),    # MAX_SEQ boundary
]


@pytest.mark.parametrize("b,l,h,hd,causal", CASES)
def test_forward_matches_dense(rng, b, l, h, hd, causal):
    q, k, v = (jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32) for _ in range(3))
    ref = dot_product_attention(q, k, v, causal=causal, impl="xla")
    out = sa.short_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("b,l,h,hd,causal", CASES[:3])
def test_grads_match_dense(rng, b, l, h, hd, causal):
    q, k, v = (jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32) for _ in range(3))

    def loss(fn):
        return lambda q, k, v: (fn(q, k, v) ** 2).sum()

    gs = jax.grad(loss(lambda q, k, v: sa.short_attention(q, k, v, causal=causal)),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda q, k, v: dot_product_attention(q, k, v, causal=causal, impl="xla")),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_supports_gating():
    assert sa.supports(50, 12, 64, None)
    assert sa.supports(77, 8, 64, None)
    assert not sa.supports(50, 12, 64, jnp.zeros((1, 1, 50, 50)))  # bias unsupported
    assert not sa.supports(512, 12, 64, None)  # beyond MAX_SEQ -> flash kernel
    assert not sa.supports(50, 3, 64, None)  # odd head count can't pair
    assert not sa.supports(50, 12, 96, None)  # unsupported head dim


def test_bf16_close(rng):
    b, l, h, hd = 2, 50, 12, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.bfloat16) for _ in range(3))
    ref = dot_product_attention(q, k, v, impl="xla").astype(jnp.float32)
    out = sa.short_attention(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_tile_grid_path_matches_dense(rng):
    """Big Lp*W blocks grid over head tiles (ViT-L/H shapes); same numerics."""
    old = sa.MAX_BLOCK
    sa.MAX_BLOCK = 64 * 256  # force the tiled path at test sizes
    try:
        q, k, v = (jnp.asarray(rng.standard_normal((2, 257, 16, 64)), jnp.float32)
                   for _ in range(3))
        ref = dot_product_attention(q, k, v, impl="xla")
        out = sa.short_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        gs = jax.grad(lambda a, b, c: (sa.short_attention(a, b, c) ** 2).sum(),
                      argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda a, b, c: (dot_product_attention(a, b, c, impl="xla") ** 2).sum(),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gs, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)
    finally:
        sa.MAX_BLOCK = old
