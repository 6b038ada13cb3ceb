"""Fused window-attention Pallas kernel (ops/window_attention.py) vs the dense
XLA formulation — forward AND gradients (q/k/v and the differentiable rel-pos
bias), in interpret mode so the production TPU compute path is exercised off-
chip. Shape grid covers the boundaries the kernel's design hinges on:

- n % 8 != 0 (n=49, the Swin-vision 7x7 window) -> padded-row masking
- shifted windows (nw > 1) -> per-window bias blocks + the fwd ``i % jwin``
  and bwd ``(j, t)`` block-index maps
- odd head counts (ph=1) vs even (ph=2 head pairing)
- gb > 1 batch blocks and t_steps > 1 sequential revisits (dbias accumulation
  across the grid's arbitrary dimension)

Reference semantics: HTSAT window attention
/root/reference/src/open_clip/audio/htsat.py:342-430 (rel-pos bias + shift
mask added to logits before softmax).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_clip_tpu.ops import window_attention as wa

# interpret-mode Pallas is slow (~4 min for the full grid) — only the cheap
# smoke tests join the quick tier; the full fwd+grad grid runs in the suite
@pytest.fixture(autouse=True)
def interpret():
    prev = wa._INTERPRET
    wa._INTERPRET = True
    yield
    wa._INTERPRET = prev


def dense_window_attention(q, k, v, bias, scale, heads):
    """The dense XLA fallback path (models/htsat.py _swin_block_apply), as the
    oracle: split heads, f32 logits, bias window b % nW, softmax, merge."""
    b, n, c = q.shape
    hd = c // heads
    nw = bias.shape[0]
    qh = q.reshape(b, n, heads, hd)
    kh = k.reshape(b, n, heads, hd)
    vh = v.reshape(b, n, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    logits = logits.reshape(-1, nw, heads, n, n) + bias.astype(jnp.float32)[None]
    logits = logits.reshape(b, heads, n, n)
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, n, c)


def make_inputs(b, n, c, heads, nw, dtype, seed=0, with_shift_mask=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, n, c)), dtype)
    k = jnp.asarray(rng.standard_normal((b, n, c)), dtype)
    v = jnp.asarray(rng.standard_normal((b, n, c)), dtype)
    # learned rel-pos bias: smallish values like a trained table
    bias = rng.standard_normal((nw, heads, n, n)).astype(np.float32) * 0.5
    if nw > 1 and with_shift_mask:
        # emulate the shifted-window mask: large negative entries on a block
        # pattern (reference htsat.py builds -100.0 there)
        blk = rng.integers(0, 2, size=(nw, 1, n, n)).astype(np.float32)
        bias = bias + blk * -100.0
    return q, k, v, jnp.asarray(bias)


# (b, n, c, heads, nw) — chosen so _pick_gb exercises gb>1, jwin>1, t_steps>1
SHAPES = [
    # HTSAT-tiny stage-0-like: ws=8 windows, even heads (ph=2), shared bias
    (8, 64, 96, 4, 1),
    # Swin-vision 7x7 window: n=49 (n%8!=0 padding), shifted (nw=4)
    (16, 49, 96, 4, 4),
    # odd head count (ph=1), n%8!=0, shifted
    (12, 49, 96, 3, 4),
    # t_steps>1 in bwd (b//nw=2 sequential revisits of the dbias block)
    (32, 49, 192, 6, 16),
    # shared bias with t_steps>1 (b//gb revisits of the single bias block)
    (32, 49, 96, 4, 1),
    # head dim 32, heads=8 like deeper HTSAT stages
    (8, 64, 256, 8, 1),
]


@pytest.mark.parametrize("b,n,c,heads,nw", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_dense(b, n, c, heads, nw, dtype):
    q, k, v, bias = make_inputs(b, n, c, heads, nw, dtype)
    assert wa.supports(n, heads, c, b, nw), "shape must route to the kernel"
    scale = (c // heads) ** -0.5
    out = wa.window_attention(q, k, v, bias, scale=scale)
    ref = dense_window_attention(q, k, v, bias, scale, heads)
    tol = 5e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=tol)


@pytest.mark.parametrize("b,n,c,heads,nw", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grads_match_dense(b, n, c, heads, nw, dtype):
    q, k, v, bias = make_inputs(b, n, c, heads, nw, dtype, seed=1)
    scale = (c // heads) ** -0.5
    rng = np.random.default_rng(2)
    dy = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    def loss_kernel(q, k, v, bias):
        out = wa.window_attention(q, k, v, bias, scale=scale)
        return (out.astype(jnp.float32) * dy).sum()

    def loss_dense(q, k, v, bias):
        out = dense_window_attention(q, k, v, bias, scale, heads)
        return (out.astype(jnp.float32) * dy).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
    tol = 1e-1 if dtype == jnp.bfloat16 else 5e-5
    for name, a, b_ in zip(("dq", "dk", "dv", "dbias"), gk, gd):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        # compare against the gradient's own magnitude (bf16 probs lose bits)
        denom = max(np.abs(b_).max(), 1.0)
        np.testing.assert_allclose(a / denom, b_ / denom, atol=tol,
                                   err_msg=f"{name} mismatch")


@pytest.mark.quick
def test_bias_window_broadcast_rule():
    """Row b of q/k/v must use bias window b % nW (reference logits layout
    reshape(-1, nW, H, N, N)): distinct per-window biases must produce
    distinct outputs matching the dense oracle per-window."""
    b, n, c, heads, nw = 8, 16, 32, 2, 4
    q, k, v, _ = make_inputs(b, n, c, heads, nw, jnp.float32, seed=3)
    # bias that identifies the window: +large on column w
    bias = np.zeros((nw, heads, n, n), np.float32)
    for w in range(nw):
        bias[w, :, :, w] = 50.0
    bias = jnp.asarray(bias)
    scale = (c // heads) ** -0.5
    out = wa.window_attention(q, k, v, bias, scale=scale)
    ref = dense_window_attention(q, k, v, bias, scale, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.quick
def test_supports_boundaries():
    # n > 128 rejected (kernel stages full (n, n) logits in VMEM)
    assert not wa.supports(196, 4, 96, 8, 1)
    # c not divisible by heads rejected
    assert not wa.supports(64, 5, 96, 8, 1)
    # c > 1024 rejected
    assert not wa.supports(64, 16, 2048, 8, 1)
    # b not divisible by the window count
    assert not wa.supports(49, 4, 96, 6, 4)
    # happy paths
    assert wa.supports(49, 4, 96, 16, 4)
    assert wa.supports(64, 4, 96, 8, 1)


@pytest.mark.quick
def test_enabled_respects_flag():
    prev = wa.WINDOW_ATTN_KERNEL
    try:
        wa.WINDOW_ATTN_KERNEL = False
        assert not wa.enabled()
        wa.WINDOW_ATTN_KERNEL = True
        assert wa.enabled()  # _INTERPRET fixture is active
    finally:
        wa.WINDOW_ATTN_KERNEL = prev
