"""Panel window-attention Pallas kernel (ops/swin_attention.py) vs the dense
partition->attend->reverse formulation — forward AND gradients (q/k/v and the
differentiable bias), in interpret mode so the production TPU path runs
off-chip. The panel kernel folds window partition/reverse into the kernel, so
the oracle is the *composition* window_partition -> dense attention ->
window_reverse on identical inputs.

Covers the design's load-bearing cases: shared vs per-window bias (the fwd
``(i, j)`` and bwd ``(j, t)`` bias block maps + dbias accumulation across the
sample grid dim), non-square maps (wr stride != h), multiple panel rows
(nWy > 1), gb > 1 sample blocks, odd head counts (ph=1), and the single-window
degenerate map (stage-3-like 8x8).

Reference semantics: HTSAT window attention + partition/reverse
/root/reference/src/open_clip/audio/htsat.py:254-274,342-430.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_clip_tpu.models.htsat import window_partition, window_reverse
from open_clip_tpu.ops import swin_attention as swa


@pytest.fixture(autouse=True)
def interpret():
    prev = swa._INTERPRET
    swa._INTERPRET = True
    yield
    swa._INTERPRET = prev


def dense_oracle(q, k, v, bias, h, w, ws, heads, scale):
    """partition -> per-window dense attention (bias window = row % nW) ->
    reverse, in the token layout the panel kernel consumes/emits."""
    b, l, c = q.shape
    hd = c // heads
    nw = bias.shape[0]
    qw = window_partition(q.reshape(b, h, w, c), ws)
    kw = window_partition(k.reshape(b, h, w, c), ws)
    vw = window_partition(v.reshape(b, h, w, c), ws)
    bw, n, _ = qw.shape
    qh = qw.reshape(bw, n, heads, hd)
    kh = kw.reshape(bw, n, heads, hd)
    vh = vw.reshape(bw, n, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    logits = logits.reshape(-1, nw, heads, n, n) + bias.astype(jnp.float32)[None]
    logits = logits.reshape(bw, heads, n, n)
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    ow = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(bw, n, c)
    return window_reverse(ow, ws, h, w).reshape(b, l, c)


def make_inputs(b, h, w, c, heads, nw, dtype, seed=0):
    rng = np.random.default_rng(seed)
    n = 64
    q = jnp.asarray(rng.standard_normal((b, h * w, c)), dtype)
    k = jnp.asarray(rng.standard_normal((b, h * w, c)), dtype)
    v = jnp.asarray(rng.standard_normal((b, h * w, c)), dtype)
    bias = rng.standard_normal((nw, heads, n, n)).astype(np.float32) * 0.5
    if nw > 1:
        blk = rng.integers(0, 2, size=(nw, 1, n, n)).astype(np.float32)
        bias = bias + blk * -100.0  # shifted-window mask pattern
    return q, k, v, jnp.asarray(bias)


# (b, h, w, c, heads, nw) — ws is always 8 (the supports() contract)
SHAPES = [
    # HTSAT stage-0-like: 2x2 windows, even heads (ph=2), shared bias
    (2, 16, 16, 96, 4, 1),
    # shifted: per-window bias, dbias accumulated across b (t_steps=2)
    (2, 16, 16, 96, 4, 4),
    # non-square map (wr stride != h), per-window bias
    (2, 8, 16, 192, 8, 2),
    # odd head count (ph=1)
    (2, 16, 16, 96, 3, 4),
    # single-window degenerate map (stage-3-like), gb>1 batch blocks
    (8, 8, 8, 96, 4, 1),
]


@pytest.mark.parametrize("b,h,w,c,heads,nw", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_dense(b, h, w, c, heads, nw, dtype):
    q, k, v, bias = make_inputs(b, h, w, c, heads, nw, dtype)
    assert swa.supports(h, w, 8, heads, c, b), "shape must route to the kernel"
    scale = (c // heads) ** -0.5
    out = swa.panel_attention(q, k, v, bias, hw=(h, w), ws=8, scale=scale)
    ref = dense_oracle(q, k, v, bias, h, w, 8, heads, scale)
    tol = 5e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=tol)


@pytest.mark.parametrize("b,h,w,c,heads,nw", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grads_match_dense(b, h, w, c, heads, nw, dtype):
    q, k, v, bias = make_inputs(b, h, w, c, heads, nw, dtype, seed=1)
    scale = (c // heads) ** -0.5
    rng = np.random.default_rng(2)
    dy = jnp.asarray(rng.standard_normal((b, h * w, c)), jnp.float32)

    def loss_kernel(q, k, v, bias):
        out = swa.panel_attention(q, k, v, bias, hw=(h, w), ws=8, scale=scale)
        return (out.astype(jnp.float32) * dy).sum()

    def loss_dense(q, k, v, bias):
        out = dense_oracle(q, k, v, bias, h, w, 8, heads, scale)
        return (out.astype(jnp.float32) * dy).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
    tol = 1e-1 if dtype == jnp.bfloat16 else 5e-5
    for name, a, b_ in zip(("dq", "dk", "dv", "dbias"), gk, gd):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        denom = max(np.abs(b_).max(), 1.0)
        np.testing.assert_allclose(a / denom, b_ / denom, atol=tol,
                                   err_msg=f"{name} mismatch")


@pytest.mark.quick
def test_swin_block_panel_matches_dense():
    """Full _swin_block_apply through the panel route (roll outside, three-way
    qkv split, proj) vs the dense route on the same params — including a
    shifted block, where roll + per-window mask must compose exactly."""
    from open_clip_tpu.models import htsat as H
    from open_clip_tpu.ops import window_attention as wa

    key = jax.random.PRNGKey(0)
    h = w = 16
    c, heads, ws = 96, 4, 8
    p = H._init_swin_block(key, c, heads, ws, 2.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h * w, c), jnp.float32)
    for shift in (0, 4):
        prev_wa, prev_swa = wa.WINDOW_ATTN_KERNEL, swa.SWIN_PANEL_KERNEL
        try:
            swa.SWIN_PANEL_KERNEL = True
            out_panel = H._swin_block_apply(p, x, resolution=(h, w),
                                            heads=heads, ws=ws, shift=shift)
            swa.SWIN_PANEL_KERNEL = False
            wa.WINDOW_ATTN_KERNEL = False  # force the dense formulation
            out_dense = H._swin_block_apply(p, x, resolution=(h, w),
                                            heads=heads, ws=ws, shift=shift)
        finally:
            wa.WINDOW_ATTN_KERNEL, swa.SWIN_PANEL_KERNEL = prev_wa, prev_swa
        np.testing.assert_allclose(np.asarray(out_panel), np.asarray(out_dense),
                                   atol=3e-5, rtol=3e-5,
                                   err_msg=f"shift={shift}")


@pytest.mark.quick
def test_supports_boundaries():
    assert not swa.supports(16, 16, 7, 4, 96, 8)    # ws != 8
    assert not swa.supports(12, 16, 8, 4, 96, 8)    # h % ws
    assert not swa.supports(16, 16, 8, 5, 96, 8)    # c % heads
    assert not swa.supports(16, 16, 8, 16, 2048, 8)  # c > 1024
    assert not swa.supports(16, 16, 8, 16, 64, 8)   # hd < 8
    assert swa.supports(64, 64, 8, 4, 96, 128)      # HTSAT stage 0
    assert swa.supports(8, 8, 8, 32, 768, 128)      # HTSAT stage 3


@pytest.mark.quick
def test_enabled_respects_flag():
    prev = swa.SWIN_PANEL_KERNEL
    try:
        swa.SWIN_PANEL_KERNEL = False
        assert not swa.enabled()
        swa.SWIN_PANEL_KERNEL = True
        assert swa.enabled()  # _INTERPRET fixture active
    finally:
        swa.SWIN_PANEL_KERNEL = prev
