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


def test_switchback_in_vit_mlp(rng):
    """MLP_LINEAR_IMPL='switchback' routes block MLPs through the int8 kernel:
    forward stays close to dense, and a train step still optimizes."""
    import open_clip_tpu as oct
    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models import blocks
    from open_clip_tpu.models.clip import init_clip, encode_image
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import create_train_state, make_train_step

    name = "tiny-sb"
    if name not in oct.list_models():
        oct.add_model_config({
            "embed_dim": 16,
            "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16},
            "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 16, "heads": 2, "layers": 2},
        }, name=name)
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(3), cfg)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))

    dense = np.asarray(encode_image(params, cfg, img, normalize=True))
    blocks.MLP_LINEAR_IMPL = "switchback"
    try:
        sb = np.asarray(encode_image(params, cfg, img, normalize=True))
        cos = (dense * sb).sum(-1)
        assert cos.min() > 0.99, cos

        opt = create_optimizer(OptimizerCfg(lr=1e-3, wd=0.0), params, const_lr(1e-3, 0))
        step = make_train_step(cfg, opt, compute_dtype=jnp.float32)
        state = create_train_state(params, opt)
        batch = {"image": img, "text": jnp.asarray(rng.integers(1, 63, size=(2, 12)).astype(np.int32))}
        losses = []
        for i in range(4):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all() and losses[-1] < losses[0], losses
    finally:
        blocks.MLP_LINEAR_IMPL = "dense"
