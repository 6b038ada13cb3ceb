"""NaFlex tests: patchify contract, scheduler determinism, native tower forward,
padding invariance, and ViT->NaFlex param folding equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

import open_clip_tpu as oct
from open_clip_tpu.config import parse_model_cfg, CLIPVisionCfg
from open_clip_tpu.data.naflex import (
    NaFlexBatchScheduler,
    NaFlexDataConfig,
    NaFlexTransform,
    calculate_batch_size,
    collate_naflex,
)
from open_clip_tpu.models import naflex_vit
from open_clip_tpu.models.clip import init_clip
from open_clip_tpu.models import vit as vit_mod


def test_patchify_contract():
    t = NaFlexTransform(max_seq_len=64, patch_size=16)
    img = Image.new("RGB", (130, 70), (120, 30, 60))
    out = t(img)
    assert out["patches"].shape == (64, 16 * 16 * 3)
    assert out["patch_coord"].shape == (64, 2)
    assert out["patch_valid"].shape == (64,)
    n = out["patch_valid"].sum()
    assert 0 < n <= 64
    # aspect roughly preserved: wider than tall
    gh = out["patch_coord"][:n, 0].max() + 1
    gw = out["patch_coord"][:n, 1].max() + 1
    assert gw > gh
    assert gh * gw == n


def test_batch_size_calc():
    assert calculate_batch_size(256, 16384, divisor=8) == 64
    assert calculate_batch_size(1024, 16384, divisor=8) == 16
    assert calculate_batch_size(100000, 16384, divisor=8) == 1  # min clamp


def test_scheduler_deterministic():
    cfg = NaFlexDataConfig(seq_lens=(64, 128), patch_sizes=(16, 32), max_tokens_per_batch=1024, seed=3)
    s = NaFlexBatchScheduler(cfg, num_batches=20)
    a, b = s.schedule(epoch=1), s.schedule(epoch=1)
    assert a == b
    assert s.schedule(epoch=2) != a
    for p, l, bs in a:
        assert p in (16, 32) and l in (64, 128) and bs * l <= 1024 + l


@pytest.fixture(scope="module")
def naflex_model():
    name = "tiny-naflex"
    if name not in oct.list_models():
        oct.add_model_config(
            {
                "embed_dim": 64,
                "custom_text": True,
                "vision_cfg": {
                    "image_size": 64,
                    "timm_model_name": "naflexvit_tiny_patch16_map",
                    "timm_model_kwargs": {"pos_embed_grid_size": [4, 4]},
                },
                "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 64, "heads": 2, "layers": 2},
            },
            name=name,
        )
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_naflex_forward(naflex_model):
    cfg, params = naflex_model
    t = NaFlexTransform(max_seq_len=48, patch_size=16)
    imgs = [Image.new("RGB", (96, 48), (i * 40, 10, 200)) for i in range(3)]
    batch = collate_naflex([t(im) for im in imgs])
    feats = oct.encode_image(params, cfg, {k: jnp.asarray(v) for k, v in batch.items()}, normalize=True)
    assert feats.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5)


def test_naflex_padding_invariance(naflex_model):
    """Extra padding tokens must not change the pooled features (mask correctness)."""
    cfg, params = naflex_model
    img = Image.new("RGB", (64, 64), (50, 90, 130))
    small = NaFlexTransform(max_seq_len=16, patch_size=16)(img)
    big = NaFlexTransform(max_seq_len=48, patch_size=16)(img)
    # same valid patch count (image fits in 16 tokens at most)
    assert small["patch_valid"].sum() == big["patch_valid"].sum()
    f1 = oct.encode_image(params, cfg, {k: jnp.asarray(v[None]) for k, v in small.items()})
    f2 = oct.encode_image(params, cfg, {k: jnp.asarray(v[None]) for k, v in big.items()})
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


def test_vit_to_naflex_folding():
    """A square image through the standard ViT must match the folded NaFlex params on
    the same patches (conversion recipe of reference naflex_convert.py:157-212)."""
    vcfg = CLIPVisionCfg(image_size=64, layers=2, width=64, patch_size=16, head_width=32)
    params = vit_mod.init_vision_tower(jax.random.PRNGKey(1), vcfg, 32)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    pooled_vit, _ = vit_mod.apply_vision_tower(params, vcfg, jnp.asarray(img))

    nf_params = naflex_vit.vit_params_to_naflex(params, grid=(4, 4))
    ncfg = naflex_vit.NaFlexVitCfg(
        width=64, layers=2, heads=2, patch_size=16, pos_grid=(4, 4),
        pool="tok", class_token=True, norm_eps=1e-5, proj_bias=False, pre_norm=True,
    )
    patches = vit_mod.patchify(jnp.asarray(img), 16)  # (1, 16, 768)
    ys, xs = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    coords = np.stack([ys.reshape(-1), xs.reshape(-1)], -1)[None].astype(np.int32)
    batch = {
        "patches": patches,
        "patch_coord": jnp.asarray(coords),
        "patch_valid": jnp.ones((1, 16), bool),
    }
    pooled_nf, _ = naflex_vit.apply_naflex_vit(nf_params, ncfg, batch)
    # pos-embed sampling at exact grid centers reproduces the table; outputs must match
    np.testing.assert_allclose(np.asarray(pooled_nf), np.asarray(pooled_vit), atol=1e-4)


def test_naflex_loss_scale():
    """linear/sqrt loss scaling by (bucket batch / reference batch), static per shape."""
    import open_clip_tpu as oct
    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models.clip import init_clip
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import create_train_state, make_train_step

    name = "tiny-naflex-scale"
    if name not in oct.list_models():
        oct.add_model_config({
            "embed_dim": 16,
            "vision_cfg": {"image_size": 64, "patch_size": 16,
                           "timm_model_name": "naflexvit_tiny_patch16_map",
                           "timm_model_kwargs": {"depth": 2},
                           "layers": 2, "width": 32, "head_width": 16},
            "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 16,
                         "heads": 2, "layers": 2},
        }, name=name)
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    opt = create_optimizer(OptimizerCfg(lr=0.0, wd=0.0), params, const_lr(0.0, 0))

    rng = np.random.default_rng(0)
    n, seq = 4, 16
    batch = {
        "image": {
            "patches": jnp.asarray(rng.standard_normal((n, seq, 16 * 16 * 3)).astype(np.float32)),
            "patch_coord": jnp.asarray(np.stack(np.meshgrid(np.arange(4), np.arange(4), indexing="ij"),
                                                -1).reshape(1, seq, 2).repeat(n, 0).astype(np.int32)),
            "patch_valid": jnp.ones((n, seq), bool),
        },
        "text": jnp.asarray(rng.integers(1, 63, size=(n, 12)).astype(np.int32)),
    }
    losses = {}
    for mode in ("none", "linear", "sqrt"):
        step = make_train_step(cfg, opt, compute_dtype=jnp.float32,
                               naflex_loss_scale=mode, reference_batch_size=16)
        state = create_train_state(params, opt)
        _, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses[mode] = float(metrics["loss"])
    assert losses["linear"] == pytest.approx(losses["none"] * (4 / 16), rel=1e-6)
    assert losses["sqrt"] == pytest.approx(losses["none"] * 0.5, rel=1e-6)



def test_naflex_name_parsing_overrides_and_registers():
    """timm_model_kwargs depth/embed_dim/num_heads override the named size, and regN
    in the name adds register tokens (stock configs moderntext-naflex_ViT-B-deep-16 /
    ViT-SO150M2-16)."""
    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models.naflex_vit import parse_naflex_cfg

    deep = parse_naflex_cfg(parse_model_cfg("moderntext-naflex_ViT-B-deep-16").vision_cfg)
    assert (deep.layers, deep.width, deep.heads) == (16, 768, 12)
    so = parse_naflex_cfg(parse_model_cfg("moderntext-naflex_ViT-SO150M2-16").vision_cfg)
    assert (so.layers, so.width, so.heads, so.reg_tokens) == (21, 832, 13, 1)
