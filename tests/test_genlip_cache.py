"""GenLIP prefix-KV-cache parity: cached caption scoring and cached generation must
match the joint forward exactly (prefix-LM: image tokens never attend text, so cached
image K/V are identical to the joint forward's)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import open_clip_tpu as oct
from open_clip_tpu.models import genlip as G


@pytest.fixture(scope="module")
def model():
    raw = oct.get_model_config("naflexgenlip_test")
    cfg = G.GenLipModelCfg.from_dict(raw)
    params = G.init_genlip(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _image(b, ni, valid_count, seed=0):
    rng = np.random.default_rng(seed)
    pdim = 16 * 16 * 3
    coord = np.stack([np.arange(ni) // 4, np.arange(ni) % 4], axis=-1).astype(np.int32)
    return {
        "patches": jnp.asarray(rng.normal(size=(b, ni, pdim)).astype(np.float32) * 0.1),
        "patch_coord": jnp.asarray(np.broadcast_to(coord, (b, ni, 2))),
        "patch_valid": jnp.asarray(np.broadcast_to(np.arange(ni) < valid_count, (b, ni))),
    }


def _captions(cfg, b, lt, seed=1):
    rng = np.random.default_rng(seed)
    tc = cfg.text_cfg
    text = rng.integers(0, 1000, size=(b, lt)).astype(np.int32)
    text[:, 0] = tc.bos_id
    lens = rng.integers(3, lt + 1, size=b)
    for i, n in enumerate(lens):
        if n < lt:
            text[i, n - 1] = tc.eos_id
            text[i, n:] = tc.pad_id
    return jnp.asarray(text)


def _direct_scores(params, cfg, image, text, text_valid):
    """Reference scoring protocol via the joint forward
    (reference scripts/genlip_zeroshot.py:97-119)."""
    b = text.shape[0]
    image_b = {k: jnp.broadcast_to(v, (b,) + v.shape[1:]) for k, v in image.items()}
    out = G.genlip_forward(params, cfg, image_b, text, text_valid=text_valid)
    ni = out["image_seq_len"]
    lt = text.shape[1]
    pred = out["logits"][:, ni - 1: ni - 1 + lt].astype(jnp.float32)
    lp = jax.nn.log_softmax(pred, axis=-1)
    lp = jnp.take_along_axis(lp, text[..., None].astype(jnp.int32), axis=-1)[..., 0]
    lp = jnp.where(text_valid, lp, 0.0)
    return lp.sum(1) / jnp.clip(text_valid.sum(1), 1, None)


@pytest.mark.parametrize("valid_count", [12, 9])
def test_cached_scoring_matches_joint(model, valid_count):
    cfg, params = model
    image = _image(1, 12, valid_count)
    text = _captions(cfg, 5, 10)
    text_valid = text != cfg.text_cfg.pad_id

    direct = np.asarray(_direct_scores(params, cfg, image, text, text_valid))
    cache = G.prefix_cache(params, cfg, image)
    cached = np.asarray(G.score_captions(params, cfg, cache, text, text_valid))
    np.testing.assert_allclose(cached, direct, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("valid_count", [12, 9])
def test_cached_generate_matches_uncached_greedy(model, valid_count):
    cfg, params = model
    image = _image(2, 12, valid_count, seed=4)
    slow = np.asarray(G.generate(params, cfg, image, seq_len=8, kv_cache=False))
    fast = np.asarray(G.generate(params, cfg, image, seq_len=8, kv_cache=True))
    np.testing.assert_array_equal(fast, slow)


def test_cached_generate_min_seq_len_blocks_eos(model):
    cfg, params = model
    image = _image(1, 12, 12, seed=5)
    out = np.asarray(G.generate_cached(params, cfg, image, seq_len=6, min_seq_len=4))
    eos_pos = np.where(out[0] == cfg.text_cfg.eos_id)[0]
    if eos_pos.size:
        assert eos_pos[0] >= 4


@pytest.mark.parametrize("name", ["naflexgenlap_test_1d", "naflexgenlap_test_2d"])
def test_genlap_cached_scoring_matches_joint(name):
    from open_clip_tpu.models import genlap as GL

    raw = oct.get_model_config(name)
    cfg = GL.GenLapModelCfg.from_dict(raw)
    params = GL.init_genlap(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    ni, b = 10, 4
    freq_tokens = cfg.audio_cfg.freq_tokens
    coord = np.stack([np.arange(ni) % max(freq_tokens, 1), np.arange(ni) // max(freq_tokens, 1)],
                     axis=-1).astype(np.int32)
    audio = {
        "patches": jnp.asarray(rng.normal(size=(1, ni, cfg.audio_cfg.patch_dim)).astype(np.float32) * 0.1),
        "patch_coord": jnp.asarray(coord[None]),
        "patch_valid": jnp.asarray((np.arange(ni) < 8)[None]),
    }
    text = _captions(cfg, b, 7, seed=8)
    text_valid = text != cfg.text_cfg.pad_id

    audio_b = {k: jnp.broadcast_to(v, (b,) + v.shape[1:]) for k, v in audio.items()}
    out = GL.genlap_forward(params, cfg, audio_b, text, text_valid=text_valid)
    nia = out["audio_seq_len"]
    pred = out["logits"][:, nia - 1: nia - 1 + text.shape[1]].astype(jnp.float32)
    lp = jax.nn.log_softmax(pred, axis=-1)
    lp = jnp.take_along_axis(lp, text[..., None].astype(jnp.int32), axis=-1)[..., 0]
    lp = jnp.where(text_valid, lp, 0.0)
    direct = np.asarray(lp.sum(1) / jnp.clip(text_valid.sum(1), 1, None))

    cache = GL.prefix_cache(params, cfg, audio)
    cached = np.asarray(G.score_captions(params, cfg, cache, text, text_valid))
    np.testing.assert_allclose(cached, direct, rtol=1e-4, atol=1e-4)


def test_genlap_cached_generate_matches_joint_loop():
    """GenLAP audio captioning (cached decode) must match a step-by-step greedy loop
    over the joint forward."""
    from open_clip_tpu.models import genlap as GL

    raw = oct.get_model_config("naflexgenlap_test_2d")
    cfg = GL.GenLapModelCfg.from_dict(raw)
    params = GL.init_genlap(jax.random.PRNGKey(1), cfg)
    model = GL.GenLapModel(cfg, params)
    rng = np.random.default_rng(11)
    ni = 10
    freq_tokens = max(cfg.audio_cfg.freq_tokens, 1)
    coord = np.stack([np.arange(ni) % freq_tokens, np.arange(ni) // freq_tokens],
                     axis=-1).astype(np.int32)
    audio = {
        "patches": (rng.normal(size=(2, ni, cfg.audio_cfg.patch_dim)) * 0.1).astype(np.float32),
        "patch_coord": np.broadcast_to(coord, (2, ni, 2)).copy(),
        "patch_valid": np.broadcast_to(np.arange(ni) < 8, (2, ni)).copy(),
    }
    tc = cfg.text_cfg
    T = 6
    fast = np.asarray(model.generate(audio, seq_len=T, min_seq_len=1))

    # greedy oracle: re-run the joint forward each step
    ids = np.full((2, T), tc.pad_id, np.int32)
    ids[:, 0] = tc.bos_id
    done = np.zeros(2, bool)
    for t in range(1, T):
        tv = (np.arange(T) < t)[None].repeat(2, 0)
        out = GL.genlap_forward(params, cfg, {k: jnp.asarray(v) for k, v in audio.items()},
                                jnp.asarray(ids), text_valid=jnp.asarray(tv))
        nia = out["audio_seq_len"]
        logits = np.asarray(out["logits"])[:, nia + t - 1].astype(np.float64)
        nxt = logits.argmax(-1)
        nxt = np.where(done, tc.pad_id, nxt).astype(np.int32)
        ids[:, t] = nxt
        done |= nxt == tc.eos_id
    np.testing.assert_array_equal(fast, ids)


def test_cached_scoring_batched_images(model):
    """One cache row per caption row (Bc == B) also matches."""
    cfg, params = model
    b = 3
    image = _image(b, 12, 12, seed=2)
    text = _captions(cfg, b, 8, seed=3)
    text_valid = text != cfg.text_cfg.pad_id

    out = G.genlip_forward(params, cfg, image, text, text_valid=text_valid)
    ni = out["image_seq_len"]
    pred = out["logits"][:, ni - 1: ni - 1 + text.shape[1]].astype(jnp.float32)
    lp = jax.nn.log_softmax(pred, axis=-1)
    lp = jnp.take_along_axis(lp, text[..., None].astype(jnp.int32), axis=-1)[..., 0]
    lp = jnp.where(text_valid, lp, 0.0)
    direct = np.asarray(lp.sum(1) / jnp.clip(text_valid.sum(1), 1, None))

    cache = G.prefix_cache(params, cfg, image)
    cached = np.asarray(G.score_captions(params, cfg, cache, text, text_valid))
    np.testing.assert_allclose(cached, direct, rtol=1e-4, atol=1e-4)
