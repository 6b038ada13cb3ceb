"""Sharded serving: FSDP-sharded params + data-sharded batches through the jitted
encoders on a multi-device mesh must match the single-device output — the multi-chip
inference path for models too big (or batches too large) for one chip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import open_clip_tpu as oct
from open_clip_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    fsdp_shardings,
    shard_params,
)

TINY = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16,
                   "head_width": 16},
    "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 64, "heads": 4,
                 "layers": 2},
}


@pytest.fixture(scope="module")
def model():
    if "tiny-shardinf-vit" not in oct.list_models():
        oct.add_model_config(dict(TINY), name="tiny-shardinf-vit")
    return oct.create_model("tiny-shardinf-vit", load_weights=False)


@pytest.mark.parametrize("data,fsdp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_encode_matches_single_device(model, data, fsdp):
    from open_clip_tpu.models.clip import encode_image, encode_text

    cfg, params = model.cfg, model.params
    rng = np.random.default_rng(0)
    img = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(1, 511, size=(16, 16)).astype(np.int32)

    ref_i = np.asarray(model.encode_image(img, normalize=True))
    ref_t = np.asarray(model.encode_text(txt, normalize=True))

    mesh = create_mesh(data=data, fsdp=fsdp)
    shardings = fsdp_shardings(params, mesh, min_size=64)  # tiny leaves shard too
    sp = shard_params(params, shardings)
    bs = batch_sharding(mesh)

    img_fn = jax.jit(
        lambda p, x: encode_image(p, cfg, x, normalize=True),
        in_shardings=(shardings, bs))
    txt_fn = jax.jit(
        lambda p, x: encode_text(p, cfg, x, normalize=True),
        in_shardings=(shardings, bs))

    got_i = np.asarray(img_fn(sp, jax.device_put(jnp.asarray(img), bs)))
    got_t = np.asarray(txt_fn(sp, jax.device_put(jnp.asarray(txt), bs)))
    np.testing.assert_allclose(got_i, ref_i, atol=2e-5)
    np.testing.assert_allclose(got_t, ref_t, atol=2e-5)


def test_sharded_coca_generation_matches(model):
    """The KV-cached decode loop also runs with mesh-sharded params (serving a
    captioner across chips)."""
    from open_clip_tpu.models import coca
    from open_clip_tpu.models.clip import init_clip
    from open_clip_tpu.config import parse_model_cfg

    name = "tiny-shardinf-coca"
    if name not in oct.list_models():
        oct.add_model_config({
            "embed_dim": 32, "custom_text": True,
            "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16,
                           "head_width": 16, "attentional_pool": True,
                           "attn_pooler_queries": 9, "attn_pooler_heads": 4,
                           "output_tokens": True},
            "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2,
                         "layers": 2, "embed_cls": True, "output_tokens": True},
            "multimodal_cfg": {"context_length": 12, "vocab_size": 64, "width": 32,
                               "heads": 2, "layers": 2, "attn_pooler_heads": 2},
        }, name=name)
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(5), cfg)
    img = np.random.default_rng(1).standard_normal((8, 32, 32, 3)).astype(np.float32)
    kw = dict(seq_len=8, sot_token_id=60, eos_token_id=61, pad_token_id=0)

    ref = np.asarray(coca.generate(params, cfg, jnp.asarray(img), **kw))

    mesh = create_mesh(data=4, fsdp=2)
    shardings = fsdp_shardings(params, mesh, min_size=64)
    sp = shard_params(params, shardings)
    bs = batch_sharding(mesh)
    fn = jax.jit(lambda p, x: coca.generate(p, cfg, x, **kw),
                 in_shardings=(shardings, bs))
    got = np.asarray(fn(sp, jax.device_put(jnp.asarray(img), bs)))
    np.testing.assert_array_equal(got, ref)
