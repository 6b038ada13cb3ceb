"""GenLIP parity vs the torch reference: vision-encoder features, full-sequence logits,
and the fused caption loss."""

import numpy as np
import pytest
import torch

import open_clip_tpu as oct
from open_clip_tpu.config import get_model_config
from open_clip_tpu.models import genlip as G

from .reference_stubs import install_reference

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def ref():
    return install_reference()


@pytest.fixture(scope="module")
def pair(ref):
    # the reference ships a tiny test config: naflexgenlip_test (64-wide, 2 layers)
    torch.manual_seed(33)
    tmodel = ref.create_model("naflexgenlip_test")
    tmodel.eval()
    cfg = G.GenLipModelCfg.from_dict(get_model_config("naflexgenlip_test"))
    params = G.torch_genlip_to_params(tmodel.state_dict(), cfg)
    return tmodel, cfg, params


def _patch_batch(seed=0, b=2, n=12, p=16, lt=10, vocab=100280, pad=100278):
    rng = np.random.default_rng(seed)
    patches = rng.standard_normal((b, n, p * p * 3)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(3), np.arange(4), indexing="ij")
    coords = np.stack([ys.reshape(-1), xs.reshape(-1)], -1)[None].repeat(b, 0).astype(np.int32)
    valid = np.ones((b, n), dtype=bool)
    valid[1, 8:] = False
    text = rng.integers(0, 1000, size=(b, lt)).astype(np.int64)
    text[0, 7:] = pad
    return {"patches": patches, "patch_coord": coords, "patch_valid": valid}, text


def test_genlip_encode_image_parity(pair):
    tmodel, cfg, params = pair
    image, _ = _patch_batch()
    timage = {k: torch.from_numpy(np.asarray(v)) for k, v in image.items()}
    with torch.no_grad():
        t_feat = tmodel.encode_image(timage, normalize=True)
    j_feat = G.encode_image(params, cfg, {k: jnp.asarray(v) for k, v in image.items()}, normalize=True)
    np.testing.assert_allclose(np.asarray(j_feat), t_feat.numpy(), atol=5e-5)


def test_genlip_logits_parity(pair):
    tmodel, cfg, params = pair
    image, text = _patch_batch(1)
    timage = {k: torch.from_numpy(np.asarray(v)) for k, v in image.items()}
    with torch.no_grad():
        t_out = tmodel(timage, torch.from_numpy(text), compute_loss=False)
    j_out = G.genlip_forward(
        params, cfg, {k: jnp.asarray(v) for k, v in image.items()}, jnp.asarray(text.astype(np.int32)),
        compute_loss=False,
    )
    assert int(j_out["image_seq_len"]) == int(t_out["image_seq_len"])
    np.testing.assert_allclose(np.asarray(j_out["logits"]), t_out["logits"].numpy(), atol=3e-4)


def test_genlip_loss_parity(pair):
    tmodel, cfg, params = pair
    image, text = _patch_batch(2)
    timage = {k: torch.from_numpy(np.asarray(v)) for k, v in image.items()}
    with torch.no_grad():
        t_out = tmodel(timage, torch.from_numpy(text), compute_loss=True)
    j_out = G.genlip_forward(
        params, cfg, {k: jnp.asarray(v) for k, v in image.items()}, jnp.asarray(text.astype(np.int32)),
        compute_loss=True,
    )
    np.testing.assert_allclose(float(j_out["loss"]), float(t_out["loss"]), rtol=1e-5)


def test_genlip_factory():
    model = oct.create_model("naflexgenlip_test")
    image, text = _patch_batch(3)
    out = model(image, text.astype(np.int32), compute_loss=True)
    assert np.isfinite(float(out["loss"]))


def test_genlip_pack_prefix_loss_parity(ref, rng_seed=7):
    """pack_prefix=True packed-layout loss must match the reference's packed loss
    (first caption token predicted from the last VALID prefix token)."""
    import json, tempfile, pathlib

    cfg_dict = json.loads(json.dumps(get_model_config("naflexgenlip_test")))
    cfg_dict["genlip_cfg"]["pack_prefix"] = True
    name = "naflexgenlip-test-packed"
    if name not in oct.list_models():
        oct.add_model_config(cfg_dict, name=name)
    if name not in ref.list_models():
        d = pathlib.Path(tempfile.mkdtemp())
        (d / f"{name}.json").write_text(json.dumps(cfg_dict))
        ref.add_model_config(d)

    torch.manual_seed(55)
    tmodel = ref.create_model(name)
    tmodel.eval()
    assert tmodel.pack_prefix
    cfg = G.GenLipModelCfg.from_dict(cfg_dict)
    params = G.torch_genlip_to_params(tmodel.state_dict(), cfg)

    image, text = _patch_batch(9)
    timage = {k: torch.from_numpy(np.asarray(v)) for k, v in image.items()}
    with torch.no_grad():
        t_out = tmodel(timage, torch.from_numpy(text), compute_loss=True)
    j_out = G.genlip_forward(
        params, cfg, {k: jnp.asarray(v) for k, v in image.items()},
        jnp.asarray(text.astype(np.int32)), compute_loss=True,
    )
    np.testing.assert_allclose(float(j_out["loss"]), float(t_out["loss"]), rtol=1e-5)


def test_genlip_generate_greedy_matches_stepwise_argmax():
    """First generated token == argmax of the forward logits at the bos position;
    eos terminates and pads (superset: reference exposes generation only for CoCa)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_clip_tpu.factory import create_model
    from open_clip_tpu.models import genlip as G

    m = create_model("naflexgenlip_b16", load_weights=False)
    cfg = m.cfg
    rng = np.random.default_rng(0)
    NI = 16
    image = {"patches": jnp.asarray(rng.standard_normal((2, NI, 768)), jnp.float32),
             "patch_coord": jnp.asarray(rng.integers(0, 4, (2, NI, 2)), jnp.int32),
             "patch_valid": jnp.ones((2, NI), bool)}
    ids = np.asarray(G.generate(m.params, cfg, image, seq_len=5))
    assert (ids[:, 0] == cfg.text_cfg.bos_id).all()

    # manual step-1: forward with only bos valid, argmax at position ni + 0
    seq = 5
    tc = cfg.text_cfg
    text = jnp.full((2, seq), tc.pad_id, jnp.int32).at[:, 0].set(tc.bos_id)
    tv = (jnp.arange(seq) < 1)[None, :].repeat(2, 0)
    out = G.genlip_forward(m.params, cfg, image, text, text_valid=tv)
    ni = out["image_seq_len"]
    expect = np.asarray(jnp.argmax(out["logits"][:, ni, :], axis=-1))
    np.testing.assert_array_equal(ids[:, 1], expect)

    # after an (unlikely-with-random-weights) eos, everything pads; at minimum the
    # buffer only contains ids < vocab_size and stays deterministic
    ids2 = np.asarray(G.generate(m.params, cfg, image, seq_len=5))
    np.testing.assert_array_equal(ids, ids2)
    assert ids.max() < tc.vocab_size
