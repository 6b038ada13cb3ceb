"""Native BERT/RoBERTa and T5/mT5 encoders vs transformers' Flax classes.

The native forwards (models/hf_native.py) read the exact HF-Flax param layout,
so parity is checked by running both implementations on the SAME param tree.
Flax classes are deprecated upstream (removal in transformers v5) — these tests
skip cleanly if they disappear; the native path is then the only implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")

HAS_FLAX = hasattr(transformers, "FlaxRobertaModel")


def _ids(vocab, B=3, L=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, vocab, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, L - 4:] = 0
    if B > 2:
        mask[2, L - 7:] = 0
    ids[mask == 0] = 1
    return jnp.asarray(ids), jnp.asarray(mask)


@pytest.mark.skipif(not HAS_FLAX, reason="transformers Flax classes removed")
@pytest.mark.parametrize("arch", ["roberta", "bert"])
def test_bert_family_matches_flax(arch):
    from open_clip_tpu.models.hf_native import bert_encode

    if arch == "roberta":
        cfg = transformers.RobertaConfig(
            vocab_size=120, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
            intermediate_size=64, max_position_embeddings=64, type_vocab_size=1,
            hidden_act="gelu", pad_token_id=1)
        flax_model = transformers.FlaxRobertaModel(cfg, seed=7)
    else:
        cfg = transformers.BertConfig(
            vocab_size=120, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=48, max_position_embeddings=64, type_vocab_size=2,
            hidden_act="gelu", pad_token_id=0)
        flax_model = transformers.FlaxBertModel(cfg, seed=7)

    ids, mask = _ids(cfg.vocab_size)
    if arch == "roberta":
        # roberta position ids: cumulative over non-pad, offset by pad_id
        pos = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
    else:
        pos = None

    ref = flax_model.module.apply(
        {"params": flax_model.params}, input_ids=ids, attention_mask=mask,
        **({"position_ids": pos} if pos is not None else {}))
    hidden, pooled = bert_encode(flax_model.params, cfg, ids, mask, position_ids=pos)

    np.testing.assert_allclose(np.asarray(hidden), np.asarray(ref.last_hidden_state),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref.pooler_output),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(not HAS_FLAX, reason="transformers Flax classes removed")
@pytest.mark.parametrize("arch", ["mt5", "t5"])
def test_t5_family_matches_flax(arch):
    from open_clip_tpu.models.hf_native import t5_encode

    conf_cls = transformers.MT5Config if arch == "mt5" else transformers.T5Config
    cfg = conf_cls(vocab_size=120, d_model=32, num_layers=3, num_heads=4, d_kv=8, d_ff=64)
    model_cls = transformers.FlaxMT5EncoderModel if arch == "mt5" else transformers.FlaxT5EncoderModel
    flax_model = model_cls(cfg, seed=3)

    ids, mask = _ids(cfg.vocab_size, seed=1)
    ref = flax_model.module.apply(
        {"params": flax_model.params}, input_ids=ids, attention_mask=mask)
    hidden = t5_encode(flax_model.params, cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(ref.last_hidden_state),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(not HAS_FLAX, reason="transformers Flax classes removed")
def test_init_layout_matches_flax():
    """Native init produces the exact tree structure the Flax model would."""
    from open_clip_tpu.models.hf_native import init_bert_params, init_t5_params

    cfg = transformers.RobertaConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=32, type_vocab_size=1)
    flax_model = transformers.FlaxRobertaModel(cfg, seed=0)
    ours = init_bert_params(jax.random.PRNGKey(0), cfg)
    ref_paths = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_flatten_with_path(dict(flax_model.params))[0]}
    our_paths = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_flatten_with_path(ours)[0]}
    assert ref_paths == our_paths

    tcfg = transformers.MT5Config(vocab_size=50, d_model=16, num_layers=2, num_heads=2, d_kv=8, d_ff=32)
    tflax = transformers.FlaxMT5EncoderModel(tcfg, seed=0)
    tours = init_t5_params(jax.random.PRNGKey(0), tcfg)
    ref_paths = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_flatten_with_path(dict(tflax.params))[0]}
    our_paths = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_flatten_with_path(tours)[0]}
    assert ref_paths == our_paths


def test_torch_bert_converter_parity():
    """torch RobertaModel -> native layout -> bert_encode matches torch forward."""
    torch = pytest.importorskip("torch")
    from open_clip_tpu.models.hf_native import bert_encode, torch_bert_to_layout

    cfg = transformers.RobertaConfig(
        vocab_size=90, hidden_size=24, num_hidden_layers=2, num_attention_heads=3,
        intermediate_size=48, max_position_embeddings=40, type_vocab_size=1,
        hidden_act="gelu", pad_token_id=1)
    torch.manual_seed(5)
    tm = transformers.RobertaModel(cfg).eval()
    params = torch_bert_to_layout(tm.state_dict())

    ids, mask = _ids(cfg.vocab_size, B=2, L=10, seed=2)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(np.asarray(ids)).long(),
                 attention_mask=torch.from_numpy(np.asarray(mask)).long())
    pos = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
    hidden, pooled = bert_encode(params, cfg, ids, mask, position_ids=pos)
    np.testing.assert_allclose(np.asarray(hidden), ref.last_hidden_state.numpy(),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref.pooler_output.numpy(),
                               rtol=3e-5, atol=3e-5)


def test_torch_t5_converter_parity():
    torch = pytest.importorskip("torch")
    from open_clip_tpu.models.hf_native import t5_encode, torch_t5_to_layout

    cfg = transformers.MT5Config(vocab_size=90, d_model=24, num_layers=2, num_heads=3, d_kv=8, d_ff=48)
    torch.manual_seed(6)
    tm = transformers.MT5EncoderModel(cfg).eval()
    params = torch_t5_to_layout(tm.state_dict())

    ids, mask = _ids(cfg.vocab_size, B=2, L=10, seed=3)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(np.asarray(ids)).long(),
                 attention_mask=torch.from_numpy(np.asarray(mask)).long())
    hidden = t5_encode(params, cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(hidden), ref.last_hidden_state.numpy(),
                               rtol=3e-5, atol=3e-5)


# ---------------------------------------------------------------------------
# M2M100 / NLLB and ModernBERT vs torch oracles (no Flax class ever existed for
# modernbert; both native forwards are checked against the torch modules, which
# remain the upstream source of truth after the Flax removal)
# ---------------------------------------------------------------------------

def test_m2m100_encoder_matches_torch():
    import torch
    from open_clip_tpu.models.hf_native import m2m100_encode, torch_m2m100_to_layout

    cfg = transformers.M2M100Config(
        vocab_size=140, d_model=32, encoder_layers=3, encoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_layers=1, decoder_attention_heads=4,
        decoder_ffn_dim=64, max_position_embeddings=64, pad_token_id=1,
        scale_embedding=True, activation_function="relu", dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0)
    torch.manual_seed(11)
    ref = transformers.M2M100Model(cfg).eval()

    ids, mask = _ids(cfg.vocab_size, seed=5)
    with torch.no_grad():
        out = ref.encoder(input_ids=torch.as_tensor(np.asarray(ids)).long(),
                          attention_mask=torch.as_tensor(np.asarray(mask)).long())
    params = torch_m2m100_to_layout(ref.state_dict(), prefix="encoder.")
    hidden = m2m100_encode(params, cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(hidden), out.last_hidden_state.numpy(),
                               rtol=3e-5, atol=3e-5)


def test_m2m100_layout_matches_init_tree():
    import torch
    from open_clip_tpu.models.hf_native import init_m2m100_params, torch_m2m100_to_layout

    cfg = transformers.M2M100Config(
        vocab_size=140, d_model=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_layers=1, max_position_embeddings=64)
    torch.manual_seed(0)
    ref = transformers.M2M100Model(cfg).eval()
    conv = torch_m2m100_to_layout(ref.state_dict(), prefix="encoder.")
    init = init_m2m100_params(jax.random.PRNGKey(0), cfg)
    flat_c = {"/".join(map(str, p)) for p, _ in
              jax.tree_util.tree_flatten_with_path(conv)[0]}
    flat_i = {"/".join(map(str, p)) for p, _ in
              jax.tree_util.tree_flatten_with_path(init)[0]}
    assert flat_c == flat_i


@pytest.mark.parametrize("L", [12, 40])
def test_modernbert_matches_torch(L):
    import torch
    from open_clip_tpu.models.hf_native import modernbert_encode, torch_modernbert_to_layout

    # window < L at L=40 so the sliding-window branch is exercised; layer count
    # > global_attn_every_n_layers so both rope thetas run
    cfg = transformers.ModernBertConfig(
        vocab_size=140, hidden_size=32, num_hidden_layers=5, num_attention_heads=4,
        intermediate_size=48, max_position_embeddings=64, pad_token_id=1,
        global_attn_every_n_layers=2, local_attention=16, global_rope_theta=160000.0,
        local_rope_theta=10000.0, hidden_activation="gelu",
        attention_dropout=0.0, mlp_dropout=0.0, embedding_dropout=0.0,
        attn_implementation="eager", reference_compile=False)
    torch.manual_seed(2)
    ref = transformers.ModernBertModel(cfg).eval()

    ids, mask = _ids(cfg.vocab_size, L=L, seed=9)
    with torch.no_grad():
        out = ref(input_ids=torch.as_tensor(np.asarray(ids)).long(),
                  attention_mask=torch.as_tensor(np.asarray(mask)).long())
    params = torch_modernbert_to_layout(ref.state_dict(), prefix="")
    hidden = modernbert_encode(params, cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(hidden), out.last_hidden_state.numpy(),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("model_type", ["m2m_100", "modernbert"])
def test_hf_text_tower_native_archs(model_type):
    """The tower-level wrapper builds, runs, and pools the new archs."""
    from open_clip_tpu.config import CLIPTextCfg
    from open_clip_tpu.models.hf_text import apply_hf_text_tower, init_hf_text_tower

    if model_type == "m2m_100":
        mc = {"model_type": "m2m_100", "vocab_size": 140, "d_model": 32,
              "encoder_layers": 2, "encoder_attention_heads": 4,
              "encoder_ffn_dim": 64, "max_position_embeddings": 64, "pad_token_id": 1}
        pooler = "cls_pooler"
    else:
        mc = {"model_type": "modernbert", "vocab_size": 140, "hidden_size": 32,
              "num_hidden_layers": 3, "num_attention_heads": 4,
              "intermediate_size": 48, "max_position_embeddings": 64,
              "pad_token_id": 1, "local_attention": 16}
        pooler = "cls_pooler"
    cfg = CLIPTextCfg(hf_model_config=mc, hf_pooler_type=pooler,
                      hf_proj_type="linear", pad_id=1)
    params = init_hf_text_tower(jax.random.PRNGKey(0), cfg, embed_dim=16)
    ids, _ = _ids(140, seed=3)
    pooled, tokens = apply_hf_text_tower(params, cfg, ids)
    assert pooled.shape == (3, 16)
    assert np.isfinite(np.asarray(pooled)).all()


def test_unknown_hf_arch_raises():
    from open_clip_tpu.config import CLIPTextCfg
    from open_clip_tpu.models.hf_text import init_hf_text_tower

    cfg = CLIPTextCfg(hf_model_config={"model_type": "mamba"}, hf_pooler_type="mean_pooler")
    with pytest.raises(ValueError, match="model_type"):
        init_hf_text_tower(jax.random.PRNGKey(0), cfg, embed_dim=16)


def test_reference_hf_checkpoint_converts():
    """Reference-layout HFTextEncoder state dict (text.transformer.* / text.proj.*)
    loads through torch_clip_to_params' HF branch and matches the torch encoder."""
    import torch
    from open_clip_tpu.config import CLIPTextCfg
    from open_clip_tpu.models.hf_text import apply_hf_text_tower, torch_hf_text_to_params

    cfg_t = transformers.M2M100Config(
        vocab_size=140, d_model=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_layers=1, max_position_embeddings=64,
        pad_token_id=1, dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    torch.manual_seed(4)
    enc = transformers.M2M100Model(cfg_t).eval().encoder
    proj = torch.nn.Linear(32, 16, bias=False)
    sd = {"transformer." + k: v for k, v in enc.state_dict().items()}
    sd["proj.weight"] = proj.weight

    mc = {"model_type": "m2m_100", "vocab_size": 140, "d_model": 32,
          "encoder_layers": 2, "encoder_attention_heads": 4, "encoder_ffn_dim": 64,
          "max_position_embeddings": 64, "pad_token_id": 1, "dropout": 0.0,
          "attention_dropout": 0.0, "activation_dropout": 0.0}
    cfg = CLIPTextCfg(hf_model_config=mc, hf_pooler_type="mean_pooler",
                      hf_proj_type="linear", pad_id=1)
    params = torch_hf_text_to_params(sd, cfg)
    ids, mask = _ids(140, seed=6)
    pooled, _ = apply_hf_text_tower(params, cfg, ids)

    with torch.no_grad():
        out = enc(input_ids=torch.as_tensor(np.asarray(ids)).long(),
                  attention_mask=torch.as_tensor(np.asarray(mask)).long()).last_hidden_state
        m = torch.as_tensor(np.asarray(mask)).float()[..., None]
        want = proj((out * m).sum(1) / m.sum(1).clamp(min=1.0))
    np.testing.assert_allclose(np.asarray(pooled), want.numpy(), rtol=3e-5, atol=3e-5)
