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
