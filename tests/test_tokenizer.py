import numpy as np
import pytest

from open_clip_tpu.tokenizer import SimpleTokenizer, canonicalize_text, tokenize

from .reference_stubs import install_reference

SAMPLES = [
    "hello world",
    "a photo of a cat.",
    "A PHOTO OF A DOG!!!",
    "the quick brown fox jumps over the lazy dog " * 5,  # forces truncation
    "Ünïcödé — curly “quotes” & emoji 🚀 test",
    "multi\n line\ttext   with   spaces",
    "",
    "hyphenated-word under_scored 12345 ...",
]


@pytest.fixture(scope="module")
def ref_tokenizer():
    ref = install_reference()
    return ref.tokenizer._tokenizer


def test_vocab_and_specials():
    tok = SimpleTokenizer()
    assert tok.vocab_size == 49408
    assert tok.sot_token_id == 49406
    assert tok.eot_token_id == 49407


def test_matches_reference_tokenizer(ref_tokenizer):
    tok = SimpleTokenizer()
    ours = tok(SAMPLES)
    theirs = ref_tokenizer(SAMPLES).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_encode_decode_roundtrip():
    tok = SimpleTokenizer()
    ids = tok.encode("a photo of a cat")
    assert tok.decode(ids).strip() == "a photo of a cat"


def test_truncation_forces_eot():
    tok = SimpleTokenizer()
    out = tok(["word " * 200], context_length=77)
    assert out.shape == (1, 77)
    assert out[0, -1] == tok.eot_token_id


def test_module_level_tokenize():
    out = tokenize("hello world")
    assert out.shape == (1, 77)
    assert out.dtype == np.int32


def test_canonicalize():
    assert canonicalize_text("Hello, World!") == "hello world"
    assert canonicalize_text("sea_waves") == "sea waves"


def test_variable_length_rejected():
    tok = SimpleTokenizer()
    with pytest.raises(ValueError):
        tok(["hi"], pad=False)


def test_reduction_mask_shapes():
    tok = SimpleTokenizer(reduction_mask="simple", context_length=16)
    out = tok(["word " * 50, "short"])
    assert out.shape == (2, 16)
    assert out[0, 0] == tok.sot_token_id


def test_syntax_reduction_mask():
    """CLIPA syntax mask (reference tokenizer.py:356-412): over-budget captions keep
    content words (nouns first, then adjectives, then verbs) in original order;
    under-budget captions pass through untouched."""
    from open_clip_tpu.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer(context_length=12, reduction_mask="syntax")
    out = tok(["The quick brown fox jumps over the extremely lazy dog near a very old red barn"])
    assert out.shape == (1, 12)
    ids = [t for t in out[0].tolist() if t != 0]
    assert ids[0] == tok.sot_token_id and ids[-1] == tok.eot_token_id
    dec = tok.decode(ids[1:-1])
    # nouns survive, determiners/prepositions/adverbs are dropped first
    for w in ("fox", "dog", "barn"):
        assert w in dec, dec
    for w in ("over", "near", "extremely"):
        assert w not in dec, dec
    # word order is preserved
    assert dec.index("fox") < dec.index("dog") < dec.index("barn")

    # under budget: identical to plain tokenize
    plain = SimpleTokenizer(context_length=12)
    short = ["a cat sits"]
    import numpy as np

    np.testing.assert_array_equal(tok(short), plain(short))
