"""Tokenizers (host-side, framework-agnostic).

Implements the OpenAI CLIP byte-level BPE tokenizer (the public algorithm from
openai/CLIP, MIT) with behavior matching reference ``src/open_clip/tokenizer.py``
(clean modes, special tokens, truncate-with-eot, CLIPA-style reduction masks),
plus a HuggingFace-tokenizer wrapper. Outputs are numpy int32 arrays — feed them
straight to jitted encode functions.

The BPE merge table ships as the standard OpenAI vocab data file
(``assets_bpe_vocab_16e6.txt.gz``).
"""

from __future__ import annotations

import functools
import gzip
import html
import random
import string
from pathlib import Path
from typing import Callable, Dict, List, Optional, Union

import numpy as np
import regex as re

try:
    import ftfy  # optional; ASCII-clean captions are unaffected without it

    _fix_text = ftfy.fix_text
except ImportError:  # pragma: no cover
    def _fix_text(s: str) -> str:
        return s

DEFAULT_CONTEXT_LENGTH = 77

_VOCAB_PATH = Path(__file__).parent / "assets_bpe_vocab_16e6.txt.gz"


@functools.lru_cache()
def byte_to_unicode_table() -> Dict[int, str]:
    """Reversible byte<->printable-unicode mapping (GPT-2/CLIP byte-level BPE standard)."""
    visible = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    chars = visible[:]
    offset = 0
    for b in range(256):
        if b not in visible:
            visible.append(b)
            chars.append(256 + offset)
            offset += 1
    return dict(zip(visible, (chr(c) for c in chars)))


def basic_clean(text: str) -> str:
    text = _fix_text(text)
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    return " ".join(text.split()).strip()


def canonicalize_text(
    text: str,
    *,
    keep_punctuation_exact_string: Optional[str] = None,
) -> str:
    """big_vision-style canonicalization: lowercase, punctuation stripped
    (reference tokenizer.py:110-140)."""
    trans = str.maketrans("", "", string.punctuation)
    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(trans) for part in text.split(keep_punctuation_exact_string)
        )
    else:
        text = text.translate(trans)
    text = text.lower()
    return " ".join(text.split()).strip()


# module-level (not lambdas) so tokenizers stay picklable for forkserver data workers
def _clean_canonicalize(x: str) -> str:
    return canonicalize_text(basic_clean(x))


def _clean_lower(x: str) -> str:
    return whitespace_clean(basic_clean(x)).lower()


def _clean_whitespace(x: str) -> str:
    return whitespace_clean(basic_clean(x))


def _clean_whitespace_underscore(x: str) -> str:
    return whitespace_clean(basic_clean(x).replace("_", " "))


_CLEAN_FNS = {
    "canonicalize": _clean_canonicalize,
    "lower": _clean_lower,
    "whitespace": _clean_whitespace,
    "whitespace_underscore": _clean_whitespace_underscore,
}


def get_clean_fn(kind: str) -> Callable[[str], str]:
    try:
        return _CLEAN_FNS[kind]
    except KeyError:
        raise ValueError(f"invalid clean function {kind!r}") from None


class SimpleTokenizer:
    """OpenAI CLIP BPE tokenizer. vocab_size 49408, sot 49406, eot 49407."""

    def __init__(
        self,
        bpe_path: Union[str, Path] = _VOCAB_PATH,
        additional_special_tokens: Optional[List[str]] = None,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "lower",
        reduction_mask: str = "",
    ):
        self.byte_encoder = byte_to_unicode_table()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        with gzip.open(bpe_path, "rt", encoding="utf-8") as fh:
            lines = fh.read().split("\n")
        # line 0 is a header; CLIP uses the first 48894 merges (49152 - 256 - 2)
        merge_lines = lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines]

        base = list(self.byte_encoder.values())
        vocab = base + [c + "</w>" for c in base]
        vocab += ["".join(m) for m in merges]
        specials = ["<start_of_text>", "<end_of_text>"]
        if additional_special_tokens:
            specials = specials + list(additional_special_tokens)
        vocab += specials

        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder: Dict[int, str] = {i: tok for tok, i in self.encoder.items()}
        self.merge_rank: Dict[tuple, int] = {m: i for i, m in enumerate(merges)}
        self._cache: Dict[str, str] = {t: t for t in specials}
        self.token_pattern = re.compile(
            "|".join(specials) + r"""|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        self.vocab_size = len(self.encoder)
        self.all_special_ids = [self.encoder[t] for t in specials]
        self.sot_token_id, self.eot_token_id = self.all_special_ids[:2]
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.reduction_fn = get_reduction_mask_fn(reduction_mask) if reduction_mask else None

    # -- core BPE ---------------------------------------------------------------
    def _bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        if not token:
            return token
        parts = list(token[:-1]) + [token[-1] + "</w>"]
        while len(parts) > 1:
            pairs = {(parts[i], parts[i + 1]) for i in range(len(parts) - 1)}
            best = min(pairs, key=lambda p: self.merge_rank.get(p, float("inf")))
            if best not in self.merge_rank:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == first and parts[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        result = " ".join(parts)
        self._cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = self.clean_fn(text)
        for token in re.findall(self.token_pattern, text):
            token_uni = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[part] for part in self._bpe(token_uni).split(" "))
        return ids

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    # -- batch API ----------------------------------------------------------------
    def __call__(
        self,
        texts: Union[str, List[str]],
        context_length: Optional[int] = None,
        pad: bool = True,
    ) -> np.ndarray:
        """Tokenize to a (N, context_length) int32 array; overlong inputs are truncated
        with eot forced into the last slot (reference tokenizer.py:276-289)."""
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        assert context_length, "context length required"
        if not pad:
            raise ValueError(
                "SimpleTokenizer cannot emit variable-length ids: token id 0 is a real BPE "
                "token, not padding. Use an HF tokenizer with a reserved pad token."
            )

        if self.reduction_fn is not None:
            return self.reduction_fn(
                texts,
                context_length=context_length,
                sot_token_id=self.sot_token_id,
                eot_token_id=self.eot_token_id,
                encode_fn=self.encode,
            )

        result = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            tokens = [self.sot_token_id] + self.encode(text) + [self.eot_token_id]
            if len(tokens) > context_length:
                tokens = tokens[:context_length]
                tokens[-1] = self.eot_token_id
            result[i, : len(tokens)] = tokens
        return result


# ---------------------------------------------------------------------------
# CLIPA-style token reduction masks (reference tokenizer.py:306-428)
# ---------------------------------------------------------------------------

def random_mask_tokenize(
    texts: List[str],
    context_length: int,
    sot_token_id: int,
    eot_token_id: int,
    encode_fn: Callable,
    shuffle: bool = False,
) -> np.ndarray:
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = np.asarray(encode_fn(text))
        num_tokens = len(tokens)
        budget = context_length - 2  # sot + eot
        if num_tokens > budget:
            keep = np.sort(np.random.permutation(num_tokens)[:budget])
            tokens = tokens[keep]
            if shuffle:
                tokens = tokens[np.random.permutation(budget)]
            num_tokens = budget
        result[i, 0] = sot_token_id
        result[i, 1 : 1 + num_tokens] = tokens
        result[i, 1 + num_tokens] = eot_token_id
    return result


def simple_mask_tokenize(
    texts: List[str],
    context_length: int,
    sot_token_id: int,
    eot_token_id: int,
    encode_fn: Callable,
) -> np.ndarray:
    """Keep a random contiguous span when over budget."""
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = encode_fn(text)
        num_tokens = len(tokens)
        budget = context_length - 2
        if num_tokens > budget:
            start = random.randint(0, num_tokens - budget)
            tokens = tokens[start : start + budget]
            num_tokens = budget
        seq = [sot_token_id] + list(tokens) + [eot_token_id]
        result[i, : len(seq)] = seq
    return result


# POS-lite tagging for the syntax reduction mask. The reference uses nltk's
# perceptron tagger (tokenizer.py:364-428); its corpora need a network download,
# so offline installs fall back to a closed-class/suffix heuristic that lands in
# the same four priority buckets the mask cares about: noun(1) < adj(2) < verb(3)
# < other(4) — i.e. keep content words, drop function words first.

_POSLITE_CLOSED = frozenset("""
a an the this that these those some any each every no all both either neither
i you he she it we they me him her us them my your his its our their mine yours
hers ours theirs myself yourself himself herself itself ourselves themselves
of in on at by for with from to into onto upon about above below under over
between among through during before after against across behind beyond near
and or but nor so yet if because although though while whereas unless since
when where whom whose which who what why how there here not only just very too
also quite rather as than then once again is are was were be been being am do
does did have has had will would shall should can could may might must
""".split())

_POSLITE_VERBS = frozenset("""
go goes went gone run runs ran running walk walks walked sit sits sat stand
stands stood come comes came eat eats ate drink drinks drank make makes made
take takes took get gets got give gives gave say says said see sees saw look
looks looked hold holds held play plays played fly flies flew jump jumps jumped
wear wears wore ride rides rode swim swims swam
""".split())

_POSLITE_ADJ_SUFFIX = ("ful", "ous", "ive", "able", "ible", "ish", "less", "ic", "al")
_POSLITE_ADJ = frozenset("""
big small large little old new good bad great high low long short red blue
green yellow black white brown orange purple pink gray grey young happy sad
hot cold dark bright beautiful
""".split())


_POSLITE_LY_NOUNS = frozenset(
    "family butterfly jelly belly lily italy assembly ally rally".split())


def _pos_lite_order(word: str) -> int:
    w = word.lower()
    if not w[:1].isalpha():
        return 4
    if w in _POSLITE_CLOSED:
        return 4
    if len(w) >= 5 and w.endswith("ly") and w not in _POSLITE_LY_NOUNS:
        return 4  # adverbs (RB) sit in the lowest-priority bucket
    if w in _POSLITE_ADJ or w.endswith(_POSLITE_ADJ_SUFFIX):
        return 2
    if w in _POSLITE_VERBS or w.endswith(("ing", "ed", "ify", "ize", "ise")):
        return 3
    return 1  # default: noun — highest keep priority, like the CLIPA intent


_WORD_RE = None
_nltk_ready: Optional[bool] = None


def _syntax_word_orders(text: str):
    """(words, priority-orders) via nltk when its corpora are installed, else the
    POS-lite heuristic."""
    global _nltk_ready, _WORD_RE
    if _nltk_ready is None:
        try:
            import nltk

            nltk.pos_tag(nltk.tokenize.word_tokenize("a"))
            _nltk_ready = True
        except Exception:  # noqa: BLE001 — missing package or missing corpora
            _nltk_ready = False

    def bucket(tag: str) -> int:
        if tag.startswith("NN"):
            return 1
        if tag.startswith("JJ"):
            return 2
        if tag.startswith("VB"):
            return 3
        return 4

    if _nltk_ready:
        import nltk

        words = nltk.tokenize.word_tokenize(text)
        return words, [bucket(t) for _, t in nltk.pos_tag(words)]
    if _WORD_RE is None:
        import re as _re

        _WORD_RE = _re.compile(r"\w+|[^\w\s]")
    words = _WORD_RE.findall(text)
    return words, [_pos_lite_order(w) for w in words]


def syntax_mask_tokenize(
    texts: List[str],
    context_length: int,
    sot_token_id: int,
    eot_token_id: int,
    encode_fn: Callable,
) -> np.ndarray:
    """Drop words prioritized by part of speech before tokenizing (reference
    syntax_mask_tokenize, tokenizer.py:356-412): keep nouns, then adjectives, then
    verbs, then everything else, preserving original word order."""
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    budget = context_length - 2
    for i, text in enumerate(texts):
        words, orders = _syntax_word_orders(text)
        keep = sorted(np.argsort(np.asarray(orders), kind="stable")[:budget])
        reduced = " ".join(str(words[j]) for j in keep)
        tokens = [sot_token_id] + encode_fn(reduced) + [eot_token_id]
        if len(tokens) > context_length:  # some words produce multiple tokens
            tokens = tokens[:context_length]
            tokens[-1] = eot_token_id
        result[i, : len(tokens)] = tokens
    return result


def get_reduction_mask_fn(kind: str) -> Callable:
    if kind == "random":
        return random_mask_tokenize
    if kind == "shuffle":
        return functools.partial(random_mask_tokenize, shuffle=True)
    if kind == "simple":
        return simple_mask_tokenize
    if kind == "syntax":
        return syntax_mask_tokenize
    raise ValueError(f"invalid reduction mask {kind!r}")


# ---------------------------------------------------------------------------
# HuggingFace tokenizer wrapper (reference tokenizer.py:431-626)
# ---------------------------------------------------------------------------

class HFTokenizer:
    """Wrap any ``transformers`` tokenizer with the reference's conventions:
    forced right-padding, no fabricated pad id, optional strip_sep, variable mode."""

    def __init__(
        self,
        tokenizer_name: str,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "whitespace",
        strip_sep_token: bool = False,
        language: Optional[str] = None,
        cache_dir: Optional[str] = None,
        **kwargs,
    ):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name, cache_dir=cache_dir, **kwargs)
        self.tokenizer.padding_side = "right"
        set_lang_fn = getattr(self.tokenizer, "set_src_lang_special_tokens", None)
        if callable(set_lang_fn):
            self.set_lang_fn = set_lang_fn
        if language is not None:
            self.set_language(language)
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.strip_sep_token = strip_sep_token

    @property
    def pad_token_id(self) -> Optional[int]:
        return self.tokenizer.pad_token_id

    @property
    def eos_token_id(self) -> Optional[int]:
        return self.tokenizer.eos_token_id

    def save_pretrained(self, dest):
        self.tokenizer.save_pretrained(dest)

    def set_language(self, src_lang):
        if hasattr(self, "set_lang_fn"):
            self.set_lang_fn(src_lang)
        else:
            raise RuntimeError("cannot set language for the tokenizer")

    def __call__(self, texts: Union[str, List[str]], context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        assert context_length, "context length required"
        texts = [self.clean_fn(t) for t in texts]
        out = self.tokenizer.batch_encode_plus(
            texts,
            return_tensors="np",
            max_length=context_length,
            padding="max_length",
            truncation=True,
        ).input_ids
        if self.strip_sep_token:
            sep = self.tokenizer.sep_token_id
            out = np.where(out == sep, np.zeros_like(out), out)
        return out.astype(np.int32)


# module-level convenience matching the reference's tokenize/decode exports
_default_tokenizer: Optional[SimpleTokenizer] = None


def _get_default() -> SimpleTokenizer:
    global _default_tokenizer
    if _default_tokenizer is None:
        _default_tokenizer = SimpleTokenizer()
    return _default_tokenizer


def tokenize(texts, context_length: int = DEFAULT_CONTEXT_LENGTH) -> np.ndarray:
    return _get_default()(texts, context_length=context_length)


def decode(output_ids) -> str:
    return _get_default().decode(np.asarray(output_ids))


# ---------------------------------------------------------------------------
# SigLIP sentencepiece tokenizer (reference tokenizer.py:627-703) — gated on
# sentencepiece availability (not in this image)
# ---------------------------------------------------------------------------

class SigLipTokenizer:
    """T5/Gemma sentencepiece tokenizers used by SigLIP models. Requires the
    ``sentencepiece``-backed HF tokenizers; raises a clear error when unavailable."""

    VOCAB_FILES = {
        "c4-en": "http://storage.googleapis.com/t5-data/vocabs/cc_en.32000/sentencepiece.model",
        "mc4": "http://storage.googleapis.com/t5-data/vocabs/mc4.250000.100extra/sentencepiece.model",
        "gemma": "gemma tokenizer via hf hub",
    }

    def __init__(self, tokenizer_name: str, context_length: Optional[int] = 64):
        try:
            from transformers import T5TokenizerFast

            if "gemma" in tokenizer_name:
                from transformers import GemmaTokenizerFast

                self.tokenizer = GemmaTokenizerFast.from_pretrained(tokenizer_name)
            else:
                self.tokenizer = T5TokenizerFast.from_pretrained(tokenizer_name)
        except Exception as e:  # noqa: BLE001 — hub/sentencepiece availability
            raise RuntimeError(
                f"SigLipTokenizer needs the hub + sentencepiece backends for {tokenizer_name!r}: {e}"
            ) from e
        self.tokenizer.padding_side = "right"
        self.context_length = context_length

    @property
    def pad_token_id(self):
        return self.tokenizer.pad_token_id

    @property
    def eos_token_id(self):
        return self.tokenizer.eos_token_id

    def __call__(self, texts: Union[str, List[str]], context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        texts = [canonicalize_text(basic_clean(t)) for t in texts]
        out = self.tokenizer(
            texts, return_tensors="np", max_length=context_length,
            padding="max_length", truncation=True,
        )
        return out.input_ids.astype(np.int32)


# ---------------------------------------------------------------------------
# TikToken tokenizer (reference tokenizer.py:704-804) — gated on tiktoken
# availability (not in this image)
# ---------------------------------------------------------------------------

class TikTokenTokenizer:
    """cl100k/r50k BPE with 3 reserved control ids above the base vocab
    (eot/pad/sot, reference tokenizer.py:704-770). Supports ``pad=False`` variable mode
    since the pad id is reserved (unlike SimpleTokenizer)."""

    def __init__(
        self,
        tiktoken_name: str = "cl100k_base",
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "lower",
    ):
        try:
            import tiktoken
        except ImportError as e:
            raise RuntimeError(
                "TikTokenTokenizer requires the `tiktoken` package (not in this image); "
                "GenLIP-family models need it for training but load/run without it."
            ) from e
        base = tiktoken.get_encoding(tiktoken_name)
        self.encoding = base
        n = base.n_vocab
        self.eot_token_id = n
        self.pad_token_id = n + 1
        self.sot_token_id = n + 2
        self.vocab_size = n + 3
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)

    def encode(self, text: str) -> List[int]:
        return self.encoding.encode(self.clean_fn(text), disallowed_special=())

    def decode(self, tokens) -> str:
        specials = {self.eot_token_id, self.pad_token_id, self.sot_token_id}
        return self.encoding.decode([int(t) for t in tokens if int(t) not in specials])

    def __call__(self, texts, context_length: Optional[int] = None, pad: bool = True):
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        rows = []
        for t in texts:
            ids = [self.sot_token_id] + self.encode(t) + [self.eot_token_id]
            if len(ids) > context_length:
                ids = ids[: context_length - 1] + [self.eot_token_id]
            rows.append(ids)
        if not pad:
            return [np.asarray(r, dtype=np.int32) for r in rows]
        out = np.full((len(rows), context_length), self.pad_token_id, dtype=np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return out
