"""Conformance at realistic vocabulary scale (~50k pieces, multi-MB corpus).

The round-1 parity suite ran on 2k-piece fixtures; the nasty cases — derived
merges during byte-level conversion (reference tokenizer_converters.py:256-364),
whitespace canonicalization, real Unigram score distributions, 50k-row merge
tables — only show up at real scale. These tests train ~50k tokenizers with
HF `tokenizers` (offline) and enforce byte-exact id parity both directions.
"""

import json

import numpy as np
import pytest
from tokenizers import Tokenizer as HFTokenizer

from zett_tpu.tokenization import Tokenizer
from zett_tpu.tokenization.bytemaps import CHARS_TO_BYTES
from zett_tpu.tokenization.convert import convert_to_byte_level, is_byte_level
from zett_tpu.tokenization.fast_encode import fast_encoder_or_none

FULLSCALE = ["bpe_bytelevel_50k_json", "unigram_50k_json", "bpe_metaspace_50k_json"]


def _sample_texts(big_corpus, n=400):
    # deterministic diverse slice: code chunks, multilingual, English
    step = max(1, len(big_corpus) // n)
    return [t for t in big_corpus[::step][:n]]


@pytest.mark.parametrize("fixture", FULLSCALE)
def test_vocab_size_is_realistic(fixture, request):
    tok_json = request.getfixturevalue(fixture)
    ours = Tokenizer.from_json(tok_json)
    assert len(ours) >= 30_000, f"{fixture}: trained only {len(ours)} pieces"


@pytest.mark.parametrize("fixture", FULLSCALE)
def test_encode_ids_match_hf_at_scale(fixture, big_corpus, request):
    tok_json = request.getfixturevalue(fixture)
    ours = Tokenizer.from_json(tok_json)
    hf = HFTokenizer.from_str(json.dumps(tok_json))
    n = 0
    for text in _sample_texts(big_corpus):
        got = ours.encode(text, add_special_tokens=True).ids
        want = hf.encode(text, add_special_tokens=True).ids
        assert got == want, f"{fixture}: mismatch on {text[:80]!r}"
        n += 1
    assert n >= 300


@pytest.mark.parametrize("fixture", FULLSCALE)
def test_converted_byte_level_at_scale(fixture, big_corpus, request):
    """convert_to_byte_level at 50k: output is fully byte-level, loads in HF,
    and our encodes match HF's on the converted artifact."""
    tok_json = request.getfixturevalue(fixture)
    tok = Tokenizer.from_json(tok_json)
    conv, _ = convert_to_byte_level(tok.copy())
    assert is_byte_level(conv.to_json())

    specials = set(conv.all_special_tokens)
    vocab = conv.get_vocab(with_added_tokens=False)
    bad = [
        t for t in vocab
        if t not in specials and not t.startswith("<unused_")
        and not all(c in CHARS_TO_BYTES for c in t)
    ]
    assert not bad, f"{fixture}: {len(bad)} non-byte-level pieces, e.g. {bad[:5]}"

    hf = HFTokenizer.from_str(conv.to_str())
    for text in _sample_texts(big_corpus, n=150):
        got = conv.encode(text, add_special_tokens=False).ids
        want = hf.encode(text, add_special_tokens=False).ids
        assert got == want, f"{fixture}: converted mismatch on {text[:80]!r}"


@pytest.mark.parametrize("fixture", ["bpe_metaspace_50k_json"])
def test_derived_merges_reencode_consistency(fixture, big_corpus, request):
    """The byte-level conversion of a metaspace BPE re-derives the merge
    table; the converted tokenizer must segment text into byte-level images
    of the original segmentation (decode round trip preserved)."""
    tok_json = request.getfixturevalue(fixture)
    tok = Tokenizer.from_json(tok_json)
    conv, _ = convert_to_byte_level(tok.copy())
    for text in _sample_texts(big_corpus, n=100):
        if not text.strip():
            continue
        ids = conv.encode(text, add_special_tokens=False).ids
        assert conv.decode(ids) in (text, " " + text, text.strip()), text[:80]


@pytest.mark.parametrize("fixture", FULLSCALE)
def test_native_fast_encode_at_scale(fixture, big_corpus, request):
    """The C++ fast path (what the collator and bench use) must agree with
    the python tokenizer at 50k-vocab scale."""
    tok_json = request.getfixturevalue(fixture)
    tok = Tokenizer.from_json(tok_json)
    conv, _ = convert_to_byte_level(tok.copy())
    fast = fast_encoder_or_none(conv)
    if fast is None:
        pytest.skip(f"{fixture}: no native fast path for this shape")
    texts = [t for t in _sample_texts(big_corpus, n=64) if t.strip()]
    block = 64
    pad_id = conv.all_special_ids[0] if conv.all_special_ids else 0
    ids_fast, mask = fast.encode_batch(
        texts, add_special_tokens=False, max_length=block, pad_id=pad_id
    )
    for i, text in enumerate(texts):
        ref = conv.encode(text, add_special_tokens=False).ids[:block]
        got = list(ids_fast[i][: mask[i].sum()])
        assert got == ref, f"{fixture}: fast-path mismatch on {text[:60]!r}"


def test_surface_forms_at_scale(bpe_bytelevel_50k_json, unigram_50k_json):
    """get_surface_form_matrix over a full 50k vocab with a 50k hn tokenizer."""
    from zett_tpu.tokenization.surface_forms import get_surface_form_matrix

    hn_tok, _ = convert_to_byte_level(Tokenizer.from_json(unigram_50k_json))
    target, _ = convert_to_byte_level(Tokenizer.from_json(bpe_bytelevel_50k_json))
    sf, n_truncated = get_surface_form_matrix(target, 16, hn_tok)
    assert sf.shape == (len(target), 16)
    assert sf.dtype == np.int32
    # every non-special row decodes back to the token's byte string
    specials = set(target.all_special_ids)
    hn_specials = set(hn_tok.all_special_tokens)
    ids = [i for i in range(0, len(target), 997) if i not in specials][:40]
    for i in ids:
        token = target.id_to_token(i)
        pieces = [hn_tok.id_to_token(j) for j in sf[i]]
        if token and not token.startswith("<unused_"):
            joined = "".join(p for p in pieces if p and p not in hn_specials)
            # rows at the full width may be truncations of the token
            if len(joined) >= len(token):
                assert joined == token, (i, token, pieces)
            else:
                assert token.startswith(joined), (i, token, pieces)
