"""Differential tests: zett_tpu tokenization vs. the HF `tokenizers` Rust lib.

The BASELINE north star demands byte-exact token-id parity with HF tokenizers
for GPT2/GPT-NeoX/XLM-R-style vocabs; these tests enforce it on structurally
identical locally-trained tokenizers (network access is unavailable).
"""

import json

import pytest
from tokenizers import Tokenizer as HFTokenizer

from zett_tpu.tokenization import Tokenizer

FIXTURES = ["gpt2_like_json", "xlmr_like_json", "llama_like_json", "bert_like_json"]


def _load_both(tok_json):
    ours = Tokenizer.from_json(tok_json)
    hf = HFTokenizer.from_str(json.dumps(tok_json))
    return ours, hf


@pytest.mark.parametrize("fixture", FIXTURES)
def test_encode_ids_match_hf(fixture, corpus, request):
    tok_json = request.getfixturevalue(fixture)
    ours, hf = _load_both(tok_json)
    n_checked = 0
    for text in corpus:
        got = ours.encode(text, add_special_tokens=True)
        want = hf.encode(text, add_special_tokens=True)
        assert got.ids == want.ids, (
            f"{fixture}: id mismatch on {text!r}\n ours: {got.tokens}\n hf:   {want.tokens}"
        )
        assert got.tokens == want.tokens, f"{fixture}: token mismatch on {text!r}"
        n_checked += 1
    assert n_checked > 200


@pytest.mark.parametrize("fixture", FIXTURES)
def test_encode_no_special_tokens(fixture, corpus, request):
    tok_json = request.getfixturevalue(fixture)
    ours, hf = _load_both(tok_json)
    for text in corpus[:50]:
        got = ours.encode(text, add_special_tokens=False)
        want = hf.encode(text, add_special_tokens=False)
        assert got.ids == want.ids, f"{fixture}: mismatch on {text!r}"


@pytest.mark.parametrize("fixture", FIXTURES)
def test_decode_round_trip_matches_hf(fixture, corpus, request):
    tok_json = request.getfixturevalue(fixture)
    ours, hf = _load_both(tok_json)
    for text in corpus[:80]:
        ids = hf.encode(text, add_special_tokens=False).ids
        assert ours.decode(ids) == hf.decode(ids), f"{fixture}: decode mismatch on {text!r}"


@pytest.mark.parametrize("fixture", FIXTURES)
def test_json_round_trip_loads_in_hf(fixture, corpus, request):
    """Our serialization must be loadable by HF and encode identically."""
    tok_json = request.getfixturevalue(fixture)
    ours = Tokenizer.from_json(tok_json)
    hf_reloaded = HFTokenizer.from_str(ours.to_str())
    hf_orig = HFTokenizer.from_str(json.dumps(tok_json))
    for text in corpus[:80]:
        assert hf_reloaded.encode(text).ids == hf_orig.encode(text).ids, (
            f"{fixture}: round-tripped json diverges on {text!r}"
        )


@pytest.mark.parametrize("fixture", FIXTURES)
def test_vocab_and_id_lookup(fixture, request):
    tok_json = request.getfixturevalue(fixture)
    ours, hf = _load_both(tok_json)
    assert ours.get_vocab_size() == hf.get_vocab_size()
    vocab = hf.get_vocab()
    for token, idx in list(vocab.items())[:500]:
        assert ours.token_to_id(token) == idx


@pytest.mark.parametrize("fixture", ["gpt2_like_json"])
def test_offsets_match_hf_byte_level(fixture, corpus, request):
    """Offset parity for the byte-level family (used for bits-per-byte eval)."""
    tok_json = request.getfixturevalue(fixture)
    ours, hf = _load_both(tok_json)
    for text in corpus[:60]:
        got = ours.encode(text).offsets
        want = hf.encode(text).offsets
        assert got == want, f"offset mismatch on {text!r}:\n ours {got}\n hf   {want}"


def test_truncation_and_padding(gpt2_like_json, corpus):
    ours, hf = _load_both(gpt2_like_json)
    ours.enable_truncation(16)
    hf.enable_truncation(16)
    pad_id = 0
    ours.enable_padding(length=16, pad_id=pad_id, pad_token="<|endoftext|>")
    hf.enable_padding(length=16, pad_id=pad_id, pad_token="<|endoftext|>")
    for text in corpus[:40]:
        got = ours.encode(text)
        want = hf.encode(text)
        assert got.ids == want.ids, f"trunc/pad mismatch on {text!r}"
        assert got.attention_mask == want.attention_mask


def test_added_special_token_splitting(gpt2_like_json):
    ours, hf = _load_both(gpt2_like_json)
    text = "hello <|endoftext|> world<|endoftext|>"
    assert ours.encode(text).ids == hf.encode(text).ids


def test_unigram_scores_mutation(xlmr_like_json):
    ours = Tokenizer.from_json(xlmr_like_json)
    model = ours.model
    scores = model.get_scores()
    model.set_scores([s * 0.5 for s in scores])
    assert model.get_scores()[5] == pytest.approx(scores[5] * 0.5)
    pieces = model.get_pieces()
    model.set_pieces(pieces)
    assert ours.encode("hello world").ids
