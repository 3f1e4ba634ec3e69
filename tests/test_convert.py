"""Tests for byte-level tokenizer conversion (zett_tpu.tokenization.convert).

Mirrors the reference semantics of convert_to_byte_level
(/root/reference/zett/tokenizer_converters.py:78-406) and differential-tests
the converted artifact against the HF tokenizers lib.
"""

import json

import pytest
from tokenizers import Tokenizer as HFTokenizer

from zett_tpu.tokenization import Tokenizer
from zett_tpu.tokenization.bytemaps import CHARS_TO_BYTES
from zett_tpu.tokenization.convert import convert_to_byte_level, is_byte_level

FIXTURES = ["gpt2_like_json", "xlmr_like_json", "llama_like_json", "bert_like_json"]


def _surface_is_byte_level(s: str) -> bool:
    return all(c in CHARS_TO_BYTES for c in s)


@pytest.mark.parametrize("fixture", FIXTURES)
def test_converted_is_byte_level_and_complete(fixture, request):
    tok = Tokenizer.from_json(request.getfixturevalue(fixture))
    conv, n_added = convert_to_byte_level(tok.copy())
    specials = set(conv.all_special_tokens)
    vocab = conv.get_vocab(with_added_tokens=False)
    n_bad = sum(
        1
        for t in vocab
        if t not in specials
        and not t.startswith("<unused_")
        and not _surface_is_byte_level(t)
    )
    assert n_bad == 0, f"{fixture}: {n_bad} non-byte-level surface forms"
    # byte alphabet complete
    for c in CHARS_TO_BYTES:
        assert c in vocab, f"{fixture}: byte char {c!r} missing"
    assert is_byte_level(conv.to_json())


@pytest.mark.parametrize("fixture", FIXTURES)
def test_converted_encode_matches_hf(fixture, corpus, request):
    """The converted tokenizer.json must be loadable by HF tokenizers and our
    encodes must match HF's on it — this is the parity contract."""
    tok = Tokenizer.from_json(request.getfixturevalue(fixture))
    conv, _ = convert_to_byte_level(tok.copy())
    hf = HFTokenizer.from_str(conv.to_str())
    for text in corpus[:100]:
        ours = conv.encode(text, add_special_tokens=False).ids
        theirs = hf.encode(text, add_special_tokens=False).ids
        assert ours == theirs, f"{fixture}: mismatch on {text!r}"


@pytest.mark.parametrize("fixture", ["gpt2_like_json", "xlmr_like_json"])
def test_converted_decode_round_trip(fixture, corpus, request):
    tok = Tokenizer.from_json(request.getfixturevalue(fixture))
    conv, _ = convert_to_byte_level(tok.copy())
    for text in corpus[:40]:
        if not text.strip():
            continue
        ids = conv.encode(text, add_special_tokens=False).ids
        decoded = conv.decode(ids)
        # canonical form prepends a space to the first word
        assert decoded.lstrip() == text.lstrip() or decoded == " " + text, (
            f"{fixture}: round trip changed text: {text!r} -> {decoded!r}"
        )


def test_byte_level_identity_preserves_ids(gpt2_like_json):
    """Converting an already-byte-level tokenizer preserves original ids."""
    tok = Tokenizer.from_json(gpt2_like_json)
    conv, n_added = convert_to_byte_level(tok.copy())
    assert n_added is not None and n_added >= 0
    orig_vocab = tok.get_vocab()
    conv_vocab = conv.get_vocab()
    for t, i in orig_vocab.items():
        assert conv_vocab.get(t) == i, f"id moved for {t!r}"


def test_unigram_score_transplant(xlmr_like_json):
    tok = Tokenizer.from_json(xlmr_like_json)
    orig_scores = {p: s for p, s in tok.model.get_pieces()}
    conv, _ = convert_to_byte_level(tok.copy())
    conv_scores = {p: s for p, s in conv.model.get_pieces()}
    # '▁' maps to 'Ġ' (space byte): the score must have moved with it
    assert "▁hello" in orig_scores or "▁the" in orig_scores
    moved = [(p, s) for p, s in orig_scores.items() if p.startswith("▁")]
    for p, s in moved[:20]:
        byte_form = "Ġ" + p[1:]
        if byte_form in conv_scores:
            assert conv_scores[byte_form] == pytest.approx(s), f"score lost for {p!r}"


def test_byte_fallback_collapse(llama_like_json):
    tok = Tokenizer.from_json(llama_like_json)
    conv, _ = convert_to_byte_level(tok.copy())
    vocab = conv.get_vocab(with_added_tokens=False)
    # <0xNN> tokens whose byte char wasn't already present collapse to the char
    n_fallback_left = sum(1 for t in vocab if t.startswith("<0x") and t.endswith(">"))
    assert n_fallback_left < 256, "no byte-fallback token was collapsed"


def test_whitespace_consistency(gpt2_like_json, corpus):
    tok = Tokenizer.from_json(gpt2_like_json)
    conv, _ = convert_to_byte_level(tok.copy(), make_whitespace_consistent=True)
    vocab = conv.get_vocab(with_added_tokens=False)
    ws_chars = set("ĠĊĉ")
    for t in vocab:
        if t.startswith("<unused_") or t in set(conv.all_special_tokens):
            continue
        n_ws = sum(c in ws_chars for c in t)
        if n_ws > 1:
            # must be a canonical whitespace run: first char + repeats of one char
            body = t[1:]
            assert len(set(body)) <= 1 and set(body) <= ws_chars, f"bad ws token {t!r}"
    # still HF-loadable and parity holds
    hf = HFTokenizer.from_str(conv.to_str())
    for text in corpus[:50]:
        assert conv.encode(text, add_special_tokens=False).ids == hf.encode(
            text, add_special_tokens=False
        ).ids


def test_match_special_tokens_to(xlmr_like_json, gpt2_like_json):
    source = Tokenizer.from_json(gpt2_like_json)  # has <|endoftext|> at id 0
    target = Tokenizer.from_json(xlmr_like_json)
    conv, n_added = convert_to_byte_level(
        target.copy(), match_special_tokens_to=source
    )
    assert n_added is None  # indices not preserved
    assert conv.token_to_id("<|endoftext|>") == source.token_to_id("<|endoftext|>")
    assert set(conv.all_special_tokens) >= set(source.all_special_tokens)
    # old specials are gone
    assert conv.token_to_id("<s>") is None or "<s>" not in conv.all_special_tokens


def test_postprocessor_id_fixup(xlmr_like_json, llama_like_json):
    source = Tokenizer.from_json(xlmr_like_json)  # TemplateProcessing <s>...</s>
    target = Tokenizer.from_json(llama_like_json)
    conv, _ = convert_to_byte_level(target.copy(), match_special_tokens_to=source)
    data = conv.to_json()
    post = data["post_processor"]
    assert post is not None and post["type"] == "TemplateProcessing"
    specials = post["special_tokens"]
    entries = specials.values() if isinstance(specials, dict) else specials
    vocab = conv.get_vocab()
    for entry in entries:
        for t, i in zip(entry["tokens"], entry["ids"]):
            assert vocab[t] == i, f"post-processor id stale for {t}"
    # encoding with specials places them at the remapped ids
    enc = conv.encode("hello")
    assert enc.ids[0] == conv.token_to_id("<s>")
    assert enc.ids[-1] == conv.token_to_id("</s>")
