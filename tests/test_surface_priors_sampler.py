"""Tests for surface-form matrices, priors, and the tokenizer sampler."""

import numpy as np
import pytest

from zett_tpu.tokenization import Tokenizer
from zett_tpu.tokenization.convert import convert_to_byte_level
from zett_tpu.tokenization.priors import (
    AhoCorasick,
    compute_substring_prior,
    get_prior,
)
from zett_tpu.tokenization.sampler import (
    TokenizerSampler,
    _count_substrings,
    pretokenize_byte_level,
)
from zett_tpu.tokenization.surface_forms import get_surface_form_matrix


@pytest.fixture(scope="module")
def hn_tokenizer(xlmr_like_json=None):
    # build a byte-level hypernet tokenizer from the gpt2-like fixture
    import json
    from fixtures import _cached, _build_gpt2_like

    tok = Tokenizer.from_json(_cached("gpt2_like", _build_gpt2_like))
    conv, _ = convert_to_byte_level(tok)
    return conv


class TestSurfaceForms:
    def test_shape_and_padding(self, hn_tokenizer):
        tokens = ["Ġhello", "world", "Ġthe", "<|endoftext|>"]
        mat, n_trunc = get_surface_form_matrix(tokens, 8, hn_tokenizer)
        assert mat.shape == (4, 8)
        assert n_trunc == 0

    def test_special_tokens_single_id(self, hn_tokenizer):
        mat, _ = get_surface_form_matrix(["<|endoftext|>"], 8, hn_tokenizer)
        assert mat[0, 0] == hn_tokenizer.token_to_id("<|endoftext|>")
        assert (mat[0, 1:] == 0).all() or (mat[0, 1:] == mat[0, 1]).all()

    def test_round_trip_decodes(self, hn_tokenizer):
        tokens = ["Ġhello", "Ġworld", "the"]
        mat, _ = get_surface_form_matrix(tokens, 16, hn_tokenizer)
        for row, token in zip(mat, tokens):
            pieces = [hn_tokenizer.id_to_token(int(i)) for i in row if i != 0]
            assert "".join(p for p in pieces if p) == token

    def test_truncation_counted(self, hn_tokenizer):
        long_token = "x" * 100
        mat, n_trunc = get_surface_form_matrix([long_token], 4, hn_tokenizer)
        assert n_trunc == 1

    def test_with_padding_rows(self, hn_tokenizer):
        mat, _ = get_surface_form_matrix(["a"], 4, hn_tokenizer, padding=3)
        assert mat.shape == (4, 4)


class TestPriors:
    def test_reestimate(self, hn_tokenizer):
        ids = np.array([[1, 2, 2, 3], [3, 3, 0, 1]])
        prior = get_prior("reestimate", ids, hn_tokenizer)
        assert prior.shape == (len(hn_tokenizer),)
        # more frequent ids get higher prior
        assert prior[3] > prior[2] > prior[4]
        # log-probs sum to ~1 in prob space (before special overrides)
        assert prior.max() <= 0.0 or np.isclose(np.exp(prior).sum(), 1.0, atol=0.1)

    def test_use_tokenizer_mode(self):
        from fixtures import _cached, _build_xlmr_like

        tok = Tokenizer.from_json(_cached("xlmr_like", _build_xlmr_like))
        prior = get_prior("use_tokenizer", None, tok)
        scores = tok.model.get_scores()
        # non-special entries match unigram scores
        specials = set(tok.all_special_ids)
        for i in range(min(50, len(scores))):
            if i not in specials:
                assert prior[i] == pytest.approx(scores[i])
        for i in specials:
            assert prior[i] == 0.0

    def test_keep_mode(self, hn_tokenizer):
        assert get_prior("keep", None, hn_tokenizer) is None

    def test_aho_corasick_matches_naive(self):
        patterns = {"he": 0, "she": 1, "his": 2, "hers": 3, "e": 4}
        ac = AhoCorasick(patterns)
        text = "ushers"
        got = sorted(ac.iter_matches(text))
        naive = sorted(
            v
            for p, v in patterns.items()
            for i in range(len(text))
            if text[i : i + len(p)] == p
        )
        assert got == naive

    def test_substring_prior(self, hn_tokenizer):
        texts = ["the thermal theory", "there then"] * 10
        prior = compute_substring_prior(hn_tokenizer, texts=texts)
        assert prior.shape == (len(hn_tokenizer),)
        # 'he' occurs as substring more often than 'q'
        he = hn_tokenizer.token_to_id("he")
        q = hn_tokenizer.token_to_id("q")
        if he is not None and q is not None:
            assert prior[he] > prior[q]


class TestSampler:
    def test_pretokenize_prepends_space(self):
        pieces = pretokenize_byte_level("hello world")
        assert pieces[0][0] == "Ġhello"
        assert pieces[1][0] == "Ġworld"

    def test_count_substrings_scores(self):
        counts = _count_substrings({"aa": 3}, max_length=16, stride=1, use_native=False)
        # pretoken b' aa': substrings starting at char boundaries
        assert counts[b"a"] == 3 * 1 * 2  # 'a' appears at 2 start positions
        assert counts[b"aa"] == 3 * 2
        assert counts[b" aa"] == 3 * 4  # ' ' maps to Ġ = 2 utf-8 bytes

    def test_native_matches_python(self):
        texts = {
            "hello world, this is a test": 1,
            "Zürich café 日本語 🤖 multi-byte": 2,
            "  spaces\tand\nnewlines  ": 1,
        }
        py = _count_substrings(texts, max_length=16, stride=4, use_native=False)
        native = _count_substrings(texts, max_length=16, stride=4, use_native=True)
        assert py == native

    def test_sample_contains_byte_alphabet_and_ws_runs(self):
        s = TokenizerSampler(use_native=False)
        pieces = s.sample_tokenizer(
            {"the quick brown fox jumps over the lazy dog": 1}, 5000, 16, 1, 0.0
        )
        vocab = {p for p, _ in pieces}
        from zett_tpu.tokenization.bytemaps import BYTE_ALPHABET

        assert set(BYTE_ALPHABET) <= vocab
        assert "ĠĠĠ" in vocab  # whitespace runs
        assert "Ġthe" in vocab

    def test_seed_size_cap(self):
        s = TokenizerSampler(use_native=False)
        pieces = s.sample_tokenizer({"some words repeated here": 1}, 900, 16, 1, 0.0)
        assert len(pieces) <= 900

    def test_sliding_cache(self):
        s = TokenizerSampler(use_native=False)
        # two warmup calls fill the window without popping
        s.sample_tokenizer({"alpha beta": 1}, 100, 16, 1, 0.0, pop_prev=False)
        s.sample_tokenizer({"omega psi": 1}, 100, 16, 1, 0.0, pop_prev=False)
        assert len(s.seed_cache) == 2
        # a popping call drops the OLDEST batch (alpha) and adds the new one
        pieces = s.sample_tokenizer({"gamma delta": 1}, 5000, 16, 1, 0.0, pop_prev=True)
        vocab = {p for p, _ in pieces}
        assert "Ġgamma" in vocab and "Ġomega" in vocab
        assert "Ġalpha" not in vocab  # slid out of the window
        assert len(s.seed_cache) == 2

    def test_validation_does_not_push(self):
        s = TokenizerSampler(use_native=False)
        s.sample_tokenizer({"warm up": 1}, 100, 16, 1, 0.0, pop_prev=False)
        n = len(s.seed_cache)
        s.sample_tokenizer({"valid": 1}, 100, 16, 1, 0.0, pop_prev=True, push_current=False)
        assert len(s.seed_cache) == n

    def test_noise_changes_scores_not_pieces_much(self):
        rng = np.random.default_rng(0)
        s1 = TokenizerSampler(use_native=False)
        p1 = dict(s1.sample_tokenizer({"hello world hello": 1}, 2000, 16, 1, 0.0))
        s2 = TokenizerSampler(use_native=False)
        p2 = dict(
            s2.sample_tokenizer({"hello world hello": 1}, 2000, 16, 1, 0.5, rng=rng)
        )
        assert p1.keys() and p2.keys()
        common = set(p1) & set(p2) - {p for p, sc in p1.items() if sc == 0.0}
        diffs = [abs(p1[p] - p2[p]) for p in common if p1[p] != p2[p]]
        assert diffs, "noise had no effect on scores"

    def test_scores_are_log_probs(self):
        s = TokenizerSampler(use_native=False)
        pieces = s.sample_tokenizer({"abc abc abc": 1}, 1000, 16, 1, 0.0)
        scores = [sc for p, sc in pieces if sc != 0.0]
        assert all(sc <= 0.0 for sc in scores)
