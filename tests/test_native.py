"""Differential tests: native C++ host library vs Python reference paths."""

import numpy as np
import pytest

from zett_tpu.csrc import host_lib
from zett_tpu.data.collator import build_sampled_tokenizer
from zett_tpu.tokenization import Tokenizer
from zett_tpu.tokenization.fast_encode import FastUnigramEncoder, fast_encoder_or_none
from zett_tpu.tokenization.priors import AhoCorasick
from zett_tpu.tokenization.sampler import TokenizerSampler

pytestmark = pytest.mark.skipif(host_lib is None, reason="native lib unavailable")


@pytest.fixture(scope="module")
def sampled_tokenizer(corpus):
    sampler = TokenizerSampler(use_native=True)
    sampled = sampler.sample_tokenizer(
        {t: 1 for t in corpus if t.strip()}, 4000, 16, 1, 0.0
    )
    pieces = [p for p, _ in sampled]
    scores = [s for _, s in sampled]
    reference = Tokenizer.from_json(
        {
            "version": "1.0",
            "added_tokens": [
                {"id": 0, "content": "<s>", "single_word": False, "lstrip": False,
                 "rstrip": False, "normalized": False, "special": True},
                {"id": 1, "content": "</s>", "single_word": False, "lstrip": False,
                 "rstrip": False, "normalized": False, "special": True},
            ],
            "normalizer": None,
            "pre_tokenizer": None,
            "post_processor": {
                "type": "TemplateProcessing",
                "single": [
                    {"SpecialToken": {"id": "<s>", "type_id": 0}},
                    {"Sequence": {"id": "A", "type_id": 0}},
                    {"SpecialToken": {"id": "</s>", "type_id": 0}},
                ],
                "pair": [],
                "special_tokens": {
                    "<s>": {"id": "<s>", "ids": [0], "tokens": ["<s>"]},
                    "</s>": {"id": "</s>", "ids": [1], "tokens": ["</s>"]},
                },
            },
            "decoder": None,
            "model": {"type": "BPE", "vocab": {"<s>": 0, "</s>": 1}, "merges": [],
                      "unk_token": None, "continuing_subword_prefix": None,
                      "end_of_word_suffix": None, "fuse_unk": False,
                      "byte_fallback": False, "ignore_merges": False, "dropout": None},
        }
    )
    tok, _ = build_sampled_tokenizer(pieces, scores, reference)
    return tok


class TestNativeUnigram:
    def test_matches_python_model(self, sampled_tokenizer, corpus):
        """Native Viterbi ids == the Python Unigram model's ids on the same
        pretokens (tie-breaking and all)."""
        enc = FastUnigramEncoder(sampled_tokenizer)
        from tokenizers import Tokenizer as HFTokenizer

        hf = HFTokenizer.from_str(sampled_tokenizer.to_str())
        texts = [t for t in corpus if t.strip()][:120]
        ids, mask = enc.encode_batch(texts, add_special_tokens=True)
        for i, text in enumerate(texts):
            ours = list(ids[i][mask[i] == 1])
            want = sampled_tokenizer.encode(text, add_special_tokens=True).ids
            assert ours == want, f"fast-path mismatch on {text!r}"
            hf_ids = hf.encode(text, add_special_tokens=True).ids
            assert ours == hf_ids, f"fast-path vs HF mismatch on {text!r}"

    def test_truncation_padding(self, sampled_tokenizer, corpus):
        enc = FastUnigramEncoder(sampled_tokenizer)
        texts = [t for t in corpus if len(t) > 30][:10]
        ids, mask = enc.encode_batch(texts, max_length=16, pad_id=0)
        assert ids.shape == (10, 16)
        assert (mask.sum(1) <= 16).all()

    def test_fast_encoder_or_none_rejects_noncanonical(self, xlmr_like_json):
        # metaspace Unigram (no byte-level pre-tokenizer) has no fast path
        tok = Tokenizer.from_json(xlmr_like_json)
        assert fast_encoder_or_none(tok) is None

    def test_fast_encoder_native_bpe(self, gpt2_like_json, corpus):
        """Raw byte-level BPE tokenizers (plain ByteLevel pre-tokenizer, no
        Prepend) hit the native BPE merge path — the HF-Rust-BPE counterpart
        the reference's fixed-tokenizer workloads rely on
        (zett/collator.py:166-175)."""
        tok = Tokenizer.from_json(gpt2_like_json)
        fast = fast_encoder_or_none(tok)
        assert fast is not None
        texts = [t for t in corpus if t.strip()][:60]
        ids, mask = fast.encode_batch(texts, add_special_tokens=False)
        for i, t in enumerate(texts):
            ref = tok.encode(t, add_special_tokens=False).ids
            got = list(ids[i][: mask[i].sum()])
            assert got == ref, repr(t[:50])

    def test_memo_cache_growth(self, sampled_tokenizer):
        """>>16k distinct pretokens forces the native memo cache through
        multiple rehash/grow cycles (initial capacity 2^14); ids must stay
        identical to the uncached Python model, and repeats (cache hits
        after growth) must match their first encoding."""
        enc = FastUnigramEncoder(sampled_tokenizer)
        uniq = [f"w{i}x{i * 7919 % 104729}" for i in range(40000)]
        texts = [" ".join(uniq[k : k + 8]) for k in range(0, 40000, 8)]
        texts += texts[:50]  # repeats -> post-growth cache hits
        ids, mask = enc.encode_batch(texts, add_special_tokens=False)
        for i in (0, 1, len(texts) // 2, len(texts) - 51):
            ours = list(ids[i][mask[i] == 1])
            want = sampled_tokenizer.encode(texts[i], add_special_tokens=False).ids
            assert ours == want
        for i in range(50):  # repeated texts == their first occurrence
            a, b = i, len(texts) - 50 + i
            np.testing.assert_array_equal(ids[a][mask[a] == 1], ids[b][mask[b] == 1])


class TestNativeSplitter:
    """The C++ UTF-8 scanner implements SPLIT_REGEX semantics byte-exactly
    (classes come from a table generated with the Python `regex` module)."""

    CASES = [
        "Hello world", " Hello", "don't can't we're I'll you've he'd I'm 'S",
        "a  b   c\t d\n\ne", "  leading", "trailing  ", "tabs\t\tx", "a \tb",
        "123 456a7", "3.14 1,000,000", "日本語のテキスト", "Zürich naïve café",
        "привет мир", "🤖🎉 emoji!", "é combining á̂ marks",
        "́standalone mark", "mixed!!!◌́!!!", "многа    пробелов   ",
        "'s's's", "x'sy", "''", "'", "' '", " 's", "quote 'word' end",
        " nbsp  ", "　ideographic space", " line sep",
        "a​zero-width", "under_score dash-dash", "CamelCase ALLCAPS",
        "\t", "\n", " ", "", "a", "ab12cd!@#", "½¾ fractions ² superscript",
        "ʼmodifier-apostrophe", "ـــ tatweel", "१२३ devanagari ٤٥٦ arabic",
    ]

    @pytest.mark.parametrize("use_marks", [True, False])
    def test_matches_regex(self, use_marks):
        import random

        import regex

        from zett_tpu.constants import SPLIT_REGEX, SPLIT_REGEX_NO_MARKS

        rx = regex.compile(SPLIT_REGEX if use_marks else SPLIT_REGEX_NO_MARKS)
        rng = random.Random(0)
        pool = "abc ABC 123 .,!? \t\n日本 éǘ 🤖' 's 'll «»—　 "
        cases = self.CASES + [
            "".join(rng.choice(pool) for _ in range(rng.randint(0, 80)))
            for _ in range(200)
        ]
        for s in cases:
            want = [m.group().encode("utf-8") for m in rx.finditer(s)]
            got = host_lib.split_pretokens_native(
                s.encode("utf-8"), use_marks=use_marks
            )
            assert got == want, f"splitter mismatch on {s!r}"

    def test_fused_encode_matches_pretoken_path(self, sampled_tokenizer, corpus):
        """encode_texts (fused split+Viterbi) == split-then-encode_flat."""
        import regex

        from zett_tpu.constants import SPLIT_REGEX

        enc = FastUnigramEncoder(sampled_tokenizer)
        rx = regex.compile(SPLIT_REGEX)
        texts = [t for t in corpus if t.strip()][:60]
        raw = [(" " + t).encode("utf-8") if enc.prepend else t.encode("utf-8")
               for t in texts]
        flat_fused, per_text = enc._native.encode_texts(raw)
        pretokens = []
        for t in texts:
            pretokens.extend(
                m.group().encode("utf-8")
                for m in rx.finditer((enc.prepend or "") + t)
            )
        flat_pre, _ = enc._native.encode_flat(pretokens)
        np.testing.assert_array_equal(flat_fused, flat_pre)
        assert int(per_text.sum()) == len(flat_pre)


class TestNativeAho:
    def test_matches_python_automaton(self, corpus):
        patterns = {}
        words = ["he", "she", "his", "hers", "the", "a", "ab", "тест", "日本"]
        for i, w in enumerate(words):
            patterns[w] = i
        py = AhoCorasick(patterns)
        acc_py = np.zeros(len(words), dtype=np.int64)
        texts = [t for t in corpus if t.strip()][:100]
        for t in texts:
            py.count_into(t, 2, acc_py)
        native = host_lib.NativeAhoCorasick(
            [w.encode("utf-8") for w in words], list(range(len(words)))
        )
        acc_nat = native.count([t.encode("utf-8") for t in texts], [2] * len(texts))
        # python automaton counts per CHAR position; native per BYTE position.
        # occurrence counts are identical because patterns are contiguous
        # byte sequences either way
        np.testing.assert_array_equal(acc_py, acc_nat)


class TestSamplerNative:
    def test_native_sampler_end_to_end(self, corpus):
        s_native = TokenizerSampler(use_native=True)
        s_py = TokenizerSampler(use_native=False)
        texts = {t: 1 for t in corpus[:40] if t.strip()}
        out_native = s_native.sample_tokenizer(texts, 3000, 16, 2, 0.0)
        out_py = s_py.sample_tokenizer(texts, 3000, 16, 2, 0.0)
        assert dict(out_native) == dict(out_py)
