"""serde_json float-parse emulation (tokenization/jsonfloat.py).

HF `tokenizers` inherits serde_json's default, NOT-correctly-rounded f64
parsing; ~25% of real Unigram scores land 1 ulp away from Python's json
values, silently flipping Viterbi tie-breaks on periodic strings (piece-
multiset permutations give exactly-colliding path scores). These tests pin
the emulation against HF itself.
"""

import json
import random

import numpy as np
import pytest
from tokenizers import Tokenizer as HFTokenizer

from zett_tpu.tokenization import Tokenizer
from zett_tpu.tokenization.jsonfloat import serde_canon, serde_f64


def test_serde_differs_from_correct_rounding():
    # values whose 17-digit significand exceeds 2^53: `significand as f64`
    # rounds once, the 10^-15 division rounds again
    for s in ["-23.730159082008406", "-15.635918818704317", "-9.994279510260647"]:
        assert serde_f64(s) != float(s), s
        assert abs(serde_f64(s) - float(s)) <= np.spacing(abs(float(s)))


def test_serde_canon_native_matches_python():
    rng = random.Random(0)
    xs = [-rng.uniform(0.0, 40.0) for _ in range(20000)] + [0.0, -1.0, -2.5]
    got = serde_canon(xs)
    want = [serde_f64(x) for x in xs]
    assert got == want
    # fixed point over score magnitudes: reserialization round-trips stably
    assert serde_canon(got) == got


def _hf(vocab_json):
    return HFTokenizer.from_str(json.dumps(vocab_json))


def _tok_json(vocab):
    return {
        "version": "1.0", "added_tokens": [], "normalizer": None,
        "pre_tokenizer": None, "post_processor": None, "decoder": None,
        "model": {"type": "Unigram", "unk_id": 0,
                  "vocab": [["<unk>", -100.0]] + vocab, "byte_fallback": False},
    }


def test_periodic_string_tie_matches_hf():
    """The original failure shape: a long piece that equals a concatenation
    of short pieces (periodic text), with a messy-score prefix piece. The two
    segmentations' path scores collide exactly in correctly-rounded f64, but
    not in serde-parsed f64 — HF's pick is only reproducible with canon."""
    vocab = [
        ["u", -10.156335607261767], ["v", -9.40297437531868],
        ["w", -11.09928552905105], ["uvwuvwuvw", -15.233929608271067],
        ["P", -24.899903196436245],
    ]
    d = _tok_json(vocab)
    hf = _hf(d)
    ours = Tokenizer.from_json(d)
    for s in ["Puvwuvwuvwuvw", "uvwuvwuvwuvw", "Puvwuvwuvwuvwuvwuvw"]:
        want = hf.encode(s, add_special_tokens=False).ids
        got = ours.encode(s, add_special_tokens=False).ids
        assert got == want, s


def test_non_shortest_literals_parse_from_raw_bytes():
    """Files holding non-shortest decimal literals (sentencepiece exports
    with full-precision digits): serde parses the ORIGINAL bytes, and
    re-canonicalizing from repr(float(bytes)) can land 1 ulp elsewhere.
    from_str must hold exactly what HF holds for the same file bytes."""
    raws = ["-10.35667001171853485", "-12.13250904315709811",
            "-19.06387816609423425"]
    vocab_src = ", ".join(f'["p{i}", {r}]' for i, r in enumerate(raws))
    raw_json = (
        '{"version": "1.0", "added_tokens": [], "normalizer": null, '
        '"pre_tokenizer": null, "post_processor": null, "decoder": null, '
        '"model": {"type": "Unigram", "unk_id": 0, '
        f'"vocab": [["<unk>", -100.0], {vocab_src}], "byte_fallback": false}}}}'
    )
    ours = Tokenizer.from_str(raw_json).model.get_scores()[1:]
    # HF re-serializes the doubles it holds with shortest repr; Python json
    # parses those correctly-rounded -> exactly HF's in-memory values
    hf_scores = [
        s for _, s in json.loads(HFTokenizer.from_str(raw_json).to_str())
        ["model"]["vocab"]
    ][1:]
    assert ours == hf_scores
    # and the distinction is real: shortest-repr re-canonicalization would
    # have produced a different double for each of these literals
    assert all(
        serde_f64(raw) != serde_f64(repr(float(raw))) for raw in raws
    )
    assert ours == [serde_f64(raw) for raw in raws]


@pytest.mark.parametrize("seed", [1, 2])
def test_fuzz_unigram_ties_match_hf(seed):
    """Random messy-score vocabs over a tiny alphabet generate tie-heavy
    lattices; every encode must match HF byte-exactly."""
    rng = random.Random(seed)
    alpha = "abcd"
    for _ in range(250):
        vocab = [[c, -rng.uniform(1, 20)] for c in alpha]
        for _ in range(rng.randint(1, 6)):
            p = "".join(rng.choice(alpha) for _ in range(rng.randint(2, 6)))
            vocab.append([p, -rng.uniform(1, 30)])
        seen, vv = set(), []
        for p, s in vocab:
            if p not in seen:
                seen.add(p)
                vv.append([p, s])
        d = _tok_json(vv)
        hf = _hf(d)
        ours = Tokenizer.from_json(d)
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 24)))
        assert (
            ours.encode(s, add_special_tokens=False).ids
            == hf.encode(s, add_special_tokens=False).ids
        ), (s, vv)
