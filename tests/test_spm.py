"""Unigram-EM trainer (sentencepiece replacement) tests."""

import numpy as np
import pytest

from zett_tpu.csrc import host_lib
from zett_tpu.tokenization.spm import make_spm_tokenizer, train_unigram

pytestmark = pytest.mark.skipif(host_lib is None, reason="native lib required")


@pytest.fixture(scope="module")
def trained(corpus):
    texts = [t for t in corpus if t.strip()] * 3
    return train_unigram(texts, vocab_size=800, special_tokens=["<unk>", "<s>"])


def test_vocab_size_and_structure(trained):
    # like sentencepiece/HF, the trainer emits at most vocab_size pieces —
    # never MORE than the corpus supports (padding with never-used pieces
    # would carry meaningless scores)
    assert 256 < len(trained) <= 800
    assert trained.token_to_id("<unk>") == 0
    assert trained.token_to_id("<s>") == 1
    vocab = trained.get_vocab(with_added_tokens=False)
    # byte alphabet complete
    from zett_tpu.tokenization.bytemaps import BYTE_ALPHABET

    for c in BYTE_ALPHABET:
        assert c in vocab


def test_scores_are_sane_log_probs(trained):
    """Regression: vocab_size beyond corpus support used to emit pieces with
    digamma-degenerate scores (-1e9-scale); every emitted piece must carry a
    plausible log-prob."""
    scores = np.array(trained.model.get_scores())
    nonspecial = scores[scores < 0]
    assert nonspecial.min() > -50, nonspecial.min()
    # normalized distribution: logsumexp ~ 0
    lse = np.log(np.exp(nonspecial - nonspecial.max()).sum()) + nonspecial.max()
    assert abs(lse) < 0.1


def test_learns_frequent_words(trained, corpus):
    vocab = trained.get_vocab()
    # frequent corpus words should be single pieces
    hits = sum(1 for w in ["Ġthe", "Ġand", "Ġof", "Ġto"] if w in vocab)
    assert hits >= 3, f"frequent words not learned: {sorted(v for v in vocab if v.startswith('Ġt'))[:20]}"


def test_encodes_and_round_trips(trained, corpus):
    for text in [t for t in corpus if t.strip()][:30]:
        enc = trained.encode(text, add_special_tokens=False)
        assert enc.ids
        decoded = trained.decode(enc.ids)
        assert decoded.lstrip() == text.lstrip() or decoded == " " + text


def test_hf_loadable_and_parity(trained, corpus):
    from tokenizers import Tokenizer as HFTokenizer

    hf = HFTokenizer.from_str(trained.to_str())
    for text in [t for t in corpus if t.strip()][:50]:
        assert trained.encode(text, add_special_tokens=False).ids == hf.encode(
            text, add_special_tokens=False
        ).ids


def test_compression_beats_bytes(trained, corpus):
    text = " ".join(t for t in corpus[:50] if t.strip())
    n_tokens = len(trained.encode(text, add_special_tokens=False).ids)
    n_bytes = len(text.encode("utf-8"))
    assert n_tokens < n_bytes * 0.6, f"poor compression: {n_tokens}/{n_bytes}"


def test_whitespace_pieces(corpus):
    tok = make_spm_tokenizer(
        [t for t in corpus if t.strip()], vocab_size=500,
        with_whitespace_pieces=True, special_tokens=["<unk>"],
    )
    vocab = tok.get_vocab()
    assert "ĠĠĠĠ" in vocab


def test_expected_counts_likelihood_improves(corpus):
    """EM must not decrease corpus likelihood."""
    from zett_tpu.tokenization.spm import _pretoken_counts

    texts = [t for t in corpus if t.strip()]
    counts = _pretoken_counts(texts)
    pretokens = list(counts.keys())
    weights = np.array([counts[p] for p in pretokens], dtype=np.float64)

    pieces = [bytes([b]) for b in range(256)] + [b" the", b"the", b" and", b"nd"]
    scores = np.log(np.ones(len(pieces)) / len(pieces))
    m1 = host_lib.NativeUnigram(pieces, list(scores), unk_id=-1)
    c1, ll1 = m1.expected_counts(pretokens, weights, len(pieces))
    new_scores = np.log(np.maximum(c1, 1e-12) / max(c1.sum(), 1e-12))
    m2 = host_lib.NativeUnigram(pieces, list(new_scores), unk_id=-1)
    _, ll2 = m2.expected_counts(pretokens, weights, len(pieces))
    assert ll2 >= ll1, f"EM step decreased likelihood: {ll1} -> {ll2}"


def test_make_tokenizers_cli_train_and_sample(tmp_path, corpus):
    """Artifact-minting CLI (reference: scripts/make_spm.py +
    make_tokenizers.sh + get_sampled_tokenizer.py)."""
    import numpy as np

    from zett_tpu.tokenization import Tokenizer
    from zett_tpu.tokenization.make_tokenizers import main

    data_path = str(tmp_path / "corpus.txt")
    with open(data_path, "w") as f:
        for t in corpus:
            if t.strip():
                f.write(t.replace("\n", " ") + "\n")

    for mode, extra in [("train", ["--whitespace-pieces"]), ("sample", ["--noise-std", "0.5"])]:
        main([
            "--data", data_path,
            "--output", str(tmp_path / "artifacts"),
            "--name", f"{mode}_tok",
            "--mode", mode,
            "--vocab-size", "400",
        ] + extra)
        out = tmp_path / "artifacts" / f"{mode}_tok"
        tok = Tokenizer.from_file(str(out / "tokenizer.json"))
        assert len(tok) >= 256
        ids = tok.encode("hello world").ids
        assert len(ids) > 0 and tok.decode(ids) == " hello world"
        # reference artifact format (zett/compute_prior.py:158-166)
        prior = np.load(str(out / "priors.npy"), allow_pickle=True).item()
        assert set(prior) == {"substring", "token"}
        assert np.asarray(prior["token"]).shape[0] == len(tok)
        assert np.isfinite(prior["token"]).all()
        # HF sidecars so the dir loads with PreTrainedTokenizerFast
        assert (out / "tokenizer_config.json").exists()
        assert (out / "special_tokens_map.json").exists()
