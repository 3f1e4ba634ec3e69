"""Unigram-EM tokenizer training: the framework's sentencepiece replacement.

Reference dependency: scripts/make_spm.py:36-87 trains per-language 50k
Unigram tokenizers with the sentencepiece C++ trainer, converts them
byte-level and appends whitespace-run pieces for code. Here the trainer is
our own: byte-level seed vocab from substring counts, EM iterations with the
forward-backward E-step in the native C++ library (uni_expected_counts),
Bayesianized M-step (digamma), and likelihood-loss-based pruning — the
sentencepiece algorithm re-expressed over raw bytes.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
from scipy.special import digamma

from ..constants import EXTRA_WHITESPACE_CHARS, SPLIT_REGEX_NO_MARKS
from .bytemaps import bytes_to_byte_chars
from .convert import BYTE_LEVEL_PRETOKENIZER
from .core import AddedToken, Tokenizer
from .pretokenizers import _compiled

try:
    from zett_tpu.csrc import host_lib as _host_lib
except Exception:  # pragma: no cover
    _host_lib = None


def _pretoken_counts(texts: Iterable[str]) -> Counter:
    """Byte pretoken counts with the canonical prepended-space regex split."""
    rx = _compiled(SPLIT_REGEX_NO_MARKS)
    counts: Counter = Counter()
    for text in texts:
        for m in rx.finditer(" " + text):
            counts[m.group().encode("utf-8")] += 1
    return counts


def train_unigram(
    texts: Iterable[str],
    vocab_size: int,
    seed_size_factor: int = 4,
    n_em_iters: int = 2,
    n_prune_rounds: int = 4,
    shrink_factor: float = 0.75,
    max_piece_length: int = 16,
    special_tokens: Optional[List[str]] = None,
    verbose: bool = False,
) -> Tokenizer:
    """Train a byte-level Unigram tokenizer with EM + pruning.

    Returns a canonical byte-level Tokenizer (Prepend(" ") + Split regex +
    ByteLevel map) with `vocab_size` pieces (including the 256-byte alphabet
    and any special tokens, which are prepended at ids 0..n_special-1).
    """
    assert _host_lib is not None, "native host library required for EM training"
    special_tokens = special_tokens or []

    pretoken_counts = _pretoken_counts(texts)
    pretokens = list(pretoken_counts.keys())
    weights = np.array([pretoken_counts[p] for p in pretokens], dtype=np.float64)

    # seed vocab: frequent substrings (freq*len scoring), always the byte alphabet
    seed_counts: Dict[bytes, int] = {}
    for raw, cnt in pretoken_counts.items():
        L = len(raw)
        for i in range(L):
            upper = min(max_piece_length, L - i)
            for k in range(2, upper + 1):
                piece = raw[i : i + k]
                seed_counts[piece] = seed_counts.get(piece, 0) + cnt * k
    seed_size = min(len(seed_counts), vocab_size * seed_size_factor)
    seeds = sorted(seed_counts.items(), key=lambda kv: -kv[1])[:seed_size]

    pieces: List[bytes] = [bytes([b]) for b in range(256)] + [p for p, _ in seeds]
    counts0 = np.array(
        [1.0] * 256 + [float(c) for _, c in seeds], dtype=np.float64
    )
    scores = np.log(counts0 / counts0.sum())

    def em(pieces, scores, iters):
        for _ in range(iters):
            model = _host_lib.NativeUnigram(pieces, list(scores), unk_id=-1)
            counts, ll = model.expected_counts(pretokens, weights, len(pieces))
            # Bayesianized M-step (sentencepiece): digamma-smoothed
            counts = np.maximum(counts, 0.0)
            total = counts.sum()
            if total <= 0:
                break
            with np.errstate(invalid="ignore"):
                # digamma explodes toward -1/x for x -> 0, so floor the
                # expected counts at 0.05 (score bounded at ~-20.6 relative
                # to digamma(total)). Rare-but-real pieces keep a sane,
                # stable low score instead of death-spiraling (the r3 sink
                # branch subtracted 20 per EM iteration, which starved a
                # third of the loss-pruned survivors and under-filled the
                # requested vocab to 56-66% where HF fills ~100%).
                new_scores = digamma(np.maximum(counts, 0.05)) - digamma(total)
            scores = new_scores
            if verbose:
                print(f"EM ll/token: {ll / weights.sum():.4f}, pieces: {len(pieces)}")
        return scores

    def prune_losses(pieces, scores, counts):
        """sentencepiece's prune criterion (unigram_model_trainer.cc
        PruneSentencePieces): the likelihood LOST if a piece is removed and
        its occurrences re-segment along the best alternative path —
        loss(x) = freq(x) * (logp(x) - logp_alt(x)). Pruning by raw usage
        instead keeps shadowed/redundant pieces that the final EM then
        starves, under-filling the requested vocab (r3: 56-66% emitted)."""
        logZ = np.log(np.exp(scores - scores.max()).sum()) + scores.max()
        norm = scores - logZ
        score_of = {p: s for p, s in zip(pieces, norm)}
        losses = np.zeros(len(pieces))
        NEG = -1e18
        for i, (p, c) in enumerate(zip(pieces, counts)):
            if len(p) <= 1:
                continue  # byte alphabet is inviolable anyway
            if c <= 0:
                losses[i] = NEG  # unused: prune first
                continue
            L = len(p)
            best = [NEG] * (L + 1)
            best[0] = 0.0
            for j in range(1, L + 1):
                bj = NEG
                lo = 0 if j <= max_piece_length else j - max_piece_length
                for k in range(lo, j):
                    sub = p[k:j]
                    if sub == p:
                        continue
                    s = score_of.get(sub)
                    if s is not None:
                        cand = best[k] + s
                        if cand > bj:
                            bj = cand
                best[j] = bj
            losses[i] = c * (norm[i] - best[L])
        return losses

    target_core = vocab_size - len(special_tokens)
    while True:
        scores = em(pieces, scores, n_em_iters)
        if len(pieces) <= target_core:
            break
        # prune by likelihood loss, keeping all single bytes; shrink toward
        # the target
        model = _host_lib.NativeUnigram(pieces, list(scores), unk_id=-1)
        counts, _ = model.expected_counts(pretokens, weights, len(pieces))
        keep_n = max(target_core, int(len(pieces) * shrink_factor))
        order = np.argsort(-prune_losses(pieces, scores, counts))
        keep = set()
        for i in range(256):
            keep.add(i)  # byte alphabet is inviolable
        for idx in order:
            if len(keep) >= keep_n:
                break
            keep.add(int(idx))
        idxs = sorted(keep)
        pieces = [pieces[i] for i in idxs]
        scores = scores[idxs]
        if len(pieces) <= target_core:
            scores = em(pieces, scores, n_em_iters)
            break

    # drop only pieces with literally zero posterior mass (unreachable in
    # any segmentation of the corpus): both sentencepiece's seed and HF's
    # UnigramTrainer FILL the requested vocab when the seed lattice supports
    # it, keeping rare-but-real pieces with low finite scores (r3 used a
    # 0.5-occurrence support cut and emitted only 56-66% of the requested
    # vocab where HF emitted ~100% on the same corpus). Byte rows always
    # stay.
    model = _host_lib.NativeUnigram(pieces, list(scores), unk_id=-1)
    counts, _ = model.expected_counts(pretokens, weights, len(pieces))
    supported = (counts > 0.0) | (np.arange(len(pieces)) < 256)
    if supported.sum() < len(pieces):
        if verbose:
            print(
                f"corpus supports {int(supported.sum())} of {len(pieces)} "
                "requested pieces; dropping the rest"
            )
        pieces = [p for p, k in zip(pieces, supported) if k]
        scores = scores[supported]
        scores = em(pieces, scores, 1)

    # floor the stragglers (byte-coverage rows whose scores drifted): just
    # below the rarest genuinely-used piece, the same convention as the
    # Viterbi unk penalty
    used = scores[counts[supported] >= 0.5] if supported.any() else scores
    if used.size:
        scores = np.maximum(scores, used.min() - 10.0)

    # normalize scores to log-probs
    logZ = np.log(np.exp(scores - scores.max()).sum()) + scores.max()
    scores = scores - logZ

    vocab_pairs = [[t, 0.0] for t in special_tokens] + [
        [bytes_to_byte_chars(p), float(s)] for p, s in zip(pieces, scores)
    ]
    return assemble_unigram_tokenizer(vocab_pairs, special_tokens)


def assemble_unigram_tokenizer(
    vocab_pairs: List[List], special_tokens: List[str]
) -> Tokenizer:
    """Byte-level Unigram tokenizer from [piece, score] pairs (pieces already
    in byte-char alphabet, specials first)."""
    data = {
        "version": "1.0",
        "added_tokens": [],
        "normalizer": {"type": "Prepend", "prepend": " "},
        "pre_tokenizer": BYTE_LEVEL_PRETOKENIZER,
        "post_processor": None,
        "decoder": {"type": "ByteLevel", "add_prefix_space": True,
                    "trim_offsets": True, "use_regex": True},
        "model": {"type": "Unigram", "unk_id": None, "vocab": vocab_pairs,
                  "byte_fallback": False},
    }
    tok = Tokenizer.from_json(data)
    for i, t in enumerate(special_tokens):
        tok._register_added_token(AddedToken(t, normalized=False, special=True), i)
    return tok


def make_spm_tokenizer(
    texts: Iterable[str],
    vocab_size: int = 50_000,
    with_whitespace_pieces: bool = False,
    special_tokens: Optional[List[str]] = None,
    **train_kwargs,
) -> Tokenizer:
    """Per-language tokenizer building (reference scripts/make_spm.py):
    train Unigram, optionally append whitespace-run pieces for code."""
    tok = train_unigram(
        texts, vocab_size, special_tokens=special_tokens, **train_kwargs
    )
    if with_whitespace_pieces:
        pieces = tok.model.get_pieces()
        existing = {p for p, _ in pieces}
        extra = []
        for c1 in EXTRA_WHITESPACE_CHARS:
            for i in range(1, 16):
                for c2 in EXTRA_WHITESPACE_CHARS:
                    piece = c2 + c1 * i
                    if piece not in existing:
                        extra.append([piece, 0.0])
                        existing.add(piece)
        tok.model.set_pieces([list(p) for p in pieces] + extra)
    return tok
