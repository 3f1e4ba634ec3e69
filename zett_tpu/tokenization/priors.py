"""Token priors.

Two modes match the reference's get_prior (zett/utils.py:291-315):
"reestimate" — Laplace-smoothed corpus counts; "use_tokenizer" — Unigram
scores. The substring prior counts, for every vocab token, how often it
occurs as a substring of corpus pretokens, via Aho-Corasick multi-pattern
matching (reference: zett/compute_prior.py:25-136; the pyahocorasick C
extension is replaced by our own automaton, with a C++ fast path in csrc).
"""

from __future__ import annotations

from collections import Counter, deque
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

from ..constants import NEGATIVE_INF_FILL_VALUE
from .core import Tokenizer

try:
    from zett_tpu.csrc import host_lib as _host_lib
except Exception:  # pragma: no cover
    _host_lib = None


def get_prior(
    mode: str,
    input_ids: Optional[np.ndarray],
    tokenizer: Tokenizer,
    padding: int = 0,
) -> Optional[np.ndarray]:
    if mode == "keep":
        return None
    if mode == "reestimate":
        uniq, counts = np.unique(input_ids, return_counts=True)
        priors = np.ones(len(tokenizer) + padding)  # laplace smoothing
        priors[uniq] += counts
        priors /= priors.sum()
        priors = np.log(priors)
    elif mode == "use_tokenizer":
        scores = np.asarray(tokenizer.model.get_scores(), dtype=np.float64)
        priors = np.pad(
            scores,
            (0, len(tokenizer) + padding - len(scores)),
            constant_values=NEGATIVE_INF_FILL_VALUE,
        )
    else:
        raise ValueError(f"Unknown prior mode: {mode}")
    special_ids = tokenizer.all_special_ids
    if special_ids:
        priors[np.asarray(special_ids)] = 0.0  # special tokens: 0 by convention
    return priors


class AhoCorasick:
    """Multi-pattern substring automaton (goto/fail/output links)."""

    def __init__(self, patterns: Dict[str, int]):
        # trie as list-of-dicts for speed
        self._goto: List[Dict[str, int]] = [{}]
        self._out: List[List[int]] = [[]]
        self._fail: List[int] = [0]
        for pattern, value in patterns.items():
            node = 0
            for c in pattern:
                nxt = self._goto[node].get(c)
                if nxt is None:
                    self._goto.append({})
                    self._out.append([])
                    self._fail.append(0)
                    nxt = len(self._goto) - 1
                    self._goto[node][c] = nxt
                node = nxt
            self._out[node].append(value)
        # BFS to build failure links
        queue = deque()
        for child in self._goto[0].values():
            queue.append(child)
        while queue:
            node = queue.popleft()
            for c, child in self._goto[node].items():
                queue.append(child)
                f = self._fail[node]
                while f and c not in self._goto[f]:
                    f = self._fail[f]
                self._fail[child] = self._goto[f].get(c, 0) if self._goto[f].get(c, 0) != child else 0
                self._out[child].extend(self._out[self._fail[child]])

    def iter_matches(self, text: str) -> Iterable[int]:
        node = 0
        goto, fail, out = self._goto, self._fail, self._out
        for c in text:
            while node and c not in goto[node]:
                node = fail[node]
            node = goto[node].get(c, 0)
            if out[node]:
                yield from out[node]

    def count_into(self, text: str, weight: int, acc: np.ndarray):
        node = 0
        goto, fail, out = self._goto, self._fail, self._out
        for c in text:
            while node and c not in goto[node]:
                node = fail[node]
            node = goto[node].get(c, 0)
            for v in out[node]:
                acc[v] += weight


def get_pretoken_counts(tokenizer: Tokenizer, texts: Iterable[str]) -> Counter:
    """Count normalized pretokens across a corpus using the tokenizer's own
    normalizer/pre-tokenizer (reference compute_prior.py:35-63)."""
    counts: Counter = Counter()
    norm = tokenizer.normalizer
    pretok = tokenizer.pre_tokenizer
    for text in texts:
        t = norm.normalize_str(text) if norm is not None else text
        if pretok is not None:
            counts.update(p for p, _ in pretok.pre_tokenize_str(t))
        else:
            counts[t] += 1
    return counts


def compute_substring_prior(
    tokenizer: Tokenizer,
    texts: Optional[Iterable[str]] = None,
    pretoken_counts: Optional[Counter] = None,
    return_pretoken_counts: bool = False,
):
    """log-prior over the vocab from substring occurrence counts in pretokens."""
    if pretoken_counts is None:
        assert texts is not None
        pretoken_counts = get_pretoken_counts(tokenizer, texts)

    vocab = tokenizer.get_vocab()
    acc = np.zeros(len(tokenizer), dtype=np.int64)
    if _host_lib is not None:
        _host_lib.substring_counts(vocab, pretoken_counts, acc)
    else:
        automaton = AhoCorasick(vocab)
        for pretoken, count in pretoken_counts.items():
            automaton.count_into(pretoken, count, acc)

    prior = acc.astype(np.float64) + 1.0  # laplace smoothing
    prior /= prior.sum()
    prior = np.log(prior)
    special_ids = tokenizer.all_special_ids
    if special_ids:
        prior[np.asarray(special_ids)] = 0.0
    if return_pretoken_counts:
        return prior, pretoken_counts
    return prior
