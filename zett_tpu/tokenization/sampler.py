"""Noisy Unigram-tokenizer sampling from corpus substrings.

Replaces the reference's Rust module (rust_utils/src/lib.rs:21-257,
TokenizerSampler::sample_tokenizer): enumerate substrings of pre-tokenized
text, score = frequency * byte-length, keep a sliding window of per-batch
count maps, normalize to log-probs with Gaussian noise, always include the
256-byte alphabet and whitespace-run pieces, truncate to seed_size.

This module is the semantic reference; zett_tpu.csrc provides the C++ fast
path with identical output (differential-tested).
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..constants import EXTRA_WHITESPACE_CHARS, SPLIT_REGEX_NO_MARKS
from .bytemaps import BYTE_ALPHABET, text_to_byte_chars
from .pretokenizers import _compiled

try:
    from zett_tpu.csrc import host_lib as _host_lib
except Exception:  # pragma: no cover - C++ lib optional
    _host_lib = None


def pretokenize_byte_level(text: str) -> List[Tuple[str, List[int]]]:
    """GPT-2-regex split (no \\p{M}) then byte-char mapping, with a prepended
    space — the sampler's canonical pre-tokenization (rust_utils lib.rs:82-111).

    Returns (mapped_pretoken, char_start_offsets) where char_start_offsets are
    the positions in the mapped string where original characters begin.
    """
    text = " " + text
    rx = _compiled(SPLIT_REGEX_NO_MARKS)
    out = []
    for m in rx.finditer(text):
        piece = m.group()
        starts = []
        pos = 0
        for c in piece:
            starts.append(pos)
            pos += len(c.encode("utf-8"))
        out.append((text_to_byte_chars(piece), starts))
    return out


def _count_substrings(
    texts_with_counts: Dict[str, int], max_length: int, stride: int
) -> Dict[str, int]:
    """Enumerate substrings starting at every `stride`-th original-char
    boundary, with byte-char lengths 1..max_length-1;
    score += count * utf8_byte_length of the byte-char piece
    (reference: rust_utils/src/lib.rs:113-158)."""
    counts: Dict[str, int] = {}
    for text, n in texts_with_counts.items():
        for pretoken, char_starts in pretokenize_byte_level(text):
            L = len(pretoken)
            for i in char_starts[::stride]:
                upper = min(max_length - 1, L - i)
                for k in range(1, upper + 1):
                    piece = pretoken[i : i + k]
                    score = n * len(piece.encode("utf-8"))
                    counts[piece] = counts.get(piece, 0) + score
    return counts


class TokenizerSampler:
    """Stateful sampler with a sliding cache of per-batch substring counts."""

    def __init__(self, use_native: bool = True):
        self.seed_cache: deque = deque()
        self._native = None
        if use_native and _host_lib is not None:
            self._native = _host_lib.NativeSampler()

    def sample_tokenizer(
        self,
        texts_with_counts: Dict[str, int],
        seed_size: int,
        max_length: int = 16,
        stride: int = 1,
        noise_std: float = 0.0,
        pop_prev: bool = True,
        push_current: bool = True,
        rng: Optional[np.random.Generator] = None,
    ) -> List[Tuple[str, float]]:
        if self._native is not None:
            seed = int((rng or np.random.default_rng()).integers(0, 2**31 - 1))
            return self._native.sample_tokenizer(
                texts_with_counts, seed_size, max_length, stride,
                noise_std, pop_prev, push_current, seed,
            )
        return self._sample_py(
            texts_with_counts, seed_size, max_length, stride,
            noise_std, pop_prev, push_current, rng,
        )

    def _sample_py(
        self, texts_with_counts, seed_size, max_length, stride,
        noise_std, pop_prev, push_current, rng,
    ) -> List[Tuple[str, float]]:
        rng = rng or np.random.default_rng()
        current = _count_substrings(texts_with_counts, max_length, stride)

        maybe_prev = self.seed_cache.pop() if (pop_prev and self.seed_cache) else None
        self.seed_cache.appendleft(current)

        seed_pieces: List[Tuple[str, float]] = []
        if pop_prev:
            merged: Dict[str, int] = {}
            for batch_counts in self.seed_cache:
                for k, v in batch_counts.items():
                    merged[k] = merged.get(k, 0) + v

            score_sum = float(sum(merged.values()))
            min_score = float(min(merged.values())) if merged else 1.0
            min_log_prob = float(np.log(min_score / score_sum)) if score_sum else 0.0

            for char in BYTE_ALPHABET:
                seed_pieces.append((char, min_log_prob))

            noise = (
                rng.normal(0.0, noise_std, size=len(merged))
                if noise_std > 0
                else np.zeros(len(merged))
            )
            scored = []
            for (piece, v), eps in zip(merged.items(), noise):
                noised = v / score_sum + eps
                scored.append((piece, float(np.log(noised)) if noised > 0 else -100000.0))
            scored.sort(key=lambda x: -x[1])

            ws = EXTRA_WHITESPACE_CHARS
            for c1 in ws:
                for i in range(1, max_length):
                    for c2 in ws:
                        seed_pieces.append((c2 + c1 * i, 0.0))

            for piece, score in scored:
                if len(piece) == 1 or sum(c in ws for c in piece) >= 2:
                    continue  # single chars and ws runs already added
                seed_pieces.append((piece, score))
                if len(seed_pieces) >= seed_size:
                    break

        if not push_current:
            self.seed_cache.popleft()
            if maybe_prev is not None:
                self.seed_cache.append(maybe_prev)
        return seed_pieces
