"""Noisy Unigram-tokenizer sampling from corpus substrings.

Replaces the reference's Rust module (rust_utils/src/lib.rs:21-257,
TokenizerSampler::sample_tokenizer): enumerate substrings of pre-tokenized
text, score = frequency * byte-length of the byte-char form, keep a sliding
window of per-batch count maps, normalize to log-probs with Gaussian noise,
always include the 256-byte alphabet and whitespace-run pieces, truncate to
seed_size.

All internal state is RAW BYTES (the byte-level mapping is 1 byte : 1 char);
pieces are converted to byte-char strings only at the output boundary. The
hot substring-enumeration loop runs in the native C++ library
(zett_tpu/csrc/zett_host.cpp count_substrings) when available, with this
module's pure-Python path as the differential-tested reference.
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..constants import EXTRA_WHITESPACE_CHARS, SPLIT_REGEX_NO_MARKS
from .bytemaps import BYTE_ALPHABET, bytes_to_byte_chars
from .pretokenizers import _compiled

try:
    from zett_tpu.csrc import host_lib as _host_lib
except Exception:  # pragma: no cover - C++ lib optional
    _host_lib = None

def _byte_weight_table() -> np.ndarray:
    # utf-8 length of each byte's byte-char (matches rust token.len() scoring)
    w = np.full(256, 2, dtype=np.int64)
    for b in range(ord("!"), ord("~") + 1):
        w[b] = 1
    return w


_BYTE_W = _byte_weight_table()


def pretokenize_bytes(text: str) -> List[Tuple[bytes, List[int]]]:
    """GPT-2-regex split (no \\p{M}) with a prepended space
    (rust_utils lib.rs:82-111). Returns (utf8_bytes, char_start_offsets)."""
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
        out.append((piece.encode("utf-8"), starts))
    return out


def pretokenize_byte_level(text: str) -> List[Tuple[str, List[int]]]:
    """Byte-char variant (kept for tests/diagnostics)."""
    return [
        (bytes_to_byte_chars(raw), starts) for raw, starts in pretokenize_bytes(text)
    ]


def _count_substrings_py(
    texts_with_counts: Dict[str, int], max_length: int, stride: int
) -> Dict[bytes, int]:
    """Enumerate substrings starting at every `stride`-th original-char
    boundary, byte lengths 1..max_length-1; score += count * byte-char-utf8len
    (reference: rust_utils/src/lib.rs:113-158)."""
    counts: Dict[bytes, int] = {}
    for text, n in texts_with_counts.items():
        for raw, char_starts in pretokenize_bytes(text):
            L = len(raw)
            for i in char_starts[::stride]:
                upper = min(max_length - 1, L - i)
                wsum = 0
                for k in range(1, upper + 1):
                    wsum += int(_BYTE_W[raw[i + k - 1]])
                    piece = raw[i : i + k]
                    counts[piece] = counts.get(piece, 0) + n * wsum
    return counts


def _count_substrings_native(
    texts_with_counts: Dict[str, int], max_length: int, stride: int
) -> Dict[bytes, int]:
    pretokens: List[bytes] = []
    char_starts: List[List[int]] = []
    weights: List[int] = []
    for text, n in texts_with_counts.items():
        for raw, starts in pretokenize_bytes(text):
            pretokens.append(raw)
            char_starts.append(starts)
            weights.append(n)
    return _host_lib.count_substrings_native(
        pretokens, char_starts, weights, max_length, stride
    )


def _count_substrings(
    texts_with_counts: Dict[str, int], max_length: int, stride: int,
    use_native: bool = True,
) -> Dict[bytes, int]:
    if use_native and _host_lib is not None:
        return _count_substrings_native(texts_with_counts, max_length, stride)
    return _count_substrings_py(texts_with_counts, max_length, stride)


class TokenizerSampler:
    """Stateful sampler with a sliding cache of per-batch substring counts."""

    def __init__(self, use_native: bool = True):
        self.seed_cache: deque = deque()
        self.use_native = use_native and _host_lib is not None

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
        rng = rng or np.random.default_rng()
        if self.use_native:
            # fused native path: split + substring counting in one C++ call,
            # counts stay native (no million-entry Python dicts)
            texts_b = [(" " + t).encode("utf-8") for t in texts_with_counts]
            current = _host_lib.count_substrings_texts_native(
                texts_b, list(texts_with_counts.values()), max_length, stride
            )
        else:
            current = _count_substrings_py(texts_with_counts, max_length, stride)

        maybe_prev = self.seed_cache.pop() if (pop_prev and self.seed_cache) else None
        self.seed_cache.appendleft(current)

        seed_pieces: List[Tuple[str, float]] = []
        if pop_prev:
            if self.use_native:
                keys_blob, key_offsets, values_u = _host_lib.merge_counts(
                    list(self.seed_cache)
                )
                values = values_u.astype(np.float64)
                keys = None
            else:
                merged: Dict[bytes, int] = {}
                for batch_counts in self.seed_cache:
                    for k, v in batch_counts.items():
                        merged[k] = merged.get(k, 0) + v
                values = np.fromiter(
                    merged.values(), dtype=np.float64, count=len(merged)
                )
                keys = list(merged.keys())

            score_sum = float(values.sum()) if len(values) else 1.0
            min_score = float(values.min()) if len(values) else 1.0
            min_log_prob = float(np.log(min_score / score_sum)) if score_sum else 0.0

            for char in BYTE_ALPHABET:
                seed_pieces.append((char, min_log_prob))

            probs = values / score_sum
            if noise_std > 0:
                probs = probs + rng.normal(0.0, noise_std, size=len(probs))
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = np.where(probs > 0, np.log(np.maximum(probs, 1e-300)), -100000.0)
            order = np.argsort(-scores, kind="stable")

            ws = EXTRA_WHITESPACE_CHARS
            for c1 in ws:
                for i in range(1, max_length):
                    for c2 in ws:
                        seed_pieces.append((c2 + c1 * i, 0.0))

            if keys is None:
                # vectorized eligibility: skip 1-byte pieces (alphabet covers
                # them) and pieces with >= 2 whitespace bytes (runs covered)
                lens = key_offsets[1:] - key_offsets[:-1]
                blob = np.frombuffer(keys_blob, dtype=np.uint8)
                is_ws = (blob == 0x20) | (blob == 0x0A) | (blob == 0x09)
                ws_cum = np.concatenate([[0], np.cumsum(is_ws, dtype=np.int64)])
                n_ws = ws_cum[key_offsets[1:]] - ws_cum[key_offsets[:-1]]
                eligible = (lens > 1) & (n_ws < 2)
                order_f = order[eligible[order]]
                if len(order_f):
                    n_take = max(1, seed_size - len(seed_pieces))
                    for idx in order_f[:n_take]:
                        raw = keys_blob[key_offsets[idx]: key_offsets[idx + 1]]
                        seed_pieces.append(
                            (bytes_to_byte_chars(raw), float(scores[idx]))
                        )
            else:
                ws_raw = set(b" \n\t")
                for idx in order:
                    raw = keys[idx]
                    if len(raw) == 1:
                        continue  # single chars already added via the alphabet
                    n_ws = sum(1 for b in raw if b in ws_raw)
                    if n_ws >= 2:
                        continue  # whitespace runs already added
                    seed_pieces.append((bytes_to_byte_chars(raw), float(scores[idx])))
                    if len(seed_pieces) >= seed_size:
                        break

        if not push_current:
            self.seed_cache.popleft()
            if maybe_prev is not None:
                self.seed_cache.append(maybe_prev)
        return seed_pieces
