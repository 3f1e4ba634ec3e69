"""ctypes bindings for the native host library (zett_host.cpp).

Builds the shared object on first import (g++ -O3, cached by source mtime).
Exposes:
  - NativeUnigram: batched byte-level Viterbi encode/score
  - count_substrings_native: the sampler's substring enumeration
  - NativeAhoCorasick / substring_counts: multi-pattern counting
All interfaces speak RAW BYTES; byte-char conversion happens at the caller.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "zett_host.cpp")
_SO = os.path.join(_DIR, "libzett_host.so")


def _build():
    if (
        os.path.exists(_SO)
        and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _SO, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


_build()
_lib = ctypes.CDLL(_SO)

_lib.uni_new.restype = ctypes.c_void_p
_lib.uni_new.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_int64, ctypes.c_int32, ctypes.c_double, ctypes.c_int64,
]
_lib.uni_free.argtypes = [ctypes.c_void_p]
_lib.uni_encode_batch.restype = ctypes.c_int64
_lib.uni_encode_batch.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
]
_lib.uni_encode_batch_threaded.restype = ctypes.c_int64
_lib.uni_encode_batch_threaded.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
]
_lib.uni_encode_texts.restype = ctypes.c_int64
_lib.uni_encode_texts.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_int32,
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
]
_lib.bpe_new.restype = ctypes.c_void_p
_lib.bpe_new.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_int32, ctypes.c_int32,
]
_lib.bpe_free.argtypes = [ctypes.c_void_p]
_lib.bpe_encode_texts.restype = ctypes.c_int64
_lib.bpe_encode_texts.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_int32,
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
]
_lib.bpe_encode_batch.restype = ctypes.c_int64
_lib.bpe_encode_batch.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
]
_lib.split_pretokens.restype = ctypes.c_int64
_lib.split_pretokens.argtypes = [
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
    ctypes.c_void_p, ctypes.c_int64,
]
_lib.uni_score_batch.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p,
]
_lib.uni_expected_counts.restype = ctypes.c_double
_lib.uni_expected_counts.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_void_p,
]
_lib.uni_expected_counts_threaded.restype = ctypes.c_double
_lib.uni_expected_counts_threaded.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
]
_lib.count_substrings.restype = ctypes.c_void_p
_lib.count_substrings.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
]
_lib.count_substrings_texts.restype = ctypes.c_void_p
_lib.count_substrings_texts.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
    ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
]
_lib.countmap_merge.restype = ctypes.c_void_p
_lib.countmap_merge.argtypes = [ctypes.c_void_p, ctypes.c_int64]
_lib.countmap_size.restype = ctypes.c_int64
_lib.countmap_size.argtypes = [ctypes.c_void_p]
_lib.countmap_serialize.restype = ctypes.c_int64
_lib.countmap_serialize.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
]
_lib.countmap_free.argtypes = [ctypes.c_void_p]
_lib.cuckoo_build.restype = ctypes.c_int32
_lib.cuckoo_build.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_void_p,
]
_lib.serde_canon.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
_lib.bucket4_build.restype = ctypes.c_int32
_lib.bucket4_build.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_void_p,
]
_lib.ac_new.restype = ctypes.c_void_p
_lib.ac_new.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
]
_lib.ac_free.argtypes = [ctypes.c_void_p]
_lib.ac_count.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_void_p,
]


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


# Unicode class table for the native pretokenizer: one byte per codepoint,
# bits 1=\s, 2=\p{L}, 4=\p{M}, 8=\p{N}. Generated with the Python `regex`
# module (the same engine as the pure-Python split path) so the native
# scanner's class semantics match it by construction; cached on disk.
_CTAB_PATH = os.path.join(_DIR, "unicode_classes_v1.npy")
_CTAB: "np.ndarray | None" = None

LETTERS_WITH_MARKS = 2 | 4  # [\p{L}\p{M}] branch (SPLIT_REGEX)
LETTERS_NO_MARKS = 2  # \p{L} branch (SPLIT_REGEX_NO_MARKS / rust variant)


def unicode_class_table() -> np.ndarray:
    global _CTAB
    if _CTAB is not None:
        return _CTAB
    if os.path.exists(_CTAB_PATH):
        tab = np.load(_CTAB_PATH)
        if tab.shape == (0x110000,) and tab.dtype == np.uint8:
            _CTAB = np.ascontiguousarray(tab)
            return _CTAB
    import regex

    tab = np.zeros(0x110000, dtype=np.uint8)
    cps = np.concatenate([np.arange(0xD800), np.arange(0xE000, 0x110000)])
    all_chars = "".join(map(chr, cps))
    for bit, pat in ((1, r"\s"), (2, r"\p{L}"), (4, r"\p{M}"), (8, r"\p{N}")):
        mask = np.zeros(len(cps), dtype=bool)
        for mo in regex.finditer(pat + "+", all_chars):
            mask[mo.start():mo.end()] = True
        tab[cps[mask]] |= np.uint8(bit)
    _CTAB = tab
    try:
        np.save(_CTAB_PATH, tab)
    except OSError:
        pass
    return _CTAB


def split_pretokens_native(text: bytes, use_marks: bool = True) -> List[bytes]:
    """Native GPT-2-regex split of one utf-8 text (differential-test hook)."""
    ctab = unicode_class_table()
    data = np.frombuffer(text, dtype=np.uint8)
    if len(data) == 0:
        return []
    data = np.ascontiguousarray(data)
    ends = np.empty(len(text), dtype=np.int64)
    n = _lib.split_pretokens(
        _ptr(data), len(text), _ptr(ctab),
        LETTERS_WITH_MARKS if use_marks else LETTERS_NO_MARKS,
        _ptr(ends), len(ends),
    )
    assert n >= 0
    out, start = [], 0
    for e in ends[:n]:
        out.append(text[start:e])
        start = int(e)
    return out


def _concat_bytes(items: Sequence[bytes]) -> Tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(items) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in items], out=offsets[1:])
    data = np.frombuffer(b"".join(items), dtype=np.uint8).copy()
    if len(data) == 0:
        data = np.zeros(1, dtype=np.uint8)
    return data, offsets


class NativeUnigram:
    """Byte-level Unigram Viterbi over the trie, with a memo cache."""

    def __init__(
        self,
        pieces: Sequence[bytes],
        scores: Sequence[float],
        unk_id: int = -1,
        unk_penalty: float = 10.0,
        cache_cap: int = 1 << 20,
    ):
        data, offsets = _concat_bytes(pieces)
        scores_arr = np.asarray(scores, dtype=np.float64)
        self._data = data  # keep alive
        self._handle = _lib.uni_new(
            _ptr(data), _ptr(offsets), _ptr(scores_arr), len(pieces),
            unk_id, unk_penalty, cache_cap,
        )

    def __del__(self):
        if getattr(self, "_handle", None) and _lib is not None:
            _lib.uni_free(self._handle)
            self._handle = None

    def encode_pretokens(self, pretokens: Sequence[bytes]) -> List[np.ndarray]:
        """Encode each pretoken independently -> list of int32 id arrays."""
        data, offsets = _concat_bytes(pretokens)
        cap = max(int(offsets[-1]), 1)
        out_ids = np.empty(cap, dtype=np.int32)
        out_lens = np.empty(len(pretokens), dtype=np.int32)
        total = _lib.uni_encode_batch(
            self._handle, _ptr(data), _ptr(offsets), len(pretokens),
            _ptr(out_ids), cap, _ptr(out_lens),
        )
        assert total >= 0, "output capacity exceeded"
        splits = np.cumsum(out_lens[:-1])
        return np.split(out_ids[:total], splits)

    def encode_flat(
        self, pretokens: Sequence[bytes], n_threads: int = 0
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (flat_ids, lens) without per-pretoken splitting. With
        n_threads=0 the thread count is chosen from the CPU count."""
        data, offsets = _concat_bytes(pretokens)
        cap = max(int(offsets[-1]), 1)
        out_ids = np.empty(cap, dtype=np.int32)
        out_lens = np.empty(len(pretokens), dtype=np.int32)
        if n_threads == 0:
            n_threads = min(os.cpu_count() or 1, 8)
        total = _lib.uni_encode_batch_threaded(
            self._handle, _ptr(data), _ptr(offsets), len(pretokens),
            _ptr(out_ids), cap, _ptr(out_lens), n_threads,
        )
        assert total >= 0, "output capacity exceeded"
        return out_ids[:total], out_lens

    def encode_texts(
        self,
        texts: Sequence[bytes],
        use_marks: bool = True,
        n_threads: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fused split-regex pretokenize + Viterbi over whole utf-8 texts.
        Returns (flat_ids, tokens_per_text). The entire collator hot path
        (reference: HF pre_tokenizer + Unigram encode, zett/collator.py:166)
        in one native threaded call."""
        ctab = unicode_class_table()
        data, offsets = _concat_bytes(texts)
        cap = max(int(offsets[-1]), 1)
        out_ids = np.empty(cap, dtype=np.int32)
        out_tokens = np.empty(len(texts), dtype=np.int64)
        if n_threads == 0:
            n_threads = min(os.cpu_count() or 1, 8)
        total = _lib.uni_encode_texts(
            self._handle, _ptr(data), _ptr(offsets), len(texts),
            _ptr(ctab),
            LETTERS_WITH_MARKS if use_marks else LETTERS_NO_MARKS,
            _ptr(out_ids), cap, _ptr(out_tokens), n_threads,
        )
        assert total >= 0, "output capacity exceeded"
        return out_ids[:total], out_tokens

    def score_pretokens(self, pretokens: Sequence[bytes]) -> np.ndarray:
        data, offsets = _concat_bytes(pretokens)
        out = np.empty(len(pretokens), dtype=np.float64)
        _lib.uni_score_batch(
            self._handle, _ptr(data), _ptr(offsets), len(pretokens), _ptr(out)
        )
        return out

    def expected_counts(
        self, pretokens: Sequence[bytes], weights: Sequence[float], n_pieces: int
    ) -> Tuple[np.ndarray, float]:
        """Forward-backward expected piece counts + total log-likelihood
        (Unigram-EM E-step)."""
        data, offsets = _concat_bytes(pretokens)
        w = np.asarray(weights, dtype=np.float64)
        counts = np.zeros(n_pieces, dtype=np.float64)
        n_threads = min(os.cpu_count() or 1, 16)
        ll = _lib.uni_expected_counts_threaded(
            self._handle, _ptr(data), _ptr(offsets), len(pretokens), _ptr(w),
            _ptr(counts), n_pieces, n_threads,
        )
        return counts, float(ll)


class NativeBPE:
    """Byte-level BPE merge encode (HF-Rust-BPE counterpart; semantics match
    tokenization/models.py BPE._merge_word, differential-tested vs HF)."""

    def __init__(
        self,
        pieces: Sequence[bytes],
        piece_ids: Sequence[int],
        merges: Sequence[Tuple[int, int, int]],
        unk_id: int = -1,
        ignore_merges: bool = False,
    ):
        """merges: (left_id, right_id, merged_id) in rank order."""
        data, offsets = _concat_bytes(pieces)
        ids_arr = np.asarray(piece_ids, dtype=np.int32)
        m = np.asarray(merges, dtype=np.int32).reshape(-1, 3)
        left = np.ascontiguousarray(m[:, 0])
        right = np.ascontiguousarray(m[:, 1])
        out = np.ascontiguousarray(m[:, 2])
        self._keep = (data, ids_arr, left, right, out)
        self._handle = _lib.bpe_new(
            _ptr(data), _ptr(offsets), _ptr(ids_arr), len(pieces),
            _ptr(left), _ptr(right), _ptr(out), len(m),
            unk_id, 1 if ignore_merges else 0,
        )

    def __del__(self):
        if getattr(self, "_handle", None) and _lib is not None:
            _lib.bpe_free(self._handle)
            self._handle = None

    def encode_pretokens(self, pretokens: Sequence[bytes]) -> List[np.ndarray]:
        data, offsets = _concat_bytes(pretokens)
        cap = max(int(offsets[-1]), 1)
        out_ids = np.empty(cap, dtype=np.int32)
        out_lens = np.empty(len(pretokens), dtype=np.int32)
        total = _lib.bpe_encode_batch(
            self._handle, _ptr(data), _ptr(offsets), len(pretokens),
            _ptr(out_ids), cap, _ptr(out_lens),
        )
        assert total >= 0, "output capacity exceeded"
        splits = np.cumsum(out_lens[:-1])
        return np.split(out_ids[:total], splits)

    def encode_texts(
        self,
        texts: Sequence[bytes],
        use_marks: bool = True,
        n_threads: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fused split-regex pretokenize + BPE merge over whole utf-8 texts.
        Returns (flat_ids, tokens_per_text)."""
        ctab = unicode_class_table()
        data, offsets = _concat_bytes(texts)
        cap = max(int(offsets[-1]), 1)
        out_ids = np.empty(cap, dtype=np.int32)
        out_tokens = np.empty(len(texts), dtype=np.int64)
        if n_threads == 0:
            n_threads = min(os.cpu_count() or 1, 8)
        total = _lib.bpe_encode_texts(
            self._handle, _ptr(data), _ptr(offsets), len(texts),
            _ptr(ctab),
            LETTERS_WITH_MARKS if use_marks else LETTERS_NO_MARKS,
            _ptr(out_ids), cap, _ptr(out_tokens), n_threads,
        )
        assert total >= 0, "output capacity exceeded"
        return out_ids[:total], out_tokens


def count_substrings_native(
    pretokens: Sequence[bytes],
    char_starts: Sequence[Sequence[int]],
    weights: Sequence[int],
    max_length: int = 16,
    stride: int = 1,
) -> Dict[bytes, int]:
    """Substring enumeration with freq*byte-weight scoring (sampler core)."""
    data, offsets = _concat_bytes(pretokens)
    w = np.asarray(weights, dtype=np.int32)
    cs_offsets = np.zeros(len(char_starts) + 1, dtype=np.int64)
    np.cumsum([len(c) for c in char_starts], out=cs_offsets[1:])
    cs_flat = (
        np.concatenate([np.asarray(c, dtype=np.int32) for c in char_starts])
        if len(char_starts) and cs_offsets[-1] > 0
        else np.zeros(1, dtype=np.int32)
    )
    handle = _lib.count_substrings(
        _ptr(data), _ptr(offsets), len(pretokens), _ptr(w),
        _ptr(cs_flat), _ptr(cs_offsets), max_length, stride,
    )
    try:
        return _countmap_to_dict(handle)
    finally:
        _lib.countmap_free(handle)


def _countmap_to_dict(handle) -> Dict[bytes, int]:
    n = _lib.countmap_size(handle)
    key_bytes = _lib.countmap_serialize(handle, None, None, None)
    keys = np.empty(max(key_bytes, 1), dtype=np.uint8)
    key_offsets = np.empty(n + 1, dtype=np.int64)
    values = np.empty(max(n, 1), dtype=np.uint64)
    _lib.countmap_serialize(handle, _ptr(keys), _ptr(key_offsets), _ptr(values))
    raw = keys.tobytes()
    return {
        raw[key_offsets[i]: key_offsets[i + 1]]: int(values[i]) for i in range(n)
    }


class NativeCounts:
    """Owning wrapper around a native CountMap handle (one sampler batch)."""

    def __init__(self, handle):
        self._handle = handle

    def __len__(self) -> int:
        return int(_lib.countmap_size(self._handle))

    def __del__(self):
        if getattr(self, "_handle", None) and _lib is not None:
            _lib.countmap_free(self._handle)
            self._handle = None

    def to_dict(self) -> Dict[bytes, int]:
        return _countmap_to_dict(self._handle)


def count_substrings_texts_native(
    texts: Sequence[bytes],
    weights: Sequence[int],
    max_length: int = 16,
    stride: int = 1,
    use_marks: bool = False,
) -> NativeCounts:
    """Fused split + substring enumeration over whole utf-8 texts (the
    sampler counting stage). Returns an owning handle; merge + serialize
    with merge_counts()."""
    ctab = unicode_class_table()
    data, offsets = _concat_bytes(texts)
    w = np.asarray(weights, dtype=np.int32)
    handle = _lib.count_substrings_texts(
        _ptr(data), _ptr(offsets), len(texts), _ptr(w), _ptr(ctab),
        LETTERS_WITH_MARKS if use_marks else LETTERS_NO_MARKS,
        max_length, stride,
    )
    return NativeCounts(handle)


def merge_counts(
    batches: Sequence[NativeCounts],
) -> Tuple[bytes, np.ndarray, np.ndarray]:
    """Sum sliding-window count maps natively; returns (keys_blob,
    key_offsets[n+1], values[n]) arrays for vectorized scoring."""
    handles = (ctypes.c_void_p * len(batches))(
        *[b._handle for b in batches]
    )
    merged = _lib.countmap_merge(handles, len(batches))
    try:
        n = _lib.countmap_size(merged)
        key_bytes = _lib.countmap_serialize(merged, None, None, None)
        keys = np.empty(max(key_bytes, 1), dtype=np.uint8)
        key_offsets = np.empty(n + 1, dtype=np.int64)
        values = np.empty(max(n, 1), dtype=np.uint64)
        _lib.countmap_serialize(merged, _ptr(keys), _ptr(key_offsets), _ptr(values))
        return keys.tobytes()[: key_bytes], key_offsets, values[:n]
    finally:
        _lib.countmap_free(merged)


def bucket4_build_native(
    pieces: Sequence[bytes], scores: Sequence[float], M: int, salt: int
):
    """Build the device retokenizer's single-gather bucket-4 vocab table.
    Returns (table (M,16) int32, max_piece_len) or None if a bucket
    overflows (caller bumps the salt / doubles M)."""
    data, offsets = _concat_bytes(pieces)
    scores_arr = np.asarray(scores, dtype=np.float32)
    table = np.empty((M, 16), dtype=np.int32)
    maxlen = np.zeros(1, dtype=np.int32)
    ok = _lib.bucket4_build(
        _ptr(data), _ptr(offsets), _ptr(scores_arr), len(pieces), M,
        ctypes.c_uint32(salt), _ptr(table), _ptr(maxlen),
    )
    if not ok:
        return None
    return table, int(maxlen[0])


def cuckoo_build_native(
    pieces: Sequence[bytes], scores: Sequence[float], M: int, max_kicks: int = 64
):
    """Build the device retokenizer's cuckoo vocab table natively. Returns
    (table_a, table_b, max_piece_len) or None if M is too small (caller
    doubles and retries). Bit-identical to the Python reference build."""
    data, offsets = _concat_bytes(pieces)
    scores_arr = np.asarray(scores, dtype=np.float32)
    ta = np.empty((M, 4), dtype=np.int32)
    tb = np.empty((M, 4), dtype=np.int32)
    maxlen = np.zeros(1, dtype=np.int32)
    ok = _lib.cuckoo_build(
        _ptr(data), _ptr(offsets), _ptr(scores_arr), len(pieces), M,
        max_kicks, _ptr(ta), _ptr(tb), _ptr(maxlen),
    )
    if not ok:
        return None
    return ta, tb, int(maxlen[0])


class NativeAhoCorasick:
    def __init__(self, patterns: Sequence[bytes], values: Sequence[int]):
        data, offsets = _concat_bytes(patterns)
        vals = np.asarray(values, dtype=np.int32)
        self._n_values = int(vals.max()) + 1 if len(vals) else 0
        self._data = data
        self._handle = _lib.ac_new(_ptr(data), _ptr(offsets), _ptr(vals), len(patterns))

    def __del__(self):
        if getattr(self, "_handle", None) and _lib is not None:
            _lib.ac_free(self._handle)
            self._handle = None

    def count(
        self, texts: Sequence[bytes], weights: Sequence[int], n_out: int = None
    ) -> np.ndarray:
        data, offsets = _concat_bytes(texts)
        w = np.asarray(weights, dtype=np.int64)
        acc = np.zeros(n_out or self._n_values, dtype=np.int64)
        _lib.ac_count(self._handle, _ptr(data), _ptr(offsets), len(texts), _ptr(w), _ptr(acc))
        return acc


def serde_canon_native(scores: np.ndarray) -> np.ndarray:
    """Map correctly-rounded doubles to the values serde_json's default
    parser would produce from their shortest decimal repr (see
    tokenization/jsonfloat.py for why this matters for HF parity)."""
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    out = np.empty_like(scores)
    _lib.serde_canon(_ptr(scores), _ptr(out), len(scores))
    return out


def substring_counts(vocab: Dict[str, int], pretoken_counts, acc: np.ndarray):
    """Drop-in used by zett_tpu.tokenization.priors.compute_substring_prior."""
    patterns = [k.encode("utf-8") for k in vocab.keys()]
    values = list(vocab.values())
    ac = NativeAhoCorasick(patterns, values)
    texts = [t.encode("utf-8") for t in pretoken_counts.keys()]
    weights = list(pretoken_counts.values())
    acc += ac.count(texts, weights, n_out=len(acc))
