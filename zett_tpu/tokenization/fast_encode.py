"""Fast batch encoding for canonical byte-level Unigram AND BPE tokenizers.

The collator's hot path (reference: zett/collator.py:166-175, delegated to
the HF Rust crate) re-implemented on the native C++ library: split-regex
pretokenization + Viterbi (Unigram) or ranked merge encode (BPE) +
memoization over raw bytes, all in one threaded native call.

Only valid for the canonical sampled/converted pipeline:
Prepend(" ") normalizer (optional) + Split(SPLIT_REGEX, invert) + ByteLevel
map + byte-complete model. Differential-tested against Tokenizer.encode_batch
(which is itself byte-exact vs HF at 50k scale).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..constants import SPLIT_REGEX
from .bytemaps import CHARS_TO_BYTES
from .core import Tokenizer
from .models import BPE, Unigram
from .normalizers import Prepend
from .postprocessors import ByteLevelPost, TemplateProcessing
from .pretokenizers import ByteLevel as _ByteLevelPre
from .pretokenizers import Sequence as _PreSequence
from .pretokenizers import Split as _Split
from .pretokenizers import _compiled

try:
    from zett_tpu.csrc import host_lib as _host_lib
except Exception:  # pragma: no cover
    _host_lib = None

# byte-char -> latin-1 char translation (piece.translate + encode beats a
# per-char dict lookup loop; a fresh encoder is built per sampled tokenizer).
# Raw chars outside the byte alphabet but < 0x100 (e.g. '\x85') map to an
# un-encodable char so the piece is skipped, matching the dict-lookup KeyError.
_BYTECHAR_TRANS = {ord(c): chr(b) for c, b in CHARS_TO_BYTES.items()}
for _b in range(256):
    if _b not in _BYTECHAR_TRANS:
        _BYTECHAR_TRANS[_b] = "￿"


def _build_native_bpe(model: BPE, trans) -> Optional["_host_lib.NativeBPE"]:
    """NativeBPE from a byte-level BPE model: vocab pieces + merges resolved
    to id triples (left, right, merged) in rank order. Returns None unless
    the raw-byte vocab covers all 256 single bytes (then unk/byte_fallback
    can never trigger and the native merge loop is exact)."""
    pieces_raw: List[bytes] = []
    piece_ids: List[int] = []
    raw_by_piece = {}
    bytes_seen = set()
    for piece, idx in model.vocab.items():
        try:
            raw = piece.translate(trans).encode("latin-1")
        except UnicodeEncodeError:
            continue  # specials / <unused_*> never match raw byte text
        pieces_raw.append(raw)
        piece_ids.append(idx)
        raw_by_piece[piece] = raw
        if len(raw) == 1:
            bytes_seen.add(raw[0])
    if len(bytes_seen) < 256:
        return None
    merges = []
    vocab = model.vocab
    for left, right in model.merges:
        li = vocab.get(left)
        ri = vocab.get(right)
        mi = vocab.get(left + right)
        if li is None or ri is None or mi is None:
            continue  # merge over non-byte pieces can never fire on raw text
        if left not in raw_by_piece or right not in raw_by_piece:
            continue
        merges.append((li, ri, mi))
    return _host_lib.NativeBPE(
        pieces_raw, piece_ids, merges, unk_id=-1,
        ignore_merges=model.ignore_merges,
    )


def _canonical_structure(tok: Tokenizer) -> bool:
    # structural check on the live objects — tok.to_json() serializes the
    # whole 32k-piece model, which was a per-batch cost
    if isinstance(tok.model, BPE):
        m = tok.model
        # byte-level converted BPE: no subword prefix/suffix, no dropout
        if m.continuing_subword_prefix or m.end_of_word_suffix or m.dropout:
            return False
    elif not isinstance(tok.model, Unigram):
        return False
    pt = tok.pre_tokenizer
    if (
        isinstance(pt, _PreSequence)
        and len(pt.pretokenizers) == 2
        and isinstance(pt.pretokenizers[0], _Split)
        and isinstance(pt.pretokenizers[1], _ByteLevelPre)
    ):
        return True
    # converted-BPE tokenizers commonly carry the plain ByteLevel
    # pre-tokenizer with use_regex=True: same split + byte map semantics
    return isinstance(pt, _ByteLevelPre) and getattr(pt, "use_regex", True)


class FastUnigramEncoder:
    """Vectorized encode for a canonical byte-level Unigram or BPE tokenizer."""

    def __init__(self, tok: Tokenizer):
        assert _host_lib is not None, "native host library unavailable"
        assert _canonical_structure(tok), "tokenizer is not canonical byte-level"
        self.tok = tok
        norm = tok.normalizer
        self.prepend = None
        if norm is not None:
            if isinstance(norm, Prepend):
                self.prepend = norm.prepend
            else:
                raise ValueError(f"unsupported normalizer for fast path: {norm}")
        self._rx = _compiled(SPLIT_REGEX)

        # pre-split semantics: the converted Sequence[Split, ByteLevel]
        # carries the ZeTT SPLIT_REGEX (letters include \p{M}); a plain
        # ByteLevel(use_regex=True) pre-tokenizer (already-byte-level
        # tokenizers keep their own, e.g. raw gpt2-style BPE) uses the
        # GPT-2 regex without marks and may prepend a space itself
        pt = tok.pre_tokenizer
        if isinstance(pt, _ByteLevelPre):
            self.use_marks = False
            self.add_prefix_space = bool(pt.add_prefix_space)
        else:
            pattern = getattr(pt.pretokenizers[0], "pattern", SPLIT_REGEX)
            self.use_marks = r"\p{M}" in pattern
            self.add_prefix_space = False

        trans = _BYTECHAR_TRANS
        if isinstance(tok.model, Unigram):
            pieces_raw: List[bytes] = []
            scores: List[float] = []
            id_map: List[int] = []
            for i, (piece, score) in enumerate(tok.model.pieces):
                try:
                    raw = piece.translate(trans).encode("latin-1")
                except UnicodeEncodeError:
                    continue  # specials / <unused_*> never match raw byte text
                pieces_raw.append(raw)
                scores.append(score)
                id_map.append(i)
            self._id_map = np.asarray(id_map, dtype=np.int32)
            self._native = _host_lib.NativeUnigram(pieces_raw, scores, unk_id=-1)
        else:
            self._id_map = None
            self._native = _build_native_bpe(tok.model, trans)
            if self._native is None:
                raise ValueError("BPE vocab is not byte-complete")

        # single-sequence special-token template (TemplateProcessing)
        self.prefix_ids: List[int] = []
        self.suffix_ids: List[int] = []
        post = tok.post_processor
        if isinstance(post, TemplateProcessing):
            seen_seq = False
            specials = post.special_tokens
            for piece in post.single:
                if "Sequence" in piece:
                    seen_seq = True
                elif "SpecialToken" in piece:
                    ids = specials[piece["SpecialToken"]["id"]]["ids"]
                    (self.suffix_ids if seen_seq else self.prefix_ids).extend(ids)
        elif post is not None and not isinstance(post, ByteLevelPost):
            raise ValueError(f"unsupported post_processor for fast path: {post}")

    def encode_batch(
        self,
        texts: List[str],
        add_special_tokens: bool = True,
        max_length: Optional[int] = None,
        pad_id: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (input_ids, attention_mask) int32 arrays. With max_length
        set, output is truncated+padded to (n_texts, max_length); otherwise
        arrays are padded to the longest sequence."""
        # fused native path: split-regex pretokenize + Viterbi/BPE-merge +
        # memoization all inside one threaded C++ call (zett_host.cpp
        # uni_encode_texts / bpe_encode_texts)
        prepend = self.prepend
        prepend_b = prepend.encode("utf-8") if prepend else b""
        raw_texts = [
            (prepend_b + t.encode("utf-8")) if (prepend and t) else t.encode("utf-8")
            for t in texts
        ]
        if self.add_prefix_space:
            raw_texts = [
                (b" " + t) if t and not t.startswith(b" ") else t
                for t in raw_texts
            ]
        flat_ids, tokens_per_text = self._native.encode_texts(
            raw_texts, use_marks=self.use_marks
        )
        if self._id_map is not None:
            flat_ids = self._id_map[flat_ids]  # re-map trie ids -> vocab ids
        text_tok_starts = np.concatenate(
            [[0], np.cumsum(tokens_per_text[:-1], dtype=np.int64)]
        )

        prefix = np.asarray(self.prefix_ids if add_special_tokens else [], dtype=np.int32)
        suffix = np.asarray(self.suffix_ids if add_special_tokens else [], dtype=np.int32)
        np_, ns = len(prefix), len(suffix)
        total_per_text = tokens_per_text + np_ + ns
        if max_length is not None:
            final_per_text = np.minimum(total_per_text, max_length)
            width = max_length
        else:
            final_per_text = total_per_text
            width = int(final_per_text.max()) if len(texts) else 0

        out = np.full((len(texts), width), pad_id, dtype=np.int32)
        # scatter body tokens: each token's (row, col) in one fancy store
        rows = np.repeat(np.arange(len(texts)), tokens_per_text)
        cols = (
            np.arange(len(flat_ids), dtype=np.int64)
            - np.repeat(text_tok_starts, tokens_per_text)
            + np_
        )
        keep = cols < width - (ns if max_length is not None else 0) if ns else cols < width
        if max_length is not None and ns:
            # reserve room for the suffix under truncation
            keep = cols < np.repeat(final_per_text - ns, tokens_per_text)
        out[rows[keep], cols[keep]] = flat_ids[keep]
        if np_:
            out[:, :np_] = prefix[None, :]
        if ns:
            suffix_start = final_per_text - ns
            for k in range(ns):
                out[np.arange(len(texts)), np.minimum(suffix_start + k, width - 1)] = suffix[k]
        mask = (
            np.arange(width)[None, :] < final_per_text[:, None]
        ).astype(np.int32)
        return out, mask


def fast_encoder_or_none(tok: Tokenizer) -> Optional[FastUnigramEncoder]:
    if _host_lib is None or not _canonical_structure(tok):
        return None
    try:
        return FastUnigramEncoder(tok)
    except (ValueError, AssertionError):
        return None
