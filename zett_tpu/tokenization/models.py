"""Tokenization models: Unigram (Viterbi + n-best), BPE, WordPiece.

Pure-Python implementations that define the framework's semantics; the C++
backend (zett_tpu/csrc) accelerates the same algorithms and is differential-
tested against these. Parity targets are the HF `tokenizers` Rust models the
reference relies on (SURVEY §2.2: Unigram Viterbi encode/n-best, BPE merge
encode, WordPiece; reference call sites zett/collator.py:166, zett/utils.py:681,
scripts/unigramify.py:197).
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Optional, Sequence, Tuple

from ..constants import UNK_PENALTY
from .bytemaps import BYTES_TO_CHARS


class Model:
    def tokenize(self, pretoken: str) -> List[Tuple[int, str]]:
        """Segment one pretoken into a list of (token_id, token_str)."""
        raise NotImplementedError

    def get_vocab(self) -> Dict[str, int]:
        raise NotImplementedError

    def to_json(self) -> dict:
        raise NotImplementedError

    def id_to_token(self, idx: int) -> Optional[str]:
        vocab = self.get_vocab()
        if not hasattr(self, "_inv_vocab") or len(self._inv_vocab) != len(vocab):
            self._inv_vocab = {v: k for k, v in vocab.items()}
        return self._inv_vocab.get(idx)

    def token_to_id(self, token: str) -> Optional[int]:
        return self.get_vocab().get(token)

    @staticmethod
    def from_json(data: dict) -> "Model":
        t = data["type"]
        if t == "Unigram":
            # Hold the scores HF holds: serde_json's default f64 parsing is
            # off by 1 ulp from correct rounding for ~25% of real scores,
            # which flips Viterbi tie-breaks (see jsonfloat.py).
            from .jsonfloat import serde_canon

            pieces = [p for p, _ in data["vocab"]]
            scores = serde_canon([s for _, s in data["vocab"]])
            return Unigram(
                list(zip(pieces, scores)),
                unk_id=data.get("unk_id"),
                byte_fallback=data.get("byte_fallback", False),
            )
        if t == "BPE":
            merges = []
            for m in data.get("merges", []):
                if isinstance(m, str):
                    a, b = m.split(" ")
                else:
                    a, b = m
                merges.append((a, b))
            return BPE(
                data["vocab"],
                merges,
                unk_token=data.get("unk_token"),
                continuing_subword_prefix=data.get("continuing_subword_prefix") or "",
                end_of_word_suffix=data.get("end_of_word_suffix") or "",
                fuse_unk=data.get("fuse_unk", False),
                byte_fallback=data.get("byte_fallback", False),
                ignore_merges=data.get("ignore_merges", False),
            )
        if t == "WordPiece":
            return WordPiece(
                data["vocab"],
                unk_token=data.get("unk_token", "[UNK]"),
                continuing_subword_prefix=data.get("continuing_subword_prefix", "##"),
                max_input_chars_per_word=data.get("max_input_chars_per_word", 100),
            )
        raise ValueError(f"Unsupported model type: {t}")


class _Trie:
    """Char trie for common-prefix search over the vocab."""

    __slots__ = ("children", "token_id")

    def __init__(self):
        self.children: Dict[str, _Trie] = {}
        self.token_id: Optional[int] = None

    def insert(self, token: str, token_id: int):
        node = self
        for c in token:
            nxt = node.children.get(c)
            if nxt is None:
                nxt = node.children[c] = _Trie()
            node = nxt
        node.token_id = token_id

    def prefix_matches(self, text: str, start: int) -> List[Tuple[int, int]]:
        """All (end_pos, token_id) for vocab tokens that prefix text[start:]."""
        out = []
        node = self
        i = start
        n = len(text)
        while i < n:
            node = node.children.get(text[i])
            if node is None:
                break
            i += 1
            if node.token_id is not None:
                out.append((i, node.token_id))
        return out


class Unigram(Model):
    """Unigram LM tokenizer: maximize the sum of piece log-probs (Viterbi).

    Tie-breaking matches sentencepiece/HF: strict improvement only, scanning
    begin positions in ascending order per end position — so on equal score
    the segmentation found first (longest piece into this end) wins.
    Unknown characters get min_score - UNK_PENALTY and consecutive unknowns
    are fused when fuse_unk is set.
    """

    def __init__(
        self,
        vocab: Sequence[Tuple[str, float]],
        unk_id: Optional[int] = None,
        byte_fallback: bool = False,
        fuse_unk: Optional[bool] = None,
    ):
        self.pieces: List[Tuple[str, float]] = [(str(p), float(s)) for p, s in vocab]
        self.unk_id = unk_id
        self.byte_fallback = byte_fallback
        self.fuse_unk = fuse_unk if fuse_unk is not None else unk_id is not None
        self._rebuild()

    def _rebuild(self):
        self._vocab = {}
        self._trie = None  # built lazily: the native fast-encode path never
        # tokenizes through the Python trie, and a fresh sampled tokenizer is
        # constructed every training batch
        min_score = 0.0
        for i, (piece, score) in enumerate(self.pieces):
            if piece not in self._vocab:  # first occurrence wins, like HF
                self._vocab[piece] = i
            if score < min_score:
                min_score = score
        self.min_score = min_score
        self._unk_score = min_score - UNK_PENALTY
        self._inv_vocab = {}

    def _ensure_trie(self):
        if self._trie is None:
            trie = _Trie()
            # _vocab already keeps only the first occurrence of each piece
            for piece, i in self._vocab.items():
                trie.insert(piece, i)
            self._trie = trie
        return self._trie

    # --- mutable model access (HF fork API parity: get/set_pieces/scores) ---
    def get_pieces(self) -> List[Tuple[str, float]]:
        return [tuple(p) for p in self.pieces]

    def set_pieces(self, pieces):
        self.pieces = [(str(p), float(s)) for p, s in pieces]
        self._rebuild()

    def get_scores(self) -> List[float]:
        return [s for _, s in self.pieces]

    def set_scores(self, scores):
        assert len(scores) == len(self.pieces)
        self.pieces = [(p, float(s)) for (p, _), s in zip(self.pieces, scores)]
        self._rebuild()

    def get_vocab(self) -> Dict[str, int]:
        return self._vocab

    def _lattice(self, text: str):
        """edges[end] = list of (begin, token_id, score); unk edges id=-1."""
        n = len(text)
        edges: List[List[Tuple[int, int, float]]] = [[] for _ in range(n + 1)]
        pieces = self.pieces
        trie = self._ensure_trie()
        for begin in range(n):
            matches = trie.prefix_matches(text, begin)
            has_single = any(e == begin + 1 for e, _ in matches)
            for end, tid in matches:
                edges[end].append((begin, tid, pieces[tid][1]))
            if not has_single:
                edges[begin + 1].append((begin, -1, self._unk_score))
        return edges

    def tokenize(self, pretoken: str) -> List[Tuple[int, str]]:
        if not pretoken:
            return []
        n = len(pretoken)
        edges = self._lattice(pretoken)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: List[Optional[Tuple[int, int]]] = [None] * (n + 1)
        best[0] = 0.0
        for end in range(1, n + 1):
            for begin, tid, score in edges[end]:
                cand = best[begin] + score
                if cand > best[end]:
                    best[end] = cand
                    back[end] = (begin, tid)
        if best[n] == NEG:
            return []  # uncoverable without unk (cannot happen: unk edges exist)
        # backtrack
        rev: List[Tuple[int, str]] = []
        pos = n
        while pos > 0:
            begin, tid = back[pos]
            piece = pretoken[begin:pos]
            rev.append((tid, piece))
            pos = begin
        rev.reverse()
        return self._resolve_unknowns(rev)

    def _resolve_unknowns(self, segs: List[Tuple[int, str]]) -> List[Tuple[int, str]]:
        out: List[Tuple[int, str]] = []
        for tid, piece in segs:
            if tid != -1:
                out.append((tid, piece))
                continue
            if self.byte_fallback:
                covered = True
                fallback = []
                for b in piece.encode("utf-8"):
                    bt = f"<0x{b:02X}>"
                    bid = self._vocab.get(bt)
                    if bid is None:
                        covered = False
                        break
                    fallback.append((bid, bt))
                if covered:
                    out.extend(fallback)
                    continue
            if self.fuse_unk and out and self.unk_id is not None and out[-1][0] == self.unk_id:
                out[-1] = (self.unk_id, out[-1][1] + piece)
            else:
                out.append((self.unk_id if self.unk_id is not None else -1, piece))
        return out

    def score(self, pretoken: str) -> float:
        """Log-prob of the Viterbi segmentation."""
        if not pretoken:
            return 0.0
        edges = self._lattice(pretoken)
        n = len(pretoken)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        best[0] = 0.0
        for end in range(1, n + 1):
            for begin, _, score in edges[end]:
                cand = best[begin] + score
                if cand > best[end]:
                    best[end] = cand
        return best[n]

    def get_top_n_encodings(self, pretoken: str, n_best: int) -> List[Tuple[List[int], float]]:
        """Top-n segmentations by score (parity with the HF fork's
        get_top_n_encodings used by unigramify, scripts/unigramify.py:197)."""
        if not pretoken:
            return []
        n = len(pretoken)
        edges = self._lattice(pretoken)
        # DP storing top-k (score, path) per end position.
        tops: List[List[Tuple[float, Tuple[int, ...]]]] = [[] for _ in range(n + 1)]
        tops[0] = [(0.0, ())]
        for end in range(1, n + 1):
            cands: List[Tuple[float, Tuple[int, ...]]] = []
            for begin, tid, score in edges[end]:
                rid = tid if tid != -1 else (self.unk_id if self.unk_id is not None else -1)
                for s, path in tops[begin]:
                    cands.append((s + score, path + (rid,)))
            cands.sort(key=lambda x: -x[0])
            tops[end] = cands[:n_best]
        return [(list(path), s) for s, path in tops[n]]

    def to_json(self) -> dict:
        return {
            "type": "Unigram",
            "unk_id": self.unk_id,
            "vocab": [[p, s] for p, s in self.pieces],
            "byte_fallback": self.byte_fallback,
        }


class BPE(Model):
    """Byte-pair encoding with ranked merges (GPT-2 semantics)."""

    def __init__(
        self,
        vocab: Dict[str, int],
        merges: Sequence[Tuple[str, str]],
        unk_token: Optional[str] = None,
        continuing_subword_prefix: str = "",
        end_of_word_suffix: str = "",
        fuse_unk: bool = False,
        byte_fallback: bool = False,
        ignore_merges: bool = False,
        dropout: Optional[float] = None,
    ):
        self.vocab = dict(vocab)
        self.merges = [tuple(m) for m in merges]
        self.unk_token = unk_token
        self.continuing_subword_prefix = continuing_subword_prefix
        self.end_of_word_suffix = end_of_word_suffix
        self.fuse_unk = fuse_unk
        self.byte_fallback = byte_fallback
        self.ignore_merges = ignore_merges
        self.dropout = dropout
        self._ranks = {m: i for i, m in enumerate(self.merges)}
        self._inv_vocab = {}
        self._cache: Dict[str, List[str]] = {}

    def get_vocab(self) -> Dict[str, int]:
        return self.vocab

    def _merge_word(self, word: str) -> List[str]:
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        if self.ignore_merges and word in self.vocab:
            self._cache[word] = [word]
            return [word]
        csp = self.continuing_subword_prefix
        eows = self.end_of_word_suffix
        parts = list(word)
        if csp:
            parts = [parts[0]] + [csp + c for c in parts[1:]] if parts else parts
        if eows and parts:
            parts[-1] = parts[-1] + eows
        ranks = self._ranks
        while len(parts) > 1:
            best_rank = None
            best_pair = None
            for a, b in zip(parts, parts[1:]):
                r = ranks.get((a, b))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_pair = (a, b)
            if best_pair is None:
                break
            a, b = best_pair
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        if len(self._cache) < 65536:
            self._cache[word] = parts
        return parts

    def tokenize(self, pretoken: str) -> List[Tuple[int, str]]:
        out: List[Tuple[int, str]] = []
        unk_id = self.vocab.get(self.unk_token) if self.unk_token is not None else None
        for part in self._merge_word(pretoken):
            tid = self.vocab.get(part)
            if tid is not None:
                out.append((tid, part))
                continue
            if self.byte_fallback:
                ids = [self.vocab.get(f"<0x{b:02X}>") for b in part.encode("utf-8")]
                if all(i is not None for i in ids):
                    out.extend((i, f"<0x{b:02X}>") for i, b in zip(ids, part.encode("utf-8")))
                    continue
            if unk_id is not None:
                if self.fuse_unk and out and out[-1][0] == unk_id:
                    out[-1] = (unk_id, out[-1][1] + part)
                else:
                    out.append((unk_id, part))
            # else: drop silently (HF errors; our vocabs are byte-complete)
        return out

    def to_json(self) -> dict:
        return {
            "type": "BPE",
            "dropout": self.dropout,
            "unk_token": self.unk_token,
            "continuing_subword_prefix": self.continuing_subword_prefix or None,
            "end_of_word_suffix": self.end_of_word_suffix or None,
            "fuse_unk": self.fuse_unk,
            "byte_fallback": self.byte_fallback,
            "ignore_merges": self.ignore_merges,
            "vocab": self.vocab,
            "merges": [list(m) for m in self.merges],
        }


class WordPiece(Model):
    """Greedy longest-match-first segmentation with a continuation prefix."""

    def __init__(
        self,
        vocab: Dict[str, int],
        unk_token: str = "[UNK]",
        continuing_subword_prefix: str = "##",
        max_input_chars_per_word: int = 100,
    ):
        self.vocab = dict(vocab)
        self.unk_token = unk_token
        self.continuing_subword_prefix = continuing_subword_prefix
        self.max_input_chars_per_word = max_input_chars_per_word
        self._inv_vocab = {}

    def get_vocab(self) -> Dict[str, int]:
        return self.vocab

    def tokenize(self, pretoken: str) -> List[Tuple[int, str]]:
        unk_id = self.vocab.get(self.unk_token)
        if len(pretoken) > self.max_input_chars_per_word:
            return [(unk_id, self.unk_token)] if unk_id is not None else []
        out: List[Tuple[int, str]] = []
        start = 0
        n = len(pretoken)
        while start < n:
            end = n
            found = None
            while end > start:
                sub = pretoken[start:end]
                if start > 0:
                    sub = self.continuing_subword_prefix + sub
                tid = self.vocab.get(sub)
                if tid is not None:
                    found = (tid, sub)
                    break
                end -= 1
            if found is None:
                return [(unk_id, self.unk_token)] if unk_id is not None else []
            out.append(found)
            start = end
        return out

    def to_json(self) -> dict:
        return {
            "type": "WordPiece",
            "unk_token": self.unk_token,
            "continuing_subword_prefix": self.continuing_subword_prefix,
            "max_input_chars_per_word": self.max_input_chars_per_word,
            "vocab": self.vocab,
        }
