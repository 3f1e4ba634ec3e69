"""Device-side batched Unigram Viterbi: the retokenization loop on-chip.

BASELINE.json north star: "Replace the Rust retokenization utilities with
device-side kernels so the corpus-retokenization loop used for tokenizer
sampling and prior computation runs on-chip... corpus shards data-parallel,
merge table / unigram scores replicated, token-frequency counts reduced via
psum collectives."

Formulation (TPU-friendly, static shapes): pretokens are padded byte rows
(B, L). The vocab is compiled on host into an open-addressing hash table
mapping double-32-bit rolling-hash fingerprints of each piece to (score,
piece_id). On device, fingerprints for every (start, length<=K) span are
computed in one vectorized pass, scores gathered from the table (bounded
linear probing, unrolled), and the Viterbi DP runs as a lax.scan over the
L axis with the whole batch vectorized. Backtracking emits token ids via a
second scan. Counting reduces with psum over the data axis of the mesh.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

NEG = -1e30
_P1 = np.uint32(0x01000193)  # FNV-ish multipliers
_P2 = np.uint32(0x85EBCA6B)
_OFF1 = np.uint32(0x811C9DC5)
_OFF2 = np.uint32(0x9E3779B9)


class VocabTable(NamedTuple):
    keys1: np.ndarray  # (M,) uint32 fingerprints, 0 = empty
    keys2: np.ndarray  # (M,) uint32
    scores: np.ndarray  # (M,) float32
    piece_ids: np.ndarray  # (M,) int32
    n_probes: int
    max_piece_len: int


def _fingerprints(piece: bytes) -> Tuple[np.uint32, np.uint32]:
    h1 = _OFF1
    h2 = _OFF2
    for b in piece:
        h1 = np.uint32((int(h1) * int(_P1) + b + 1) & 0xFFFFFFFF)
        h2 = np.uint32((int(h2) * int(_P2) + b + 1) & 0xFFFFFFFF)
    return h1, h2


def _mix32(h: int) -> int:
    """murmur3 fmix32 avalanche — short byte strings cluster badly without it."""
    h &= 0xFFFFFFFF
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def build_vocab_table(
    pieces: Sequence[bytes], scores: Sequence[float], n_probes: int = 8
) -> VocabTable:
    n = len(pieces)
    M = 1 << int(np.ceil(np.log2(max(4 * n, 64))))
    while True:
        keys1 = np.zeros(M, dtype=np.uint32)
        keys2 = np.zeros(M, dtype=np.uint32)
        tvals = np.full(M, NEG, dtype=np.float32)
        tids = np.full(M, -1, dtype=np.int32)
        max_len = 1
        ok = True
        for pid, (piece, score) in enumerate(zip(pieces, scores)):
            if not piece:
                continue
            max_len = max(max_len, len(piece))
            h1, h2 = _fingerprints(piece)
            if h1 == 0:
                h1 = np.uint32(1)
            slot = _mix32(int(h1)) % M
            for probe in range(n_probes):
                s = (slot + probe) % M
                if keys1[s] == 0:
                    keys1[s] = h1
                    keys2[s] = h2
                    tvals[s] = score
                    tids[s] = pid
                    break
                if keys1[s] == h1 and keys2[s] == h2:
                    break  # first occurrence wins (duplicate piece)
            else:
                ok = False
                break
        if ok:
            return VocabTable(keys1, keys2, tvals, tids, n_probes, max_len)
        M *= 2  # grow and retry


def pack_pretokens(
    pretokens: Sequence[bytes], max_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack pretoken bytes into (B, max_len) int32 rows + (B,) lengths.
    Over-long pretokens are truncated (rare: the GPT-2 split bounds words)."""
    B = len(pretokens)
    rows = np.zeros((B, max_len), dtype=np.int32)
    lens = np.zeros(B, dtype=np.int32)
    for i, p in enumerate(pretokens):
        p = p[:max_len]
        rows[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
        lens[i] = len(p)
    return rows, lens


@partial(jax.jit, static_argnames=("K", "n_probes", "with_backtrack"))
def viterbi_device(
    rows: jnp.ndarray,  # (B, L) int32 bytes
    lens: jnp.ndarray,  # (B,) int32
    keys1: jnp.ndarray,
    keys2: jnp.ndarray,
    tscores: jnp.ndarray,
    tids: jnp.ndarray,
    unk_score: float,
    K: int = 16,
    n_probes: int = 8,
    with_backtrack: bool = True,
):
    """Batched Viterbi. Returns (best_scores (B,), back_k (B, L+1) int32,
    back_id (B, L+1) int32) where back_k[j] is the length of the best piece
    ending at j (0 where unreachable)."""
    S, I = compute_span_scores(
        rows, lens, keys1, keys2, tscores, tids, unk_score, K, n_probes
    )
    B, L = rows.shape

    # DP over positions: dp[j+1..j+K] relax from dp[j]
    dp0 = jnp.full((B, L + K), NEG, dtype=jnp.float32).at[:, 0].set(0.0)
    bk0 = jnp.zeros((B, L + K), dtype=jnp.int32)
    bi0 = jnp.full((B, L + K), -1, dtype=jnp.int32)

    def step(carry, j):
        dp, bk, bi = carry
        dj = jax.lax.dynamic_slice(dp, (0, j), (B, 1))  # (B, 1)
        cand = dj + S[:, j, :]  # spans starting at j  (B, K)
        window = jax.lax.dynamic_slice(dp, (0, j + 1), (B, K))
        better = cand > window
        new_window = jnp.where(better, cand, window)
        dp = jax.lax.dynamic_update_slice(dp, new_window, (0, j + 1))
        bk_window = jax.lax.dynamic_slice(bk, (0, j + 1), (B, K))
        bi_window = jax.lax.dynamic_slice(bi, (0, j + 1), (B, K))
        bk = jax.lax.dynamic_update_slice(
            bk, jnp.where(better, jnp.arange(1, K + 1)[None, :], bk_window), (0, j + 1)
        )
        bi = jax.lax.dynamic_update_slice(
            bi, jnp.where(better, I[:, j, :], bi_window), (0, j + 1)
        )
        return (dp, bk, bi), None

    (dp, bk, bi), _ = jax.lax.scan(step, (dp0, bk0, bi0), jnp.arange(L))
    best = jnp.take_along_axis(dp, lens[:, None], axis=1)[:, 0]
    if not with_backtrack:
        return best, None, None
    return best, bk[:, : L + 1], bi[:, : L + 1]


def compute_span_scores(rows, lens, keys1, keys2, tscores, tids, unk_score,
                        K: int, n_probes: int):
    """Vectorized hash lookup of all (start, len<=K) spans -> (S, I), each
    (B, L, K): span scores (NEG where absent/invalid) and piece ids."""
    B, L = rows.shape
    M = keys1.shape[0]
    # rolling double fingerprints, extended one byte per k iteration
    bytes_u32 = rows.astype(jnp.uint32)
    h1 = jnp.full((B, L), int(_OFF1), dtype=jnp.uint32)
    h2 = jnp.full((B, L), int(_OFF2), dtype=jnp.uint32)
    span_scores = []
    span_ids = []
    for k in range(1, K + 1):
        # byte at position i+k-1 for each start i (shift left by k-1)
        shifted = jnp.pad(bytes_u32[:, k - 1 :], ((0, 0), (0, k - 1)))
        h1 = h1 * jnp.uint32(int(_P1)) + shifted + 1
        h2 = h2 * jnp.uint32(int(_P2)) + shifted + 1
        hh1 = jnp.where(h1 == 0, jnp.uint32(1), h1)
        # bounded linear probing, unrolled; slot uses the same fmix32 mix
        mixed = hh1 ^ (hh1 >> 16)
        mixed = mixed * jnp.uint32(0x85EBCA6B)
        mixed = mixed ^ (mixed >> 13)
        mixed = mixed * jnp.uint32(0xC2B2AE35)
        mixed = mixed ^ (mixed >> 16)
        score_k = jnp.full((B, L), NEG, dtype=jnp.float32)
        id_k = jnp.full((B, L), -1, dtype=jnp.int32)
        found = jnp.zeros((B, L), dtype=bool)
        base = (mixed % jnp.uint32(M)).astype(jnp.int32)
        for probe in range(n_probes):
            slot = (base + probe) % M
            k1 = jnp.take(keys1, slot)
            k2 = jnp.take(keys2, slot)
            hit = (~found) & (k1 == hh1) & (k2 == h2)
            score_k = jnp.where(hit, jnp.take(tscores, slot), score_k)
            id_k = jnp.where(hit, jnp.take(tids, slot), id_k)
            found = found | hit | (k1 == 0)  # empty slot terminates the probe
        span_scores.append(score_k)
        span_ids.append(id_k)
    S = jnp.stack(span_scores, axis=-1)  # (B, L, K)
    I = jnp.stack(span_ids, axis=-1)

    # spans must stay inside the pretoken
    pos = jnp.arange(L)[None, :, None]
    klen = jnp.arange(1, K + 1)[None, None, :]
    valid = (pos + klen) <= lens[:, None, None]
    # unk fallback: single-byte spans always available at unk_score
    single = (klen == 1) & valid
    S = jnp.where(valid, S, NEG)
    S = jnp.where(single & (S <= NEG / 2), unk_score, S)
    I = jnp.where(single & (I < 0), -2, I)  # -2 marks unk bytes
    return S, I


@partial(jax.jit, static_argnames=("K", "n_probes", "tile_b"))
def viterbi_device_pallas(
    rows, lens, keys1, keys2, tscores, tids, unk_score,
    K: int = 16, n_probes: int = 8, tile_b: int = 256,
):
    """Same contract as viterbi_device but with the DP phase as a Pallas
    kernel (dp/backpointers resident in VMEM, one launch per batch tile)."""
    from .pallas_viterbi import viterbi_dp_pallas

    S, I = compute_span_scores(
        rows, lens, keys1, keys2, tscores, tids, unk_score, K, n_probes
    )
    L = rows.shape[1]
    dp, bk, bi = viterbi_dp_pallas(S, I, tile_b=tile_b)
    best = jnp.take_along_axis(dp, lens[:, None], axis=1)[:, 0]
    return best, bk[:, : L + 1], bi[:, : L + 1]


def backtrack_ids(
    back_k: np.ndarray, back_id: np.ndarray, lens: np.ndarray
) -> List[List[int]]:
    """Host-side backtrack (cheap: one pass per row)."""
    out = []
    for row_k, row_id, n in zip(back_k, back_id, lens):
        ids = []
        j = int(n)
        while j > 0:
            k = int(row_k[j])
            if k <= 0:
                break
            ids.append(int(row_id[j]))
            j -= k
        ids.reverse()
        out.append(ids)
    return out


@partial(jax.jit, static_argnames=("n_pieces",))
def count_token_usage(back_k, back_id, lens, n_pieces: int):
    """Device-side token-frequency counting from backpointers (for priors):
    follow the segmentation chain with a fori_loop and scatter-add ids.
    Under shard_map/pjit over a 'data'-sharded batch, jnp sums of the result
    become psum collectives."""
    B, L1 = back_k.shape

    def body(state, _):
        j, counts = state
        k = jnp.take_along_axis(back_k, j[:, None], axis=1)[:, 0]
        pid = jnp.take_along_axis(back_id, j[:, None], axis=1)[:, 0]
        active = (j > 0) & (k > 0) & (pid >= 0)
        counts = counts.at[jnp.where(active, pid, n_pieces)].add(1)
        j = jnp.maximum(j - jnp.maximum(k, 1), 0)
        return (j, counts), None

    counts0 = jnp.zeros(n_pieces + 1, dtype=jnp.int32)  # +1 overflow bucket
    (j, counts), _ = jax.lax.scan(body, (lens, counts0), None, length=L1)
    return counts[:n_pieces]


class DeviceRetokenizer:
    """High-level wrapper: host packs pretokens, device does Viterbi."""

    def __init__(self, pieces: Sequence[bytes], scores: Sequence[float],
                 max_pretoken_len: int = 64, K: int = 16):
        self.table = build_vocab_table(pieces, scores)
        self.K = min(K, self.table.max_piece_len)
        self.max_pretoken_len = max_pretoken_len
        min_score = min(scores) if len(scores) else 0.0
        self.unk_score = float(min_score) - 10.0
        self.n_pieces = len(pieces)
        self._dev_table = jax.tree_util.tree_map(
            jnp.asarray,
            (self.table.keys1, self.table.keys2, self.table.scores, self.table.piece_ids),
        )

    def encode(self, pretokens: Sequence[bytes]) -> List[List[int]]:
        rows, lens = pack_pretokens(pretokens, self.max_pretoken_len)
        k1, k2, ts, ti = self._dev_table
        best, bk, bi = viterbi_device(
            jnp.asarray(rows), jnp.asarray(lens), k1, k2, ts, ti,
            self.unk_score, K=self.K, n_probes=self.table.n_probes,
        )
        return backtrack_ids(np.asarray(bk), np.asarray(bi), lens)

    def best_scores(self, pretokens: Sequence[bytes]) -> np.ndarray:
        rows, lens = pack_pretokens(pretokens, self.max_pretoken_len)
        k1, k2, ts, ti = self._dev_table
        best, _, _ = viterbi_device(
            jnp.asarray(rows), jnp.asarray(lens), k1, k2, ts, ti,
            self.unk_score, K=self.K, n_probes=self.table.n_probes,
            with_backtrack=False,
        )
        return np.asarray(best)

    def token_counts(self, pretokens: Sequence[bytes]) -> np.ndarray:
        rows, lens = pack_pretokens(pretokens, self.max_pretoken_len)
        k1, k2, ts, ti = self._dev_table
        _, bk, bi = viterbi_device(
            jnp.asarray(rows), jnp.asarray(lens), k1, k2, ts, ti,
            self.unk_score, K=self.K, n_probes=self.table.n_probes,
        )
        return np.asarray(
            count_token_usage(bk, bi, jnp.asarray(lens), self.n_pieces)
        )
