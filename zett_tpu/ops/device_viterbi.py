"""Device-side batched Unigram Viterbi: the retokenization loop on-chip.

BASELINE.json north star: "Replace the Rust retokenization utilities with
device-side kernels so the corpus-retokenization loop used for tokenizer
sampling and prior computation runs on-chip... corpus shards data-parallel,
merge table / unigram scores replicated, token-frequency counts reduced via
psum collectives."

Formulation (TPU-friendly, static shapes): pretokens are padded byte rows
(B, L). The vocab is compiled on host into a **cuckoo hash table** (two
choices, no probing chains) whose slots are fused int32 rows
[key1, key2, score_bits, piece_id] — so one span lookup is exactly two
row-gathers instead of a probe chain of scalar gathers (TPU gathers are
HBM-latency-bound; the fused layout cuts them 12x vs. 8-probe open
addressing). On device, rolling double fingerprints for every
(start, length<=K) span are computed in one vectorized pass, the two slots
gathered and compared, and the Viterbi DP runs as a lax.scan over the L axis
with the whole batch vectorized. Backtracking emits token ids via a second
pass. Counting reduces with psum over the data axis of the mesh.

The high-level DeviceRetokenizer additionally **dedups** pretoken rows before
dispatch and memoizes segmentations across calls — corpora are Zipfian, so
the device only ever sees each distinct pretoken once (the same trick the
host fast-encode path uses), which multiplies effective bytes/s by the
corpus' repetition factor.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

NEG = -1e30
_P1 = 0x01000193  # FNV-ish multipliers
_P2 = 0x85EBCA6B
_OFF1 = 0x811C9DC5
_OFF2 = 0x9E3779B9
_SALT_B = 0x7FEB352D


def _fingerprints(piece: bytes) -> Tuple[int, int]:
    h1, h2 = _OFF1, _OFF2
    for b in piece:
        h1 = (h1 * _P1 + b + 1) & 0xFFFFFFFF
        h2 = (h2 * _P2 + b + 1) & 0xFFFFFFFF
    if h1 == 0:
        h1 = 1
    return h1, h2


def _mix32(h: int) -> int:
    """murmur3 fmix32 avalanche — short byte strings cluster badly without it."""
    h = int(h) & 0xFFFFFFFF  # plain int: numpy scalars overflow-warn here
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


class CuckooTable:
    """Two-choice cuckoo hash of pieces -> (score, id), fused row layout.

    table_a/table_b: (M, 4) int32 — [key1, key2, score_bits, piece_id];
    key1 == 0 marks an empty slot."""

    __slots__ = ("table_a", "table_b", "max_piece_len", "M")

    def __init__(self, table_a, table_b, max_piece_len):
        self.table_a = table_a
        self.table_b = table_b
        self.max_piece_len = max_piece_len
        self.M = table_a.shape[0]


def build_vocab_table(
    pieces: Sequence[bytes], scores: Sequence[float], max_kicks: int = 64,
    use_native: bool = True,
) -> CuckooTable:
    n = max(1, len(pieces))
    M = 1 << int(np.ceil(np.log2(max(n, 32))))
    if use_native:
        try:
            from zett_tpu.csrc import host_lib as _hl
        except Exception:  # pragma: no cover - C++ lib optional
            _hl = None
        if _hl is not None:
            # native build (a fresh table per sampled tokenizer = once per
            # training batch); bit-identical to the Python loop below
            while True:
                out = _hl.cuckoo_build_native(pieces, scores, M, max_kicks)
                if out is not None:
                    ta, tb, max_len = out
                    return CuckooTable(ta, tb, max_len)
                M *= 2
    entries = []
    max_len = 1
    seen = set()
    for pid, (piece, score) in enumerate(zip(pieces, scores)):
        if not piece:
            continue
        h1, h2 = _fingerprints(piece)
        if (h1, h2) in seen:
            continue  # first occurrence wins (duplicate piece)
        seen.add((h1, h2))
        max_len = max(max_len, len(piece))
        sbits = int(np.float32(score).view(np.int32))
        entries.append((h1, h2, sbits, pid))

    while True:
        ta = np.zeros((M, 4), dtype=np.int64)
        tb = np.zeros((M, 4), dtype=np.int64)
        ok = True
        for entry in entries:
            cur = entry
            side = 0
            placed = False
            for _ in range(max_kicks):
                if side == 0:
                    slot = _mix32(cur[0]) % M
                    if ta[slot, 0] == 0:
                        ta[slot] = cur
                        placed = True
                        break
                    cur, ta[slot] = tuple(ta[slot]), cur
                    side = 1
                else:
                    slot = _mix32(cur[1] ^ _SALT_B) % M
                    if tb[slot, 0] == 0:
                        tb[slot] = cur
                        placed = True
                        break
                    cur, tb[slot] = tuple(tb[slot]), cur
                    side = 0
            if not placed:
                ok = False
                break
        if ok:
            to_i32 = lambda t: t.astype(np.uint32).view(np.int32).reshape(M, 4)
            return CuckooTable(to_i32(ta), to_i32(tb), max_len)
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


def _fmix32_dev(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> 16)


def compute_span_scores(rows, lens, table_a, table_b, unk_score, K: int):
    """Vectorized cuckoo lookup of all (start, len<=K) spans -> (S, I), each
    (B, L, K): span scores (NEG where absent/invalid) and piece ids.

    Exactly two row-gathers per span (cuckoo's two choices); the fused
    (M, 4) layout fetches keys+score+id in one slice each."""
    B, L = rows.shape
    M = table_a.shape[0]
    bytes_u32 = rows.astype(jnp.uint32)
    h1 = jnp.full((B, L), _OFF1, dtype=jnp.uint32)
    h2 = jnp.full((B, L), _OFF2, dtype=jnp.uint32)
    span_scores = []
    span_ids = []
    for k in range(1, K + 1):
        # byte at position i+k-1 for each start i (shift left by k-1)
        shifted = jnp.pad(bytes_u32[:, k - 1 :], ((0, 0), (0, k - 1)))
        h1 = h1 * jnp.uint32(_P1) + shifted + 1
        h2 = h2 * jnp.uint32(_P2) + shifted + 1
        hh1 = jnp.where(h1 == 0, jnp.uint32(1), h1)

        slot_a = (_fmix32_dev(hh1) % jnp.uint32(M)).astype(jnp.int32)
        slot_b = (_fmix32_dev(h2 ^ jnp.uint32(_SALT_B)) % jnp.uint32(M)).astype(
            jnp.int32
        )
        row_a = jnp.take(table_a, slot_a, axis=0)  # (B, L, 4)
        row_b = jnp.take(table_b, slot_b, axis=0)

        key1 = hh1.astype(jnp.int32)
        key2 = h2.astype(jnp.int32)
        hit_a = (row_a[..., 0] == key1) & (row_a[..., 1] == key2)
        hit_b = (row_b[..., 0] == key1) & (row_b[..., 1] == key2)
        sel = jnp.where(hit_a[..., None], row_a, row_b)
        hit = hit_a | hit_b
        score_k = jnp.where(
            hit, jax.lax.bitcast_convert_type(sel[..., 2], jnp.float32), NEG
        )
        id_k = jnp.where(hit, sel[..., 3], -1)
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


@partial(jax.jit, static_argnames=("K", "with_backtrack"))
def viterbi_device(
    rows: jnp.ndarray,  # (B, L) int32 bytes
    lens: jnp.ndarray,  # (B,) int32
    table_a: jnp.ndarray,  # (M, 4) int32 cuckoo
    table_b: jnp.ndarray,
    unk_score: float,
    K: int = 16,
    with_backtrack: bool = True,
):
    """Batched Viterbi. Returns (best_scores (B,), back_k (B, L+1) int32,
    back_id (B, L+1) int32) where back_k[j] is the length of the best piece
    ending at j (0 where unreachable)."""
    S, I = compute_span_scores(rows, lens, table_a, table_b, unk_score, K)
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


@partial(jax.jit, static_argnames=("K", "tile_b"))
def viterbi_device_pallas(
    rows, lens, table_a, table_b, unk_score, K: int = 16, tile_b: int = 256
):
    """Same contract as viterbi_device but with the DP phase as a Pallas
    kernel (dp/backpointers resident in VMEM, one launch per batch tile)."""
    from .pallas_viterbi import viterbi_dp_pallas

    S, I = compute_span_scores(rows, lens, table_a, table_b, unk_score, K)
    L = rows.shape[1]
    dp, bk, bi = viterbi_dp_pallas(S, I, tile_b=tile_b)
    best = jnp.take_along_axis(dp, lens[:, None], axis=1)[:, 0]
    return best, bk[:, : L + 1], bi[:, : L + 1]


@jax.jit
def backtrack_device(back_k, back_id, lens):
    """Device-side backtrack: follow each row's segmentation chain with a
    scan and emit piece ids in REVERSE order, padded with -1. Fetching this
    single (B, L) array costs half the bytes of the two backpointer arrays —
    the tunnel/host transfer is what dominates the end-to-end device path."""
    L = back_k.shape[1] - 1

    def body(j, _):
        k = jnp.take_along_axis(back_k, j[:, None], axis=1)[:, 0]
        pid = jnp.take_along_axis(back_id, j[:, None], axis=1)[:, 0]
        active = (j > 0) & (k > 0)
        out = jnp.where(active, pid, -1)  # -1 pad; real pids are >=0 or -2 (unk)
        j = jnp.where(active, j - k, 0)
        return j, out

    _, ids_rev = jax.lax.scan(body, lens, None, length=L)
    return ids_rev.T  # (B, L), reversed segmentation order


def unpack_backtrack(ids_rev: np.ndarray) -> List[List[int]]:
    """Host unpack of backtrack_device output -> per-row id lists.
    Vectorized: ids occupy a prefix of each reversed row, so flipping the
    axis leaves the forward ids as a suffix — one slice+tolist per row."""
    L = ids_rev.shape[1]
    fwd = ids_rev[:, ::-1]
    counts = L - (ids_rev != -1).sum(axis=1)
    return [row[c:].tolist() for row, c in zip(fwd, counts)]


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
def count_token_usage(back_k, back_id, lens, n_pieces: int, weights=None):
    """Device-side token-frequency counting from backpointers (for priors):
    follow the segmentation chain with a scan and scatter-add ids, optionally
    weighted per row (dedup multiplicities). Under shard_map/pjit over a
    'data'-sharded batch, jnp sums of the result become psum collectives."""
    B, L1 = back_k.shape
    if weights is None:
        weights = jnp.ones(B, dtype=jnp.int32)

    def body(state, _):
        j, counts = state
        k = jnp.take_along_axis(back_k, j[:, None], axis=1)[:, 0]
        pid = jnp.take_along_axis(back_id, j[:, None], axis=1)[:, 0]
        active = (j > 0) & (k > 0) & (pid >= 0)
        counts = counts.at[jnp.where(active, pid, n_pieces)].add(
            jnp.where(active, weights, 0)
        )
        j = jnp.maximum(j - jnp.maximum(k, 1), 0)
        return (j, counts), None

    counts0 = jnp.zeros(n_pieces + 1, dtype=jnp.int32)  # +1 overflow bucket
    (j, counts), _ = jax.lax.scan(body, (lens, counts0), None, length=L1)
    return counts[:n_pieces]


class DeviceRetokenizer:
    """High-level wrapper: host packs + dedups pretokens, device does Viterbi.

    Dedup is two-level: per call, identical pretoken rows collapse to one
    (np.unique); across calls, segmentations are memoized so a pretoken seen
    in any earlier batch never reaches the device again (Zipfian corpora
    repeat heavily — this is where the effective throughput comes from)."""

    def __init__(self, pieces: Sequence[bytes], scores: Sequence[float],
                 max_pretoken_len: int = 64, K: int = 16,
                 memoize: bool = True):
        self.table = build_vocab_table(pieces, scores)
        self.K = min(K, self.table.max_piece_len)
        self.max_pretoken_len = max_pretoken_len
        min_score = min(scores) if len(scores) else 0.0
        self.unk_score = float(min_score) - 10.0
        self.n_pieces = len(pieces)
        self._dev_table = (
            jnp.asarray(self.table.table_a),
            jnp.asarray(self.table.table_b),
        )
        self.memoize = memoize
        self._cache: Dict[bytes, List[int]] = {}

    def _segment_unique(self, unique_pretokens: Sequence[bytes]) -> List[List[int]]:
        """Device Viterbi + host backtrack for pretokens not seen before.
        The batch is padded to power-of-two buckets so jit compiles once per
        bucket, not once per distinct unique-row count."""
        if not unique_pretokens:
            return []
        rows, lens = pack_pretokens(unique_pretokens, self.max_pretoken_len)
        n = rows.shape[0]
        bucket = max(256, 1 << int(np.ceil(np.log2(n))))
        if bucket > n:
            rows = np.pad(rows, ((0, bucket - n), (0, 0)))
            lens = np.pad(lens, (0, bucket - n))
        ta, tb = self._dev_table
        _, bk, bi = viterbi_device(
            jnp.asarray(rows), jnp.asarray(lens), ta, tb, self.unk_score, K=self.K
        )
        # backtrack on device; fetch ONE (B, L) ids array instead of both
        # backpointer arrays (the host<->device transfer dominates)
        ids_rev = np.asarray(backtrack_device(bk, bi, jnp.asarray(lens)))
        return unpack_backtrack(ids_rev[:n])

    def _segmentations(self, pretokens: Sequence[bytes]) -> List[List[int]]:
        if self.memoize:
            new = []
            seen_new = set()
            for p in pretokens:
                key = p[: self.max_pretoken_len]
                if key not in self._cache and key not in seen_new:
                    seen_new.add(key)
                    new.append(key)
            for key, ids in zip(new, self._segment_unique(new)):
                self._cache[key] = ids
            return [self._cache[p[: self.max_pretoken_len]] for p in pretokens]
        uniq = list(dict.fromkeys(p[: self.max_pretoken_len] for p in pretokens))
        seg = dict(zip(uniq, self._segment_unique(uniq)))
        return [seg[p[: self.max_pretoken_len]] for p in pretokens]

    def encode(self, pretokens: Sequence[bytes]) -> List[List[int]]:
        return self._segmentations(pretokens)

    def best_scores(self, pretokens: Sequence[bytes]) -> np.ndarray:
        keys = [p[: self.max_pretoken_len] for p in pretokens]
        uniq = list(dict.fromkeys(keys))
        rows, lens = pack_pretokens(uniq, self.max_pretoken_len)
        ta, tb = self._dev_table
        best, _, _ = viterbi_device(
            jnp.asarray(rows), jnp.asarray(lens), ta, tb, self.unk_score,
            K=self.K, with_backtrack=False,
        )
        best = dict(zip(uniq, np.asarray(best)))
        return np.asarray([best[k] for k in keys], dtype=np.float32)

    def token_counts(self, pretokens: Sequence[bytes]) -> np.ndarray:
        """Piece-usage histogram over the (deduped) segmentations."""
        segs = self._segmentations(pretokens)
        counts = np.zeros(self.n_pieces, dtype=np.int64)
        for ids in segs:
            for pid in ids:
                if pid >= 0:
                    counts[pid] += 1
        return counts
