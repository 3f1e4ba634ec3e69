"""Device-side batched Unigram Viterbi: the retokenization loop on-chip.

BASELINE.json north star: "Replace the Rust retokenization utilities with
device-side kernels so the corpus-retokenization loop used for tokenizer
sampling and prior computation runs on-chip... corpus shards data-parallel,
merge table / unigram scores replicated, token-frequency counts reduced via
psum collectives."

Formulation (TPU-friendly, static shapes): pretokens are padded byte rows
(B, L). The vocab is compiled on host into a **single-gather bucket-4 hash
table**: (M, 16) int32 rows holding four fused entries
[key1, key2, score_bits, piece_id], slot = fmix32(h1 ^ salt) % M at load
factor <= 1/4 wrt buckets (salted rebuild on the rare overflow). TPU gathers
are HBM-latency-bound — the row WIDTH is nearly free (a 64B row gathers at
the same rate as a 16B row) while the gather COUNT is what costs, so one
64B-row gather per span is ~2x faster than the two-choice cuckoo layout this
replaces, and ~12x faster than an 8-probe open-addressing chain. On device,
rolling double fingerprints for every (start, length<=K) span are computed in
one vectorized pass, the bucket row gathered and compared against all four
entries, and the Viterbi DP runs as a lax.scan over the L axis with the whole
batch vectorized (or as the Pallas kernel in pallas_viterbi.py — measured at
parity with the scan: the spans phase, not the DP, is the bottleneck).
Backtracking emits token ids via a second pass. Counting reduces with psum
over the data axis of the mesh (count_tokens_device).

The high-level DeviceRetokenizer additionally **buckets pretokens by length**
(widths 8/12/16: span count grows as L*K, and most pretokens are short — the
histogram of a realistic corpus puts ~70% of unique pretokens at <=8 bytes,
so bucketing cuts the span grid ~2x) and **dedups** rows before dispatch,
memoizing segmentations across calls — corpora are Zipfian, so the device
only ever sees each distinct pretoken once (the same trick the host
fast-encode path uses), which multiplies effective bytes/s by the corpus'
repetition factor.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

NEG = -1e30
import collections

_FUSED_SEGMENT_CACHE: "collections.OrderedDict" = collections.OrderedDict()
# (present-widths, shared-batch-bucket, K) -> jitted fn; LRU-bounded: every
# group is padded to ONE shared batch bucket so the signature does not
# multiply across per-width batch sizes
_FUSED_SEGMENT_CACHE_MAX = 32
_P1 = 0x01000193  # FNV-ish multipliers
_P2 = 0x85EBCA6B
_OFF1 = 0x811C9DC5
_OFF2 = 0x9E3779B9


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


class PackedTable:
    """Single-gather bucket-4 hash of pieces -> (score, id).

    table: (M, 16) int32 — four entries of [key1, key2, score_bits,
    piece_id] per bucket row; key1 == 0 marks an empty entry. One span
    lookup = one row gather + four fused compares."""

    __slots__ = ("table", "salt", "max_piece_len", "M")

    def __init__(self, table, salt, max_piece_len):
        self.table = table
        self.salt = salt
        self.max_piece_len = max_piece_len
        self.M = table.shape[0]


def build_vocab_table(
    pieces: Sequence[bytes], scores: Sequence[float], use_native: bool = True,
) -> PackedTable:
    """Build the device vocab table (fresh per sampled tokenizer = once per
    training batch; the native build is single-pass). Bucket load factor
    stays <= 1/4 entries-per-slot in expectation, so a bucket overflowing its
    4 entries is rare — bump the salt, then double M if salts keep failing."""
    n = max(1, len(pieces))
    M = 1 << int(np.ceil(np.log2(max(n, 32))))
    _hl = None
    if use_native:
        try:
            from zett_tpu.csrc import host_lib as _hl
        except Exception:  # pragma: no cover - C++ lib optional
            _hl = None

    while True:
        for salt in range(8):
            if _hl is not None:
                out = _hl.bucket4_build_native(pieces, scores, M, salt)
                if out is not None:
                    return PackedTable(out[0], salt, out[1])
            else:
                out = _bucket4_build_py(pieces, scores, M, salt)
                if out is not None:
                    return PackedTable(out[0], salt, out[1])
        M *= 2


def _bucket4_build_py(pieces, scores, M, salt):
    """Python reference build, bit-identical to the C++ one."""
    table = np.zeros((M, 16), dtype=np.int64)
    seen = set()
    max_len = 1
    for pid, (piece, score) in enumerate(zip(pieces, scores)):
        if not piece:
            continue
        h1, h2 = _fingerprints(piece)
        if (h1, h2) in seen:
            continue  # first occurrence wins (duplicate piece)
        seen.add((h1, h2))
        max_len = max(max_len, len(piece))
        sbits = int(np.float32(score).view(np.int32)) & 0xFFFFFFFF
        slot = _mix32(h1 ^ salt) % M
        for e in range(4):
            if table[slot, e * 4] == 0:
                table[slot, e * 4 : e * 4 + 4] = (h1, h2, sbits, pid)
                break
        else:
            return None
    return table.astype(np.uint32).view(np.int32).reshape(M, 16), max_len


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


def compute_span_scores(rows, lens, table, salt, unk_score, K: int):
    """Vectorized bucket-4 lookup of all (start, len<=K) spans -> (S, I),
    each (B, L, K): span scores (NEG where absent/invalid) and piece ids.

    Exactly ONE row-gather per span; the fused (M, 16) bucket fetches four
    candidate entries' keys+scores+ids in one slice."""
    B, L = rows.shape
    M = table.shape[0]
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

        slot = (_fmix32_dev(hh1 ^ jnp.uint32(salt)) % jnp.uint32(M)).astype(
            jnp.int32
        )
        row = jnp.take(table, slot, axis=0)  # (B, L, 16)
        ent = row.reshape(B, L, 4, 4)  # four entries per bucket

        key1 = hh1.astype(jnp.int32)
        key2 = h2.astype(jnp.int32)
        hit = (ent[..., 0] == key1[..., None]) & (ent[..., 1] == key2[..., None])
        score_e = jnp.where(
            hit, jax.lax.bitcast_convert_type(ent[..., 2], jnp.float32), NEG
        )
        id_e = jnp.where(hit, ent[..., 3], -1)
        # at most one entry matches (keys are unique)
        span_scores.append(score_e.max(axis=-1))
        span_ids.append(id_e.max(axis=-1))
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
    table: jnp.ndarray,  # (M, 16) int32 bucket-4
    salt: int,
    unk_score: float,
    K: int = 16,
    with_backtrack: bool = True,
):
    """Batched Viterbi. Returns (best_scores (B,), back_k (B, L+1) int32,
    back_id (B, L+1) int32) where back_k[j] is the length of the best piece
    ending at j (0 where unreachable)."""
    S, I = compute_span_scores(rows, lens, table, salt, unk_score, K)
    B, L = rows.shape

    # DP over positions: dp[j+1..j+K] relax from dp[j]. The initial carries
    # derive from `rows` so they inherit its varying-manual-axes type under
    # shard_map (a constant carry + varying updates is a type error there);
    # outside shard_map the +0 folds away.
    vary_f = (rows[:, :1] * 0).astype(jnp.float32)  # (B, 1)
    vary_i = rows[:, :1] * 0
    dp0 = jnp.full((B, L + K), NEG, dtype=jnp.float32).at[:, 0].set(0.0) + vary_f
    bk0 = jnp.zeros((B, L + K), dtype=jnp.int32) + vary_i
    bi0 = jnp.full((B, L + K), -1, dtype=jnp.int32) + vary_i

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
    rows, lens, table, salt, unk_score, K: int = 16, tile_b: int = 256
):
    """Same contract as viterbi_device but with the DP phase as a Pallas
    kernel (dp/backpointers resident in VMEM, one launch per batch tile).
    Measured at parity with the lax.scan DP on v5e (the spans phase
    dominates); kept as the explicit-kernel path and benchmarked in
    bench.py."""
    from .pallas_viterbi import viterbi_dp_pallas

    S, I = compute_span_scores(rows, lens, table, salt, unk_score, K)
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

    # +1 overflow bucket; + lens[:1]*0 inherits the varying type under
    # shard_map (see viterbi_device), a no-op otherwise
    counts0 = jnp.zeros(n_pieces + 1, dtype=jnp.int32) + lens[:1] * 0
    (j, counts), _ = jax.lax.scan(body, (lens, counts0), None, length=L1)
    return counts[:n_pieces]


def _pad_rows(rows, lens, weights, n_data: int):
    """Pad a row chunk so its leading dim divides the mesh's data axis."""
    pad = (-rows.shape[0]) % max(n_data, 1)
    if pad:
        rows = np.pad(rows, ((0, pad), (0, 0)))
        lens = np.pad(lens, (0, pad))
        weights = np.pad(weights, (0, pad))
    return rows, lens, weights


def count_tokens_device(
    pieces: Sequence[bytes],
    scores: Sequence[float],
    pretoken_counts,  # Mapping[bytes, int]
    mesh=None,
    max_pretoken_len: int = 64,
    K: int = 16,
    overlong: str = "host",
) -> np.ndarray:
    """Corpus token-usage counts entirely on-device (BASELINE north star:
    "token-frequency counts reduced via psum collectives").

    Pretokens are deduped on host (weights = multiplicities), packed into
    byte rows, and sharded over the mesh's "data" axis; every device runs
    Viterbi + chain-following count_token_usage on its shard and the final
    (V,) histogram reduces with one psum. Only the counts ever leave the
    devices — no backtrack transfer. Single-device without a mesh.

    Replaces the host pass the reference does with HF `tokenizers` +
    np.unique when reestimating priors (zett/utils.py:291-315 with input_ids
    produced by the Rust encode).

    `overlong`: pretokens longer than max_pretoken_len are a tiny Zipf tail
    but truncating them changes their segmentations (and the counts).
    "host" (default) segments them exactly with the native C++ encoder and
    folds their counts in; "truncate" keeps the old clip behavior."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    table = build_vocab_table(pieces, scores)
    K = min(K, table.max_piece_len)
    unk_score = (min(scores) if len(scores) else 0.0) - 10.0
    n_pieces = len(pieces)

    host_tail = np.zeros(n_pieces, dtype=np.int64)
    agg: Dict[bytes, int] = {}
    long_keys: list = []
    for p, w in pretoken_counts.items():
        if len(p) > max_pretoken_len and overlong == "host":
            long_keys.append(p)
            continue
        key = p[:max_pretoken_len]
        agg[key] = agg.get(key, 0) + int(w)
    if long_keys:
        from ..csrc import host_lib

        native = host_lib.NativeUnigram(pieces, scores, unk_id=-1)
        for p, seg in zip(long_keys, native.encode_pretokens(long_keys)):
            w = int(pretoken_counts[p])
            for pid in seg:
                if pid >= 0:
                    host_tail[pid] += w
    keys = list(agg.keys())
    if not keys:
        return host_tail
    rows, lens = pack_pretokens(keys, max_pretoken_len)
    weights = np.fromiter((agg[k] for k in keys), dtype=np.int64, count=len(keys))

    n_data = int(mesh.shape.get("data", 1)) if mesh is not None else 1
    tab = jnp.asarray(table.table)

    def _count(rows, lens, weights, tab):
        _, bk, bi = viterbi_device(rows, lens, tab, table.salt, unk_score, K=K)
        return count_token_usage(bk, bi, lens, n_pieces, weights=weights)

    if mesh is not None and n_data > 1:
        shard = P("data")
        fn = jax.jit(shard_map(
            lambda r, l, w, t: jax.lax.psum(_count(r, l, w, t), "data"),
            mesh=mesh,
            in_specs=(shard, shard, shard, P()),
            out_specs=P(),
        ))
    else:
        fn = lambda r, l, w, t: _count(r, l, w, t)  # noqa: E731

    # the on-device histogram accumulates in int32 (TPU-native; int64 would
    # be silently downcast without x64): chunk rows so that each chunk's
    # worst-case token count — sum(weights * tokens_per_row), tokens_per_row
    # <= len — stays below 2^31, and accumulate chunks in int64 on host.
    # Whole-corpus multiplicities (compute_prior --device) exceed int32.
    LIMIT = (np.int64(1) << 31) - (np.int64(1) << 20)
    cost = weights * np.maximum(lens.astype(np.int64), 1)
    cum = np.cumsum(cost)
    total = host_tail.copy()
    start = 0
    n = len(keys)
    while start < n:
        # rows whose cumulative cost fits in the int32 budget; a single row
        # with > LIMIT occurrences splits its weight across repeats
        base = cum[start - 1] if start else np.int64(0)
        stop = int(np.searchsorted(cum, base + LIMIT, side="right"))
        if stop <= start:  # one gigantic row: split its weight
            w_full = int(weights[start])
            w_step = max(int(LIMIT // max(int(lens[start]), 1)), 1)
            for off in range(0, w_full, w_step):
                w_part = np.asarray([min(w_step, w_full - off)], dtype=np.int32)
                r, l = rows[start:start + 1], lens[start:start + 1]
                r, l, w_part = _pad_rows(r, l, w_part, n_data)
                total += np.asarray(
                    fn(jnp.asarray(r), jnp.asarray(l), jnp.asarray(w_part), tab),
                    dtype=np.int64,
                )
            start += 1
            continue
        r = rows[start:stop]
        l = lens[start:stop]
        w = weights[start:stop].astype(np.int32)
        r, l, w = _pad_rows(r, l, w, n_data)
        total += np.asarray(
            fn(jnp.asarray(r), jnp.asarray(l), jnp.asarray(w), tab),
            dtype=np.int64,
        )
        start = stop
    return total


class DeviceRetokenizer:
    """High-level wrapper: host packs + dedups pretokens, device does Viterbi.

    Dedup is two-level: per call, identical pretoken rows collapse to one;
    across calls, segmentations are memoized so a pretoken seen in any
    earlier batch never reaches the device again (Zipfian corpora repeat
    heavily — this is where the effective throughput comes from). Unique
    rows are split into length buckets (widths multiples of 4 up to
    max_pretoken_len) so short pretokens don't pay the full (L, K) span
    grid."""

    BUCKET_WIDTHS = (8, 12, 16, 24, 32, 48)

    # default 64 matches the original host-path semantics: pretokens are
    # GPT-2-split words, and truncating at 16 visibly changes segmentations
    # (and counts) for long identifiers; length buckets keep short rows
    # cheap regardless, so the wide default costs little
    def __init__(self, pieces: Sequence[bytes], scores: Sequence[float],
                 max_pretoken_len: int = 64, K: int = 16,
                 memoize: bool = True):
        self.table = build_vocab_table(pieces, scores)
        self.K = min(K, self.table.max_piece_len)
        self.max_pretoken_len = max_pretoken_len
        min_score = min(scores) if len(scores) else 0.0
        self.unk_score = float(min_score) - 10.0
        self.n_pieces = len(pieces)
        self._dev_table = jnp.asarray(self.table.table)
        self.memoize = memoize
        self._cache: Dict[bytes, List[int]] = {}
        # the last bucket is always max_pretoken_len wide, so over-long
        # pretokens truncate exactly as pack_pretokens always did
        self._widths = sorted(
            {w for w in self.BUCKET_WIDTHS if w < max_pretoken_len}
            | {max_pretoken_len}
        )

    def _segment_bucket(self, pretokens: List[bytes], width: int) -> List[List[int]]:
        rows, lens = pack_pretokens(pretokens, width)
        n = rows.shape[0]
        bucket = max(256, 1 << int(np.ceil(np.log2(n))))
        if bucket > n:
            rows = np.pad(rows, ((0, bucket - n), (0, 0)))
            lens = np.pad(lens, (0, bucket - n))
        K = min(self.K, width)
        _, bk, bi = viterbi_device(
            jnp.asarray(rows), jnp.asarray(lens), self._dev_table,
            self.table.salt, self.unk_score, K=K,
        )
        # backtrack on device; fetch ONE (B, L) ids array instead of both
        # backpointer arrays (the host<->device transfer dominates)
        ids_rev = np.asarray(backtrack_device(bk, bi, jnp.asarray(lens)))
        return unpack_backtrack(ids_rev[:n])

    def _segment_unique(self, unique_pretokens: Sequence[bytes]) -> List[List[int]]:
        """Device Viterbi + host backtrack for pretokens not seen before,
        length-bucketed; each bucket is padded to power-of-two batch sizes so
        jit compiles once per (batch-bucket, width) tuple signature.

        ALL width buckets run inside ONE jitted call and return ONE
        concatenated ids array: through the remote tunnel each dispatch and
        each fetch costs ~15-25 ms, and the per-bucket loop (up to 6 round
        trips) used to dominate the effective rate on real corpora — the
        device compute itself is a few ms per bucket."""
        if not unique_pretokens:
            return []
        out: List[Optional[List[int]]] = [None] * len(unique_pretokens)
        last = self._widths[-1]
        groups = []  # (idx, rows, lens, n_real, width)
        for wi, width in enumerate(self._widths):
            lo = self._widths[wi - 1] if wi else -1  # first bucket takes len 0
            idx = [
                i for i, p in enumerate(unique_pretokens)
                if lo < len(p) <= width or (width == last and len(p) > last)
            ]
            if not idx:
                continue
            rows, lens = pack_pretokens(
                [unique_pretokens[i] for i in idx], width
            )
            groups.append((idx, rows, lens, rows.shape[0], width))
        if not groups:
            return out  # type: ignore[return-value]

        # every group is padded to ONE shared batch bucket (max across the
        # present widths): the jit signature is then (present-widths,
        # bucket) instead of a per-width batch tuple, which would compile a
        # fresh program for every COMBINATION of per-width batch sizes. The
        # padded rows cost device compute only (a few ms — dispatch
        # dominates through the tunnel).
        bucket = max(
            256,
            1 << int(np.ceil(np.log2(max(n for *_, n, _ in groups)))),
        )
        groups = [
            (
                idx,
                np.pad(rows, ((0, bucket - n), (0, 0))) if bucket > n else rows,
                np.pad(lens, (0, bucket - n)) if bucket > n else lens,
                n,
                width,
            )
            for idx, rows, lens, n, width in groups
        ]

        # module-level cache: jit programs are reusable across
        # DeviceRetokenizer instances (a fresh instance per sampled
        # tokenizer is the normal usage — per-instance caching would
        # recompile every batch)
        sig = (
            tuple(int(w) for *_, w in groups),
            bucket,
            int(self.K),
        )
        fn = _FUSED_SEGMENT_CACHE.get(sig)
        if fn is not None:
            _FUSED_SEGMENT_CACHE.move_to_end(sig)
        if fn is None:
            widths = [w for _, _, _, _, w in groups]
            Ks = [min(self.K, w) for w in widths]
            w_max = max(widths)

            @jax.jit
            def fn(tab, salt, unk, *flat):
                outs = []
                for (rows, lens), K, w in zip(
                    zip(flat[::2], flat[1::2]), Ks, widths
                ):
                    _, bk, bi = viterbi_device(rows, lens, tab, salt, unk, K=K)
                    ids_rev = backtrack_device(bk, bi, lens)  # (B, w)
                    if w < w_max:
                        # pad on the RIGHT of the reversed array (ids live in
                        # a -1-terminated prefix, so right-padding with -1 is
                        # shape-only)
                        ids_rev = jnp.pad(
                            ids_rev, ((0, 0), (0, w_max - w)),
                            constant_values=-1,
                        )
                    outs.append(ids_rev)
                return jnp.concatenate(outs, axis=0)

            _FUSED_SEGMENT_CACHE[sig] = fn
            while len(_FUSED_SEGMENT_CACHE) > _FUSED_SEGMENT_CACHE_MAX:
                _FUSED_SEGMENT_CACHE.popitem(last=False)

        flat = []
        for _, rows, lens, _, _ in groups:
            flat += [jnp.asarray(rows), jnp.asarray(lens)]
        all_ids = np.asarray(fn(
            self._dev_table,
            jnp.uint32(self.table.salt), jnp.float32(self.unk_score),
            *flat,
        ))  # ONE fetch
        off = 0
        for idx, rows, _, n, _ in groups:
            segs = unpack_backtrack(all_ids[off : off + n])
            off += rows.shape[0]
            for i, seg in zip(idx, segs):
                out[i] = seg
        return out  # type: ignore[return-value]

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
        best, _, _ = viterbi_device(
            jnp.asarray(rows), jnp.asarray(lens), self._dev_table,
            self.table.salt, self.unk_score, K=self.K, with_backtrack=False,
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
