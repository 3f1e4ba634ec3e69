"""Device-side Viterbi: differential vs the native C++ (and Python) models."""

from collections import Counter

import numpy as np
import pytest

from zett_tpu.csrc import host_lib
from zett_tpu.ops.device_viterbi import DeviceRetokenizer
from zett_tpu.tokenization.sampler import TokenizerSampler

pytestmark = pytest.mark.skipif(host_lib is None, reason="native lib required")


@pytest.fixture(scope="module")
def vocab(corpus):
    sampler = TokenizerSampler()
    sampled = sampler.sample_tokenizer(
        {t: 1 for t in corpus if t.strip()}, 3000, 16, 1, 0.0
    )
    from zett_tpu.tokenization.bytemaps import CHARS_TO_BYTES

    pieces, scores = [], []
    for p, s in sampled:
        try:
            raw = bytes(CHARS_TO_BYTES[c] for c in p)
        except KeyError:
            continue
        pieces.append(raw)
        scores.append(s)
    return pieces, scores


@pytest.fixture(scope="module")
def pretokens(corpus):
    from zett_tpu.tokenization.sampler import pretokenize_bytes

    out = []
    for t in corpus:
        if not t.strip():
            continue
        out.extend(raw for raw, _ in pretokenize_bytes(t) if len(raw) <= 48)
    return out[:2000]


def test_device_matches_native(vocab, pretokens):
    pieces, scores = vocab
    dev = DeviceRetokenizer(pieces, scores, max_pretoken_len=48)
    native = host_lib.NativeUnigram(pieces, scores, unk_id=-1)
    dev_ids = dev.encode(pretokens)
    nat_ids = native.encode_pretokens(pretokens)
    n_mismatch = 0
    for i, (d, nn) in enumerate(zip(dev_ids, nat_ids)):
        nat = [int(x) for x in nn]
        if d != nat:
            n_mismatch += 1
            if n_mismatch <= 3:
                print(f"mismatch on {pretokens[i]!r}: device {d} native {nat}")
    assert n_mismatch == 0, f"{n_mismatch}/{len(pretokens)} segmentation mismatches"


def test_device_scores_match_native(vocab, pretokens):
    pieces, scores = vocab
    dev = DeviceRetokenizer(pieces, scores, max_pretoken_len=48)
    native = host_lib.NativeUnigram(pieces, scores, unk_id=-1)
    dev_scores = dev.best_scores(pretokens[:500])
    nat_scores = native.score_pretokens(pretokens[:500])
    np.testing.assert_allclose(dev_scores, nat_scores, rtol=1e-4, atol=1e-4)


def test_device_token_counts(vocab, pretokens):
    pieces, scores = vocab
    dev = DeviceRetokenizer(pieces, scores, max_pretoken_len=48)
    counts = dev.token_counts(pretokens[:400])
    expected = Counter(t for row in dev.encode(pretokens[:400]) for t in row if t >= 0)
    for pid, c in expected.items():
        assert counts[pid] == c, f"count mismatch for piece {pid}"
    assert counts.sum() == sum(expected.values())


def test_sharded_counting_psum(vocab, pretokens):
    """Counts reduce correctly when the batch is sharded over the mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zett_tpu.ops.device_viterbi import (
        count_token_usage,
        pack_pretokens,
        viterbi_device,
    )
    from zett_tpu.parallel import make_mesh

    pieces, scores = vocab
    dev = DeviceRetokenizer(pieces, scores, max_pretoken_len=48)
    pts = pretokens[:512]
    rows, lens = pack_pretokens(pts, 48)
    mesh = make_mesh(n_data=8, n_model=1)
    tab = dev._dev_table
    import jax.numpy as jnp

    rows_s = jax.device_put(jnp.asarray(rows), NamedSharding(mesh, P("data", None)))
    lens_s = jax.device_put(jnp.asarray(lens), NamedSharding(mesh, P("data")))
    _, bk, bi = viterbi_device(
        rows_s, lens_s, tab, dev.table.salt, dev.unk_score, K=dev.K,
    )
    counts = count_token_usage(bk, bi, lens_s, dev.n_pieces)
    expected = dev.token_counts(pts)
    np.testing.assert_array_equal(np.asarray(counts), expected)


def test_bucket4_build_native_matches_python():
    """The C++ bucket-4 table build is bit-identical to the Python reference
    (same fingerprints, same entry order), so lookups behave identically."""
    from zett_tpu.ops.device_viterbi import build_vocab_table

    rng = np.random.default_rng(7)
    pieces = sorted({rng.bytes(int(rng.integers(1, 12))) for _ in range(3000)})
    scores = rng.normal(size=len(pieces)).tolist()
    nat = build_vocab_table(pieces, scores, use_native=True)
    py = build_vocab_table(pieces, scores, use_native=False)
    np.testing.assert_array_equal(nat.table, py.table)
    assert nat.salt == py.salt
    assert nat.max_piece_len == py.max_piece_len


def test_count_tokens_device_matches_host(vocab, pretokens):
    """count_tokens_device (the prior pipeline's on-device counting path,
    psum over the data axis) agrees with the host-side token_counts on a
    weighted pretoken multiset, sharded and unsharded."""
    from collections import Counter

    from zett_tpu.ops.device_viterbi import count_tokens_device
    from zett_tpu.parallel import make_mesh

    pieces, scores = vocab
    pts = [p[:16] for p in pretokens[:700]]
    weighted = Counter(pts)
    dev = DeviceRetokenizer(pieces, scores, max_pretoken_len=16)
    expected = dev.token_counts(pts)

    got_single = count_tokens_device(pieces, scores, weighted)
    np.testing.assert_array_equal(got_single, expected)

    mesh = make_mesh(n_data=8, n_model=1)
    got_sharded = count_tokens_device(pieces, scores, weighted, mesh=mesh)
    np.testing.assert_array_equal(got_sharded, expected)


def test_count_tokens_device_overlong_host_fallback(vocab):
    """Pretokens longer than max_pretoken_len must not be truncated into
    wrong counts: the host C++ encoder segments the overlong tail exactly
    and its counts fold into the device histogram."""
    from zett_tpu.ops.device_viterbi import count_tokens_device

    pieces, scores = vocab
    native = host_lib.NativeUnigram(pieces, scores, unk_id=-1)
    long_pt = b" the" * 20  # 80 bytes > 16
    weighted = {long_pt: 5, b" the": 2, b" of": 1}
    segs = native.encode_pretokens(list(weighted))
    expected = np.zeros(len(pieces), dtype=np.int64)
    for (p, w), seg in zip(weighted.items(), segs):
        for t in seg:
            if t >= 0:
                expected[t] += w
    got = count_tokens_device(pieces, scores, weighted, max_pretoken_len=16)
    np.testing.assert_array_equal(got, expected)
    # the old clip behavior remains opt-in
    got_trunc = count_tokens_device(
        pieces, scores, weighted, max_pretoken_len=16, overlong="truncate"
    )
    assert (got_trunc != expected).any()


def test_count_tokens_device_int64_weights(vocab):
    """Whole-corpus multiplicities overflow the on-device int32 histogram;
    the host chunking must accumulate exactly in int64. One pretoken with
    a >2^31-token total plus normal rows; counts must match weight x
    tokens-per-segmentation with no wraparound."""
    from zett_tpu.ops.device_viterbi import count_tokens_device

    pieces, scores = vocab
    dev = DeviceRetokenizer(pieces, scores, max_pretoken_len=16)
    big_w = (1 << 31) + 12345
    weighted = {b" the": big_w, b" and": 3, b" of": 2}
    seg = {p: ids for p, ids in zip(weighted, dev.encode(list(weighted)))}
    expected = np.zeros(len(pieces), dtype=np.int64)
    for p, w in weighted.items():
        for t in seg[p]:
            if t >= 0:
                expected[t] += w
    got = count_tokens_device(pieces, scores, weighted)
    assert got.dtype == np.int64
    np.testing.assert_array_equal(got, expected)
    assert got.sum() > (1 << 31)  # the overflow regime was actually hit
