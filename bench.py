"""Benchmark driver: prints ONE JSON line with the headline metrics.

BASELINE.json metrics: bytes/s/chip retokenization, token-id exact-match %
vs. HF tokenizers, hypernet ms per 32k vocab. The retokenization baseline is
the HF `tokenizers` Rust library measured on the same corpus and tokenizer
(vs_baseline = ours / HF). The hypernet forward runs on the real chip.
"""

import json
import random
import sys
import time


def make_corpus(target_bytes: int = 2_000_000):
    """Synthetic corpus with realistic lexical statistics: a Zipf-distributed
    lexicon of tens of thousands of distinct word forms (real text has
    10k-100k unique pretokens per MB-scale shard; an earlier ~170-word corpus
    made every dedup/memoization path look infinitely fast and starved the
    device retokenizer of unique rows)."""
    rng = random.Random(0)
    function_words = (
        "the of and to in is was he for it with as his on be at by this had "
        "not are but from or have an they which one you were her all she "
        "there would their we him been has when who will more no if out so"
    ).split()
    onsets = (
        "b br c ch cl cr d dr f fl fr g gl gr h j k kl l m n p pl pr qu r s "
        "sc sh sl sm sp st str t th tr v w wh z"
    ).split()
    nuclei = "a e i o u ai au ea ee ie oa oo ou".split()
    codas = (
        " b ck ct d ft g l ld ll lt m mp n nd ng nk nt p r rd rk rm rn rt s "
        "sh sk sp ss st t th x"
    ).split(" ")
    stems = [o + n + c for o in onsets for n in nuclei for c in codas]
    rng.shuffle(stems)
    suffixes = ["", "", "", "s", "ed", "ing", "er", "est", "ly", "ness", "ation"]
    lexicon = [s + rng.choice(suffixes) for s in stems]
    extra = ["Zürich", "naïve", "café", "日本語", "привет", "🤖", "don't", "it's"]

    # Zipf weights over the lexicon; function words get the head mass
    n_lex = len(lexicon)
    cum = []
    total_w = 0.0
    for i in range(n_lex):
        total_w += 1.0 / (i + 20)
        cum.append(total_w)

    texts = []
    total = 0
    while total < target_bytes:
        n = rng.randint(8, 60)
        parts = []
        for _ in range(n):
            r = rng.random()
            if r < 0.45:
                parts.append(rng.choice(function_words))
            elif r < 0.97:
                # Zipf draw from the synthetic lexicon
                x = rng.random() * total_w
                lo, hi = 0, n_lex - 1
                while lo < hi:
                    mid = (lo + hi) // 2
                    if cum[mid] < x:
                        lo = mid + 1
                    else:
                        hi = mid
                w = lexicon[lo]
                if rng.random() < 0.05:
                    w = w.capitalize()
                parts.append(w)
            elif r < 0.99:
                parts.append(str(rng.randint(0, 99999)))
            else:
                parts.append(rng.choice(extra))
        t = " ".join(parts) + rng.choice([".", ".", "!", "?", ","])
        texts.append(t)
        total += len(t.encode("utf-8"))
    return texts


def bench_retokenize(texts, vocab_size=32768):
    from tokenizers import Tokenizer as HFTokenizer

    from zett_tpu.data.collator import build_sampled_tokenizer
    from zett_tpu.tokenization import Tokenizer
    from zett_tpu.tokenization.core import AddedToken
    from zett_tpu.tokenization.sampler import TokenizerSampler

    sampler = TokenizerSampler()
    t0 = time.time()
    sampled = sampler.sample_tokenizer(
        {t: 1 for t in texts[:4096]}, vocab_size, 16, 4, 0.0, pop_prev=True
    )
    sample_time = time.time() - t0
    pieces = [p for p, _ in sampled]
    scores = [s for _, s in sampled]
    bench_retokenize.last_vocab = (pieces, scores)

    reference = Tokenizer.from_json(
        {
            "version": "1.0",
            "added_tokens": [
                {"id": 0, "content": "<|endoftext|>", "single_word": False,
                 "lstrip": False, "rstrip": False, "normalized": False, "special": True}
            ],
            "normalizer": None,
            "pre_tokenizer": None,
            "post_processor": None,
            "decoder": None,
            "model": {"type": "BPE", "vocab": {"<|endoftext|>": 0}, "merges": [],
                      "unk_token": None, "continuing_subword_prefix": None,
                      "end_of_word_suffix": None, "fuse_unk": False,
                      "byte_fallback": False, "ignore_merges": False,
                      "dropout": None},
        }
    )
    ours, _ = build_sampled_tokenizer(pieces, scores, reference)
    hf = HFTokenizer.from_str(ours.to_str())

    n_bytes = sum(len(t.encode("utf-8")) for t in texts)

    from zett_tpu.tokenization.fast_encode import fast_encoder_or_none

    fast = fast_encoder_or_none(ours)

    # INTERLEAVED best-of-N: ours and the HF baseline alternate within each
    # round, so shared-host noise (which drifts over seconds) hits both
    # sides equally instead of whichever ran second — the same protocol the
    # transfer bench uses. Spread (max/min per side) is reported so a noisy
    # capture is visible in the artifact instead of silently moving the
    # headline (BENCH_r03→r04 drifted 50.6→47.5 MB/s without it).
    rounds = 5
    our_times, hf_times = [], []
    our_ids = None
    hf_encodings = None
    if fast is not None:
        fast.encode_batch(texts[:64], add_special_tokens=False)  # warm cache
    hf.encode_batch(texts[:64], add_special_tokens=False)
    for _ in range(rounds):
        if fast is not None:
            t0 = time.time()
            ids_arr, mask_arr = fast.encode_batch(texts, add_special_tokens=False)
            our_times.append(time.time() - t0)
            our_ids = [
                list(ids_arr[i][mask_arr[i] == 1]) for i in range(len(texts))
            ]
        else:
            t0 = time.time()
            our_ids = [
                e.ids for e in ours.encode_batch(texts, add_special_tokens=False)
            ]
            our_times.append(time.time() - t0)
        t0 = time.time()
        hf_encodings = hf.encode_batch(texts, add_special_tokens=False)
        hf_times.append(time.time() - t0)

    our_time = min(our_times)
    hf_time = min(hf_times)
    n_match = sum(1 for a, b in zip(our_ids, hf_encodings) if list(a) == b.ids)
    exact_match = n_match / len(texts)

    return {
        "bytes_per_s": n_bytes / our_time,
        "hf_bytes_per_s": n_bytes / hf_time,
        "bytes_per_s_spread": round(max(our_times) / min(our_times), 3),
        "hf_bytes_per_s_spread": round(max(hf_times) / min(hf_times), 3),
        "exact_match": exact_match,
        "sample_time_s": sample_time,
        "n_bytes": n_bytes,
        "vocab_size": len(ours),
    }


def bench_device_retokenize(texts, pieces_chars, scores):
    """On-chip batched Viterbi throughput (BASELINE north star: the
    retokenization loop runs on-device).

    Numbers: the raw device rate over UNIQUE pretoken rows (what the chip
    actually grinds through — length-bucketed dispatch over the
    single-gather bucket-4 table), the same with the Pallas DP kernel, and
    the effective corpus rate after the retokenizer's dedup (corpora are
    Zipfian; every repeat is free)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from zett_tpu.ops.device_viterbi import (
        DeviceRetokenizer,
        pack_pretokens,
        viterbi_device,
    )
    from zett_tpu.tokenization.bytemaps import CHARS_TO_BYTES
    from zett_tpu.tokenization.sampler import pretokenize_bytes

    pieces, pscores = [], []
    for p, s in zip(pieces_chars, scores):
        try:
            raw = bytes(CHARS_TO_BYTES[c] for c in p)
        except KeyError:
            continue
        pieces.append(raw)
        pscores.append(s)

    pretokens = []
    for t in texts:
        pretokens.extend(raw for raw, _ in pretokenize_bytes(t))
    n_bytes = sum(len(p) for p in pretokens)

    dev = DeviceRetokenizer(pieces, pscores, max_pretoken_len=16)
    uniq = list(dict.fromkeys(p[:16] for p in pretokens))
    uniq_bytes = sum(len(p) for p in uniq)
    tab = dev._dev_table
    salt = dev.table.salt

    # length buckets exactly as DeviceRetokenizer dispatches them
    buckets = []
    last = dev._widths[-1]
    for wi, width in enumerate(dev._widths):
        lo = dev._widths[wi - 1] if wi else -1
        sel = [p for p in uniq
               if lo < len(p) <= width or (width == last and len(p) > last)]
        if sel:
            rows, lens = pack_pretokens(sel, width)
            buckets.append((jnp.asarray(rows), jnp.asarray(lens), min(dev.K, width)))

    # scalar fetch as the sync barrier (block_until_ready is a no-op through
    # the remote-device tunnel); roll by i so iterations differ (else XLA
    # hoists the loop-invariant DP and computes it once)
    def timed_buckets(vit):
        from functools import partial as _partial

        @_partial(jax.jit, static_argnames=("K",))
        def run10(rows, lens, tab, K):
            def body(i, acc):
                r = jnp.roll(rows, i, axis=0)
                ln = jnp.roll(lens, i, axis=0)
                best, _, _ = vit(r, ln, tab, salt, dev.unk_score, K)
                return acc + best.sum()
            return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

        for rows_d, lens_d, K in buckets:  # compile each bucket
            float(run10(rows_d, lens_d, tab, K=K))
        dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            for rows_d, lens_d, K in buckets:
                float(run10(rows_d, lens_d, tab, K=K))
            dt = min(dt, (time.time() - t0) / 10)
        return dt

    dt = timed_buckets(
        lambda r, l, t, s, u, K: viterbi_device(r, l, t, s, u, K=K)
    )

    def _finish(pallas_vs_scan):
        # effective end-to-end corpus rate through the wrapper (pack + dedup
        # on host, Viterbi + backtrack transfer for new rows); first pass
        # warms the per-bucket jit compile, the timed pass starts with a
        # cold memo cache
        DeviceRetokenizer(pieces, pscores, max_pretoken_len=16).encode(pretokens)
        t0 = time.time()
        dev2 = DeviceRetokenizer(pieces, pscores, max_pretoken_len=16)
        dev2.encode(pretokens)
        effective_dt = time.time() - t0
        return {
            "device_retokenize_bytes_per_s": uniq_bytes / dt,
            "pallas_vs_scan_dp": pallas_vs_scan,
            "device_retokenize_effective_bytes_per_s": n_bytes / effective_dt,
            "n_bytes": n_bytes,
            "n_unique_rows": len(uniq),
            "vocab_in_table": len(pieces),
        }

    # Pallas DP kernel vs the lax.scan DP on identical precomputed span
    # scores (the spans phase is shared; combining spans+pallas in one jit
    # hangs the remote-tunnel compiler at large B, and the DP phase is where
    # the kernel could differ). Scalar-fetch barrier as above; ~15ms
    # dispatch overhead affects both identically.
    #
    # Runs by DEFAULT with a watchdog (opt out: BENCH_PALLAS=0). The r4
    # worry was remote-tunnel Mosaic compiles hanging the driver bench;
    # the remote compile is an interruptible HTTP call, so a SIGALRM
    # deadline turns a hang into a recorded timeout error instead of a
    # stuck driver. The bench JSON carries only numbers THIS run produced.
    import os as _os
    import signal as _signal

    if _os.environ.get("BENCH_PALLAS") == "0":
        return _finish({"skipped": "BENCH_PALLAS=0"})

    class _Deadline(Exception):
        pass

    def _on_alarm(signum, frame):
        raise _Deadline("pallas compile/run exceeded 180s watchdog")

    prev_alarm = _signal.signal(_signal.SIGALRM, _on_alarm)
    _signal.alarm(180)
    try:
        from functools import partial as _partial

        from zett_tpu.ops.device_viterbi import compute_span_scores
        from zett_tpu.ops.pallas_viterbi import viterbi_dp_pallas

        rows_big, lens_big, K_big = max(buckets, key=lambda b: b[0].shape[0])

        @_partial(jax.jit, static_argnames=("K",))
        def spans(rows, lens, tab, K):
            return compute_span_scores(rows, lens, tab, salt, dev.unk_score, K)

        S_d, I_d = spans(rows_big, lens_big, tab, K=K_big)

        @jax.jit
        def dp_pallas(S, I, lens):
            dp, bk, _ = viterbi_dp_pallas(S, I, tile_b=256)
            return (
                jnp.take_along_axis(dp, lens[:, None], axis=1)[:, 0].sum()
                + bk.sum().astype(jnp.float32)
            )

        @jax.jit
        def dp_scan(S, I, lens):
            B, L, K = S.shape
            NEG = -1e30
            dp0 = jnp.full((B, L + K), NEG, dtype=jnp.float32).at[:, 0].set(0.0)
            bk0 = jnp.zeros((B, L + K), dtype=jnp.int32)

            def step(carry, j):
                dp, bk = carry
                dj = jax.lax.dynamic_slice(dp, (0, j), (B, 1))
                cand = dj + S[:, j, :]
                window = jax.lax.dynamic_slice(dp, (0, j + 1), (B, K))
                better = cand > window
                dp = jax.lax.dynamic_update_slice(
                    dp, jnp.where(better, cand, window), (0, j + 1))
                bkw = jax.lax.dynamic_slice(bk, (0, j + 1), (B, K))
                bk = jax.lax.dynamic_update_slice(
                    bk, jnp.where(better, jnp.arange(1, K + 1)[None, :], bkw),
                    (0, j + 1))
                return (dp, bk), None

            (dp, bk), _ = jax.lax.scan(step, (dp0, bk0), jnp.arange(L))
            return (
                jnp.take_along_axis(dp, lens[:, None], axis=1)[:, 0].sum()
                + bk[:, : L + 1].sum().astype(jnp.float32)
            )

        def best_ms(fn):
            float(fn(S_d, I_d, lens_big))
            best = float("inf")
            for _ in range(5):
                t0 = time.time()
                float(fn(S_d, I_d, lens_big))
                best = min(best, time.time() - t0)
            return best * 1000

        pallas_vs_scan = {
            "rows": int(rows_big.shape[0]),
            "pallas_dp_ms": round(best_ms(dp_pallas), 2),
            "scan_dp_ms": round(best_ms(dp_scan), 2),
        }
    except Exception as e:  # noqa: BLE001 - explicit-kernel path optional
        pallas_vs_scan = {"error": str(e)[:160]}
    finally:
        _signal.alarm(0)
        _signal.signal(_signal.SIGALRM, prev_alarm)
    return _finish(pallas_vs_scan)


def bench_hypernet(vocab=32768, maxlen=16, hidden=768, layers=3, lengths=None):
    """Hypernet ms per 32k-token vocab, measured the way the transfer path
    actually runs: tokens length-bucketed to multiples of 8 (trailing pads
    are masked+CLS-pooled away, so trimming is exact — see
    transfer/core.py batched_inference). `lengths` is the realistic
    surface-length distribution (taken from the sampled vocab's pieces)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from zett_tpu.models import Hypernet, HypernetConfig

    cfg = HypernetConfig(
        # intermediate 2*hidden matches the reference run configs
        # (hn_intermediate_size 1536 at hidden 768, v7:gpt2.json)
        hidden_size=hidden, intermediate_size=hidden * 2, num_hidden_layers=layers,
        num_attention_heads=hidden // 64, max_position_embeddings=maxlen + 2,
        vocab_size=4096, pad_token_id=0, n_embd=hidden, hn_surface_maxlen=maxlen,
        separate_out_embeddings=True,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    hn = Hypernet(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = 8192
    if lengths is None:
        lengths = np.full(vocab, 6, dtype=np.int64)
    else:
        lengths = np.clip(np.asarray(lengths, dtype=np.int64), 1, maxlen)
        lengths = np.resize(lengths, vocab)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sf0 = rng.integers(1, 4096, size=(8, maxlen)).astype(np.int32)
        params = hn.init(
            jax.random.PRNGKey(0), jnp.asarray(sf0), jnp.asarray(np.zeros(8, np.float32))
        )
    # params resident on the chip: without this every call re-ships ~85MB of
    # fp32 params through the device tunnel (7x the actual forward time)
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)

    # sort by length, chunk at full batch size, each chunk at its max width
    # rounded to a multiple of 4 (matching batched_inference) — one partial
    # batch total; chunks of equal width share a scanned jit
    lengths = np.sort(lengths)
    lengths = np.resize(lengths, len(lengths) + (-len(lengths)) % batch)
    chunk_lens = lengths.reshape(-1, batch)
    chunk_w = np.minimum(-(-chunk_lens.max(axis=1) // 4) * 4, maxlen).astype(int)
    groups = []
    for w in np.unique(chunk_w):
        lens_w = chunk_lens[chunk_w == w].reshape(-1)
        n_batches = len(lens_w) // batch
        sf = rng.integers(1, 4096, size=(len(lens_w), int(w))).astype(np.int32)
        sf[np.arange(int(w))[None, :] >= lens_w[:, None]] = 0
        groups.append(
            (
                jnp.asarray(sf.reshape(n_batches, batch, int(w))),
                jnp.asarray(np.zeros((n_batches, batch), np.float32)),
            )
        )

    # ONE dispatch for the whole vocab: every width group is an argument of
    # a single jitted call (scan over same-width chunks inside) — per-call
    # dispatch through the device tunnel costs ~25 ms, which used to be
    # charged once per width group. NB: through the remote-device tunnel
    # block_until_ready() does NOT sync; a scalar fetch (float()) is the
    # only reliable barrier, so the jit returns a checksum.
    @jax.jit
    def fwd_all(p, *group_args):
        total = jnp.float32(0)
        for s4, pr4 in zip(group_args[::2], group_args[1::2]):
            def body(_, xs):
                ss, pp = xs
                return None, hn.apply(p, ss, pp)[0].sum()
            _, outs = jax.lax.scan(body, None, (s4, pr4))
            total = total + outs.sum().astype(jnp.float32)
        return total

    flat = [x for g in groups for x in g]
    float(fwd_all(params, *flat))  # compile
    ms_per_32k = float("inf")
    for _ in range(5):  # best-of-5: the shared chip is noisy
        t0 = time.time()
        float(fwd_all(params, *flat))
        ms_per_32k = min(ms_per_32k, (time.time() - t0) * 1000)
    n_rows = sum(int(s.shape[0] * s.shape[1]) for s, _ in groups)
    return {
        "hypernet_ms_per_32k_vocab": ms_per_32k,
        "hypernet_rows_processed": n_rows,
        "device": str(jax.devices()[0]),
    }


def bench_transfer_250k(vocab=250_000, maxlen=16, batch=16384,
                        hidden=768, layers=3):
    """BASELINE config #4 shape on the real chip: a 250k-token vocab
    transfer at the reference's batch 16384 (scripts/transfer.py:44),
    through the REAL batched_inference path. Three measurements:

      serial     — drain each dispatch before the next (pre-r4 behavior)
      pipelined  — batched_inference's depth-2 in-flight queue
      ideal      — all batches inside ONE jitted scan (zero per-batch
                   dispatch; the device-only floor)

    dispatch_overhead_pct = (pipelined - ideal) / pipelined; the r3 verdict
    target is <5% (~16 x 25 ms unamortized before)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from zett_tpu.models import Hypernet, HypernetConfig
    from zett_tpu.transfer.core import batched_inference

    cfg = HypernetConfig(
        hidden_size=hidden, intermediate_size=hidden * 2,
        num_hidden_layers=layers, num_attention_heads=hidden // 64,
        max_position_embeddings=maxlen + 2, vocab_size=4096, pad_token_id=0,
        n_embd=hidden, hn_surface_maxlen=maxlen,
        separate_out_embeddings=True,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    hn = Hypernet(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    sf = rng.integers(1, 4096, size=(vocab, maxlen)).astype(np.int32)
    sf[rng.random((vocab, maxlen)) > 0.5] = 0  # realistic pad mix
    sf[:, 0] = np.maximum(sf[:, 0], 1)
    priors = np.zeros(vocab, np.float32)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = hn.init(
            jax.random.PRNGKey(0), jnp.asarray(sf[:8]),
            jnp.asarray(priors[:8]),
        )
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)

    @jax.jit
    def predict(p, s, pr):
        out = hn.apply(p, s, pr)
        # mirror transfer()'s production bf16 result fetch (lossless for a
        # bf16 hypernet — parity pinned on-chip; halves the dominant
        # download through the tunnel)
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), out
        )

    def predict_fn(s, pr, _src, _lidx):
        return predict(params, s, pr)

    def run(pipelined: bool):
        # depth-1 drain = the serial pre-r4 behavior; monkey-level switch
        # via batch ordering is identical, so emulate serial by draining
        # through a wrapper that blocks immediately
        if pipelined:
            fn = predict_fn
        else:
            def fn(s, pr, a, b):
                out = predict_fn(s, pr, a, b)
                jax.device_get(out[0])  # force the serialization point
                return out
        t0 = time.time()
        batched_inference(
            fn, sf, priors, None, 0, batch_size=batch,
            bucket_multiple=0, rng=np.random.default_rng(7),
        )
        return (time.time() - t0) * 1000

    # each full pass moves ~800 MB through the tunnel (~35-60 s), so the
    # driver bench runs ONE pass per scheme (serial first — the link's
    # slow-drift then biases AGAINST the pipelined number, the
    # conservative direction). The careful interleaved multi-pass
    # comparison is the committed experiments/results/transfer_250k.json.
    run(True)  # compile warmup
    ms_serial = run(False)
    ms_pipelined = run(True)

    # ideal: one dispatch, scan over all full batches
    n_batches = vocab // batch
    sf_s = jnp.asarray(sf[: n_batches * batch].reshape(n_batches, batch, maxlen))
    pr_s = jnp.asarray(priors[: n_batches * batch].reshape(n_batches, batch))

    @jax.jit
    def fwd_all(p, s4, p4):
        def body(_, xs):
            ss, pp = xs
            return None, hn.apply(p, ss, pp)[0].sum()
        _, outs = jax.lax.scan(body, None, (s4, p4))
        return outs.sum().astype(jnp.float32)

    float(fwd_all(params, sf_s, pr_s))  # compile
    ms_ideal = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(fwd_all(params, sf_s, pr_s))
        ms_ideal = min(ms_ideal, (time.time() - t0) * 1000)

    # raw result-download rate: the transfer's PRODUCT is the embedding
    # matrices, and fetching them is a fixed cost no dispatch scheme can
    # remove — through the remote tunnel it dominates the wall clock
    # (on locally-attached hardware the same fetch rides PCIe at GB/s)
    out = predict(params, jnp.asarray(sf[:batch]), jnp.asarray(priors[:batch]))
    jax.device_get(out[2])  # sync
    fetch_bytes = sum(
        int(np.prod(o.shape)) * o.dtype.itemsize for o in out if o is not None
    )
    t0 = time.time()
    for o in out:
        if o is not None:
            jax.device_get(o)
    dl_s = time.time() - t0
    dl_mb_per_s = fetch_bytes / 1e6 / max(dl_s, 1e-9)
    n_batches = int(np.ceil(vocab / batch))
    ms_download_est = n_batches * fetch_bytes / 1e6 / dl_mb_per_s * 1000

    return {
        "transfer_250k_ms_pipelined": round(ms_pipelined, 1),
        "transfer_250k_ms_serial": round(ms_serial, 1),
        "transfer_250k_ms_ideal_compute": round(ms_ideal, 1),
        "transfer_250k_result_mb": round(n_batches * fetch_bytes / 1e6, 1),
        "transfer_250k_download_mb_per_s": round(dl_mb_per_s, 1),
        "transfer_250k_ms_download_est": round(ms_download_est, 1),
        "transfer_250k_rows_per_s": round(vocab / (ms_pipelined / 1000), 1),
        # overhead not explained by compute or the unavoidable result
        # download; the r3-verdict <5% dispatch-amortization target applies
        # to THIS number (the raw pipelined-vs-compute gap is link-bound
        # through the tunnel, not dispatch-bound)
        "transfer_250k_dispatch_overhead_pct": round(
            100.0
            * max(ms_pipelined - ms_ideal - ms_download_est, 0.0)
            / max(ms_pipelined, 1e-9),
            2,
        ),
        "transfer_250k_batches": n_batches,
    }


def main():
    texts = make_corpus()
    retok = bench_retokenize(texts)
    try:
        pieces, scores = bench_retokenize.last_vocab
        device_retok = bench_device_retokenize(texts[:3000], pieces, scores)
    except Exception as e:  # noqa: BLE001
        device_retok = {"device_retokenize_bytes_per_s": None, "error": str(e)}
    try:
        # realistic surface-length distribution from the sampled vocab
        pieces = bench_retokenize.last_vocab[0]
        lengths = [max(1, len(p)) for p in pieces] or None
        hyper = bench_hypernet(lengths=lengths)
    except Exception as e:  # noqa: BLE001 - bench must still print its line
        hyper = {"hypernet_ms_per_32k_vocab": None, "device": f"error: {e}"}
    try:
        transfer250 = bench_transfer_250k()
    except Exception as e:  # noqa: BLE001
        transfer250 = {"transfer_250k_error": str(e)[:160]}

    result = {
        "metric": "bytes/s/chip retokenize (noisy-sampled 32k Unigram vocab)",
        "value": round(retok["bytes_per_s"], 1),
        "unit": "bytes/s",
        "vs_baseline": round(retok["bytes_per_s"] / retok["hf_bytes_per_s"], 4),
        "token_id_exact_match": round(retok["exact_match"], 6),
        "hf_rust_bytes_per_s": round(retok["hf_bytes_per_s"], 1),
        "bytes_per_s_spread": retok.get("bytes_per_s_spread"),
        "hf_bytes_per_s_spread": retok.get("hf_bytes_per_s_spread"),
        "tokenizer_sample_time_s": round(retok["sample_time_s"], 3),
        "hypernet_ms_per_32k_vocab": (
            round(hyper["hypernet_ms_per_32k_vocab"], 2)
            if hyper["hypernet_ms_per_32k_vocab"] is not None
            else None
        ),
        "device_retokenize_bytes_per_s": (
            round(device_retok["device_retokenize_bytes_per_s"], 1)
            if device_retok.get("device_retokenize_bytes_per_s")
            else None
        ),
        "pallas_vs_scan_dp": device_retok.get("pallas_vs_scan_dp"),
        "device_retokenize_effective_bytes_per_s": (
            round(device_retok["device_retokenize_effective_bytes_per_s"], 1)
            if device_retok.get("device_retokenize_effective_bytes_per_s")
            else None
        ),
        **transfer250,
        "device": hyper["device"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
