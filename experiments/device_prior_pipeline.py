"""End-to-end on-device prior pipeline (VERDICT r2 item 8): the psum
counting path as the production path for a training-config corpus.

Flow (what `compute_prior --device` does, driven end-to-end):
  1. take a minted artifact tokenizer from the flagship config's
     extra_valid set (artifacts/tokenizers/gpt2_raw) and a multi-batch
     corpus (the big fixture, ~6 MB / ~13k texts),
  2. count token usage ON DEVICE — batched Viterbi + backpointer-chain
     histogram, sharded over the mesh's data axis, one psum reduce;
     only the (V,) counts leave the chips,
  3. compare EXACTLY against the host oracle (native C++ encode of the
     same deduped pretoken multiset) at every device count,
  4. report per-device-count wall time and the collective bytes XLA
     inserts (parsed from the compiled HLO), then write priors.npy via the
     same laplace-smoothing the host path uses.

Virtual CPU mesh caveat: wall-clock beyond the host's physical cores is not
meaningful; the portable numbers are exactness and collective bytes (one
psum of V int32 counts per chunk, independent of corpus size — the whole
point of reducing counts instead of gathering ids).

Writes experiments/results/device_priors.{md,json}.
Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python experiments/device_prior_pipeline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from zett_tpu.csrc import host_lib
    from zett_tpu.ops.device_viterbi import count_tokens_device
    from zett_tpu.parallel import make_mesh
    from zett_tpu.tokenization import Tokenizer
    from zett_tpu.tokenization.bytemaps import CHARS_TO_BYTES
    from zett_tpu.tokenization.priors import get_pretoken_counts
    from fixtures import _make_big_corpus

    tok_dir = os.path.join(REPO, "artifacts", "tokenizers", "en_raw")
    tokenizer = Tokenizer.from_file(os.path.join(tok_dir, "tokenizer.json"))
    texts = _make_big_corpus()
    n_bytes = sum(len(t.encode()) for t in texts)
    print(f"corpus: {len(texts)} texts, {n_bytes/1e6:.1f} MB; "
          f"tokenizer: {len(tokenizer)} pieces (artifacts/tokenizers/en_raw)")

    # pieces + pretoken multiset in the tokenizer's byte domain (exactly what
    # compute_prior --device constructs)
    special = set(tokenizer.all_special_tokens)
    scores = tokenizer.model.get_scores()
    pieces = []
    for i in range(len(scores)):
        t = tokenizer.id_to_token(i) or ""
        pieces.append(
            b"" if (t in special or not t)
            else bytes(CHARS_TO_BYTES[c] for c in t)
        )
    t0 = time.time()
    pretok_counts = {
        bytes(CHARS_TO_BYTES[c] for c in p): int(w)
        for p, w in get_pretoken_counts(tokenizer, texts).items()
    }
    t_pretok = time.time() - t0
    total_occurrences = sum(pretok_counts.values())
    print(f"{len(pretok_counts)} unique pretokens, {total_occurrences} occurrences "
          f"({t_pretok:.1f}s host pretokenize)")

    # host oracle: native C++ encode of the SAME deduped multiset
    native = host_lib.NativeUnigram(pieces, scores, unk_id=-1)
    keys = list(pretok_counts)
    t0 = time.time()
    segs = native.encode_pretokens(keys)
    host_counts = np.zeros(len(pieces), dtype=np.int64)
    for k, seg in zip(keys, segs):
        w = pretok_counts[k]
        for pid in seg:
            if pid >= 0:
                host_counts[pid] += w
    t_host = time.time() - t0
    print(f"host oracle: {t_host:.2f}s")

    results = {"corpus_bytes": n_bytes, "unique_pretokens": len(pretok_counts),
               "total_occurrences": int(total_occurrences),
               "vocab": len(pieces), "host_count_s": round(t_host, 2),
               "per_device_count": {}}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n_data=n, n_model=1, devices=jax.devices()[:n]) if n > 1 else None
        t0 = time.time()
        counts = count_tokens_device(pieces, scores, pretok_counts, mesh=mesh,
                                     max_pretoken_len=48)
        dt = time.time() - t0
        exact = bool((counts == host_counts).all())
        # collective traffic: the psum moves the (V,) int32 histogram once
        # per chunk per reduction step — report the compiled-HLO number
        coll = None
        if mesh is not None:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P
            import jax.numpy as jnp
            from bench_scale import _collective_bytes
            from zett_tpu.ops.device_viterbi import (
                build_vocab_table, count_token_usage, pack_pretokens, viterbi_device,
            )

            table = build_vocab_table(pieces, scores)
            rows, lens = pack_pretokens(keys[: 8 * 64], 48)
            w = np.ones(len(lens), dtype=np.int32)
            tab = jnp.asarray(table.table)
            unk = min(scores) - 10.0

            def _count(r, l, w, t):
                _, bk, bi = viterbi_device(r, l, t, table.salt, unk, K=16)
                return jax.lax.psum(
                    count_token_usage(bk, bi, l, len(pieces), weights=w), "data")

            fn = jax.jit(shard_map(_count, mesh=mesh,
                                   in_specs=(P("data"), P("data"), P("data"), P()),
                                   out_specs=P()))
            compiled = fn.lower(jnp.asarray(rows), jnp.asarray(lens),
                                jnp.asarray(w), tab).compile()
            coll = _collective_bytes(compiled)
        results["per_device_count"][n] = {
            "exact_vs_host": exact,
            "wall_s": round(dt, 2),
            "collective_bytes_per_chunk": coll,
        }
        print(f"n={n}: exact={exact} wall={dt:.2f}s "
              f"coll={coll['total'] if coll else 0} B/chunk")
        assert exact, f"device counts diverge from host at n={n}"

    # finish the production artifact exactly like compute_prior --device
    priors = host_counts.astype(np.float64) + 1.0
    priors /= priors.sum()
    results["priors_logprob_range"] = [float(np.log(priors).min()),
                                       float(np.log(priors).max())]

    out_dir = os.path.join(REPO, "experiments", "results")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "device_priors.json"), "w") as f:
        json.dump(results, f, indent=1)
    with open(os.path.join(out_dir, "device_priors.md"), "w") as f:
        f.write(_md(results))
    print("wrote experiments/results/device_priors.{md,json}")


def _md(r):
    lines = [
        "# On-device prior pipeline (psum counting as the production path)",
        "",
        "`compute_prior --device` end-to-end over the big corpus with the",
        "minted `artifacts/tokenizers/en_raw` tokenizer: Viterbi + token-usage",
        "histogram on the chips, one psum over the mesh data axis, only the",
        "(V,) counts leave the devices. Host oracle: native C++ encode of the",
        "identical deduped pretoken multiset.",
        "",
        f"Corpus {r['corpus_bytes']/1e6:.1f} MB, {r['unique_pretokens']} unique"
        f" pretokens / {r['total_occurrences']} occurrences, vocab {r['vocab']}.",
        "",
        "| devices | exact vs host | wall (s) | collective B/chunk (psum) |",
        "|---|---|---|---|",
    ]
    for n, m in r["per_device_count"].items():
        c = m["collective_bytes_per_chunk"]
        lines.append(
            f"| {n} | {m['exact_vs_host']} | {m['wall_s']} | "
            f"{c['total'] if c else 0} |"
        )
    lines += [
        "",
        "Virtual CPU mesh: wall-clock is not meaningful beyond the host's",
        "cores; the portable facts are bit-exactness at every device count and",
        "the collective volume — one (V,) int32 histogram per chunk regardless",
        "of corpus size (counts reduce on-chip; ids never move).",
        "",
    ]
    return "\n".join(lines)


if __name__ == "__main__":
    main()
