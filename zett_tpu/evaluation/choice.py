"""Zero-shot multiple-choice evaluation: lm_eval-style loglikelihood scoring.

The reference's downstream zero-shot numbers come from the external
EleutherAI harness (`lm_eval`, experiments/eval_english.sh:1-6 and the
XCOPA/m_MMLU loops in eval_multilingual_mistral.sh) — unavailable offline.
Transferred models are standard HF dirs so `lm_eval` still works on them
externally; this module provides the same scoring natively for the tasks'
common shape: every choice is scored by the summed log-probability of its
continuation tokens given the context, reported as

  acc       argmax of raw continuation log-likelihood
  acc_norm  argmax of log-likelihood / continuation byte length
            (lm_eval's byte-length normalization)

Task format (jsonl, one item per line):
  {"query": "...", "choices": ["...", "..."], "gold": 0}

CLI:  python -m zett_tpu.evaluation.choice --model DIR --data task.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..tokenization import Tokenizer


def _encode_pair(tokenizer: Tokenizer, context: str, continuation: str):
    """lm_eval convention: tokenize the WHOLE string and split at the
    context's token count (continuation tokens may differ from encoding the
    continuation alone — merges can cross the boundary)."""
    ctx_ids = tokenizer.encode(context, add_special_tokens=False).ids
    all_ids = tokenizer.encode(context + continuation, add_special_tokens=False).ids
    # longest shared prefix: the boundary token may merge across the split
    n_ctx = 0
    while (
        n_ctx < min(len(ctx_ids), len(all_ids))
        and ctx_ids[n_ctx] == all_ids[n_ctx]
    ):
        n_ctx += 1
    # at least one context token must remain to predict from (and at least
    # one continuation token must be scored)
    n_ctx = max(1, min(n_ctx, len(all_ids) - 1))
    return all_ids, n_ctx, all_ids[n_ctx:]


def score_loglikelihoods(
    apply_fn: Callable,
    params,
    tokenizer: Tokenizer,
    requests: Sequence[Tuple[str, str]],
    batch_size: int = 8,
    max_length: int = 1024,
) -> List[Dict[str, float]]:
    """For each (context, continuation): summed log-prob of the continuation
    tokens given everything before them. Returns dicts with ll, n_tokens,
    n_bytes, greedy (whether every continuation token is the argmax)."""
    encoded = []
    for context, continuation in requests:
        all_ids, n_ctx, cont_ids = _encode_pair(tokenizer, context, continuation)
        all_ids = all_ids[-max_length:]  # keep the continuation, clip context
        n_ctx = max(1, len(all_ids) - len(cont_ids))
        encoded.append((all_ids, n_ctx, len(continuation.encode("utf-8"))))

    results: List[Dict[str, float]] = []
    jit_apply = jax.jit(apply_fn)

    def bucket_width(n: int) -> int:
        # pad every batch to a power-of-2 bucket so the jitted apply
        # compiles O(log max_length) times, not once per distinct batch
        # width (advisor r3: long tasks recompiled on nearly every batch)
        w = 32
        while w < n:
            w *= 2
        return min(w, max(max_length, n))

    for lo in range(0, len(encoded), batch_size):
        chunk = encoded[lo : lo + batch_size]
        width = bucket_width(max(len(ids) for ids, _, _ in chunk))
        # fixed row count as well: the final partial batch must not compile
        # its own program (padded rows are simply never read back)
        batch = np.zeros((batch_size, width), dtype=np.int32)
        for r, (ids, _, _) in enumerate(chunk):
            batch[r, : len(ids)] = ids
        logits = np.asarray(
            jit_apply(params, jnp.asarray(batch)), dtype=np.float32
        )
        logprobs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        logprobs = np.asarray(logprobs)
        for r, (ids, n_ctx, n_bytes) in enumerate(chunk):
            # token at position t is predicted by logits at t-1
            positions = np.arange(n_ctx, len(ids))
            token_ids = np.asarray(ids[n_ctx:], dtype=np.int64)
            row_lp = logprobs[r, positions - 1, token_ids]
            greedy = bool(
                (logprobs[r, positions - 1].argmax(-1) == token_ids).all()
            )
            results.append({
                "ll": float(row_lp.sum()),
                "n_tokens": int(len(token_ids)),
                "n_bytes": int(n_bytes),
                "greedy": greedy,
            })
    return results


def evaluate_choice_task(
    apply_fn, params, tokenizer, items: Sequence[dict],
    batch_size: int = 8, max_length: int = 1024,
) -> Dict[str, float]:
    """items: [{"query", "choices", "gold"}]. Returns acc / acc_norm."""
    requests = []
    spans = []
    for item in items:
        start = len(requests)
        for choice in item["choices"]:
            requests.append((item["query"], choice))
        spans.append((start, len(requests), int(item["gold"])))
    scores = score_loglikelihoods(
        apply_fn, params, tokenizer, requests,
        batch_size=batch_size, max_length=max_length,
    )
    n_correct = n_correct_norm = 0
    for start, stop, gold in spans:
        lls = [scores[i]["ll"] for i in range(start, stop)]
        norm = [
            scores[i]["ll"] / max(scores[i]["n_bytes"], 1)
            for i in range(start, stop)
        ]
        n_correct += int(int(np.argmax(lls)) == gold)
        n_correct_norm += int(int(np.argmax(norm)) == gold)
    n = len(spans)
    return {
        "acc": n_correct / max(n, 1),
        "acc_norm": n_correct_norm / max(n, 1),
        "n_items": n,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--data", required=True, help="jsonl: {query, choices, gold}")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-length", type=int, default=1024)
    p.add_argument("--max-items", type=int, default=None)
    args = p.parse_args(argv)

    from ..models.backbones.loader import load_backbone_params
    from ..models.backbones.registry import build_model

    with open(os.path.join(args.model, "config.json")) as f:
        config_json = json.load(f)

    class _Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

    module, config = build_model(config_json["model_type"], hf_config=_Cfg(config_json))
    params = load_backbone_params(args.model, config_json["model_type"], config)
    tokenizer = Tokenizer.from_file(
        args.tokenizer or os.path.join(args.model, "tokenizer.json")
    )

    items = []
    with open(args.data) as f:
        for line in f:
            if line.strip():
                items.append(json.loads(line))
    if args.max_items:
        items = items[: args.max_items]

    def apply_fn(params, input_ids):
        return module.apply({"params": params}, input_ids)

    metrics = evaluate_choice_task(
        apply_fn, params, tokenizer, items,
        batch_size=args.batch_size, max_length=args.max_length,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
