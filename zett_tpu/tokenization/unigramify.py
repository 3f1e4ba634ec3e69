"""Unigramify: convert a BPE/WordPiece tokenizer into a Unigram tokenizer
that reproduces the original segmentations.

Reference: scripts/unigramify.py:19-369 — initial scores from the substring
prior; margin constraints "the target encoding must beat each top-n
alternative" solved as an LP with per-constraint slack and L1/Linf
regularization toward the initial scores. The reference solves with
pyomo+CPLEX; we use scipy.optimize.linprog (HiGHS), which is fully
open-source and parallel.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from .convert import convert_to_byte_level
from .core import Tokenizer
from .models import Unigram
from .priors import compute_substring_prior, get_pretoken_counts


@dataclass
class UnigramifyResult:
    tokenizer: Tokenizer
    scores: np.ndarray
    initial_scores: np.ndarray
    n_wrong_train: int
    train_accuracy: float
    valid_accuracy: Optional[float] = None
    valid_original_accuracy: Optional[float] = None
    avg_logp_diff: float = 0.0


def _ids_counts(tokens: Tuple[int, ...], max_token_length: int):
    counter = Counter(tokens)
    keys, values = zip(*counter.most_common(max_token_length))
    indices = np.zeros(max_token_length, dtype=np.int64)
    counts = np.zeros(max_token_length, dtype=np.float64)
    indices[: len(keys)] = keys
    counts[: len(values)] = values
    return indices, counts


def unigramify(
    reference: Tokenizer,
    train_texts: Iterable[str],
    valid_texts: Optional[Iterable[str]] = None,
    max_n_train_pretokens: int = 100_000,
    top_n_encodings: int = 16,
    max_token_length: int = 16,
    margin: float = 1e-3,
    regularization_strength: float = 0.01,
    norm: str = "l1",  # "l1" | "linf" | "none"
    keep_normalizer: bool = False,
    keep_pretokenizer: bool = False,
) -> UnigramifyResult:
    from scipy import sparse
    from scipy.optimize import linprog

    byte_ref, _ = convert_to_byte_level(
        reference.copy(),
        keep_normalizer=keep_normalizer,
        keep_pretokenizer=keep_pretokenizer,
    )
    ref_data = byte_ref.to_json()

    # unigram tokenizer over the byte-level vocab, initial scores from the
    # substring prior (reference get_initial_tokenizer, unigramify.py:61-97)
    vocab = byte_ref.get_vocab(with_added_tokens=False)
    inv_vocab = {v: k for k, v in vocab.items()}
    pieces = [inv_vocab[i] for i in range(len(inv_vocab))]

    uni_data = dict(ref_data)
    uni_data["model"] = {
        "type": "Unigram",
        "unk_id": None,
        "vocab": [[p, 0.0] for p in pieces],
        "byte_fallback": False,
    }
    uni_tok = Tokenizer.from_json(uni_data)

    prior, pretoken_counts = compute_substring_prior(
        uni_tok, texts=train_texts, return_pretoken_counts=True
    )
    uni_tok.model.set_scores(list(prior))
    initial_scores = np.asarray(prior, dtype=np.float64)
    n = len(initial_scores)

    top = pretoken_counts.most_common(max_n_train_pretokens)
    weights = np.array([c for _, c in top], dtype=np.float64)
    weights = weights / weights.mean() if len(weights) else weights

    # collect margin constraints: target segmentation beats each alternative
    ref_model = byte_ref.model
    uni_model: Unigram = uni_tok.model
    rows_target = []
    rows_alts: List[List[Tuple[np.ndarray, np.ndarray]]] = []
    for pretoken, _ in top:
        target = tuple(tid for tid, _tok in ref_model.tokenize(pretoken))
        rows_target.append(_ids_counts(target, max_token_length))
        alts = []
        for tokens, _score in uni_model.get_top_n_encodings(pretoken, top_n_encodings):
            if tuple(tokens) != target:
                alts.append(_ids_counts(tuple(tokens), max_token_length))
        rows_alts.append(alts)

    # LP variables: [scores (n), pretoken slacks (m), norm slacks (k)]
    m = sum(len(a) for a in rows_alts)
    k = n if norm == "l1" else (1 if norm == "linf" else 0)
    n_vars = n + m + k

    A_rows, A_cols, A_vals, b = [], [], [], []
    c = np.zeros(n_vars)
    row = 0
    slack = 0
    for i, (target_ic, alts) in enumerate(zip(rows_target, rows_alts)):
        t_idx, t_cnt = target_ic
        for a_idx, a_cnt in alts:
            # -(target · s) + (alt · s) - slack <= -margin
            coef: Dict[int, float] = {}
            for idx, cnt in zip(t_idx, t_cnt):
                if cnt > 0:
                    coef[int(idx)] = coef.get(int(idx), 0.0) - cnt
            for idx, cnt in zip(a_idx, a_cnt):
                if cnt > 0:
                    coef[int(idx)] = coef.get(int(idx), 0.0) + cnt
            for idx, v in coef.items():
                A_rows.append(row)
                A_cols.append(idx)
                A_vals.append(v)
            A_rows.append(row)
            A_cols.append(n + slack)
            A_vals.append(-1.0)
            b.append(-margin)
            c[n + slack] = weights[i]
            row += 1
            slack += 1

    if norm != "none":
        for i in range(n):
            ns = n + m + (i if norm == "l1" else 0)
            # s_i - ns <= s0_i ; -s_i - ns <= -s0_i
            A_rows += [row, row]
            A_cols += [i, ns]
            A_vals += [1.0, -1.0]
            b.append(initial_scores[i])
            row += 1
            A_rows += [row, row]
            A_cols += [i, ns]
            A_vals += [-1.0, -1.0]
            b.append(-initial_scores[i])
            row += 1
        for j in range(k):
            c[n + m + j] += regularization_strength

    A = sparse.csr_matrix(
        (A_vals, (A_rows, A_cols)), shape=(row, n_vars)
    )
    bounds = [(None, None)] * n + [(0, None)] * (m + k)
    res = linprog(c, A_ub=A, b_ub=np.asarray(b), bounds=bounds, method="highs")
    assert res.status == 0, f"LP solve failed: {res.message}"
    scores = res.x[:n]

    # special tokens keep their initial scores (reference unigramify.py:293)
    special_ids = [i for i in byte_ref.all_special_ids if i < n]
    if special_ids:
        scores[np.asarray(special_ids)] = initial_scores[np.asarray(special_ids)]
    uni_tok.model.set_scores(list(scores))

    # training segmentation accuracy
    n_wrong = 0
    for pretoken, _ in top:
        target = tuple(tid for tid, _t in ref_model.tokenize(pretoken))
        got = tuple(tid for tid, _t in uni_tok.model.tokenize(pretoken))
        if got != target:
            n_wrong += 1
    train_acc = 1.0 - n_wrong / max(len(top), 1)

    result = UnigramifyResult(
        tokenizer=uni_tok,
        scores=scores,
        initial_scores=initial_scores,
        n_wrong_train=n_wrong,
        train_accuracy=train_acc,
        avg_logp_diff=float(np.abs(scores - initial_scores).mean()),
    )

    if valid_texts is not None:
        valid_counts = get_pretoken_counts(byte_ref, valid_texts)
        n_correct = 0
        n_orig_correct = 0
        n_total = 0
        for pretoken, v in valid_counts.most_common():
            ref_ids = [tid for tid, _t in ref_model.tokenize(pretoken)]
            new_ids = [tid for tid, _t in uni_tok.model.tokenize(pretoken)]
            if not ref_ids:
                continue
            n_orig_correct += v  # byte_ref IS the target here
            if new_ids == ref_ids:
                n_correct += v
            n_total += v
        result.valid_accuracy = n_correct / max(n_total, 1)
        result.valid_original_accuracy = n_orig_correct / max(n_total, 1)
    return result


def main(argv=None):
    """CLI (reference: scripts/unigramify.py + recorded accuracies in
    scripts/unigramify.sh): convert a BPE/WordPiece tokenizer into a Unigram
    tokenizer reproducing its segmentations, validate, and save."""
    import argparse
    import json as _json
    import os as _os

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--tokenizer", required=True, help="tokenizer.json or dir")
    p.add_argument("--data", required=True, help="text file, one doc per line")
    p.add_argument("--output", required=True)
    p.add_argument("--valid-fraction", type=float, default=0.1)
    p.add_argument("--max-train-pretokens", type=int, default=100_000)
    p.add_argument("--top-n-encodings", type=int, default=16)
    p.add_argument("--margin", type=float, default=1e-3)
    p.add_argument("--regularization-strength", type=float, default=0.01)
    p.add_argument("--norm", default="l1", choices=["l1", "linf", "none"])
    args = p.parse_args(argv)

    tok_path = (
        _os.path.join(args.tokenizer, "tokenizer.json")
        if _os.path.isdir(args.tokenizer) else args.tokenizer
    )
    reference = Tokenizer.from_file(tok_path)
    with open(args.data) as f:
        texts = [line.rstrip("\n") for line in f if line.strip()]
    n_valid = max(1, int(len(texts) * args.valid_fraction))
    result = unigramify(
        reference,
        texts[n_valid:],
        valid_texts=texts[:n_valid],
        max_n_train_pretokens=args.max_train_pretokens,
        top_n_encodings=args.top_n_encodings,
        margin=args.margin,
        regularization_strength=args.regularization_strength,
        norm=args.norm,
    )
    _os.makedirs(args.output, exist_ok=True)
    result.tokenizer.save(_os.path.join(args.output, "tokenizer.json"))
    report = {
        "train_accuracy": result.train_accuracy,
        "valid_accuracy": result.valid_accuracy,
        "valid_original_accuracy": result.valid_original_accuracy,
        "avg_logp_diff": result.avg_logp_diff,
        "n_wrong_train": result.n_wrong_train,
    }
    with open(_os.path.join(args.output, "unigramify_report.json"), "w") as f:
        _json.dump(report, f, indent=2)
    print(_json.dumps(report))


if __name__ == "__main__":
    main()
