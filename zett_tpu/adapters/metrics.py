"""Native metric implementations for downstream eval (the reference pulls
these from `evaluate`/`seqeval`, neither of which is available offline;
reference usage: zett/adapters/run_glue.py metric loading and
zett/adapters/run_ner.py seqeval span metrics)."""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def accuracy(preds: Sequence, labels: Sequence) -> float:
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    return float((preds == labels).mean()) if len(labels) else 0.0


def f1_binary(preds: Sequence, labels: Sequence, positive: int = 1) -> float:
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    tp = int(((preds == positive) & (labels == positive)).sum())
    fp = int(((preds == positive) & (labels != positive)).sum())
    fn = int(((preds != positive) & (labels == positive)).sum())
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom else 0.0


def matthews_corrcoef(preds: Sequence, labels: Sequence) -> float:
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    classes = np.unique(np.concatenate([preds, labels]))
    k = len(classes)
    remap = {c: i for i, c in enumerate(classes)}
    c = np.zeros((k, k), dtype=np.float64)
    for p, t in zip(preds, labels):
        c[remap[t], remap[p]] += 1
    t_sum = c.sum(axis=1)
    p_sum = c.sum(axis=0)
    n = c.sum()
    cov_tp = c.trace() * n - t_sum @ p_sum
    cov_tt = n * n - t_sum @ t_sum
    cov_pp = n * n - p_sum @ p_sum
    denom = np.sqrt(cov_tt * cov_pp)
    return float(cov_tp / denom) if denom else 0.0


def pearson(preds: Sequence, labels: Sequence) -> float:
    preds = np.asarray(preds, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.float64)
    if preds.std() == 0 or labels.std() == 0:
        return 0.0
    return float(np.corrcoef(preds, labels)[0, 1])


def spearman(preds: Sequence, labels: Sequence) -> float:
    def rank(x):
        order = np.argsort(x)
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(len(x), dtype=np.float64)
        # average ties
        x = np.asarray(x)
        for v in np.unique(x):
            mask = x == v
            ranks[mask] = ranks[mask].mean()
        return ranks

    return pearson(rank(np.asarray(preds)), rank(np.asarray(labels)))


def _extract_spans(tags: Sequence[str]) -> set:
    """BIO/BIO2 span extraction: returns {(type, start, end_exclusive)}."""
    spans = set()
    start, typ = None, None
    for i, tag in enumerate(list(tags) + ["O"]):
        if tag.startswith("B-") or tag == "O" or (
            tag.startswith("I-") and typ is not None and tag[2:] != typ
        ):
            if start is not None:
                spans.add((typ, start, i))
                start, typ = None, None
        if tag.startswith("B-"):
            start, typ = i, tag[2:]
        elif tag.startswith("I-") and start is None:
            # conventional BIO repair: I- without B- opens a span
            start, typ = i, tag[2:]
    return spans


def span_f1(
    pred_tags: List[List[str]], label_tags: List[List[str]]
) -> Dict[str, float]:
    """Entity-level precision/recall/F1 over BIO tag sequences (seqeval
    semantics, default mode)."""
    tp = fp = fn = 0
    correct_tokens = total_tokens = 0
    for preds, labels in zip(pred_tags, label_tags):
        p_spans = _extract_spans(preds)
        l_spans = _extract_spans(labels)
        tp += len(p_spans & l_spans)
        fp += len(p_spans - l_spans)
        fn += len(l_spans - p_spans)
        correct_tokens += sum(p == l for p, l in zip(preds, labels))
        total_tokens += len(labels)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "accuracy": correct_tokens / total_tokens if total_tokens else 0.0,
    }


def glue_metrics(task_name: str, preds: Sequence, labels: Sequence) -> Dict[str, float]:
    """Per-task metric selection mirroring the GLUE evaluate configs used by
    the reference (zett/adapters/run_glue.py task_to_keys at 64-74)."""
    if task_name == "stsb":
        return {"pearson": pearson(preds, labels), "spearmanr": spearman(preds, labels)}
    if task_name == "cola":
        return {"matthews_correlation": matthews_corrcoef(preds, labels)}
    out = {"accuracy": accuracy(preds, labels)}
    if task_name in ("mrpc", "qqp"):
        out["f1"] = f1_binary(preds, labels)
    return out
