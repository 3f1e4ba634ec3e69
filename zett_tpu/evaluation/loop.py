"""In-training eval loop (reference: train.py:1307-1395 eval_loop).

Iterates fixed-tokenizer validation collators first (caching the hypernet's
predicted embeddings across batches — the tokenizer does not change, so the
vocab-level forward runs once), then the sampled-tokenizer loader; aggregates
metrics per tokenizer and per language.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, Optional

import numpy as np


def eval_loop(
    trainer,
    eval_batches: Iterable[dict],
    name: str = "eval",
    max_batches: Optional[int] = None,
    fixed_tokenizer: bool = False,
) -> Dict[str, float]:
    """With fixed_tokenizer=True the hypernet's vocab forward runs once on
    the first batch and is reused (the tokenizer — hence surface forms and
    priors — does not change across batches; reference train.py:1354-1358)."""
    sums: Dict[str, float] = defaultdict(float)
    counts: Dict[str, int] = defaultdict(int)
    per_lang: Dict[str, Dict[str, float]] = defaultdict(lambda: defaultdict(float))
    per_lang_counts: Dict[str, int] = defaultdict(int)
    cached_embeddings = None

    for i, batch in enumerate(eval_batches):
        if max_batches is not None and i >= max_batches:
            break
        lang = batch.get("lang_code") or "all"
        device_batch = trainer._device_batch(batch)
        if fixed_tokenizer:
            if cached_embeddings is None:
                cached_embeddings = trainer.compute_embeddings(trainer.state, device_batch)
            metrics = trainer.eval_step_cached(
                trainer.state, device_batch, *cached_embeddings
            )
        else:
            metrics = trainer.eval_step(trainer.state, device_batch)
        for k, v in metrics.items():
            v = float(v)
            sums[k] += v
            counts[k] += 1
            per_lang[lang][k] += v
        per_lang_counts[lang] += 1
        if "metrics" in batch:
            for k, v in batch["metrics"].items():
                sums[k] += float(v)
                counts[k] += 1

    out = {f"{name}/{k}": sums[k] / counts[k] for k in sums}
    for lang, lang_sums in per_lang.items():
        n = per_lang_counts[lang]
        for k, v in lang_sums.items():
            out[f"{name}/{lang}_{k}"] = v / n
    return out
