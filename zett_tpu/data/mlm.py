"""MLM masking collator (replaces transformers' DataCollatorForLanguageModeling
for the MLM-backbone path; reference usage: train.py inner_collator wiring)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..tokenization import Tokenizer


class MLMCollator:
    def __init__(self, mlm_probability: float = 0.15, seed: int | None = None):
        self.mlm_probability = mlm_probability
        self.rng = np.random.default_rng(seed)

    def __call__(self, tokenizer: Tokenizer, input_ids: np.ndarray) -> Dict[str, np.ndarray]:
        labels = input_ids.copy()
        special_ids = np.array(tokenizer.all_special_ids, dtype=input_ids.dtype)
        special_mask = np.isin(input_ids, special_ids)

        prob = np.full(input_ids.shape, self.mlm_probability)
        prob[special_mask] = 0.0
        masked = self.rng.random(input_ids.shape) < prob
        labels[~masked] = -100

        mask_token_id = None
        for cand in ("<mask>", "[MASK]"):
            mask_token_id = tokenizer.token_to_id(cand)
            if mask_token_id is not None:
                break
        if mask_token_id is None:
            raise ValueError("tokenizer has no mask token for MLM")

        out = input_ids.copy()
        # 80% -> [MASK]
        replace = masked & (self.rng.random(input_ids.shape) < 0.8)
        out[replace] = mask_token_id
        # 10% -> random token
        rand = masked & ~replace & (self.rng.random(input_ids.shape) < 0.5)
        out[rand] = self.rng.integers(0, len(tokenizer), size=int(rand.sum()))
        return {"input_ids": out, "labels": labels}
