"""MLM loss/accuracy probe for transferred masked-LM models
(reference: zett/adapters/eval_mlm.py:1-76)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from ..data.mlm import MLMCollator
from ..tokenization import Tokenizer


def mlm_probe(
    apply_fn,
    params,
    tokenizer: Tokenizer,
    texts: List[str],
    block_size: int = 128,
    batch_size: int = 8,
    mlm_probability: float = 0.15,
    seed: int = 0,
) -> Dict[str, float]:
    """Mask tokens, predict, report loss + accuracy on masked positions."""
    collator = MLMCollator(mlm_probability, seed=seed)
    pad_id = tokenizer.token_to_id("<pad>") or 0
    tokenizer.enable_truncation(block_size)
    tokenizer.enable_padding(length=block_size, pad_id=pad_id, pad_token="<pad>")
    encs = tokenizer.encode_batch(texts)
    tokenizer.no_truncation()
    tokenizer.no_padding()
    input_ids = np.array([e.ids for e in encs], dtype=np.int32)
    attention_mask = np.array([e.attention_mask for e in encs], dtype=np.int32)
    masked = collator(tokenizer, input_ids)

    @jax.jit
    def step(params, ids, mask, labels):
        logits = apply_fn(params, ids, mask).astype(jnp.float32)
        label_mask = (labels != -100) & (mask == 1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_logp = jnp.take_along_axis(
            logp, jnp.maximum(labels, 0)[..., None], axis=-1
        )[..., 0]
        loss_sum = -(tok_logp * label_mask).sum()
        acc_sum = ((logits.argmax(-1) == labels) & label_mask).sum()
        return loss_sum, acc_sum, label_mask.sum()

    total_loss = total_acc = total_n = 0.0
    for start in range(0, len(input_ids), batch_size):
        sl = slice(start, start + batch_size)
        loss_sum, acc_sum, n = step(
            params,
            jnp.asarray(masked["input_ids"][sl]),
            jnp.asarray(attention_mask[sl]),
            jnp.asarray(masked["labels"][sl]),
        )
        total_loss += float(loss_sum)
        total_acc += float(acc_sum)
        total_n += float(n)
    return {
        "mlm_loss": total_loss / max(total_n, 1),
        "mlm_accuracy": total_acc / max(total_n, 1),
        "n_masked": total_n,
    }
