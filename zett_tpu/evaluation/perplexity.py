"""Standalone perplexity/bits-per-char evaluation of a (transferred) LM.

Reference: eval.py:42-209 — chunked tokenization with offset mappings,
jitted loss step on a ("data","model") mesh, special tokens masked from the
loss, optional external lm-head bias added to logits; reports loss,
chars-per-token, bits-per-char and perplexity.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..tokenization import Tokenizer
from ..tokenization.fast_encode import fast_encoder_or_none


def chunked_tokenize(
    tokenizer: Tokenizer, texts: List[str], block_size: int
) -> Dict[str, np.ndarray]:
    """Tokenize, concatenate, and chunk to block_size (reference
    zett/utils.py:318-347 tokenize_function). Returns input_ids plus
    char_lengths per token (from offsets) for bits-per-char."""
    texts = [t.replace("\x00", "").strip() for t in texts]
    all_ids: List[int] = []
    all_charlens: List[int] = []
    fast = fast_encoder_or_none(tokenizer)
    if fast is not None:
        ids_arr, mask = fast.encode_batch(texts, add_special_tokens=False)
        byte_len = np.zeros(len(tokenizer), dtype=np.int32)
        for token, idx in tokenizer.get_vocab().items():
            if idx < len(byte_len):
                byte_len[idx] = len(token)
        for i in range(len(texts)):
            row = ids_arr[i][mask[i] == 1]
            all_ids.extend(int(x) for x in row)
            all_charlens.extend(int(byte_len[x]) for x in row)
    else:
        for text in texts:
            enc = tokenizer.encode(text, add_special_tokens=False)
            all_ids.extend(enc.ids)
            all_charlens.extend(e - s for s, e in enc.offsets)

    total = (len(all_ids) // block_size) * block_size
    ids = np.asarray(all_ids[:total], dtype=np.int32).reshape(-1, block_size)
    charlens = np.asarray(all_charlens[:total], dtype=np.int32).reshape(-1, block_size)
    return {"input_ids": ids, "char_lengths": charlens}


def evaluate_lm(
    apply_fn,
    params,
    data: Dict[str, np.ndarray],
    special_ids: Optional[List[int]] = None,
    external_bias: Optional[np.ndarray] = None,
    batch_size: int = 8,
) -> Dict[str, float]:
    """apply_fn(params, input_ids) -> logits. Returns loss / cpt / bpc / ppl."""
    special = jnp.asarray(special_ids or [], dtype=jnp.int32)
    bias = jnp.asarray(external_bias) if external_bias is not None else None

    @jax.jit
    def step(params, input_ids):
        logits = apply_fn(params, input_ids).astype(jnp.float32)
        if bias is not None:
            logits = logits + bias[None, None, :]
        logp = jax.nn.log_softmax(logits, axis=-1)
        labels = input_ids[:, 1:]
        tok_logp = jnp.take_along_axis(logp[:, :-1], labels[..., None], axis=-1)[..., 0]
        mask = jnp.ones_like(labels, dtype=jnp.float32)
        if len(special_ids or []):
            mask = mask * (~jnp.isin(labels, special)).astype(jnp.float32)
        return -(tok_logp * mask).sum(), mask.sum()

    total_loss = 0.0
    total_tokens = 0.0
    total_chars = 0
    n = len(data["input_ids"])
    for start in range(0, n, batch_size):
        ids = jnp.asarray(data["input_ids"][start : start + batch_size])
        loss_sum, n_tok = step(params, ids)
        total_loss += float(loss_sum)
        total_tokens += float(n_tok)
        total_chars += int(data["char_lengths"][start : start + batch_size, 1:].sum())

    loss = total_loss / max(total_tokens, 1)
    bits_per_char = total_loss / np.log(2) / max(total_chars, 1)
    return {
        "loss": loss,
        "perplexity": float(np.exp(loss)),
        "bits_per_char": bits_per_char,
        "chars_per_token": total_chars / max(total_tokens, 1),
        "n_tokens": total_tokens,
    }
