"""Surface-form matrices: encode each target-vocab token's byte string with
the hypernetwork tokenizer into a fixed-width int32 matrix.

Reference semantics: get_surface_form_matrix (zett/utils.py:651-689) and
convert_ids_to_tokens (zett/utils.py:692-701). Special tokens are encoded as
their single id in the hn tokenizer; all other tokens are byte-char strings
segmented by the hn tokenizer's model (no normalizer/pretokenizer — the
surface form is already byte-level).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import numpy as np

from .bytemaps import BYTES_TO_CHARS, CHARS_TO_BYTES
from .core import Tokenizer


def get_surface_form_matrix(
    tokenizer_or_tokens: Union[Tokenizer, Sequence[str]],
    maxlen: int,
    hn_tokenizer: Tokenizer,
    padding: int = 0,
    cache: dict = None,
) -> Tuple[np.ndarray, int]:
    """Returns (surface_forms[(vocab+padding), maxlen] int32, n_truncated).

    cache (optional): token -> tuple(ids) memo persisted by the caller.
    Sampled vocabularies repeat pieces heavily across training batches
    (Zipf), so the per-token hn-model tokenize — the dominant cost of this
    function — is only ever paid once per distinct piece."""
    if isinstance(tokenizer_or_tokens, Tokenizer):
        tok = tokenizer_or_tokens
        tokens = [tok.id_to_token(i) for i in range(len(tok))]
    else:
        tokens = list(tokenizer_or_tokens)

    vocab_size = len(tokens)
    pad_id = hn_tokenizer.token_to_id("<pad>")
    if pad_id is None:
        pad_id = 0
    special_set = set(hn_tokenizer.all_special_tokens)

    out = np.full((vocab_size + padding, maxlen), pad_id, dtype=np.int32)
    n_truncated = 0
    model = hn_tokenizer.model
    tokenize = model.tokenize
    for i, token in enumerate(tokens):
        if token is None:
            continue
        if token in special_set:
            out[i, 0] = hn_tokenizer.token_to_id(token)
            continue
        if cache is not None:
            ids = cache.get(token)
            if ids is None:
                ids = tuple(tid for tid, _ in tokenize(token))
                cache[token] = ids
        else:
            ids = [tid for tid, _ in tokenize(token)]
        if len(ids) > maxlen:
            ids = ids[:maxlen]
            n_truncated += 1
        out[i, : len(ids)] = ids
    return out, n_truncated


def convert_ids_to_tokens(ids: Sequence[int], surface_forms: np.ndarray) -> List[str]:
    """Inverse map used at transfer time (reference zett/utils.py:692-701):
    surface_forms here holds raw byte values (not hn-token ids)."""
    tokens = []
    for i in ids:
        s = "".join(BYTES_TO_CHARS[x] for x in surface_forms[i] if x != 0)
        if s == "<|endoftext|>":
            continue
        tokens.append(s)
    return tokens


def surface_forms_to_bytes(tokens: Sequence[str], maxlen: int) -> Tuple[np.ndarray, int]:
    """Encode tokens as raw byte matrices (one byte per column) — the
    hn-tokenizer-free representation used by device-side kernels."""
    out = np.zeros((len(tokens), maxlen), dtype=np.int32)
    n_truncated = 0
    for i, token in enumerate(tokens):
        bs = [CHARS_TO_BYTES[c] for c in token if c in CHARS_TO_BYTES]
        if len(bs) > maxlen:
            bs = bs[:maxlen]
            n_truncated += 1
        out[i, : len(bs)] = bs
    return out, n_truncated
