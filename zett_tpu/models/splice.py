"""Splice hypernet-predicted embeddings into a frozen backbone's param tree.

Reference: train.py:998-1056 — predicted input embeddings replace the
embedding table, predicted output embeddings replace lm_head.kernel
(transposed), and the lm-head bias is replaced (zeroed or predicted).
Functional: returns a new tree sharing all unchanged leaves (cheap under
jit — XLA aliases the untouched buffers).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .backbones.registry import (
    BIAS_PATHS,
    IN_EMBEDDING_PATHS,
    OUT_EMBEDDING_PATHS,
    resolve_out_path,
)


def _copy_path(tree: dict, path) -> dict:
    """Shallow-copy the nodes along `path` so the result can be written
    without mutating the input tree."""
    new = dict(tree)
    node = new
    for p in path[:-1]:
        node[p] = dict(node[p])
        node = node[p]
    return new


def splice_embeddings(
    params: dict,
    model_type: str,
    embeddings_in: jnp.ndarray,
    embeddings_out: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
) -> dict:
    """Returns params with the vocab-dependent leaves replaced.

    embeddings_in: (V, E). embeddings_out: (V, E) or None (tied — the model's
    logits path uses embeddings_in.T, so for untied architectures pass the
    predicted output embeddings; for tied ones they are ignored).
    bias: (V,) lm-head bias or None to zero it when the arch has one.
    """
    in_path = IN_EMBEDDING_PATHS[model_type]
    out_path = resolve_out_path(model_type, params)
    bias_path = BIAS_PATHS[model_type]

    new = _copy_path(params, in_path)
    node = new
    for p in in_path[:-1]:
        node = node[p]
    node[in_path[-1]] = embeddings_in

    if out_path is not None:
        assert embeddings_out is not None, f"{model_type} has untied output embeddings"
        new = _copy_path(new, out_path)
        node = new
        for p in out_path[:-1]:
            node = node[p]
        node[out_path[-1]] = embeddings_out.T  # Dense kernel layout (in, out)

    if bias_path is not None:
        new = _copy_path(new, bias_path)
        node = new
        for p in bias_path[:-1]:
            node = node[p]
        node[bias_path[-1]] = (
            bias if bias is not None else jnp.zeros(embeddings_in.shape[0], dtype=embeddings_in.dtype)
        )
    return new


def extract_embeddings(params: dict, model_type: str, pad_to_multiple_of: int = 128):
    """Pop input/output embeddings out of a loaded backbone tree and return
    (params_without_embeddings_view, source_embeddings) where
    source_embeddings is the concat [emb_in | emb_out] padded to a multiple
    of `pad_to_multiple_of` rows (reference: train.py:320-348)."""
    import numpy as np

    in_path = IN_EMBEDDING_PATHS[model_type]
    out_path = resolve_out_path(model_type, params)

    node = params
    for p in in_path[:-1]:
        node = node[p]
    emb_in = np.asarray(node[in_path[-1]])

    if out_path is not None:
        node = params
        for p in out_path[:-1]:
            node = node[p]
        emb_out = np.asarray(node[out_path[-1]]).T  # kernel (E, V) -> (V, E)
        source = np.concatenate([emb_in, emb_out], axis=1)
    else:
        source = emb_in

    n = source.shape[0]
    if n % pad_to_multiple_of != 0:
        n_pad = pad_to_multiple_of - (n % pad_to_multiple_of)
        source = np.concatenate(
            [source, np.zeros((n_pad, source.shape[1]), dtype=source.dtype)], axis=0
        )
    return source, emb_in.shape[0]
