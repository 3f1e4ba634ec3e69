"""Zero-shot tokenizer transfer: run the hypernet over a target tokenizer's
whole vocabulary and produce ready-to-use embedding matrices for the base LM.

Reference: scripts/transfer.py:30-328 — byte-level conversion of the target
tokenizer matched to the source's special tokens, surface-form matrix, priors
from Unigram scores, sharded batched inference (optionally overlapping sampled
batches averaged per token, zett/utils.py:612-648 get_sample_indices),
special-token embedding splice-back from the source model.

TPU-native: the vocab axis is sharded over the mesh "data" axis via
NamedSharding; each batch is one jit call with static shapes.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..constants import NEGATIVE_INF_FILL_VALUE
from ..models import Hypernet, HypernetConfig
from ..tokenization import Tokenizer
from ..tokenization.convert import convert_to_byte_level
from ..tokenization.models import Unigram
from ..tokenization.surface_forms import get_surface_form_matrix


def get_sample_indices(n, p, batch_size, min_k, n_samples, rng=None):
    """Overlapping random vocab batches such that every token receives at
    least ``min_k`` hypernet predictions (to be averaged by the caller).

    Contract follows the reference's batch-sampling transfer mode
    (scripts/transfer.py:54-124 uses an equivalent helper): the coverage
    guarantee comes from ``min_k`` independent permutations of the full vocab,
    each split evenly over ``n_samples // min_k`` batch rows; leftover row
    capacity is topped up by prior-weighted sampling (p = log priors, entries
    at NEGATIVE_INF_FILL_VALUE are excluded) without replacement, skipping the
    tokens a row already holds.
    """
    rng = rng or np.random.default_rng()
    rows_per_round = n_samples // min_k
    assert rows_per_round * min_k == n_samples, (
        f"n_samples={n_samples} must be a multiple of min_k={min_k}"
    )
    assert batch_size * rows_per_round >= n, (
        "batch capacity too small to cover the vocab each round"
    )

    weights = np.exp(np.where(p > NEGATIVE_INF_FILL_VALUE, p, -np.inf))
    rows = np.empty((n_samples, batch_size), dtype=np.int32)
    for r in range(min_k):
        chunks = np.array_split(rng.permutation(n), rows_per_round)
        for j, chunk in enumerate(chunks):
            row = rows[r * rows_per_round + j]
            row[: len(chunk)] = chunk
            n_fill = batch_size - len(chunk)
            if n_fill:
                w = weights.copy()
                w[chunk] = 0.0
                row[len(chunk):] = rng.choice(
                    n, size=n_fill, p=w / w.sum(), replace=False
                )
    return rows


def batched_inference(
    predict_fn,
    surface_forms: np.ndarray,
    priors: np.ndarray,
    source_embeddings,
    lang_index,
    batch_size: int = 16384,
    do_batch_sampling: bool = False,
    min_k: int = 4,
    mesh: Optional[Mesh] = None,
    rng=None,
    bucket_multiple: int = 0,
    pad_id: int = 0,
):
    """Run the hypernet over the full vocab in fixed-size batches.

    Returns (emb_in, emb_out|None, bias) stacked over the vocab. Without batch
    sampling the vocab is shuffled, padded and chunked; with it, overlapping
    random batches are drawn and per-token predictions averaged
    (reference: scripts/transfer.py:54-124).

    bucket_multiple > 0 groups tokens by effective surface length and trims
    trailing pad columns to the next multiple (TPU optimization: trailing
    pads are attention-masked and CLS-pooled away, so trimming is exact —
    and most real vocab tokens fit in half the max width, nearly halving
    encoder FLOPs). Only applies to the non-sampling path; incompatible
    with concat_last_hidden_state pooling (caller must pass 0 then).
    """
    rng = rng or np.random.default_rng(1234)
    n = len(surface_forms)
    maxlen = surface_forms.shape[1]

    if not do_batch_sampling:
        if bucket_multiple:
            nz = surface_forms != pad_id
            any_nz = nz.any(axis=1)
            trailing = np.argmax(nz[:, ::-1], axis=1)
            # all-pad rows (fully masked attention degenerates to a uniform
            # average over width) keep the full width so their output is
            # unchanged vs. the unbucketed path
            eff_len = np.where(any_nz, maxlen - trailing, maxlen)
            # sort by length and chunk at the FULL batch size; each chunk
            # runs at its own max width (rounded up to the multiple). This
            # wastes only one partial batch total, unlike per-width grouping
            # which pads every width bucket to a full batch.
            order = np.argsort(eff_len, kind="stable")
            order = np.resize(order, len(order) + (-len(order)) % batch_size)
            batches = []
            for chunk in order.reshape(-1, batch_size):
                w = int(eff_len[chunk].max())
                w = min(-(-w // bucket_multiple) * bucket_multiple, maxlen)
                batches.append((chunk, w))
        else:
            permutation = rng.permutation(n)
            n_pad = (-n) % batch_size
            padded = np.concatenate([permutation, permutation[:n_pad]])
            batches = [(chunk, maxlen) for chunk in padded.reshape(-1, batch_size)]
        weights = np.zeros(n)
    else:
        n_samples = int(np.ceil(n / batch_size)) * min_k
        n_samples = (n_samples // min_k) * min_k
        sample_indices = get_sample_indices(n, priors, batch_size, min_k, n_samples, rng)
        batches = [(chunk, maxlen) for chunk in sample_indices]
        weights = np.zeros(n)

    emb_in_acc = None
    emb_out_acc = None
    bias_acc = None

    def drain(entry):
        nonlocal emb_in_acc, emb_out_acc, bias_acc
        batch_idx, e_in, e_out, b = entry
        e_in = np.asarray(jax.device_get(e_in), dtype=np.float32)
        e_out = (
            np.asarray(jax.device_get(e_out), dtype=np.float32)
            if e_out is not None else None
        )
        b = np.asarray(jax.device_get(b), dtype=np.float32)
        if emb_in_acc is None:
            emb_in_acc = np.zeros((n, e_in.shape[1]), dtype=np.float32)
            if e_out is not None:
                emb_out_acc = np.zeros((n, e_out.shape[1]), dtype=np.float32)
            bias_acc = np.zeros(n, dtype=np.float32)
        np.add.at(emb_in_acc, batch_idx, e_in)
        if e_out is not None:
            np.add.at(emb_out_acc, batch_idx, e_out)
        np.add.at(bias_acc, batch_idx, b)
        np.add.at(weights, batch_idx, 1.0)

    # pipelined dispatch: batch k+1 is enqueued BEFORE blocking on batch
    # k's results (jax dispatch is async — predict_fn returns immediately),
    # so the per-call device-tunnel dispatch latency (~25 ms on the remote
    # v5e) and the host-side accumulation overlap with device compute
    # instead of serializing with it. A 250k-vocab transfer at batch 16384
    # pays the dispatch floor once, not 16 times.
    from collections import deque

    inflight: deque = deque()
    for batch_idx, width in batches:
        sf = jnp.asarray(surface_forms[batch_idx][:, :width])
        pr = jnp.asarray(priors[batch_idx])
        if mesh is not None:
            sharding = NamedSharding(mesh, P("data", None))
            sf = jax.device_put(sf, sharding)
            pr = jax.device_put(pr, NamedSharding(mesh, P("data")))
        e_in, e_out, b = predict_fn(sf, pr, source_embeddings, lang_index)
        inflight.append((batch_idx, e_in, e_out, b))
        if len(inflight) >= 2:
            drain(inflight.popleft())
    while inflight:
        drain(inflight.popleft())

    weights = np.maximum(weights, 1.0)
    emb_in_acc /= weights[:, None]
    if emb_out_acc is not None:
        emb_out_acc /= weights[:, None]
    bias_acc /= weights
    return emb_in_acc, emb_out_acc, bias_acc


def transfer(
    *,
    hypernet: Hypernet,
    hn_params: dict,
    hn_tokenizer: Tokenizer,
    source_tokenizer: Tokenizer,
    source_embeddings_in: np.ndarray,
    target_tokenizer: Tokenizer,
    source_embeddings_out: Optional[np.ndarray] = None,
    lang_index: int = 0,
    batch_size: int = 16384,
    do_batch_sampling: bool = False,
    min_k: int = 4,
    mesh: Optional[Mesh] = None,
    seed: int = 1234,
    fetch_bf16: Optional[bool] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray, Tokenizer]:
    """Full transfer pipeline. Returns (emb_in, emb_out|None, bias,
    converted_target_tokenizer)."""
    cfg = hypernet.config
    rng = np.random.default_rng(seed)

    target, _ = convert_to_byte_level(
        target_tokenizer,
        match_special_tokens_to=source_tokenizer,
        make_whitespace_consistent=True,
    )

    surface_forms, n_truncated = get_surface_form_matrix(
        target, cfg.hn_surface_maxlen, hn_tokenizer
    )

    if isinstance(target.model, Unigram):
        scores = np.asarray(target.model.get_scores(), dtype=np.float32)
        priors = np.full(len(target), NEGATIVE_INF_FILL_VALUE, dtype=np.float32)
        priors[: len(scores)] = scores
    else:
        priors = np.zeros(len(target), dtype=np.float32)

    source = source_embeddings_in
    if source_embeddings_out is not None:
        source = np.concatenate([source_embeddings_in, source_embeddings_out], axis=1)
    n_pad = (-len(source)) % 128
    if n_pad:
        source = np.concatenate(
            [source, np.zeros((n_pad, source.shape[1]), dtype=source.dtype)]
        )
    # params + source embeddings live on-device once (replicated over the
    # mesh when sharded) — passing params as jit ARGUMENTS, not closure
    # constants, so repeated batches don't re-transfer them
    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        hn_params_dev = jax.device_put(hn_params, replicated)
        source_dev = jax.device_put(jnp.asarray(source), replicated)
    else:
        hn_params_dev = jax.device_put(hn_params, jax.devices()[0])
        source_dev = jax.device_put(jnp.asarray(source), jax.devices()[0])

    # fetch in bf16 when the hypernet computes in bf16 anyway: the result
    # download is the transfer wall through a thin host link (BENCH_r04:
    # 806 MB f32 at ~18-31 MB/s vs 1.2 s of compute for 250k vocab) and
    # halving the bytes halves it. The predictions carry <=8 significant
    # bf16 bits already, so the f32 fetch stores noise; the accumulate /
    # average / splice still runs f32 on host. Opt out with fetch_bf16 or
    # ZETT_TRANSFER_FETCH_F32=1.
    if fetch_bf16 is None:
        fetch_bf16 = hypernet.dtype == jnp.bfloat16 and not os.environ.get(
            "ZETT_TRANSFER_FETCH_F32"
        )

    @jax.jit
    def predict(p, sf, pr, src, lidx):
        out = hypernet.apply({"params": p}, sf, pr, src, lidx)
        if fetch_bf16:
            out = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), out
            )
        return out

    def predict_fn(sf, pr, src, lidx):
        return predict(hn_params_dev, sf, pr, src, lidx)

    emb_in, emb_out, bias = batched_inference(
        predict_fn,
        surface_forms,
        priors,
        source_dev,
        jnp.asarray(lang_index),
        batch_size=batch_size,
        do_batch_sampling=do_batch_sampling,
        min_k=min_k,
        mesh=mesh,
        rng=rng,
        # trailing-pad trimming is exact with CLS pooling; the concat-pooling
        # head consumes every position, so it keeps the full width. Forward
        # time is linear in width, so multiple-of-4 buckets (<=4 compiles for
        # maxlen 16) capture most of the padding savings.
        bucket_multiple=0 if cfg.concat_last_hidden_state else 4,
        pad_id=cfg.pad_token_id,
    )

    # special tokens: copy source embeddings directly
    # (reference: scripts/transfer.py:274-301)
    for token in target.all_special_tokens:
        tgt_id = target.token_to_id(token)
        src_id = source_tokenizer.token_to_id(token)
        if tgt_id is None or src_id is None:
            continue
        emb_in[tgt_id] = source_embeddings_in[src_id]
        if emb_out is not None and source_embeddings_out is not None:
            emb_out[tgt_id] = source_embeddings_out[src_id]
        bias[tgt_id] = 0.0
    return emb_in, emb_out, bias, target
