"""Baseline embedding-transfer methods (non-hypernet).

Reference: scripts/transfer_lexical.py (vocab-overlap copy + FVT/BFVT
mean-of-subtokens + unk/random fallback), scripts/transfer_focus.py (FOCUS:
overlap copy + similarity-weighted combination of overlapping tokens; the
reference uses fasttext auxiliary embeddings via the deepfocus package —
offline we default to char-n-gram auxiliary embeddings, and any auxiliary
matrix can be plugged in), scripts/transfer_passthrough.py (slice the
passthrough hypernet's learned tables), scripts/apply_to_ft.py (task-vector
arithmetic to carry a fine-tune onto a tokenizer-swapped base).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..tokenization import Tokenizer


def lexical_transfer(
    source_embeddings: np.ndarray,
    source_tokenizer: Tokenizer,
    target_tokenizer: Tokenizer,
    fvt_mode: str = "no",  # "no" | "fvt" | "bfvt"
    fallback_mode: str = "unk",  # "unk" | "random"
    unk_token: str = "<unk>",
    seed: int = 0,
) -> Tuple[np.ndarray, List[int]]:
    """Copy embeddings for overlapping tokens; FVT averages source-subtoken
    embeddings for the rest; fallback fills the remainder."""
    rng = np.random.default_rng(seed)
    source_vocab = source_tokenizer.get_vocab()
    n_target = len(target_tokenizer)
    n_source = len(source_embeddings)

    if fallback_mode == "random":
        target = rng.normal(
            loc=source_embeddings.mean(0),
            scale=source_embeddings.std(0),
            size=(n_target, source_embeddings.shape[1]),
        ).astype(source_embeddings.dtype)
    else:
        unk_id = source_tokenizer.token_to_id(unk_token)
        if unk_id is None:
            unk_id = 0
        target = np.repeat(source_embeddings[[unk_id]], n_target, axis=0)

    overlap: List[int] = []
    model = source_tokenizer.model
    for i in range(n_target):
        token = target_tokenizer.id_to_token(i)
        if token is None:
            continue
        idx = source_vocab.get(token)
        if idx is not None and idx < n_source:
            overlap.append(i)
            target[i] = source_embeddings[idx]
        elif fvt_mode != "no":
            decomposed = [tid for tid, _t in model.tokenize(token)]
            if fvt_mode == "fvt" and any(t >= n_source or t < 0 for t in decomposed):
                continue
            constituents = [t for t in decomposed if 0 <= t < n_source]
            if constituents:
                overlap.append(i)
                target[i] = source_embeddings[np.asarray(constituents)].mean(0)
    return target, overlap


def char_ngram_embeddings(
    tokens: List[str], dim: int = 256, n_min: int = 2, n_max: int = 4, seed: int = 0
) -> np.ndarray:
    """Hash-based char-n-gram embeddings: the offline auxiliary space for
    FOCUS (stands in for fasttext; any matrix can be supplied instead)."""
    out = np.zeros((len(tokens), dim), dtype=np.float32)
    for i, token in enumerate(tokens):
        padded = f"<{token}>"
        n_grams = 0
        for n in range(n_min, n_max + 1):
            for j in range(len(padded) - n + 1):
                h = hash((padded[j : j + n], seed)) % dim
                out[i, h] += 1.0
                n_grams += 1
        if n_grams:
            out[i] /= np.sqrt(n_grams)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(norms, 1e-8)


def focus_transfer(
    source_embeddings: np.ndarray,
    source_tokenizer: Tokenizer,
    target_tokenizer: Tokenizer,
    auxiliary_embeddings: Optional[Dict[str, np.ndarray]] = None,
    top_k: int = 10,
    temperature: float = 0.1,
    unk_token: str = "<unk>",
) -> Tuple[np.ndarray, List[int]]:
    """FOCUS: overlapping tokens copy their source embedding; each new token
    becomes a sparsemax/softmax-weighted combination of the embeddings of
    overlapping tokens, weighted by auxiliary-space similarity."""
    source_vocab = source_tokenizer.get_vocab()
    n_target = len(target_tokenizer)
    target_tokens = [target_tokenizer.id_to_token(i) or "" for i in range(n_target)]

    overlap_ids: List[int] = []
    overlap_tokens: List[str] = []
    new_ids: List[int] = []
    target = np.zeros((n_target, source_embeddings.shape[1]), dtype=source_embeddings.dtype)
    for i, token in enumerate(target_tokens):
        idx = source_vocab.get(token)
        if idx is not None and idx < len(source_embeddings):
            target[i] = source_embeddings[idx]
            overlap_ids.append(i)
            overlap_tokens.append(token)
        else:
            new_ids.append(i)

    if new_ids and overlap_ids:
        if auxiliary_embeddings is None:
            all_tokens = overlap_tokens + [target_tokens[i] for i in new_ids]
            aux = char_ngram_embeddings(all_tokens)
            aux_overlap = aux[: len(overlap_tokens)]
            aux_new = aux[len(overlap_tokens):]
        else:
            aux_overlap = np.stack([auxiliary_embeddings[t] for t in overlap_tokens])
            aux_new = np.stack(
                [auxiliary_embeddings[target_tokens[i]] for i in new_ids]
            )
        sims = aux_new @ aux_overlap.T  # cosine (rows normalized)
        overlap_emb = target[np.asarray(overlap_ids)]
        k = min(top_k, sims.shape[1])
        top_idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        covered: List[int] = []
        for row, i in enumerate(new_ids):
            idx = top_idx[row]
            s = sims[row, idx]
            if (s <= 0).all():
                continue  # no similar anchor -> falls back to unk below
            w = np.exp((s - s.max()) / temperature)
            w /= w.sum()
            target[i] = (w[:, None] * overlap_emb[idx]).sum(0)
            covered.append(i)
        uncovered = sorted(set(new_ids) - set(covered))
    else:
        uncovered = new_ids

    if uncovered:
        unk_id = source_tokenizer.token_to_id(unk_token)
        if unk_id is None:
            unk_id = 0
        target[np.asarray(uncovered)] = source_embeddings[unk_id][None]
    return target, overlap_ids


def ofa_subword_embeddings(
    tokenizer: Tokenizer,
    word_embeddings: Dict[str, np.ndarray],
    add_prefix_space: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Subword representations in an external multilingual word-vector space:
    each word's vector is accumulated onto every subword in its encoding, then
    averaged (the WordEmbedding construction OFA performs over ColexNet
    vectors; reference: scripts/transfer_ofa.py:18-20,34-35). Returns
    (reps [vocab, dim], has_rep [vocab] bool)."""
    n = len(tokenizer)
    dim = len(next(iter(word_embeddings.values())))
    reps = np.zeros((n, dim), dtype=np.float32)
    counts = np.zeros(n, dtype=np.int64)
    for word, vec in word_embeddings.items():
        text = " " + word if add_prefix_space else word
        ids = tokenizer.encode(text).ids
        for tid in set(ids):
            if 0 <= tid < n:
                reps[tid] += vec
                counts[tid] += 1
    has_rep = counts > 0
    reps[has_rep] /= counts[has_rep, None]
    norms = np.linalg.norm(reps, axis=1, keepdims=True)
    reps = reps / np.maximum(norms, 1e-8)
    return reps, has_rep


def ofa_transfer(
    source_embeddings: np.ndarray,
    source_tokenizer: Tokenizer,
    target_tokenizer: Tokenizer,
    word_embeddings: Optional[Dict[str, np.ndarray]] = None,
    top_k: int = 10,
    temperature: float = 0.1,
    factorize_dim: Optional[int] = None,
    seed: int = 0,
) -> Tuple[np.ndarray, List[int]]:
    """OFA-style embedding initialization (reference: scripts/transfer_ofa.py,
    delegating to the external `ofa` package — re-implemented natively here):

    1. optionally factorize E_s = F · P via SVD (`keep_dim`/`factorize`);
    2. represent every subword of BOTH vocabularies in an external
       multilingual word-vector space (ColexNet in the paper; any
       `word -> vector` dict here, with hashed char-n-grams as the offline
       fallback);
    3. overlapping tokens copy their source row exactly; each new target
       token becomes a softmax(sim/temperature)-weighted sum over its top-k
       most similar source subwords' coordinate rows (vs. ALL source
       subwords — this is what distinguishes OFA from FOCUS, which anchors
       only on overlapping tokens);
    4. tokens with no external representation get random init from the
       source distribution.
    """
    rng = np.random.default_rng(seed)
    n_target = len(target_tokenizer)
    n_source = len(source_embeddings)
    source_vocab = source_tokenizer.get_vocab()
    target_tokens = [target_tokenizer.id_to_token(i) or "" for i in range(n_target)]

    if factorize_dim is not None and factorize_dim < source_embeddings.shape[1]:
        u, s, vt = np.linalg.svd(
            source_embeddings.astype(np.float64), full_matrices=False
        )
        coords = (u[:, :factorize_dim] * s[:factorize_dim]).astype(
            source_embeddings.dtype
        )
        primitive = vt[:factorize_dim].astype(source_embeddings.dtype)
    else:
        coords = source_embeddings
        primitive = None

    if word_embeddings is not None:
        src_reps, src_has = ofa_subword_embeddings(source_tokenizer, word_embeddings)
        tgt_reps, tgt_has = ofa_subword_embeddings(target_tokenizer, word_embeddings)
    else:
        source_tokens = [source_tokenizer.id_to_token(i) or "" for i in range(n_source)]
        all_reps = char_ngram_embeddings(source_tokens + target_tokens)
        src_reps, tgt_reps = all_reps[:n_source], all_reps[n_source:]
        src_has = np.linalg.norm(src_reps, axis=1) > 0
        tgt_has = np.linalg.norm(tgt_reps, axis=1) > 0
    src_has = src_has[:n_source] if len(src_has) > n_source else src_has

    target = rng.normal(
        loc=source_embeddings.mean(0),
        scale=source_embeddings.std(0),
        size=(n_target, source_embeddings.shape[1]),
    ).astype(source_embeddings.dtype)

    overlap_ids: List[int] = []
    new_with_rep: List[int] = []
    for i, token in enumerate(target_tokens):
        idx = source_vocab.get(token)
        if idx is not None and idx < n_source:
            target[i] = source_embeddings[idx]
            overlap_ids.append(i)
        elif tgt_has[i]:
            new_with_rep.append(i)

    src_ids = np.nonzero(src_has)[0]
    if new_with_rep and len(src_ids):
        sims = tgt_reps[np.asarray(new_with_rep)] @ src_reps[src_ids].T
        k = min(top_k, sims.shape[1])
        top_idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = np.take_along_axis(sims, top_idx, axis=1)
        w = np.exp((rows - rows.max(axis=1, keepdims=True)) / temperature)
        w /= w.sum(axis=1, keepdims=True)
        combined = np.einsum("nk,nkd->nd", w, coords[src_ids[top_idx]])
        if primitive is not None:
            combined = combined @ primitive
        target[np.asarray(new_with_rep)] = combined.astype(source_embeddings.dtype)
    return target, overlap_ids


def passthrough_transfer(hn_params: dict, n_tokens: int):
    """Slice the passthrough hypernet's learned tables to the tokenizer size
    (reference: scripts/transfer_passthrough.py:49-59)."""
    emb_in = np.asarray(hn_params["input_embeddings"]["embedding"])[:n_tokens]
    emb_out = None
    if "output_embeddings" in hn_params:
        emb_out = np.asarray(hn_params["output_embeddings"]["embedding"])[:n_tokens]
    return emb_in, emb_out


def apply_to_ft(
    base_params: dict,
    ft_params: dict,
    swapped_params: dict,
    model_type: str,
    lam: float,
) -> dict:
    """Task-vector arithmetic: ft + lambda*(swapped_base - base) on all
    non-embedding params, then install the swapped embeddings
    (reference: scripts/apply_to_ft.py:33-74)."""
    import jax

    from ..models.backbones.registry import (
        BIAS_PATHS,
        IN_EMBEDDING_PATHS,
        OUT_EMBEDDING_PATHS,
    )

    def flatten(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flatten(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = v
        return out

    emb_paths = {IN_EMBEDDING_PATHS[model_type]}
    if OUT_EMBEDDING_PATHS[model_type] is not None:
        emb_paths.add(OUT_EMBEDDING_PATHS[model_type])
    if BIAS_PATHS[model_type] is not None:
        emb_paths.add(BIAS_PATHS[model_type])

    flat_base = flatten(base_params)
    flat_ft = flatten(ft_params)
    flat_swapped = flatten(swapped_params)

    out = {}
    for path, ft_val in flat_ft.items():
        if path in emb_paths:
            out[path] = flat_swapped[path]
        else:
            out[path] = ft_val + lam * (flat_swapped[path] - flat_base[path])

    nested: dict = {}
    for path, v in out.items():
        node = nested
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return nested
