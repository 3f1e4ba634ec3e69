"""Declarative sharding rules: typed path patterns -> PartitionSpec.

Replaces the reference's regex-on-stringified-paths maps
(zett/model/__init__.py:42-118, applied via train.py:757-770) with glob
matching on path tuples. The mesh is 2-D ("data", "model"): the hypernet's
vocab fan-out and the LM batch ride "data"; tensor-parallel kernels ride
"model" (SURVEY §7.1 decision 3).
"""

from __future__ import annotations

import fnmatch
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

Rule = Tuple[Tuple[str, ...], P]


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{len(devices)} devices cannot form a {n_data}x{n_model} mesh"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def _match(path: Tuple[str, ...], pattern: Tuple[str, ...]) -> bool:
    """Pattern matches a SUFFIX of the path; '**' (only as the first element)
    is implied — every rule is a suffix rule. Each segment is an fnmatch glob."""
    if len(pattern) > len(path):
        return False
    tail = path[len(path) - len(pattern):]
    return all(fnmatch.fnmatch(p, q) for p, q in zip(tail, pattern))


def resolve_pspec(path: Tuple[str, ...], rules: Sequence[Rule]) -> P:
    for pattern, spec in rules:
        if _match(path, pattern):
            return spec
    return P()  # replicate by default


def pspec_tree(params, rules: Sequence[Rule]):
    """Map every leaf of `params` to its PartitionSpec."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_of(keypath) -> Tuple[str, ...]:
        out = []
        for k in keypath:
            if hasattr(k, "key"):
                out.append(str(k.key))
            elif hasattr(k, "idx"):
                out.append(str(k.idx))
            else:
                out.append(str(k))
        return tuple(out)

    specs = {path_of(kp): resolve_pspec(path_of(kp), rules) for kp, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: specs[path_of(kp)], params
    )


def shard_tree(params, mesh: Mesh, rules: Sequence[Rule]):
    """NamedSharding tree for `params` under `mesh`."""
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), pspec_tree(params, rules)
    )


def _pad_rank(spec: P, leaf) -> P:
    """Clip specs that have more axes than the leaf's rank (scalars etc.)."""
    rank = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))
    if len(spec) > rank:
        return P(*spec[:rank])
    return spec


def pspec_tree_ranked(params, rules: Sequence[Rule]):
    specs = pspec_tree(params, rules)
    return jax.tree_util.tree_map(_pad_rank, specs, params)


# --------------------------------------------------------------------- rules

# Hypernet parameters (our fresh module tree, zett_tpu/models/hypernet.py).
# Encoder attention/FFN kernels tensor-parallel on "model"; projection heads
# column/row split; embeddings row-sharded on "model".
HYPERNET_RULES: List[Rule] = [
    # projector blocks: dense1 column-parallel, dense2 row-parallel
    (("*dense1", "kernel"), P(None, "model")),
    (("*dense2", "kernel"), P("model", None)),
    # encoder attention
    (("attention", "query", "kernel"), P(None, "model")),
    (("attention", "key", "kernel"), P(None, "model")),
    (("attention", "value", "kernel"), P(None, "model")),
    (("attention", "out", "kernel"), P("model", None)),
    (("inter_token_*", "query", "kernel"), P(None, "model")),
    (("inter_token_*", "key", "kernel"), P(None, "model")),
    (("inter_token_*", "value", "kernel"), P(None, "model")),
    (("inter_token_*", "out", "kernel"), P("model", None)),
    # encoder FFN
    (("intermediate", "kernel"), P(None, "model")),
    (("layer_*", "output", "kernel"), P("model", None)),
    # embeddings / tables
    (("word_embeddings", "embedding"), P("model", None)),
    (("fallback_embeddings", "embedding"), P("model", None)),
    # passthrough tables
    (("input_embeddings", "embedding"), P("model", None)),
    (("output_embeddings", "embedding"), P("model", None)),
]

# Frozen-backbone tensor-parallel rules (our module trees).
BACKBONE_RULES: Dict[str, List[Rule]] = {
    "gpt2": [
        (("attn", "c_attn", "kernel"), P(None, "model")),
        (("attn", "c_proj", "kernel"), P("model", None)),
        (("c_fc", "kernel"), P(None, "model")),
        (("h_*", "c_proj", "kernel"), P("model", None)),
    ],
    "llama": [
        (("self_attn", "q_proj", "kernel"), P(None, "model")),
        (("self_attn", "k_proj", "kernel"), P(None, "model")),
        (("self_attn", "v_proj", "kernel"), P(None, "model")),
        (("self_attn", "o_proj", "kernel"), P("model", None)),
        (("mlp", "gate_proj", "kernel"), P(None, "model")),
        (("mlp", "up_proj", "kernel"), P(None, "model")),
        (("mlp", "down_proj", "kernel"), P("model", None)),
        (("lm_head", "kernel"), P(None, "model")),
    ],
    "xlm-roberta": [
        (("query", "kernel"), P(None, "model")),
        (("key", "kernel"), P(None, "model")),
        (("value", "kernel"), P(None, "model")),
        (("attention_output", "kernel"), P("model", None)),
        (("intermediate", "kernel"), P(None, "model")),
        (("layer_*", "output", "kernel"), P("model", None)),
    ],
}
BACKBONE_RULES["mistral"] = BACKBONE_RULES["llama"]
BACKBONE_RULES["qwen2"] = BACKBONE_RULES["llama"]
BACKBONE_RULES["gemma"] = BACKBONE_RULES["llama"]
BACKBONE_RULES["roberta"] = BACKBONE_RULES["xlm-roberta"]


def fsdp_rules(model_type: str) -> List[Rule]:
    """Fully-sharded variant for 7B+ backbones (SURVEY §2.3: optional FSDP
    axis): tensor-parallel kernels keep their "model" axis and additionally
    shard the other kernel dimension over "data", so every large kernel is
    fully sharded across the whole mesh."""
    out: List[Rule] = []
    for pattern, spec in BACKBONE_RULES.get(model_type, []):
        dims = list(spec)
        fsdp_spec = ["data" if d is None else d for d in dims]
        out.append((pattern, P(*fsdp_spec)))
    # embeddings: rows over data (vocab axis is large)
    out.append((("embed_tokens", "embedding"), P("data", None)))
    out.append((("wte", "embedding"), P("data", None)))
    out.append((("word_embeddings", "embedding"), P("data", None)))
    return out

# source embeddings: vocab rows over "model" (reference:
# zett/model/__init__.py:46 'source_embeddings.*' -> P("model", None))
SOURCE_EMBEDDINGS_SPEC = P("model", None)

# Batch arrays (reference keys_to_model_shard, zett/utils.py:757-782 — but on
# our 2-D mesh the leading axis rides "data"): the hypernet's vocab batch and
# the LM token batch are both data-parallel.
BATCH_PSPECS: Dict[str, P] = {
    "target_surface_forms": P("data", None),
    "target_priors": P("data"),
    "mask": P("data"),
    "ids_to_embed": P("data"),
    "input_ids": P("data", None),
    "attention_mask": P("data", None),
    "labels": P("data", None),
    "byte_lengths": P("data", None),
    "special_indices": P(),
    "special_indices_in_reference": P(),
    "lang_index": P(),
}


def batch_pspecs(batch: dict) -> dict:
    return {k: BATCH_PSPECS.get(k, P()) for k in batch}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the canonical shardings."""
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "shape"):
            out[k] = v
            continue
        spec = _pad_rank(BATCH_PSPECS.get(k, P()), v)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
