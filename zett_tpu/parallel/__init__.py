"""Distributed/sharding layer: 2-D ("data","model") mesh + declarative rules."""

from .sharding import (
    BACKBONE_RULES,
    BATCH_PSPECS,
    HYPERNET_RULES,
    SOURCE_EMBEDDINGS_SPEC,
    batch_pspecs,
    make_mesh,
    pspec_tree,
    pspec_tree_ranked,
    resolve_pspec,
    shard_batch,
    shard_tree,
)

__all__ = [
    "BACKBONE_RULES",
    "BATCH_PSPECS",
    "HYPERNET_RULES",
    "SOURCE_EMBEDDINGS_SPEC",
    "batch_pspecs",
    "make_mesh",
    "pspec_tree",
    "pspec_tree_ranked",
    "resolve_pspec",
    "shard_batch",
    "shard_tree",
]
