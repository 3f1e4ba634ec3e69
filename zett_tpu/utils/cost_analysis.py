"""Static cost analysis: XLA-reported FLOPs and parameter counts.

Reference: --do_cost_analysis (train.py:809-867) lowers+compiles the
hypernet and backbone and prints FLOPs/token + param counts, then exits.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np

import jax


def _count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def cost_analysis(fn: Callable, *example_args, n_tokens: int = 1) -> Dict[str, Any]:
    """Lower+compile `fn` and report XLA cost analysis.

    Returns {"flops": total, "flops_per_token": ..., "bytes_accessed": ...}.
    """
    compiled = jax.jit(fn).lower(*example_args).compile()
    analyses = compiled.cost_analysis()
    analysis = analyses[0] if isinstance(analyses, (list, tuple)) else analyses
    flops = float(analysis.get("flops", 0.0))
    return {
        "flops": flops,
        "flops_per_token": flops / max(n_tokens, 1),
        "bytes_accessed": float(analysis.get("bytes accessed", 0.0)),
    }


def model_cost_report(
    hypernet, hn_params, backbone, bb_params, batch, source_embeddings=None
) -> Dict[str, Any]:
    """FLOPs/token + params for the hypernet and the frozen backbone
    (reference train.py:845-866 semantics)."""
    n_tokens = int(np.prod(batch["input_ids"].shape))
    n_vocab = int(batch["target_surface_forms"].shape[0])

    hyper = cost_analysis(
        lambda p, sf, pr: hypernet.apply(p, sf, pr, source_embeddings),
        hn_params,
        batch["target_surface_forms"],
        batch["target_priors"],
        n_tokens=n_vocab,
    )
    bb = cost_analysis(
        lambda p, ids: backbone.apply({"params": p}, ids),
        bb_params,
        batch["input_ids"],
        n_tokens=n_tokens,
    )
    return {
        "hypernet_flops_per_token": hyper["flops_per_token"],
        "backbone_flops_per_token": bb["flops_per_token"],
        "hypernet_params": _count_params(hn_params),
        "backbone_params": _count_params(bb_params),
    }
