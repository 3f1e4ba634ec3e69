"""Downstream evaluation of transferred models with bottleneck adapters
(reference: zett/adapters/ — run_glue.py, run_ner.py, eval_mlm.py; the MLM
probe lives in zett_tpu.evaluation.mlm_probe).

Torch-native replacement for the `adapters` library: train a sequential
bottleneck adapter + head on the source model, then load it unchanged into a
ZeTT-transferred model (swapped embeddings) for zero-shot cross-tokenizer
downstream eval.
"""

from .bottleneck import (
    AdapterConfig,
    BottleneckAdapter,
    inject_adapters,
    load_adapter,
    mark_only_adapters_trainable,
    save_adapter,
)
from .metrics import glue_metrics, span_f1

__all__ = [
    "AdapterConfig",
    "BottleneckAdapter",
    "inject_adapters",
    "load_adapter",
    "mark_only_adapters_trainable",
    "save_adapter",
    "glue_metrics",
    "span_f1",
]
