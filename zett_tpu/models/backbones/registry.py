"""Embedding-path registry + model family dispatch.

Where each supported backbone keeps its input/output embeddings and lm-head
bias inside OUR param trees (reference concept: zett/model/__init__.py:15-41).
Paths are tuples into the nested params dict.
"""

from __future__ import annotations

from typing import Optional, Tuple

IN_EMBEDDING_PATHS = {
    "gpt2": ("transformer", "wte", "embedding"),
    "roberta": ("roberta", "word_embeddings", "embedding"),
    "xlm-roberta": ("roberta", "word_embeddings", "embedding"),
    "llama": ("model", "embed_tokens", "embedding"),
    "mistral": ("model", "embed_tokens", "embedding"),
    "qwen2": ("model", "embed_tokens", "embedding"),
    "gemma": ("model", "embed_tokens", "embedding"),
    "xglm": ("model", "embed_tokens", "embedding"),
}
# None = output embeddings tied to input (logits use embedding.T)
OUT_EMBEDDING_PATHS = {
    "gpt2": None,
    "roberta": None,
    "xlm-roberta": None,
    "llama": ("lm_head", "kernel"),
    "mistral": ("lm_head", "kernel"),
    "qwen2": ("lm_head", "kernel"),
    "gemma": None,
    "xglm": None,
}
BIAS_PATHS = {
    "gpt2": None,
    "roberta": ("lm_head_bias",),
    "xlm-roberta": ("lm_head_bias",),
    "llama": None,
    "mistral": None,
    "gemma": None,
    "xglm": None,
    "qwen2": None,
}

LLAMA_FAMILY = {"llama", "mistral", "gemma", "qwen2"}
ROBERTA_FAMILY = {"roberta", "xlm-roberta"}


def resolve_out_path(model_type: str, params: dict) -> Optional[Tuple[str, ...]]:
    """The OUT_EMBEDDING_PATHS entry iff it actually exists in this param
    tree. llama-family checkpoints saved with tie_word_embeddings=True
    carry NO lm_head (logits use embedding.T — loader.convert_llama skips
    the weight), so the static table alone misidentifies tied llama /
    mistral / qwen2 models as untied and every get_subtree walk KeyErrors.
    Presence in the tree is the ground truth."""
    path = OUT_EMBEDDING_PATHS.get(model_type)
    if path is None:
        return None
    node = params
    for p in path[:-1]:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return path if isinstance(node, dict) and path[-1] in node else None


def get_subtree(tree, path: Tuple[str, ...]):
    for p in path:
        tree = tree[p]
    return tree


def set_subtree(tree, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def pop_subtree(tree, path: Tuple[str, ...]):
    node = tree
    for p in path[:-1]:
        node = node[p]
    return node.pop(path[-1])


def build_model(model_type: str, hf_config=None, config=None, dtype=None):
    """Instantiate (module, config) for a model family."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if model_type == "gpt2":
        from .gpt2 import GPT2Config, GPT2LMHeadModel

        cfg = config or GPT2Config.from_hf(hf_config)
        return GPT2LMHeadModel(cfg, dtype=dtype), cfg
    if model_type in LLAMA_FAMILY:
        from .llama import LlamaConfig, LlamaForCausalLM

        cfg = config or LlamaConfig.from_hf(hf_config)
        return LlamaForCausalLM(cfg, dtype=dtype), cfg
    if model_type in ROBERTA_FAMILY:
        from .roberta import RobertaConfig, RobertaForMaskedLM

        cfg = config or RobertaConfig.from_hf(hf_config)
        return RobertaForMaskedLM(cfg, dtype=dtype), cfg
    if model_type == "xglm":
        from .xglm import XGLMConfig, XGLMForCausalLM

        cfg = config or XGLMConfig.from_hf(hf_config)
        return XGLMForCausalLM(cfg, dtype=dtype), cfg
    raise ValueError(f"Unsupported model type: {model_type}")


def is_output_tied(model_type: str, config=None) -> bool:
    if model_type in LLAMA_FAMILY and config is not None:
        return getattr(config, "tie_word_embeddings", False)
    return OUT_EMBEDDING_PATHS.get(model_type) is None


def headless_model(model_type: str, config, dtype=None):
    """(inner module, param-subtree key) computing final hidden states
    WITHOUT the lm head — the chunked-cross-entropy path (training engine)
    recomputes per-chunk logits from these so the full (B, L, vocab) logit
    tensor never materializes. Roberta's MLM head transform (dense -> gelu
    -> LN) is applied per chunk by the engine with the same flax modules."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if model_type == "gpt2":
        from .gpt2 import GPT2Model

        return GPT2Model(config, dtype=dtype), "transformer"
    if model_type in LLAMA_FAMILY:
        from .llama import LlamaModel

        return LlamaModel(config, dtype=dtype), "model"
    if model_type == "xglm":
        from .xglm import XGLMModel

        return XGLMModel(config, dtype=dtype), "model"
    if model_type in ROBERTA_FAMILY:
        from .roberta import RobertaModel

        return RobertaModel(config, dtype=dtype), "roberta"
    return None
