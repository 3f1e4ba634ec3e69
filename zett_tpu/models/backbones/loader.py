"""HF checkpoint loading: torch safetensors/bin or flax msgpack -> our trees.

The reference loads HF Flax models directly (train.py:304-313, zett/utils.py:
721-742 load_params); we own the model definitions, so checkpoints are mapped
by explicit per-family name tables instead. Inverse mappings support PyTorch
export (reference scripts/convert_to_pt.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a HF checkpoint directory into a flat name->numpy dict."""
    index_st = os.path.join(path, "model.safetensors.index.json")
    single_st = os.path.join(path, "model.safetensors")
    torch_bin = os.path.join(path, "pytorch_model.bin")
    flax_msgpack = os.path.join(path, "flax_model.msgpack")

    if os.path.exists(index_st):
        from safetensors.numpy import load_file

        with open(index_st) as f:
            index = json.load(f)
        out: Dict[str, np.ndarray] = {}
        for shard in sorted(set(index["weight_map"].values())):
            out.update(load_file(os.path.join(path, shard)))
        return out
    if os.path.exists(single_st):
        from safetensors.numpy import load_file

        return load_file(single_st)
    if os.path.exists(torch_bin):
        import torch

        sd = torch.load(torch_bin, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    if os.path.exists(flax_msgpack):
        from flax import serialization, traverse_util

        with open(flax_msgpack, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        flat = traverse_util.flatten_dict(tree, sep=".")
        return {k: np.asarray(v) for k, v in flat.items()}
    raise FileNotFoundError(f"No checkpoint found in {path}")


def _strip_prefix(sd: Dict[str, np.ndarray], *prefixes) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def _nest(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def convert_gpt2(sd: Dict[str, np.ndarray], config) -> dict:
    sd = _strip_prefix(sd, "")
    flat: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k in ("lm_head.weight",) and config.tie_word_embeddings:
            continue
        if k.endswith(".attn.bias") or k.endswith(".attn.masked_bias"):
            continue  # causal-mask buffers
        if k == "transformer.wte.weight":
            flat["transformer/wte/embedding"] = v
        elif k == "transformer.wpe.weight":
            flat["transformer/wpe/embedding"] = v
        elif k == "transformer.ln_f.weight":
            flat["transformer/ln_f/scale"] = v
        elif k == "transformer.ln_f.bias":
            flat["transformer/ln_f/bias"] = v
        elif k == "lm_head.weight":
            flat["lm_head/kernel"] = v.T
        elif k.startswith("transformer.h."):
            parts = k.split(".")
            i, rest = parts[2], parts[3:]
            base = f"transformer/h_{i}"
            name = ".".join(rest)
            if name == "ln_1.weight":
                flat[f"{base}/ln_1/scale"] = v
            elif name == "ln_1.bias":
                flat[f"{base}/ln_1/bias"] = v
            elif name == "ln_2.weight":
                flat[f"{base}/ln_2/scale"] = v
            elif name == "ln_2.bias":
                flat[f"{base}/ln_2/bias"] = v
            elif name == "attn.c_attn.weight":
                flat[f"{base}/attn/c_attn/kernel"] = v  # Conv1D already (in,out)
            elif name == "attn.c_attn.bias":
                flat[f"{base}/attn/c_attn/bias"] = v
            elif name == "attn.c_proj.weight":
                flat[f"{base}/attn/c_proj/kernel"] = v
            elif name == "attn.c_proj.bias":
                flat[f"{base}/attn/c_proj/bias"] = v
            elif name == "mlp.c_fc.weight":
                flat[f"{base}/c_fc/kernel"] = v
            elif name == "mlp.c_fc.bias":
                flat[f"{base}/c_fc/bias"] = v
            elif name == "mlp.c_proj.weight":
                flat[f"{base}/c_proj/kernel"] = v
            elif name == "mlp.c_proj.bias":
                flat[f"{base}/c_proj/bias"] = v
    return _nest(flat)


def convert_llama(sd: Dict[str, np.ndarray], config) -> dict:
    flat: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "model.embed_tokens.weight":
            flat["model/embed_tokens/embedding"] = v
        elif k == "model.norm.weight":
            flat["model/norm/weight"] = v
        elif k == "lm_head.weight":
            if not config.tie_word_embeddings:
                flat["lm_head/kernel"] = v.T
        elif k.startswith("model.layers."):
            parts = k.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            base = f"model/layers_{i}"
            if rest.endswith("layernorm.weight"):
                name = rest.rsplit(".", 1)[0]
                flat[f"{base}/{name}/weight"] = v
            elif rest.endswith("_proj.weight"):
                scope = "self_attn" if "self_attn" in rest else "mlp"
                proj = rest.split(".")[-2]
                flat[f"{base}/{scope}/{proj}/kernel"] = v.T
            elif rest.endswith("_proj.bias"):
                scope = "self_attn" if "self_attn" in rest else "mlp"
                proj = rest.split(".")[-2]
                flat[f"{base}/{scope}/{proj}/bias"] = v
    return _nest(flat)


def convert_roberta(sd: Dict[str, np.ndarray], config) -> dict:
    flat: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("position_ids"):
            continue
        if k == "roberta.embeddings.word_embeddings.weight":
            flat["roberta/word_embeddings/embedding"] = v
        elif k == "roberta.embeddings.position_embeddings.weight":
            flat["roberta/position_embeddings/embedding"] = v
        elif k == "roberta.embeddings.token_type_embeddings.weight":
            flat["roberta/token_type_embeddings/embedding"] = v
        elif k == "roberta.embeddings.LayerNorm.weight":
            flat["roberta/embeddings_ln/scale"] = v
        elif k == "roberta.embeddings.LayerNorm.bias":
            flat["roberta/embeddings_ln/bias"] = v
        elif k == "lm_head.dense.weight":
            flat["lm_head_dense/kernel"] = v.T
        elif k == "lm_head.dense.bias":
            flat["lm_head_dense/bias"] = v
        elif k == "lm_head.layer_norm.weight":
            flat["lm_head_ln/scale"] = v
        elif k == "lm_head.layer_norm.bias":
            flat["lm_head_ln/bias"] = v
        elif k == "lm_head.bias":
            flat["lm_head_bias"] = v
        elif k == "lm_head.decoder.weight":
            continue  # tied
        elif k.startswith("roberta.encoder.layer."):
            parts = k.split(".")
            i = parts[3]
            rest = ".".join(parts[4:])
            base = f"roberta/layer_{i}"
            table = {
                "attention.self.query.weight": (f"{base}/query/kernel", True),
                "attention.self.query.bias": (f"{base}/query/bias", False),
                "attention.self.key.weight": (f"{base}/key/kernel", True),
                "attention.self.key.bias": (f"{base}/key/bias", False),
                "attention.self.value.weight": (f"{base}/value/kernel", True),
                "attention.self.value.bias": (f"{base}/value/bias", False),
                "attention.output.dense.weight": (f"{base}/attention_output/kernel", True),
                "attention.output.dense.bias": (f"{base}/attention_output/bias", False),
                "attention.output.LayerNorm.weight": (f"{base}/attention_ln/scale", False),
                "attention.output.LayerNorm.bias": (f"{base}/attention_ln/bias", False),
                "intermediate.dense.weight": (f"{base}/intermediate/kernel", True),
                "intermediate.dense.bias": (f"{base}/intermediate/bias", False),
                "output.dense.weight": (f"{base}/output/kernel", True),
                "output.dense.bias": (f"{base}/output/bias", False),
                "output.LayerNorm.weight": (f"{base}/output_ln/scale", False),
                "output.LayerNorm.bias": (f"{base}/output_ln/bias", False),
            }
            hit = table.get(rest)
            if hit is not None:
                name, transpose = hit
                flat[name] = v.T if transpose else v
    return _nest(flat)


def convert_xglm(sd: Dict[str, np.ndarray], config) -> dict:
    flat: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "model.embed_tokens.weight":
            flat["model/embed_tokens/embedding"] = v
        elif k == "model.layer_norm.weight":
            flat["model/layer_norm/scale"] = v
        elif k == "model.layer_norm.bias":
            flat["model/layer_norm/bias"] = v
        elif k == "lm_head.weight" or "embed_positions" in k:
            continue  # tied head / sinusoidal table recomputed
        elif k.startswith("model.layers."):
            parts = k.split(".")
            i = parts[2]
            rest = parts[3:]
            base = f"model/layers_{i}"
            if rest[0] == "self_attn":
                is_w = rest[2] == "weight"
                flat[f"{base}/{rest[1]}/{'kernel' if is_w else 'bias'}"] = v.T if is_w else v
            elif rest[0] in ("self_attn_layer_norm", "final_layer_norm"):
                flat[f"{base}/{rest[0]}/{'scale' if rest[1] == 'weight' else 'bias'}"] = v
            elif rest[0] in ("fc1", "fc2"):
                is_w = rest[1] == "weight"
                flat[f"{base}/{rest[0]}/{'kernel' if is_w else 'bias'}"] = v.T if is_w else v
    return _nest(flat)


CONVERTERS = {
    "gpt2": convert_gpt2,
    "llama": convert_llama,
    "mistral": convert_llama,
    "qwen2": convert_llama,
    "gemma": convert_llama,
    "roberta": convert_roberta,
    "xlm-roberta": convert_roberta,
    "xglm": convert_xglm,
}


# ------------------------------------------------------------------ inverse
def _flatten(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def invert_gpt2(params: dict, config) -> Dict[str, np.ndarray]:
    flat = _flatten(params)
    sd: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        parts = k.split("/")
        if k == "transformer/wte/embedding":
            sd["transformer.wte.weight"] = v
            if config.tie_word_embeddings:
                sd["lm_head.weight"] = v
        elif k == "transformer/wpe/embedding":
            sd["transformer.wpe.weight"] = v
        elif k == "lm_head/kernel":
            sd["lm_head.weight"] = v.T
        elif parts[1] == "ln_f":
            sd[f"transformer.ln_f.{'weight' if parts[2] == 'scale' else 'bias'}"] = v
        elif parts[1].startswith("h_"):
            i = parts[1][2:]
            rest = parts[2:]
            if rest[0] in ("ln_1", "ln_2"):
                sd[f"transformer.h.{i}.{rest[0]}.{'weight' if rest[1] == 'scale' else 'bias'}"] = v
            elif rest[0] == "attn":
                name = "weight" if rest[2] == "kernel" else "bias"
                sd[f"transformer.h.{i}.attn.{rest[1]}.{name}"] = v
            elif rest[0] in ("c_fc", "c_proj"):
                name = "weight" if rest[1] == "kernel" else "bias"
                sd[f"transformer.h.{i}.mlp.{rest[0]}.{name}"] = v
    return sd


def invert_llama(params: dict, config) -> Dict[str, np.ndarray]:
    flat = _flatten(params)
    sd: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        parts = k.split("/")
        if k == "model/embed_tokens/embedding":
            sd["model.embed_tokens.weight"] = v
            if config.tie_word_embeddings:
                sd["lm_head.weight"] = v
        elif k == "model/norm/weight":
            sd["model.norm.weight"] = v
        elif k == "lm_head/kernel":
            sd["lm_head.weight"] = v.T
        elif parts[1].startswith("layers_"):
            i = parts[1][len("layers_"):]
            rest = parts[2:]
            if rest[0].endswith("layernorm"):
                sd[f"model.layers.{i}.{rest[0]}.weight"] = v
            else:  # self_attn / mlp projections
                name = "weight" if rest[2] == "kernel" else "bias"
                val = v.T if rest[2] == "kernel" else v
                sd[f"model.layers.{i}.{rest[0]}.{rest[1]}.{name}"] = val
    return sd


def invert_roberta(params: dict, config) -> Dict[str, np.ndarray]:
    flat = _flatten(params)
    sd: Dict[str, np.ndarray] = {}
    emb_key = "roberta/word_embeddings/embedding"
    for k, v in flat.items():
        parts = k.split("/")
        if k == emb_key:
            sd["roberta.embeddings.word_embeddings.weight"] = v
            sd["lm_head.decoder.weight"] = v
        elif k == "roberta/position_embeddings/embedding":
            sd["roberta.embeddings.position_embeddings.weight"] = v
        elif k == "roberta/token_type_embeddings/embedding":
            sd["roberta.embeddings.token_type_embeddings.weight"] = v
        elif parts[:2] == ["roberta", "embeddings_ln"]:
            sd[f"roberta.embeddings.LayerNorm.{'weight' if parts[2] == 'scale' else 'bias'}"] = v
        elif k.startswith("lm_head_dense/"):
            name = "weight" if parts[1] == "kernel" else "bias"
            sd[f"lm_head.dense.{name}"] = v.T if name == "weight" else v
        elif k.startswith("lm_head_ln/"):
            sd[f"lm_head.layer_norm.{'weight' if parts[1] == 'scale' else 'bias'}"] = v
        elif k == "lm_head_bias":
            sd["lm_head.bias"] = v
            sd["lm_head.decoder.bias"] = v
        elif parts[1].startswith("layer_"):
            i = parts[1][len("layer_"):]
            base = f"roberta.encoder.layer.{i}"
            rest = parts[2:]
            inv = {
                "query": "attention.self.query",
                "key": "attention.self.key",
                "value": "attention.self.value",
                "attention_output": "attention.output.dense",
                "attention_ln": "attention.output.LayerNorm",
                "intermediate": "intermediate.dense",
                "output": "output.dense",
                "output_ln": "output.LayerNorm",
            }
            hf_name = inv[rest[0]]
            if rest[1] == "kernel":
                sd[f"{base}.{hf_name}.weight"] = v.T
            elif rest[1] == "scale":
                sd[f"{base}.{hf_name}.weight"] = v
            else:
                sd[f"{base}.{hf_name}.bias"] = v
    return sd


INVERTERS = {
    "gpt2": invert_gpt2,
    "llama": invert_llama,
    "mistral": invert_llama,
    "qwen2": invert_llama,
    "gemma": invert_llama,
    "roberta": invert_roberta,
    "xlm-roberta": invert_roberta,
}


def save_hf_model(path: str, params: dict, model_type: str, config, config_json: dict = None):
    """Write a transferred model as an HF-format checkpoint
    (model.safetensors + config.json)."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    sd = INVERTERS[model_type](params, config)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(path, "model.safetensors"))
    if config_json is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config_json, f, indent=2)


def load_backbone_params(path: str, model_type: str, config) -> dict:
    sd = load_hf_state_dict(path)
    converter = CONVERTERS.get(model_type)
    if converter is None:
        raise ValueError(f"No weight converter for model type {model_type}")
    return converter(sd, config)
