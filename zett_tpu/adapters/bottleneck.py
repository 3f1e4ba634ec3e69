"""Bottleneck adapters for transferred HF torch models.

TPU-era replacement for the `adapters` library the reference uses for
downstream evaluation (reference: zett/adapters/run_glue.py:36-37,451-453,
608-610 — `adapters.init`, `setup_adapter_training(..., "seq_bn")`,
`AdapterTrainer`). The workflow it must support is the ZeTT one
(reference: experiments/train_xlmr_adapters.sh, evaluate_xlmr_adapters.sh):

1. train a sequential-bottleneck adapter + task head on the *source* model
   (e.g. xlm-roberta-base on XNLI-en);
2. save only the adapter + head weights;
3. load them into a *transferred* model (same body, swapped embeddings /
   tokenizer) and evaluate zero-shot in another language.

Because the body weights are untouched by both the adapter training (frozen)
and the ZeTT transfer (only embeddings change), the adapter file is portable
across tokenizer transfers — that portability is the contract tested here.

`seq_bn` semantics: one bottleneck per transformer layer, applied to the
layer's hidden-state output with a residual connection:
    h' = h + up(act(down(h)))
with `down: hidden -> hidden // reduction_factor`, near-identity init
(up-projection zero-initialized) so injection is a no-op before training.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import torch
from torch import nn

ADAPTER_CONFIG_NAME = "zett_adapter_config.json"
ADAPTER_WEIGHTS_NAME = "zett_adapter.bin"

# Module names that constitute a task head in HF torch models; these are
# trained alongside the adapters and stored in the adapter file.
HEAD_MODULE_NAMES = ("classifier", "score", "qa_outputs", "classification_head")


@dataclass
class AdapterConfig:
    reduction_factor: int = 16
    non_linearity: str = "relu"
    adapter_name: str = "task"

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "AdapterConfig":
        return cls(**json.loads(text))


_ACTS = {"relu": nn.ReLU, "gelu": nn.GELU, "tanh": nn.Tanh, "silu": nn.SiLU}


class BottleneckAdapter(nn.Module):
    def __init__(self, hidden_size: int, config: AdapterConfig):
        super().__init__()
        bottleneck = max(1, hidden_size // config.reduction_factor)
        self.down = nn.Linear(hidden_size, bottleneck)
        self.act = _ACTS[config.non_linearity]()
        self.up = nn.Linear(bottleneck, hidden_size)
        # Near-identity start: adapter output is exactly zero at init.
        nn.init.normal_(self.down.weight, std=1e-3)
        nn.init.zeros_(self.down.bias)
        nn.init.zeros_(self.up.weight)
        nn.init.zeros_(self.up.bias)

    def forward(self, hidden_states: torch.Tensor) -> torch.Tensor:
        return hidden_states + self.up(self.act(self.down(hidden_states)))


class _AdaptedLayer(nn.Module):
    """Wraps one transformer layer; applies the adapter to its hidden-state
    output (first element when the layer returns a tuple)."""

    def __init__(self, layer: nn.Module, adapter: BottleneckAdapter):
        super().__init__()
        self.wrapped = layer
        self.adapter = adapter

    def forward(self, *args, **kwargs):
        out = self.wrapped(*args, **kwargs)
        if isinstance(out, tuple):
            return (self.adapter(out[0]),) + out[1:]
        return self.adapter(out)


def _find_layer_list(model: nn.Module) -> nn.ModuleList:
    """Locate the transformer layer stack across HF torch families
    (mirrors the family registry idea of models/backbones/registry.py)."""
    candidates = []
    for name, module in model.named_modules():
        if isinstance(module, nn.ModuleList) and len(module) > 0:
            leaf = name.rsplit(".", 1)[-1]
            if leaf in ("layer", "layers", "h", "block"):
                candidates.append((name, module))
    if not candidates:
        raise ValueError(
            "could not locate a transformer layer stack "
            "(looked for ModuleList named layer/layers/h/block)"
        )
    # Outermost (shortest path) stack is the encoder body.
    candidates.sort(key=lambda kv: kv[0].count("."))
    return candidates[0][1]


def _hidden_size(model: nn.Module) -> int:
    cfg = getattr(model, "config", None)
    for attr in ("hidden_size", "n_embd", "d_model"):
        if cfg is not None and getattr(cfg, attr, None):
            return getattr(cfg, attr)
    raise ValueError("could not infer hidden size from model config")


def inject_adapters(model: nn.Module, config: AdapterConfig | None = None) -> AdapterConfig:
    """Insert one bottleneck per transformer layer (in place). Idempotence is
    guarded: raises if the model already carries adapters."""
    config = config or AdapterConfig()
    if any(isinstance(m, _AdaptedLayer) for m in model.modules()):
        raise ValueError("model already has adapters injected")
    layers = _find_layer_list(model)
    hidden = _hidden_size(model)
    for i in range(len(layers)):
        layers[i] = _AdaptedLayer(layers[i], BottleneckAdapter(hidden, config))
    model._zett_adapter_config = config
    return config


def mark_only_adapters_trainable(model: nn.Module, train_head: bool = True) -> int:
    """Freeze everything except adapter (and optionally head) parameters.
    Returns the number of trainable parameters."""
    for p in model.parameters():
        p.requires_grad_(False)
    for name, module in model.named_modules():
        leaf = name.rsplit(".", 1)[-1]
        if isinstance(module, BottleneckAdapter) or (
            train_head and leaf in HEAD_MODULE_NAMES
        ):
            for p in module.parameters():
                p.requires_grad_(True)
    return sum(p.numel() for p in model.parameters() if p.requires_grad)


def _adapter_state_dict(model: nn.Module) -> dict:
    state = {}
    for name, module in model.named_modules():
        leaf = name.rsplit(".", 1)[-1]
        if isinstance(module, BottleneckAdapter) or leaf in HEAD_MODULE_NAMES:
            for pname, p in module.named_parameters(recurse=True):
                state[f"{name}.{pname}"] = p.detach().cpu()
    return state


def save_adapter(model: nn.Module, output_dir: str) -> None:
    os.makedirs(output_dir, exist_ok=True)
    config: AdapterConfig = getattr(model, "_zett_adapter_config", AdapterConfig())
    with open(os.path.join(output_dir, ADAPTER_CONFIG_NAME), "w") as f:
        f.write(config.to_json())
    torch.save(_adapter_state_dict(model), os.path.join(output_dir, ADAPTER_WEIGHTS_NAME))


def load_adapter(model: nn.Module, adapter_dir: str, strict_head: bool = False) -> AdapterConfig:
    """Inject adapters (if not present) and load weights saved by
    `save_adapter` — typically into a *different* model instance whose
    embeddings were swapped by a ZeTT transfer.

    Head weights whose shapes mismatch (e.g. a fresh head with a different
    label count) are skipped unless `strict_head`.
    """
    with open(os.path.join(adapter_dir, ADAPTER_CONFIG_NAME)) as f:
        config = AdapterConfig.from_json(f.read())
    if not any(isinstance(m, _AdaptedLayer) for m in model.modules()):
        inject_adapters(model, config)
    state = torch.load(
        os.path.join(adapter_dir, ADAPTER_WEIGHTS_NAME), weights_only=True
    )
    own = dict(model.named_parameters())
    missing, loaded = [], 0
    for key, tensor in state.items():
        if key not in own:
            missing.append(key)
            continue
        if own[key].shape != tensor.shape:
            if strict_head:
                raise ValueError(f"shape mismatch for {key}: {own[key].shape} vs {tensor.shape}")
            missing.append(key)
            continue
        with torch.no_grad():
            own[key].copy_(tensor)
        loaded += 1
    if loaded == 0:
        raise ValueError(f"no adapter weights matched the model (missing={missing[:5]}...)")
    model._zett_adapter_config = config
    return config
