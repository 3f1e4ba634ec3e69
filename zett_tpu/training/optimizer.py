"""Optimizer assembly: param freeze labels, weight-decay mask, grad clip,
gradient accumulation (reference: train.py:591-660)."""

from __future__ import annotations

import optax
from flax import traverse_util


def _is_norm_module(segment: str) -> bool:
    """Heuristic for normalization-layer module names across our module trees
    and HF-style trees ("LayerNorm", "ln_1", "ln_f", "final_layer_norm",
    "input_layernorm", "norm", ...)."""
    s = segment.lower()
    return (
        s in ("norm", "ln")
        or s.startswith("ln_")
        or "layernorm" in s
        or "layer_norm" in s
        or "rmsnorm" in s
    )


def decay_mask_fn(params):
    """True where weight decay applies: every param except biases and any
    param living inside a normalization module. Same exemption set as the
    reference (train.py:592-606) but decided per path segment instead of by
    collecting (parent, leaf) suffix pairs."""
    flat = traverse_util.flatten_dict(params)
    mask = {
        path: path[-1] != "bias" and not any(_is_norm_module(seg) for seg in path)
        for path in flat
    }
    return traverse_util.unflatten_dict(mask)


# module names whose params never receive gradient updates regardless of the
# training regime: the affine rescalers are calibrated once at init
# (Hypernet.init_rescaler) and must stay fixed (reference semantics,
# train.py:607-622)
ALWAYS_FROZEN_MODULES = frozenset({"scaler", "in_scaler", "out_scaler"})


def get_labels(params, backbone_training: str = "no"):
    """Map every param to "train"/"freeze" for optax.multi_transform.

    The hypernet subtree trains; the frozen backbone ("inner") trains only
    under full fine-tuning; rescaler modules are always frozen.
    """
    trainable_roots = {"hypernet"}
    if backbone_training == "full":
        trainable_roots.add("inner")

    def label(path):
        if ALWAYS_FROZEN_MODULES.intersection(path):
            return "freeze"
        return "train" if path[0] in trainable_roots else "freeze"

    flat = traverse_util.flatten_dict(params)
    return traverse_util.unflatten_dict({p: label(p) for p in flat})


def build_optimizer(cfg, learning_rate_fn, labels):
    if cfg.use_adafactor:
        inner = optax.adafactor(
            learning_rate=learning_rate_fn,
            weight_decay_rate=cfg.weight_decay,
            weight_decay_mask=decay_mask_fn,
        )
    else:
        inner = optax.adamw(
            learning_rate=learning_rate_fn,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.weight_decay,
            mask=decay_mask_fn,
        )
    transforms = [optax.multi_transform({"train": inner, "freeze": optax.set_to_zero()}, labels)]
    if cfg.max_grad_norm is not None:
        transforms.insert(0, optax.clip_by_global_norm(cfg.max_grad_norm))
    optimizer = optax.chain(*transforms)
    if cfg.gradient_accumulation_steps > 1:
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=cfg.gradient_accumulation_steps)
    return optimizer
