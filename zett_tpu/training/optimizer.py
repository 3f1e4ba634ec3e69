"""Optimizer assembly: param freeze labels, weight-decay mask, grad clip,
gradient accumulation (reference: train.py:591-660)."""

from __future__ import annotations

import optax
from flax import traverse_util


def decay_mask_fn(params):
    """No weight decay for biases and LayerNorm params (train.py:592-606)."""
    flat_params = traverse_util.flatten_dict(params)
    layer_norm_candidates = ["layernorm", "layer_norm", "ln"]
    layer_norm_named_params = {
        layer[-2:]
        for norm_name in layer_norm_candidates
        for layer in flat_params
        if norm_name in "".join(layer).lower()
    }
    flat_mask = {
        path: (path[-1] != "bias" and path[-2:] not in layer_norm_named_params)
        for path in flat_params
    }
    return traverse_util.unflatten_dict(flat_mask)


def get_labels(params, backbone_training: str = "no"):
    """'train' iff hypernet param (or backbone under full fine-tuning);
    rescalers are always frozen (train.py:607-622)."""
    flat_params = traverse_util.flatten_dict(params)

    def label(path):
        if len(path) >= 2 and path[-2] in {"scaler", "in_scaler", "out_scaler"}:
            return "freeze"
        if path[0] == "hypernet" or (path[0] == "inner" and backbone_training == "full"):
            return "train"
        return "freeze"

    return traverse_util.unflatten_dict({p: label(p) for p in flat_params})


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
