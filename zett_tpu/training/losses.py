"""Loss functions (reference: train.py:874-912 loss_fn, 1074-1147 lexical)."""

from __future__ import annotations

import jax.numpy as jnp
import optax

from ..constants import EPSILON


def lm_loss(logits, labels, attention_mask, loss_mode: str, byte_lengths=None, with_bpb=False):
    if loss_mode == "clm":
        shift_logits = logits[..., :-1, :]
        shift_labels = labels[..., 1:]
        shift_mask = attention_mask[..., :-1]
        loss = (
            optax.softmax_cross_entropy_with_integer_labels(
                shift_logits, jnp.maximum(shift_labels, 0)
            )
            * shift_mask
        )
        if with_bpb:
            return (
                loss.sum() / shift_mask.sum(),
                (loss.sum(-1) / byte_lengths.sum(-1)).mean(),
            )
        return loss.sum() / shift_mask.sum()
    if loss_mode == "mlm":
        label_mask = jnp.where((labels != -100) & (attention_mask == 1), 1.0, 0.0)
        loss = (
            optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(labels, 0)
            )
            * label_mask
        )
        loss = loss.sum() / label_mask.sum()
        if with_bpb:
            raise NotImplementedError("bpb for mlm")
        return loss
    raise ValueError(f"unknown loss mode {loss_mode}")


def _distance_fn(kind: str):
    if kind == "mse":
        return lambda x, y: jnp.square(x - y).sum(axis=-1)
    if kind == "rmse":
        return lambda x, y: jnp.linalg.norm(x - y, axis=-1)
    if kind == "huber":
        HUBER_DELTA = 1e-3
        HUBER_CORRECTION = 30
        return (
            lambda x, y: optax.huber_loss(x, y, delta=HUBER_DELTA).sum(axis=-1)
            / HUBER_DELTA
            / HUBER_CORRECTION
        )
    raise ValueError(f"unknown lexical loss kind {kind}")


def lexical_loss(
    predicted_in,
    predicted_out,
    target_in,
    target_out,
    overlap_mask,
    kind: str = "mse",
):
    """Auxiliary loss anchoring predictions of single-source-token targets to
    the source embeddings, normalized by target norm (train.py:1099-1141)."""
    distance = _distance_fn(kind)
    loss_in = distance(predicted_in, target_in) * overlap_mask
    loss_in = (
        loss_in.sum()
        / (overlap_mask.sum() + EPSILON)
        / jnp.linalg.norm(target_in, axis=1).mean()
    )
    if target_out is not None and predicted_out is not None:
        loss_out = distance(predicted_out, target_out) * overlap_mask
        loss_out = (
            loss_out.sum()
            / (overlap_mask.sum() + EPSILON)
            / jnp.linalg.norm(target_out, axis=1).mean()
        )
        return (loss_in + loss_out) / 2.0
    return loss_in
