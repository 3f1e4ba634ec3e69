"""Loss functions (reference: train.py:874-912 loss_fn, 1074-1147 lexical)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..constants import EPSILON


def chunked_clm_loss(hidden, head_w, logit_offset, labels, attention_mask,
                     chunk_size: int):
    """Memory-efficient CLM cross-entropy: logits are computed per
    position-chunk from the final hidden states (`hidden @ head_w.T +
    logit_offset`) inside a rematerialized scan, so the full
    (B, L, vocab) logit/grad pair never lives in HBM — that pair is what
    bounds the single-chip batch size at the 32k-vocab reference shape
    (experiments/profiles/hypernet_r3.md). Numerically identical to
    `lm_loss(logits, ..., "clm")` on the fully-materialized logits.

    hidden: (B, L, H); head_w: (V, H) — the spliced output embeddings;
    logit_offset: (V,) additive bias (vocab mask + learnable bias +
    priors), already summed."""
    B, L, H = hidden.shape
    h = hidden[:, :-1]
    y = jnp.maximum(labels[:, 1:], 0)
    m = attention_mask[:, :-1]
    L1 = L - 1
    pad = (-L1) % chunk_size
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad)))
        m = jnp.pad(m, ((0, 0), (0, pad)))
    n_chunks = (L1 + pad) // chunk_size
    # (n_chunks, B, C, ...) scan elements
    hs = h.reshape(B, n_chunks, chunk_size, H).transpose(1, 0, 2, 3)
    ys = y.reshape(B, n_chunks, chunk_size).transpose(1, 0, 2)
    ms = m.reshape(B, n_chunks, chunk_size).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_ce(h_c, y_c, m_c):
        logits = (h_c @ head_w.T.astype(h_c.dtype)).astype(jnp.float32)
        logits = logits + logit_offset.astype(jnp.float32)[None, None, :]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y_c)
        return (ce * m_c).sum()

    def body(acc, xs):
        h_c, y_c, m_c = xs
        return acc + chunk_ce(h_c, y_c, m_c), None

    total, _ = jax.lax.scan(body, jnp.float32(0.0), (hs, ys, ms))
    return total / jnp.maximum(m.sum(), 1)


def chunked_mlm_loss(hidden, head_w, logit_offset, labels, attention_mask,
                     chunk_size: int, head_fn=None):
    """MLM counterpart of chunked_clm_loss (no position shift; -100 labels
    masked). `head_fn` applies the family's pre-decoder transform per chunk
    (roberta: dense -> gelu -> LayerNorm) so the full transformed tensor
    never materializes either. XLM-R's 250k vocab makes the logit tensor
    ~8x the CLM case — this is where chunking matters most."""
    B, L, H = hidden.shape
    m = ((labels != -100) & (attention_mask == 1)).astype(jnp.float32)
    y = jnp.maximum(labels, 0)
    h = hidden
    pad = (-L) % chunk_size
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad)))
        m = jnp.pad(m, ((0, 0), (0, pad)))
    n_chunks = (L + pad) // chunk_size
    hs = h.reshape(B, n_chunks, chunk_size, H).transpose(1, 0, 2, 3)
    ys = y.reshape(B, n_chunks, chunk_size).transpose(1, 0, 2)
    ms = m.reshape(B, n_chunks, chunk_size).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_ce(h_c, y_c, m_c):
        t = head_fn(h_c) if head_fn is not None else h_c
        logits = (t @ head_w.T.astype(t.dtype)).astype(jnp.float32)
        logits = logits + logit_offset.astype(jnp.float32)[None, None, :]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y_c)
        return (ce * m_c).sum()

    def body(acc, xs):
        h_c, y_c, m_c = xs
        return acc + chunk_ce(h_c, y_c, m_c), None

    total, _ = jax.lax.scan(body, jnp.float32(0.0), (hs, ys, ms))
    return total / jnp.maximum(m.sum(), 1)


def chunked_clm_eval(hidden, head_w, logit_offset, labels, attention_mask,
                     byte_lengths, chunk_size: int):
    """Forward-only chunked CLM eval: (loss, bits-per-byte) computed without
    materializing the (B, L, vocab) logits — the eval/extra-valid path OOMs
    at exactly the large-vocab shapes (XLM-R 250k) chunking exists for
    (advisor r3). Matches lm_loss(logits, ..., "clm", with_bpb=True)."""
    B, L, H = hidden.shape
    h = hidden[:, :-1]
    y = jnp.maximum(labels[:, 1:], 0)
    m = attention_mask[:, :-1]
    L1 = L - 1
    pad = (-L1) % chunk_size
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad)))
        m = jnp.pad(m, ((0, 0), (0, pad)))
    n_chunks = (L1 + pad) // chunk_size
    hs = h.reshape(B, n_chunks, chunk_size, H).transpose(1, 0, 2, 3)
    ys = y.reshape(B, n_chunks, chunk_size).transpose(1, 0, 2)
    ms = m.reshape(B, n_chunks, chunk_size).transpose(1, 0, 2)

    def chunk_ce(h_c, y_c, m_c):
        logits = (h_c @ head_w.T.astype(h_c.dtype)).astype(jnp.float32)
        logits = logits + logit_offset.astype(jnp.float32)[None, None, :]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y_c)
        return (ce * m_c).sum(axis=-1)  # per-sequence (B,)

    def body(acc, xs):
        h_c, y_c, m_c = xs
        return acc + chunk_ce(h_c, y_c, m_c), None

    per_seq, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32), (hs, ys, ms))
    loss = per_seq.sum() / m.sum()
    bpb = _mean_bpb(per_seq, byte_lengths)
    return loss, bpb


def chunked_mlm_eval(hidden, head_w, logit_offset, labels, attention_mask,
                     chunk_size: int, head_fn=None):
    """Forward-only chunked MLM eval: (loss, accuracy) without the full
    logit tensor. Accuracy needs the argmax over the whole vocab, which is
    available inside each position chunk (chunks split L, not V)."""
    B, L, H = hidden.shape
    m = ((labels != -100) & (attention_mask == 1)).astype(jnp.float32)
    y = jnp.maximum(labels, 0)
    h = hidden
    pad = (-L) % chunk_size
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad)))
        m = jnp.pad(m, ((0, 0), (0, pad)))
    n_chunks = (L + pad) // chunk_size
    hs = h.reshape(B, n_chunks, chunk_size, H).transpose(1, 0, 2, 3)
    ys = y.reshape(B, n_chunks, chunk_size).transpose(1, 0, 2)
    ms = m.reshape(B, n_chunks, chunk_size).transpose(1, 0, 2)

    def chunk_stats(h_c, y_c, m_c):
        t = head_fn(h_c) if head_fn is not None else h_c
        logits = (t @ head_w.T.astype(t.dtype)).astype(jnp.float32)
        logits = logits + logit_offset.astype(jnp.float32)[None, None, :]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y_c)
        correct = (logits.argmax(-1) == y_c).astype(jnp.float32)
        return jnp.stack([(ce * m_c).sum(), (correct * m_c).sum()])

    def body(acc, xs):
        h_c, y_c, m_c = xs
        return acc + chunk_stats(h_c, y_c, m_c), None

    totals, _ = jax.lax.scan(body, jnp.zeros((2,), jnp.float32), (hs, ys, ms))
    loss = totals[0] / m.sum()
    acc = totals[1] / jnp.maximum(m.sum(), 1)
    return loss, acc




def _mean_bpb(per_seq_loss, byte_lengths):
    """Mean per-sequence bits-per-byte over sequences that HAVE bytes.

    Reference semantics (train.py:1237-1245) average loss/bytes per
    sequence; every reference row is a real text. Padded eval rows
    (ValidDataset fills partial batches with empty texts, byte_lengths 0)
    must not turn the mean into 0/0 = NaN — they are excluded from both
    numerator and denominator."""
    per_seq_bytes = byte_lengths.sum(-1).astype(jnp.float32)
    valid = per_seq_bytes > 0
    per_seq_bpb = jnp.where(valid, per_seq_loss / jnp.maximum(per_seq_bytes, 1.0), 0.0)
    return per_seq_bpb.sum() / jnp.maximum(valid.sum(), 1)


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
                _mean_bpb(loss.sum(-1), byte_lengths),
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
