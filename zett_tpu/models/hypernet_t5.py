"""T5-type hypernet encoder — load-time compat for `hn_model_type="t5"`
reference checkpoints (reference: zett/model/hyper_t5.py:6-447).

Our primary encoder (models/hypernet.py HypernetEncoder) is a fresh
post-LN roberta-style design; its `position_embedding_type="relative"` is
the TPU-first *functional* equivalent of the T5 variant but cannot hold T5
weights. This module reproduces the reference's FlaxHyperT5Stack semantics
exactly so the `hn_model_type="t5"` checkpoint family maps numerically:

  - pre-LN blocks with T5LayerNorm (RMS, no mean subtraction, no bias)
  - bias-free q/k/v/o projections, UNSCALED attention scores (HF T5 folds
    the 1/sqrt(d) into initialization)
  - relative attention bias computed in block 0 only and reused (with the
    additive attention mask folded in) by all later blocks
  - DenseReluDense feed-forward (relu or gated-gelu per config)
  - prior token appended with the reference's log(1e-12) normalization
    (hyper_t5.py prior_normalization_constant — the roberta variant does
    NOT normalize)
  - T5-style inter-token exchange: pre-norm on the token states, residual
    LN2 on the blocks, and the UP attention reads the CLS state only,
    broadcasting one update across every position of the row
  - final RMS LayerNorm after the block stack

Language adapters / lang-id embedding are not implemented upstream for the
t5 type (hyper_t5.py:125 "not implemented") and therefore not here either.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .hypernet import HypernetConfig


class T5LayerNorm(nn.Module):
    """RMS norm: no mean subtraction, no bias; variance in f32."""

    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", jax.nn.initializers.ones, (x.shape[-1],))
        var = jnp.power(x.astype(jnp.float32), 2).mean(axis=-1, keepdims=True)
        x = x / jnp.sqrt(var + self.eps)
        return (weight * x).astype(self.dtype)


def _t5_relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """HF T5's bidirectional bucketing, exactly (no epsilon)."""
    num_buckets = num_buckets // 2
    buckets = (relative_position > 0).astype(jnp.int32) * num_buckets
    rp = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    rp_if_large = max_exact + (
        jnp.log(rp.astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rp_if_large = jnp.minimum(rp_if_large, num_buckets - 1)
    return buckets + jnp.where(is_small, rp, rp_if_large)


class T5Attention(nn.Module):
    """Bias-free multi-head attention with unscaled scores and optional
    additive position bias (HF FlaxT5Attention semantics)."""

    config: HypernetConfig
    has_relative_attention_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states,
        attention_mask_bias=None,   # additive (B,1,1,Lk) or None
        position_bias=None,         # additive (1,H,Lq,Lk), mask already folded in
        key_value_states=None,
        deterministic: bool = True,
    ):
        cfg = self.config
        H, NH = cfg.hidden_size, cfg.num_attention_heads
        HD = H // NH
        kv = key_value_states if key_value_states is not None else hidden_states
        dense = lambda name: nn.Dense(  # noqa: E731
            H, use_bias=False, dtype=self.dtype, name=name
        )
        q = dense("q")(hidden_states)
        k = dense("k")(kv)
        v = dense("v")(kv)
        B, Lq = q.shape[0], q.shape[1]
        Lk = k.shape[1]
        q = q.reshape(B, Lq, NH, HD)
        k = k.reshape(B, Lk, NH, HD)
        v = v.reshape(B, Lk, NH, HD)

        if position_bias is None and self.has_relative_attention_bias:
            rel_table = nn.Embed(
                cfg.relative_attention_num_buckets, NH,
                embedding_init=jax.nn.initializers.normal(cfg.initializer_range),
                dtype=self.dtype, name="relative_attention_bias",
            )
            buckets = _t5_relative_position_bucket(
                jnp.arange(Lk)[None, :] - jnp.arange(Lq)[:, None],
                cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance,
            )
            position_bias = jnp.transpose(rel_table(buckets), (2, 0, 1))[None]
            if attention_mask_bias is not None:
                position_bias = position_bias + attention_mask_bias
        elif position_bias is None and attention_mask_bias is not None:
            position_bias = attention_mask_bias

        # UNSCALED scores (HF counter-scales q by sqrt(HD) before the
        # 1/sqrt(HD) inside dot_product_attention_weights)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        if position_bias is not None:
            scores = scores + position_bias.astype(scores.dtype)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        if not deterministic and cfg.attention_dropout_prob > 0.0:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - cfg.attention_dropout_prob, weights.shape
            )
            weights = weights * keep / (1.0 - cfg.attention_dropout_prob)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(B, Lq, H)
        return dense("o")(out), position_bias


class T5FF(nn.Module):
    config: HypernetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        if cfg.hidden_act == "gated-gelu":
            g = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype, name="wi_0")(x)
            lin = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype, name="wi_1")(x)
            h = nn.gelu(g, approximate=True) * lin
        else:  # relu (T5 v1.0 default)
            h = nn.relu(nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype, name="wi")(x))
        if not deterministic and cfg.hidden_dropout_prob > 0.0:
            h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=False)
        return nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype, name="wo")(h)


class T5Block(nn.Module):
    config: HypernetConfig
    has_relative_attention_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states,
        attention_mask_bias,
        position_bias,
        target_priors=None,
        inter_token_blocks=None,
        deterministic: bool = True,
    ):
        cfg = self.config
        eps = cfg.layer_norm_eps
        # pre-LN self attention + residual
        normed = T5LayerNorm(eps=eps, dtype=self.dtype, name="attn_ln")(hidden_states)
        attn_out, position_bias = T5Attention(
            cfg, has_relative_attention_bias=self.has_relative_attention_bias,
            dtype=self.dtype, name="attention",
        )(
            normed, attention_mask_bias=attention_mask_bias,
            position_bias=position_bias, deterministic=deterministic,
        )
        hidden_states = hidden_states + attn_out

        if cfg.add_inter_token_attention:
            assert inter_token_blocks is not None
            if cfg.inter_token_attention_bias_by_priors:
                bias = target_priors[None] * cfg.inter_token_attention_bias_scaler
            else:
                bias = None
            normed = T5LayerNorm(eps=eps, dtype=self.dtype, name="inter_token_ln1")(hidden_states)
            blocks_attn, _ = T5Attention(cfg, dtype=self.dtype, name="inter_token_down")(
                inter_token_blocks[None],
                position_bias=bias,  # broadcast (1, V) over heads/blocks
                key_value_states=normed[None, :, 0],
                deterministic=deterministic,
            )
            blocks = T5LayerNorm(eps=eps, dtype=self.dtype, name="inter_token_ln2")(
                inter_token_blocks + blocks_attn[0]
            )
            up_out, _ = T5Attention(cfg, dtype=self.dtype, name="inter_token_up")(
                normed[None, :, 0],
                key_value_states=blocks[None],
                deterministic=deterministic,
            )
            # one update per token row, broadcast across its positions
            hidden_states = hidden_states + up_out[0][:, None, :]

        # pre-LN feed-forward + residual
        normed = T5LayerNorm(eps=eps, dtype=self.dtype, name="ff_ln")(hidden_states)
        ff = T5FF(cfg, dtype=self.dtype, name="ff")(normed, deterministic=deterministic)
        if not deterministic and cfg.hidden_dropout_prob > 0.0:
            ff = nn.Dropout(cfg.hidden_dropout_prob)(ff, deterministic=False)
        return hidden_states + ff, position_bias


class T5CompatEncoder(nn.Module):
    """Drop-in for HypernetEncoder holding hn_model_type="t5" weights."""

    config: HypernetConfig
    dtype: Any = jnp.float32

    # reference hyper_t5.py FlaxHyperT5Stack.prior_normalization_constant
    PRIOR_NORMALIZATION = float(np.log(1e-12))

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        inputs_embeds=None,
        target_priors=None,
        lang_index=None,
        deterministic: bool = True,
        inference=None,  # accepted for Hypernet API parity; the t5-compat
        # encoder has no fused-kernel path
    ):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = nn.Embed(
                cfg.vocab_size, cfg.hidden_size,
                embedding_init=jax.nn.initializers.normal(cfg.initializer_range),
                dtype=self.dtype, name="word_embeddings",
            )(input_ids.astype("i4"))
        hidden = inputs_embeds

        if cfg.embed_target_priors:
            prior_tok = nn.Dense(
                cfg.hidden_size, dtype=self.dtype, name="prior_projection"
            )(target_priors[..., None].astype(jnp.float32) / self.PRIOR_NORMALIZATION)
            hidden = jnp.concatenate([hidden, prior_tok[:, None, :]], axis=1)
            attention_mask = jnp.concatenate(
                [attention_mask,
                 jnp.ones((hidden.shape[0], 1), dtype=attention_mask.dtype)],
                axis=1,
            )

        mask_bias = jnp.where(
            attention_mask[:, None, None, :],
            jnp.asarray(0.0, self.dtype),
            jnp.asarray(jnp.finfo(self.dtype).min, self.dtype),
        )

        inter_token_blocks = None
        if cfg.add_inter_token_attention:
            inter_token_blocks = self.param(
                "inter_token_blocks",
                jax.nn.initializers.normal(stddev=cfg.initializer_range),
                (cfg.n_inter_token_blocks, cfg.hidden_size), self.dtype,
            )

        position_bias = None
        for i in range(cfg.num_hidden_layers):
            hidden, position_bias = T5Block(
                cfg, has_relative_attention_bias=(i == 0),
                dtype=self.dtype, name=f"layer_{i}",
            )(
                hidden, mask_bias, position_bias,
                target_priors=target_priors,
                inter_token_blocks=inter_token_blocks,
                deterministic=deterministic,
            )
        hidden = T5LayerNorm(
            eps=cfg.layer_norm_eps, dtype=self.dtype, name="final_ln"
        )(hidden)
        if not deterministic and cfg.hidden_dropout_prob > 0.0:
            hidden = nn.Dropout(cfg.hidden_dropout_prob)(hidden, deterministic=False)
        return hidden
