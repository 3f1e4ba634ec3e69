"""Llama-family decoder (llama / mistral / gemma) in minimal Flax.

Fresh implementation for TPU (no transformers dependency): RMSNorm, rotary
embeddings, (grouped-query) attention, SwiGLU MLP. Mistral differs from llama
only by GQA+sliding window (irrelevant at ZeTT's block_size<=512); gemma by
GeGLU, embedding scaling, head_dim != hidden/heads and unit-offset RMSNorm.
Weight layout mirrors the HF Flax naming so the embedding-path registry
(reference zett/model/__init__.py:15-41) carries over.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    head_dim: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # bias on q/k/v projections (qwen2: True)
    attention_out_bias: bool = False  # bias on o_proj (no family uses it;
    # qwen2 has qkv bias but NOT o bias)
    hidden_act: str = "silu"  # "silu" (llama/mistral) | "gelu" (gemma)
    scale_embeddings: bool = False  # gemma multiplies embeddings by sqrt(hidden)
    rmsnorm_unit_offset: bool = False  # gemma uses (1 + w) * norm(x)
    model_type: str = "llama"
    # rematerialize each layer in the backward pass (set by the engine from
    # TrainingConfig.remat_backbone)
    remat_blocks: bool = False

    @classmethod
    def from_hf(cls, hf_config) -> "LlamaConfig":
        get = lambda k, d=None: getattr(hf_config, k, d)
        model_type = get("model_type", "llama")
        return cls(
            vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"),
            intermediate_size=get("intermediate_size"),
            num_hidden_layers=get("num_hidden_layers"),
            num_attention_heads=get("num_attention_heads"),
            num_key_value_heads=get("num_key_value_heads"),
            head_dim=get("head_dim"),
            max_position_embeddings=get("max_position_embeddings", 4096),
            rms_norm_eps=get("rms_norm_eps", 1e-6),
            rope_theta=get("rope_theta", 10000.0),
            tie_word_embeddings=get("tie_word_embeddings", False),
            # qwen2 hard-codes q/k/v bias True and o bias False in the
            # architecture (HF modeling_qwen2 Linear(..., bias=True/False));
            # its config object carries no attention_bias attribute
            attention_bias=(
                True if model_type == "qwen2"
                else get("attention_bias", False)
            ),
            hidden_act="gelu" if model_type == "gemma" else "silu",
            scale_embeddings=model_type == "gemma",
            rmsnorm_unit_offset=model_type == "gemma",
            model_type=model_type,
        )

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def dims_per_head(self) -> int:
        return self.head_dim or (self.hidden_size // self.num_attention_heads)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    unit_offset: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", jax.nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(var + self.eps)
        w = (1.0 + weight) if self.unit_offset else weight
        return (y * w).astype(self.dtype)


def rotary_embedding(positions, dim, theta):
    """Returns (sin, cos) of shape (..., dim//2)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.sin(freqs), jnp.cos(freqs)


def apply_rotary(x, sin, cos):
    """x: (B, L, heads, head_dim); HF 'half-rotation' layout."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    sin = sin[:, :, None, :]
    cos = cos[:, :, None, :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class LlamaAttention(nn.Module):
    config: LlamaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias, positions):
        cfg = self.config
        H, hd, kvh = cfg.num_attention_heads, cfg.dims_per_head, cfg.kv_heads
        dense = lambda feats, name: nn.Dense(
            feats,
            use_bias=(
                cfg.attention_out_bias
                if name == "o_proj"
                else cfg.attention_bias
            ),
            dtype=self.dtype, name=name,
        )
        B, L, _ = hidden.shape
        q = dense(H * hd, "q_proj")(hidden).reshape(B, L, H, hd)
        k = dense(kvh * hd, "k_proj")(hidden).reshape(B, L, kvh, hd)
        v = dense(kvh * hd, "v_proj")(hidden).reshape(B, L, kvh, hd)

        sin, cos = rotary_embedding(positions, hd, cfg.rope_theta)
        q = apply_rotary(q, sin, cos)
        k = apply_rotary(k, sin, cos)

        if kvh != H:  # grouped-query: broadcast kv heads
            rep = H // kvh
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(hd)
        scores = scores + attention_bias
        weights = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(B, L, H * hd)
        return dense(cfg.hidden_size, "o_proj")(out)


class LlamaMLP(nn.Module):
    config: LlamaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        act = nn.silu if cfg.hidden_act == "silu" else (lambda y: nn.gelu(y, approximate=True))
        gate = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype, name="gate_proj")(x)
        up = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype, name="up_proj")(x)
        return nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype, name="down_proj")(act(gate) * up)


class LlamaLayer(nn.Module):
    config: LlamaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias, positions):
        cfg = self.config
        norm = lambda name: RMSNorm(
            cfg.rms_norm_eps, unit_offset=cfg.rmsnorm_unit_offset, dtype=self.dtype, name=name
        )
        h = LlamaAttention(cfg, dtype=self.dtype, name="self_attn")(
            norm("input_layernorm")(hidden), attention_bias, positions
        )
        hidden = hidden + h
        h = LlamaMLP(cfg, dtype=self.dtype, name="mlp")(
            norm("post_attention_layernorm")(hidden)
        )
        return hidden + h


class LlamaModel(nn.Module):
    config: LlamaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, inputs_embeds=None):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = nn.Embed(
                cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="embed_tokens"
            )(input_ids.astype("i4"))
        hidden = inputs_embeds
        if cfg.scale_embeddings:
            hidden = hidden * jnp.sqrt(cfg.hidden_size).astype(hidden.dtype)

        B, L = input_ids.shape
        positions = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        causal = jnp.tril(jnp.ones((L, L), dtype=bool))[None, None]
        if attention_mask is not None:
            pad = attention_mask[:, None, None, :].astype(bool)
            mask = causal & pad
        else:
            mask = causal
        attention_bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min)

        Layer = nn.remat(LlamaLayer) if cfg.remat_blocks else LlamaLayer
        for i in range(cfg.num_hidden_layers):
            hidden = Layer(cfg, dtype=self.dtype, name=f"layers_{i}")(
                hidden, attention_bias, positions
            )
        return RMSNorm(
            cfg.rms_norm_eps, unit_offset=cfg.rmsnorm_unit_offset, dtype=self.dtype, name="norm"
        )(hidden)


class LlamaForCausalLM(nn.Module):
    """Param tree: {model: {embed_tokens, layers_i, norm}, lm_head?}.

    With tied embeddings the lm_head kernel is absent and logits use the
    embedding matrix transpose (the hypernet splices emb_out there)."""

    config: LlamaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, inputs_embeds=None):
        cfg = self.config
        hidden = LlamaModel(cfg, dtype=self.dtype, name="model")(
            input_ids, attention_mask, inputs_embeds
        )
        if cfg.tie_word_embeddings:
            embed = self.variables["params"]["model"]["embed_tokens"]["embedding"]
            logits = hidden @ embed.T.astype(self.dtype)
        else:
            logits = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head"
            )(hidden)
        return logits
