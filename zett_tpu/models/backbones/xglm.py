"""XGLM decoder in minimal Flax (fresh implementation).

Fairseq-style pre-norm decoder: scaled embeddings + sinusoidal positions
(offset 2), learned-bias attention, final layer norm, tied lm head.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass
class XGLMConfig:
    vocab_size: int = 256008
    d_model: int = 1024
    ffn_dim: int = 4096
    num_layers: int = 24
    attention_heads: int = 16
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    tie_word_embeddings: bool = True

    @classmethod
    def from_hf(cls, hf_config) -> "XGLMConfig":
        get = lambda k, d=None: getattr(hf_config, k, d)
        return cls(
            vocab_size=get("vocab_size"),
            d_model=get("d_model"),
            ffn_dim=get("ffn_dim"),
            num_layers=get("num_layers"),
            attention_heads=get("attention_heads"),
            max_position_embeddings=get("max_position_embeddings", 2048),
            pad_token_id=get("pad_token_id", 1),
            tie_word_embeddings=get("tie_word_embeddings", True),
        )


def sinusoidal_positions(n_pos: int, dim: int, offset: int = 2) -> np.ndarray:
    """fairseq/XGLM sinusoidal table with padding-offset rows."""
    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb)
    pos = np.arange(n_pos + offset)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((n_pos + offset, 1))], axis=1)
    return table.astype(np.float32)


class XGLMLayer(nn.Module):
    config: XGLMConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias):
        cfg = self.config
        B, L, E = hidden.shape
        H = cfg.attention_heads
        hd = E // H
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="self_attn_layer_norm")(hidden)
        q = nn.Dense(E, dtype=self.dtype, name="q_proj")(h).reshape(B, L, H, hd)
        k = nn.Dense(E, dtype=self.dtype, name="k_proj")(h).reshape(B, L, H, hd)
        v = nn.Dense(E, dtype=self.dtype, name="v_proj")(h).reshape(B, L, H, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(hd) + attention_bias
        w = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, L, E)
        hidden = hidden + nn.Dense(E, dtype=self.dtype, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")(hidden)
        h = nn.Dense(cfg.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(E, dtype=self.dtype, name="fc2")(h)
        return hidden + h


class XGLMModel(nn.Module):
    config: XGLMConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, inputs_embeds=None):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = nn.Embed(
                cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="embed_tokens"
            )(input_ids.astype("i4"))
        hidden = inputs_embeds * jnp.sqrt(cfg.d_model).astype(self.dtype)
        B, L = input_ids.shape
        table = jnp.asarray(sinusoidal_positions(cfg.max_position_embeddings, cfg.d_model))
        positions = jnp.arange(L) + 2  # fairseq offset
        hidden = hidden + table[positions][None]

        causal = jnp.tril(jnp.ones((L, L), dtype=bool))[None, None]
        if attention_mask is not None:
            mask = causal & attention_mask[:, None, None, :].astype(bool)
        else:
            mask = causal
        attention_bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min)

        for i in range(cfg.num_layers):
            hidden = XGLMLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(
                hidden, attention_bias
            )
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(hidden)


class XGLMForCausalLM(nn.Module):
    """Param tree: {model: {embed_tokens, layers_i, layer_norm}} with the lm
    head tied to the embeddings (registry: IN=model/embed_tokens/embedding)."""

    config: XGLMConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, inputs_embeds=None):
        hidden = XGLMModel(self.config, dtype=self.dtype, name="model")(
            input_ids, attention_mask, inputs_embeds
        )
        embed = self.variables["params"]["model"]["embed_tokens"]["embedding"]
        return hidden @ embed.T.astype(self.dtype)
