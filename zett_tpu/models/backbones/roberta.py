"""(XLM-)RoBERTa MLM encoder in minimal Flax (fresh implementation).

Param tree mirrors HF Flax naming ({roberta: {embeddings, encoder: {layer_i}},
lm_head}) so the embedding-path registry entries
('roberta/embeddings/word_embeddings/embedding', lm_head bias — reference
zett/model/__init__.py:17-18,35-36) carry over.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass
class RobertaConfig:
    vocab_size: int = 250002
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    # rematerialize each layer in the backward pass (set by the engine from
    # TrainingConfig.remat_backbone)
    remat_blocks: bool = False
    pad_token_id: int = 1

    @classmethod
    def from_hf(cls, hf_config) -> "RobertaConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            type_vocab_size=hf_config.type_vocab_size,
            layer_norm_eps=hf_config.layer_norm_eps,
            pad_token_id=hf_config.pad_token_id,
        )


class RobertaLayer(nn.Module):
    config: RobertaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias):
        cfg = self.config
        B, L, E = hidden.shape
        H = cfg.num_attention_heads
        hd = E // H
        q = nn.Dense(E, dtype=self.dtype, name="query")(hidden).reshape(B, L, H, hd)
        k = nn.Dense(E, dtype=self.dtype, name="key")(hidden).reshape(B, L, H, hd)
        v = nn.Dense(E, dtype=self.dtype, name="value")(hidden).reshape(B, L, H, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(hd) + attention_bias
        weights = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(B, L, E)
        attn = nn.Dense(E, dtype=self.dtype, name="attention_output")(attn)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attention_ln")(attn + hidden)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(hidden)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(E, dtype=self.dtype, name="output")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="output_ln")(h + hidden)


class RobertaModel(nn.Module):
    config: RobertaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, inputs_embeds=None):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = nn.Embed(
                cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="word_embeddings"
            )(input_ids.astype("i4"))
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), dtype=jnp.int32)
        # roberta's position ids start at pad_token_id+1 and skip PAD TOKEN
        # positions (computed from input_ids, not the attention mask — HF
        # create_position_ids_from_input_ids semantics)
        not_pad = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        positions = jnp.cumsum(not_pad, axis=1) * not_pad + cfg.pad_token_id
        pos_embeds = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
            name="position_embeddings",
        )(positions.astype("i4"))
        type_embeds = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
            name="token_type_embeddings",
        )(jnp.zeros_like(input_ids, dtype=jnp.int32))
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embeddings_ln")(
            inputs_embeds + pos_embeds + type_embeds
        )
        attention_bias = jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, jnp.finfo(jnp.float32).min
        )
        Layer = nn.remat(RobertaLayer) if cfg.remat_blocks else RobertaLayer
        for i in range(cfg.num_hidden_layers):
            hidden = Layer(cfg, dtype=self.dtype, name=f"layer_{i}")(hidden, attention_bias)
        return hidden


class RobertaForMaskedLM(nn.Module):
    """lm_head: dense -> gelu -> layer_norm -> decoder(tied to embeddings) + bias."""

    config: RobertaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, inputs_embeds=None):
        cfg = self.config
        hidden = RobertaModel(cfg, dtype=self.dtype, name="roberta")(
            input_ids, attention_mask, inputs_embeds
        )
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="lm_head_dense")(hidden)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="lm_head_ln")(h)
        embed = self.variables["params"]["roberta"]["word_embeddings"]["embedding"]
        bias = self.param("lm_head_bias", jax.nn.initializers.zeros, (cfg.vocab_size,))
        return h @ embed.T.astype(self.dtype) + bias
