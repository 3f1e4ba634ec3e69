"""GPT-2 decoder in minimal Flax (fresh implementation, HF-compatible weights).

Param tree mirrors HF Flax naming: {transformer: {wte, wpe, h_i: {ln_1, attn:
{c_attn, c_proj}, ln_2, mlp: {c_fc, c_proj}}, ln_f}} so the embedding-path
registry (reference zett/model/__init__.py:16 'transformer/wte/embedding')
carries over. GPT-2's Conv1D stores kernels as (in, out) like flax Dense.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_inner: int = None
    layer_norm_epsilon: float = 1e-5
    tie_word_embeddings: bool = True
    # rematerialize each block in the backward pass (activation memory for
    # large-batch training; the engine sets this from
    # TrainingConfig.remat_backbone)
    remat_blocks: bool = False

    @classmethod
    def from_hf(cls, hf_config) -> "GPT2Config":
        return cls(
            vocab_size=hf_config.vocab_size,
            n_positions=hf_config.n_positions,
            n_embd=hf_config.n_embd,
            n_layer=hf_config.n_layer,
            n_head=hf_config.n_head,
            n_inner=getattr(hf_config, "n_inner", None),
            layer_norm_epsilon=hf_config.layer_norm_epsilon,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", True),
        )


class GPT2Attention(nn.Module):
    config: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias):
        cfg = self.config
        B, L, E = hidden.shape
        H = cfg.n_head
        hd = E // H
        qkv = nn.Dense(3 * E, dtype=self.dtype, name="c_attn")(hidden)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, H, hd)
        k = k.reshape(B, L, H, hd)
        v = v.reshape(B, L, H, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(hd)
        scores = scores + attention_bias
        weights = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(B, L, E)
        return nn.Dense(E, dtype=self.dtype, name="c_proj")(out)


class GPT2Block(nn.Module):
    config: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias):
        cfg = self.config
        inner = cfg.n_inner or 4 * cfg.n_embd
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_1")(hidden)
        hidden = hidden + GPT2Attention(cfg, dtype=self.dtype, name="attn")(h, attention_bias)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_2")(hidden)
        h = nn.Dense(inner, dtype=self.dtype, name="c_fc")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(cfg.n_embd, dtype=self.dtype, name="c_proj")(h)
        return hidden + h


class GPT2Model(nn.Module):
    config: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, inputs_embeds=None):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = nn.Embed(
                cfg.vocab_size, cfg.n_embd, dtype=self.dtype, name="wte"
            )(input_ids.astype("i4"))
        B, L = input_ids.shape
        pos = nn.Embed(cfg.n_positions, cfg.n_embd, dtype=self.dtype, name="wpe")(
            jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        )
        hidden = inputs_embeds + pos

        causal = jnp.tril(jnp.ones((L, L), dtype=bool))[None, None]
        if attention_mask is not None:
            mask = causal & attention_mask[:, None, None, :].astype(bool)
        else:
            mask = causal
        attention_bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min)

        # HF groups blocks under 'h' -> h_i in flax flat naming; we use a
        # nested 'h' scope with numeric children to match msgpack layouts
        Block = nn.remat(GPT2Block) if cfg.remat_blocks else GPT2Block
        for i in range(cfg.n_layer):
            hidden = Block(cfg, dtype=self.dtype, name=f"h_{i}")(hidden, attention_bias)
        return nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_f")(hidden)


class GPT2LMHeadModel(nn.Module):
    config: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, inputs_embeds=None):
        cfg = self.config
        hidden = GPT2Model(cfg, dtype=self.dtype, name="transformer")(
            input_ids, attention_mask, inputs_embeds
        )
        if cfg.tie_word_embeddings:
            embed = self.variables["params"]["transformer"]["wte"]["embedding"]
            logits = hidden @ embed.T.astype(self.dtype)
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head")(hidden)
        return logits
