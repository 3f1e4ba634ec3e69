"""PyTorch port of the hypernetwork + Flax->PT weight conversion.

Parity target: the reference's hf_hypernet package (ZettHypernet,
modeling_hypernet.py:43-267) and scripts/convert_to_pt.py. Unlike the
reference port (which raises NotImplementedError for inter-token attention
and target priors, hf_hypernet/modeling_hypernet.py:85-89,164-168), this
port covers every feature of the Flax model; outputs are numerically
parity-tested against Flax.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

try:
    import torch
    from torch import nn
except Exception:  # pragma: no cover
    torch = None
    nn = object

from .hypernet import HypernetConfig


class _Attention(nn.Module):
    def __init__(self, cfg: HypernetConfig):
        super().__init__()
        H = cfg.hidden_size
        self.n_heads = cfg.num_attention_heads
        self.query = nn.Linear(H, H)
        self.key = nn.Linear(H, H)
        self.value = nn.Linear(H, H)
        self.out = nn.Linear(H, H)

    def forward(self, x, attention_mask=None, key_value_states=None, attention_bias=None):
        kv = key_value_states if key_value_states is not None else x
        B, Lq, H = x.shape
        Lk = kv.shape[1]
        hd = H // self.n_heads
        q = self.query(x).view(B, Lq, self.n_heads, hd)
        k = self.key(kv).view(B, Lk, self.n_heads, hd)
        v = self.value(kv).view(B, Lk, self.n_heads, hd)
        scores = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if attention_mask is not None:
            scores = scores.masked_fill(
                ~attention_mask[:, None, None, :], torch.finfo(torch.float32).min
            )
        elif attention_bias is not None:
            scores = scores + attention_bias[:, None, None, :]
        w = scores.softmax(-1)
        o = torch.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Lq, H)
        return self.out(o)


class _EncoderLayer(nn.Module):
    def __init__(self, cfg: HypernetConfig):
        super().__init__()
        H = cfg.hidden_size
        self.cfg = cfg
        self.attention = _Attention(cfg)
        self.attention_ln = nn.LayerNorm(H, eps=cfg.layer_norm_eps)
        self.intermediate = nn.Linear(H, cfg.intermediate_size)
        self.output = nn.Linear(cfg.intermediate_size, H)
        self.output_ln = nn.LayerNorm(H, eps=cfg.layer_norm_eps)
        if cfg.add_inter_token_attention:
            self.inter_token_down = _Attention(cfg)
            self.inter_token_up = _Attention(cfg)

    def forward(self, x, attention_mask, target_priors=None, inter_token_blocks=None):
        cfg = self.cfg
        a = self.attention(x, attention_mask=attention_mask)
        a = self.attention_ln(a + x)
        if cfg.add_inter_token_attention:
            bias = (
                target_priors[None] * cfg.inter_token_attention_bias_scaler
                if cfg.inter_token_attention_bias_by_priors
                else None
            )
            blocks = self.inter_token_down(
                inter_token_blocks[None], key_value_states=a[None, :, 0],
                attention_bias=bias,
            )[0]
            V, L, H = a.shape
            a = self.inter_token_up(
                a.reshape(1, V * L, H), key_value_states=blocks[None]
            ).reshape(V, L, H)
        h = self.output(nn.functional.gelu(self.intermediate(a), approximate="tanh"))
        return self.output_ln(h + a)


class _ProjectorBlock(nn.Module):
    def __init__(self, dim, intermediate):
        super().__init__()
        self.dense1 = nn.Linear(dim, intermediate)
        self.dense2 = nn.Linear(intermediate, dim)
        self.ln = nn.LayerNorm(dim, eps=1e-6)  # flax LayerNorm default

    def forward(self, x):
        h = self.dense2(nn.functional.gelu(self.dense1(x), approximate="tanh"))
        return self.ln(nn.functional.gelu(h, approximate="tanh") + x)


class _Rescaler(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.w = nn.Parameter(torch.ones(1, dim))
        self.b = nn.Parameter(torch.zeros(1, dim))

    def forward(self, x):
        return self.w * x + self.b


class TorchHypernet(nn.Module):
    """torch mirror of zett_tpu.models.Hypernet (same submodule names)."""

    def __init__(self, config: HypernetConfig):
        super().__init__()
        assert torch is not None, "torch unavailable"
        cfg = self.config = config
        H = cfg.hidden_size

        enc = self.encoder = nn.Module()
        if not cfg.embed_using_source_embeddings:
            enc.word_embeddings = nn.Embedding(cfg.vocab_size, H)
        enc.position_embeddings = nn.Parameter(
            torch.zeros(cfg.max_position_embeddings, H)
        )
        if cfg.embed_target_priors:
            enc.prior_projection = nn.Linear(1, H)
        if cfg.embed_lang_id:
            enc.lang_embedding = nn.Embedding(cfg.n_langs, H)
        enc.embeddings_ln = nn.LayerNorm(H, eps=cfg.layer_norm_eps)
        if cfg.add_inter_token_attention:
            enc.inter_token_blocks = nn.Parameter(
                torch.zeros(cfg.n_inter_token_blocks, H)
            )
        enc.layers = nn.ModuleList(
            [_EncoderLayer(cfg) for _ in range(cfg.num_hidden_layers)]
        )

        self.fallback_embeddings = nn.Embedding(max(cfg.n_extra_tokens, 1), cfg.n_in_embd)
        if cfg.embed_using_source_embeddings:
            self.input_projection = nn.Sequential(
                nn.Linear(cfg.n_in_embd, H), _ProjectorBlock(H, cfg.intermediate_size)
            )
        head_in_dim = cfg.n_in_embd if cfg.single_head else cfg.n_embd
        self.output_projection = nn.Sequential(
            _ProjectorBlock(H, cfg.intermediate_size), nn.Linear(H, head_in_dim)
        )
        if not cfg.single_head and cfg.separate_out_embeddings:
            self.output_projection_out = nn.Sequential(
                _ProjectorBlock(H, cfg.intermediate_size), nn.Linear(H, cfg.n_embd)
            )
        if cfg.rescale_embeddings:
            self.in_scaler = _Rescaler(cfg.n_in_embd)
            self.scaler = _Rescaler(cfg.n_embd if not cfg.single_head else cfg.n_in_embd)
            if cfg.separate_out_embeddings:
                self.out_scaler = _Rescaler(cfg.n_embd)
        if cfg.predict_bias:
            self.bias_projection = nn.Linear(H, 1)

    @torch.no_grad()
    def forward(self, target_surface_forms, target_priors=None,
                source_embeddings=None, lang_index=None):
        cfg = self.config
        attention_mask = target_surface_forms != cfg.pad_token_id

        if cfg.embed_using_source_embeddings:
            use_fallback = target_surface_forms >= cfg.original_vocab_size
            main_ids = target_surface_forms.clamp(max=cfg.original_vocab_size - 1)
            fb_ids = (target_surface_forms - cfg.original_vocab_size).clamp(
                0, max(cfg.n_extra_tokens, 1) - 1
            )
            src = source_embeddings[main_ids]
            if cfg.rescale_embeddings:
                src = self.in_scaler(src)
            x = torch.where(
                use_fallback[..., None], self.fallback_embeddings(fb_ids), src
            )
            x = self.input_projection(x)
        else:
            x = self.encoder.word_embeddings(target_surface_forms)

        L = x.shape[1]
        x = x + self.encoder.position_embeddings[None, :L]
        mask = attention_mask
        if cfg.embed_target_priors:
            prior_tok = self.encoder.prior_projection(target_priors[..., None])
            x = torch.cat([x, prior_tok[:, None, :]], dim=1)
            mask = torch.cat(
                [mask, torch.ones(x.shape[0], 1, dtype=torch.bool)], dim=1
            )
        if cfg.embed_lang_id:
            lang_tok = self.encoder.lang_embedding(lang_index).squeeze()
            x = torch.cat(
                [x, lang_tok[None, None, :].expand(x.shape[0], 1, -1)], dim=1
            )
            mask = torch.cat(
                [mask, torch.ones(x.shape[0], 1, dtype=torch.bool)], dim=1
            )
        x = self.encoder.embeddings_ln(x)
        blocks = getattr(self.encoder, "inter_token_blocks", None)
        for layer in self.encoder.layers:
            x = layer(x, mask, target_priors=target_priors, inter_token_blocks=blocks)

        pooled = (
            x.reshape(target_surface_forms.shape[0], -1)
            if cfg.concat_last_hidden_state
            else x[:, 0]
        )
        predicted = self.output_projection(pooled)
        if cfg.single_head:
            pred_in = predicted[..., : cfg.n_embd]
            pred_out = predicted[..., cfg.n_embd :] if cfg.separate_out_embeddings else None
        else:
            pred_in = predicted
            pred_out = (
                self.output_projection_out(pooled)
                if cfg.separate_out_embeddings
                else None
            )
        if cfg.rescale_embeddings:
            pred_in = self.scaler(pred_in)
            if pred_out is not None:
                pred_out = self.out_scaler(pred_out)
        bias = (
            self.bias_projection(pooled)[..., 0]
            if cfg.predict_bias
            else torch.zeros(len(target_surface_forms))
        )
        return pred_in, pred_out, bias


def convert_flax_to_torch(config: HypernetConfig, flax_params: dict) -> "TorchHypernet":
    """Build a TorchHypernet and load converted Flax weights
    (reference: scripts/convert_to_pt.py:24-52)."""
    from flax import traverse_util

    model = TorchHypernet(config)
    flat = traverse_util.flatten_dict(flax_params, sep="/")
    sd = {}
    for k, v in flat.items():
        v = np.asarray(v)
        name = k.replace("encoder/layer_", "encoder.layers.").replace("/", ".")
        # flax nn.Sequential children -> torch Sequential indices
        name = name.replace(".layers_0.", ".0.").replace(".layers_1.", ".1.")
        if name.endswith(".kernel"):
            sd[name[: -len(".kernel")] + ".weight"] = torch.from_numpy(v.T.copy())
        elif name.endswith(".scale"):
            sd[name[: -len(".scale")] + ".weight"] = torch.from_numpy(v.copy())
        elif name.endswith(".embedding"):
            sd[name[: -len(".embedding")] + ".weight"] = torch.from_numpy(v.copy())
        else:
            sd[name] = torch.from_numpy(v.copy())
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"
    assert not missing, f"missing keys: {missing[:5]}"
    return model
