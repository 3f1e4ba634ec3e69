"""The ZeTT hypernetwork, written fresh for TPU in Flax linen.

A small transformer encoder runs over each target token's surface form (byte
sequence), pools the first position, and projects to the frozen LM's
input/output embeddings (+ optional lm-head bias). Feature parity with the
reference Hypernet (zett/model/__init__.py:212-469) and its HyperRoberta
backbone extensions (zett/model/hyper_roberta.py): source-embedding input
mode with fallback table, target-prior extra token, language-id extra token,
inter-token block attention (with optional prior bias), per-language
bottleneck adapters, affine rescalers, single/dual heads, bias head.

TPU-first: the vocab axis is the batch axis (embarrassingly parallel across
target tokens; shard it over the mesh "data" axis), all matmuls run in the
MXU with static shapes, and dtype is configurable (bf16 for the compute path).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..constants import EPSILON
from ..ops.pallas_attention import (
    attention_block_fused,
    encoder_layer_fused,
    merged_attention_train,
    pallas_attention_available,
)


@dataclass
class HypernetConfig:
    # encoder dims
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 3
    num_attention_heads: int = 12
    max_position_embeddings: int = 24
    vocab_size: int = 256  # hn tokenizer vocab (ignored when embedding from source)
    type_vocab_size: int = 1
    pad_token_id: int = 0
    layer_norm_eps: float = 1e-5
    hidden_dropout_prob: float = 0.1
    attention_dropout_prob: float = 0.1
    initializer_range: float = 0.02
    # target embedding dims
    n_embd: int = 768
    separate_out_embeddings: bool = False
    # ZeTT extensions
    hn_surface_maxlen: int = 16
    embed_target_priors: bool = False
    add_inter_token_attention: bool = False
    inter_token_attention_bias_by_priors: bool = False
    inter_token_attention_bias_scaler: float = 1.0
    n_inter_token_blocks: int = 16
    # compat: the reference wraps each inter-token exchange in a FULL
    # residual attention block (out-projection + residual + LayerNorm,
    # hyper_roberta.py:344-427). Our redesign uses bare cross-attention;
    # reference_io turns this on at load time so `with_inter_token_attn`
    # checkpoints map numerically.
    inter_token_residual_ln: bool = False
    language_adapter_bottleneck_dim: int = 0
    embed_lang_id: bool = False
    n_langs: int = 1
    embed_using_source_embeddings: bool = False
    original_vocab_size: int = 0  # source vocab size (source-embedding mode)
    n_extra_tokens: int = 1  # fallback table size (byte tokens new to source)
    rescale_embeddings: bool = False
    single_head: bool = False
    predict_bias: bool = True
    concat_last_hidden_state: bool = False
    # "absolute" (roberta-style learned positions) or "relative" (t5-style
    # bucketed relative attention bias — the hn_model_type="t5" equivalent)
    position_embedding_type: str = "absolute"
    # "roberta" (our fresh post-LN encoder) or "t5" (pre-LN RMS-norm compat
    # encoder that holds hn_model_type="t5" reference checkpoints
    # numerically — models/hypernet_t5.py)
    encoder_type: str = "roberta"
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    # encoder-MLP / adapter activation: "gelu_new" (tanh approximation, our
    # default) or "gelu" (erf-exact — what HF roberta checkpoints and hence
    # reference hypernet checkpoints use)
    hidden_act: str = "gelu_new"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "HypernetConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @property
    def n_in_embd(self) -> int:
        return self.n_embd * 2 if self.separate_out_embeddings else self.n_embd


class Rescaler(nn.Module):
    """Per-feature affine calibration (reference: zett/utils.py:144-175)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("w", jax.nn.initializers.constant(1.0), (1, self.dim), self.dtype)
        b = self.param("b", jax.nn.initializers.constant(0.0), (1, self.dim), self.dtype)
        return w * x + b

    @staticmethod
    def scale_to(x, target=None, target_stds=None, target_means=None):
        if target_stds is None:
            target_stds = target.std(axis=0)
        if target_means is None:
            target_means = target.mean(axis=0)
        w = (target_stds / (x.std(axis=0) + EPSILON))[None]
        b = (target_means - (x * w).mean(axis=0))[None]
        return w, b


def _act(cfg: HypernetConfig):
    return (lambda x: nn.gelu(x, approximate=False)) if cfg.hidden_act == "gelu" else nn.gelu


class ProjectorBlock(nn.Module):
    """Residual MLP block used in the in/out projection heads
    (reference: zett/model/__init__.py:121-134)."""

    dim: int
    intermediate_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="dense1")(x)
        h = nn.Dense(self.dim, dtype=self.dtype, name="dense2")(nn.gelu(h))
        return nn.LayerNorm(dtype=self.dtype, name="ln")(nn.gelu(h) + x)


_FLATTEN_QKV = False  # experiment toggle: run the q/k/v Denses on
# (B*L, H)-flattened inputs (identical math; changes XLA's layout choices
# around the merged-head reshapes — see experiments/profiles/hypernet_r4.md)

MERGED_ATTENTION_MAX = 256  # merged seq*heads width above which the
# per-head path is used instead (the merged form trades 12x redundant
# score FLOPs — free at surface-form widths — for zero relayout copies;
# at long key lengths, e.g. the inter-token exchange over the whole
# vocab axis, the redundancy would dominate)


def _merged_head_attention(q, k, v, key_bias, head_bias, num_heads, dtype,
                           dropout_rate, deterministic, rng=None,
                           key_mask=None, inference=False):
    """Attention for tiny sequence lengths with ZERO layout copies.

    The classic per-head formulation reshapes (B, L, H) -> (B, L, h, d) and
    einsums with (b, h) batch dims, which XLA lowers with physical
    relayouts to head-major — measured at 33 ms of a 97 ms device budget on
    the 32k-vocab transfer forward and 63 ms in the train step backward
    (experiments/profiles/hypernet_r3.md). Instead, merge (L, h) into ONE
    axis by pure contiguous reshape and compute scores for ALL head pairs
    in a single (B, L*h, d) x (B, L*h, d)^T batched matmul, then mask the
    off-diagonal head blocks to -inf before the softmax. exp(min)
    underflows to exactly 0.0, so the result is numerically IDENTICAL to
    per-head attention (the extra zero terms in the PV contraction are
    exact no-ops). The h-fold redundant FLOPs are negligible: the per-head
    matmuls (M=N<=16) cannot tile the 128x128 MXU anyway, while the merged
    (L*h)^2 shapes can.

    q/k/v: (B, L, H). key_bias: (B', Lk) additive, broadcast over queries
    and heads (prior bias). key_mask: (B, Lk) boolean — folded into the
    same single `where` as the head-block mask (one fewer full-plane
    elementwise pass than an additive mask; the score plane is the
    HBM-bound tensor here). head_bias: (B', h, Lq, Lk) additive per-head
    bias (relative positions)."""
    B, Lq, H = q.shape
    Lk = k.shape[1]
    d = H // num_heads
    h = num_heads
    qm = q.reshape(B, Lq * h, d)
    km = k.reshape(B, Lk * h, d)
    vm = v.reshape(B, Lk * h, d)
    if (
        (inference or os.environ.get("ZETT_PALLAS_TRAIN") == "1")
        and key_bias is None
        and head_bias is None
        and key_mask is not None
        and d % 64 == 0
        and pallas_attention_available("core_vjp")
    ):
        # differentiable fused core (custom_vjp, Pallas fwd+bwd): the
        # score plane stays in VMEM in both directions and is never a
        # residual — this is the train-step path (the r4 trace's largest
        # line is the HBM-bound plane). Dropout runs in-core, seeded from
        # the step rng (deterministic ⇒ bit-identical resume; a different
        # equally-distributed stream than the XLA path's bernoulli).
        rate = 0.0 if (deterministic or rng is None) else float(dropout_rate)
        seed = (
            jax.random.randint(rng, (), 0, 2**31 - 1, dtype=jnp.int32)
            if rate > 0.0
            else jnp.zeros((), jnp.int32)
        )
        kmaskf = jnp.repeat(key_mask, h, axis=-1).astype(jnp.float32)
        out = merged_attention_train(qm, km, vm, kmaskf, seed, h, rate)
        return out.reshape(B, Lq, H)
    scores = jnp.einsum("bqd,bkd->bqk", qm, km)
    scores = scores / jnp.sqrt(d).astype(scores.dtype)
    if key_bias is not None:
        # merged key index = k*h + head: repeat each key h times
        scores = scores + jnp.repeat(
            key_bias.astype(scores.dtype), h, axis=-1
        )[:, None, :]
    if head_bias is not None:
        # scatter the (B', h, Lq, Lk) bias onto the block diagonal of the
        # tiny (B', Lq*h, Lk*h) merged plane (B' is 1 or B, Lq/Lk <= 16)
        hb = jnp.broadcast_to(
            head_bias, head_bias.shape[:1] + (h, Lq, Lk)
        ).astype(scores.dtype)
        eye = jnp.eye(h, dtype=scores.dtype)
        hb = hb.transpose(0, 2, 1, 3)[:, :, :, :, None] * eye[None, None, :, None, :]
        scores = scores + hb.reshape(head_bias.shape[0], Lq * h, Lk * h)
    same_head = (
        (jnp.arange(Lq * h) % h)[:, None] == (jnp.arange(Lk * h) % h)[None, :]
    )
    valid = same_head[None]
    if key_mask is not None:
        valid = valid & jnp.repeat(key_mask, h, axis=-1)[:, None, :]
    scores = jnp.where(valid, scores, jnp.finfo(scores.dtype).min)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    if not deterministic and dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    out = jnp.einsum("bqk,bkd->bqd", weights, vm)
    return out.reshape(B, Lq, H)


def _attention(q, k, v, key_bias, head_bias, num_heads, dtype, dropout_rate,
               deterministic, rng=None, key_mask=None, inference=False):
    """Multi-head attention core; q/k/v are (B, L, H) projections.

    Scores stay in the compute dtype (the MXU still accumulates the QK
    contraction in f32); only the softmax itself upcasts. Profiling the
    32k-vocab transfer forward on v5e showed f32 score tensors at the tiny
    surface-form widths ([B, 12, L, L], L<=16) cost ~30 ms of badly-tiled
    elementwise fusions out of a 120 ms device budget — and bf16 scores are
    no less precise than the reference's HF-Flax path, which runs the whole
    softmax in bf16 under a bf16 policy (flax dot_product_attention_weights)
    while we keep the softmax in f32.

    key_bias: (B', Lk) additive over keys (mask / priors); head_bias:
    (B', h, Lq, Lk) additive per-head (relative positions). At surface-form
    widths the merged-head formulation below avoids all head relayouts."""
    B, Lq, H = q.shape
    Lk = k.shape[1]
    if Lq * num_heads <= MERGED_ATTENTION_MAX and Lk * num_heads <= MERGED_ATTENTION_MAX:
        return _merged_head_attention(
            q, k, v, key_bias, head_bias, num_heads, dtype,
            dropout_rate, deterministic, rng, key_mask=key_mask,
            inference=inference,
        )
    head_dim = H // num_heads
    q = q.reshape(B, Lq, num_heads, head_dim)
    k = k.reshape(B, Lk, num_heads, head_dim)
    v = v.reshape(B, Lk, num_heads, head_dim)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    scores = scores / jnp.sqrt(head_dim).astype(scores.dtype)
    if key_bias is not None:
        scores = scores + key_bias[:, None, None, :].astype(scores.dtype)
    if head_bias is not None:
        scores = scores + head_bias.astype(scores.dtype)
    if key_mask is not None:
        scores = jnp.where(
            key_mask[:, None, None, :], scores, jnp.finfo(scores.dtype).min
        )
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    if not deterministic and dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return out.reshape(B, Lq, H)


class _DenseParams(nn.Module):
    """Declares nn.Dense's exact param tree ({kernel, bias} under this
    module's name, same initializers/param dtype) WITHOUT computing the
    matmul — the fused attention kernel consumes the raw weights, and
    checkpoints stay byte-interchangeable with the nn.Dense formulation."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class _LNParams(nn.Module):
    """nn.LayerNorm's exact param tree ({scale, bias}, f32, ones/zeros)
    without the computation — for the fused layer kernel."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.dim,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), jnp.float32
        )
        return scale, bias


class _AttentionParams(nn.Module):
    """The Attention module's param tree (query/key/value/out Dense params)
    without the computation — for the fused layer kernel."""

    hidden_size: int

    @nn.compact
    def __call__(self):
        ps = []
        for name in ("query", "key", "value", "out"):
            ps.extend(_DenseParams(self.hidden_size, self.hidden_size,
                                   name=name)())
        return tuple(ps)


class Attention(nn.Module):
    """Self/cross attention with optional additive bias over keys."""

    config: HypernetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states,
        attention_mask=None,
        key_value_states=None,
        attention_bias=None,
        position_bias=None,
        deterministic: bool = True,
        cls_query_only: bool = False,
        inference: Optional[bool] = None,
    ):
        cfg = self.config
        # `inference` routes the Pallas-fused kernels: they WIN on the
        # forward-only transfer/eval paths and measurably LOSE inside the
        # training step (e2e ablation, experiments/profiles/hypernet_r5.md)
        # — callers that differentiate pass inference=False (Trainer does).
        # Default: deterministic ⇒ inference.
        if inference is None:
            inference = deterministic
        kv = key_value_states if key_value_states is not None else hidden_states
        if cls_query_only:
            # only the CLS position's output is consumed downstream: project
            # q for position 0 alone (keys/values still span all positions)
            hidden_states = hidden_states[:, :1]

        H = cfg.hidden_size
        wq, bq = _DenseParams(H, H, name="query")()
        wk, bk = _DenseParams(H, H, name="key")()
        wv, bv = _DenseParams(H, H, name="value")()
        wo, bo = _DenseParams(H, H, name="out")()
        # nn.Dense promotes params to the compute dtype before the matmul
        wq, bq, wk, bk, wv, bv, wo, bo = (
            p.astype(self.dtype) for p in (wq, bq, wk, bk, wv, bv, wo, bo)
        )

        key_mask = None
        key_bias = None
        if attention_mask is not None:
            # (B, Lk) boolean, folded into the score mask select (NOT an
            # additive -inf pass: the score plane is the HBM-bound tensor)
            key_mask = attention_mask.astype(bool)
        elif attention_bias is not None:
            key_bias = attention_bias  # (B, Lk) additive (priors)

        fused_ok = (
            deterministic
            and inference
            and position_bias is None
            and key_value_states is None
            and not cls_query_only
            and hidden_states.shape[1] * cfg.num_attention_heads
            <= MERGED_ATTENTION_MAX
            and H % cfg.num_attention_heads == 0
            and (H // cfg.num_attention_heads) % 64 == 0
            and pallas_attention_available()
        )
        if fused_ok:
            # whole attention block in one VMEM-resident Pallas program
            # (ops/pallas_attention.py), differentiable (custom_vjp with an
            # XLA-reference recompute backward — the train step runs the
            # hypernet deterministically); the non-TPU branch of the SAME
            # trace runs the numerically-matching XLA formulation, so
            # CPU-executed init / virtual-mesh tests never meet Mosaic
            B, Lx = hidden_states.shape[:2]
            maskf = (
                key_mask.astype(jnp.float32)
                if key_mask is not None
                else jnp.ones((B, Lx), jnp.float32)
            )
            kb = (
                key_bias.astype(hidden_states.dtype)
                if key_bias is not None
                else jnp.zeros((B, Lx), hidden_states.dtype)
            )
            return attention_block_fused(
                hidden_states, maskf, kb, wq, bq, wk, bk, wv, bv, wo, bo,
                cfg.num_attention_heads, key_mask is not None,
                key_bias is not None,
            )

        def project(w, b, x):
            y = (x.reshape(-1, x.shape[-1]) if _FLATTEN_QKV else x) @ w + b
            return y.reshape(x.shape[:-1] + (H,))

        q = project(wq, bq, hidden_states)
        k = project(wk, bk, kv)
        v = project(wv, bv, kv)

        rng = self.make_rng("dropout") if not deterministic else None
        out = _attention(
            q, k, v, key_bias, position_bias, cfg.num_attention_heads,
            self.dtype, cfg.attention_dropout_prob, deterministic, rng,
            key_mask=key_mask, inference=inference,
        )
        out = out @ wo + bo
        if not deterministic and cfg.hidden_dropout_prob > 0.0:
            out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=False)
        return out


class EncoderLayer(nn.Module):
    config: HypernetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states,
        attention_mask,
        target_priors=None,
        inter_token_blocks=None,
        lang_index=None,
        position_bias=None,
        deterministic: bool = True,
        cls_only: bool = False,
        inference: Optional[bool] = None,
    ):
        """With cls_only=True, computes this layer's output for position 0
        ONLY (attention queries + MLP restricted to CLS; keys/values read the
        full previous layer). Exact when the caller pools hidden[:, 0] —
        positions 1.. of the last layer are dead code otherwise. ~25% of the
        encoder's FLOPs at typical surface widths."""
        cfg = self.config
        if inference is None:
            inference = deterministic
        if cls_only:
            assert not cfg.add_inter_token_attention
            if position_bias is not None:
                position_bias = position_bias[:, :, :1, :]

        fused_layer = (
            deterministic
            and inference
            and not cls_only
            and not cfg.add_inter_token_attention
            and position_bias is None
            and hidden_states.shape[1] * cfg.num_attention_heads
            <= MERGED_ATTENTION_MAX
            and cfg.hidden_size % cfg.num_attention_heads == 0
            and (cfg.hidden_size // cfg.num_attention_heads) % 64 == 0
            and cfg.hidden_act != "gelu"  # Mosaic has no erf/erfc
            and pallas_attention_available("layer")
        )
        if fused_layer:
            # whole layer (attention + LN + FFN + LN) as one VMEM-resident
            # Pallas program; the param tree is IDENTICAL to the module
            # path below (_AttentionParams/_DenseParams/_LNParams mirror
            # the nn.Dense / nn.LayerNorm trees), so checkpoints and init
            # are branch-independent. Non-TPU lowerings of the same trace
            # run the numerically-matching reference.
            H = cfg.hidden_size
            wq, bq, wk, bk, wv, bv, wo, bo = _AttentionParams(
                H, name="attention"
            )()
            ln1_s, ln1_b = _LNParams(H, name="attention_ln")()
            w1, b1 = _DenseParams(H, cfg.intermediate_size, name="intermediate")()
            w2, b2 = _DenseParams(cfg.intermediate_size, H, name="output")()
            ln2_s, ln2_b = _LNParams(H, name="output_ln")()
            dt = self.dtype
            wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, w2, b2 = (
                p.astype(dt)
                for p in (wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, w2, b2)
            )
            B, Lx = hidden_states.shape[:2]
            maskf = (
                attention_mask.astype(jnp.float32)
                if attention_mask is not None
                else jnp.ones((B, Lx), jnp.float32)
            )
            approx = cfg.hidden_act != "gelu"
            h = encoder_layer_fused(
                hidden_states, maskf, wq, bq, wk, bk, wv, bv, wo, bo,
                ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                cfg.num_attention_heads, cfg.layer_norm_eps, approx,
                attention_mask is not None,
            )
            return self._adapter_tail(h, lang_index, deterministic)

        attn_out = Attention(cfg, dtype=self.dtype, name="attention")(
            hidden_states, attention_mask=attention_mask,
            position_bias=position_bias, deterministic=deterministic,
            cls_query_only=cls_only, inference=inference,
        )
        residual = hidden_states[:, :1] if cls_only else hidden_states
        attn_out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="attention_ln")(
            attn_out + residual
        )

        # Inter-token attention: tokens exchange information through a small
        # set of latent blocks (reference: hyper_roberta.py:402-427). The
        # vocab/batch axis becomes the sequence axis of a 1-element batch.
        if cfg.add_inter_token_attention:
            assert inter_token_blocks is not None
            if cfg.inter_token_attention_bias_by_priors:
                bias = target_priors[None] * cfg.inter_token_attention_bias_scaler
            else:
                bias = None
            blocks_in = inter_token_blocks[None]
            blocks = Attention(cfg, dtype=self.dtype, name="inter_token_down")(
                blocks_in,
                key_value_states=attn_out[None, :, 0],
                attention_bias=bias,
                deterministic=deterministic,
                inference=inference,
            )
            if cfg.inter_token_residual_ln:
                # reference semantics: residual + LN around each exchange
                blocks = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                    name="inter_token_down_ln",
                )(blocks + blocks_in)
            V, L, H = attn_out.shape
            flat = attn_out.reshape(1, V * L, H)
            updated = Attention(cfg, dtype=self.dtype, name="inter_token_up")(
                flat,
                key_value_states=blocks,
                deterministic=deterministic,
                inference=inference,
            )
            if cfg.inter_token_residual_ln:
                updated = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                    name="inter_token_up_ln",
                )(updated + flat)
            attn_out = updated.reshape(V, L, H)

        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(attn_out)
        h = _act(cfg)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(h)
        if not deterministic and cfg.hidden_dropout_prob > 0.0:
            h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=False)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="output_ln")(h + attn_out)
        return self._adapter_tail(h, lang_index, deterministic)

    def _adapter_tail(self, h, lang_index, deterministic):
        """Per-language bottleneck adapters (reference:
        hyper_roberta.py:282-339); shared tail of both the fused-kernel and
        module paths."""
        cfg = self.config
        if cfg.language_adapter_bottleneck_dim > 0:
            d = cfg.language_adapter_bottleneck_dim
            down_w = self.param(
                "lang_adapter_down_weights", jax.nn.initializers.lecun_normal(),
                (cfg.n_langs, cfg.hidden_size, d), self.dtype,
            )
            down_b = self.param(
                "lang_adapter_down_bias", jax.nn.initializers.zeros, (cfg.n_langs, d)
            )
            up_w = self.param(
                "lang_adapter_up_weights", jax.nn.initializers.lecun_normal(),
                (cfg.n_langs, d, cfg.hidden_size), self.dtype,
            )
            up_b = self.param(
                "lang_adapter_up_bias", jax.nn.initializers.zeros,
                (cfg.n_langs, cfg.hidden_size),
            )
            la_dw = jnp.take(down_w, lang_index, axis=0)
            la_db = jnp.take(down_b, lang_index, axis=0)
            la_uw = jnp.take(up_w, lang_index, axis=0)
            la_ub = jnp.take(up_b, lang_index, axis=0)
            mid = _act(cfg)(jnp.einsum("...i,io->...o", h, la_dw) + la_db)
            adapted = jnp.einsum("...i,io->...o", mid, la_uw) + la_ub
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="adapter_ln")(adapted + h)
        return h


def _relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """T5 bidirectional relative-position bucketing."""
    import numpy as _np

    num_buckets = num_buckets // 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / _np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class HypernetEncoder(nn.Module):
    """Embeddings (+prior/lang extra tokens) and the layer stack."""

    config: HypernetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        inputs_embeds=None,
        target_priors=None,
        lang_index=None,
        deterministic: bool = True,
        inference: Optional[bool] = None,
    ):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = nn.Embed(
                cfg.vocab_size, cfg.hidden_size,
                embedding_init=jax.nn.initializers.normal(cfg.initializer_range),
                dtype=self.dtype, name="word_embeddings",
            )(input_ids.astype("i4"))
        L = inputs_embeds.shape[1]
        if cfg.position_embedding_type == "absolute":
            position_embeds = self.param(
                "position_embeddings",
                jax.nn.initializers.normal(cfg.initializer_range),
                (cfg.max_position_embeddings, cfg.hidden_size), self.dtype,
            )
            hidden = inputs_embeds + position_embeds[None, :L]
        else:
            hidden = inputs_embeds

        if cfg.embed_target_priors:
            prior_tok = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="prior_projection")(
                target_priors[..., None]
            )
            hidden = jnp.concatenate([hidden, prior_tok[:, None, :]], axis=1)
            attention_mask = jnp.concatenate(
                [attention_mask, jnp.ones((hidden.shape[0], 1), dtype=attention_mask.dtype)],
                axis=1,
            )
        if cfg.embed_lang_id:
            lang_embedding = nn.Embed(
                cfg.n_langs, cfg.hidden_size,
                embedding_init=jax.nn.initializers.normal(cfg.initializer_range),
                dtype=self.dtype, name="lang_embedding",
            )
            lang_tok = jnp.squeeze(lang_embedding(lang_index))
            hidden = jnp.concatenate(
                [hidden, jnp.broadcast_to(lang_tok[None, None, :], (hidden.shape[0], 1, cfg.hidden_size))],
                axis=1,
            )
            attention_mask = jnp.concatenate(
                [attention_mask, jnp.ones((hidden.shape[0], 1), dtype=attention_mask.dtype)],
                axis=1,
            )

        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="embeddings_ln")(hidden)
        if not deterministic and cfg.hidden_dropout_prob > 0.0:
            hidden = nn.Dropout(cfg.hidden_dropout_prob)(hidden, deterministic=False)

        if cfg.add_inter_token_attention:
            inter_token_blocks = self.param(
                "inter_token_blocks",
                jax.nn.initializers.normal(stddev=cfg.initializer_range),
                (cfg.n_inter_token_blocks, cfg.hidden_size), self.dtype,
            )
        else:
            inter_token_blocks = None

        position_bias = None
        if cfg.position_embedding_type == "relative":
            # t5-style bucketed relative attention bias, shared by all layers
            Lx = hidden.shape[1]
            rel_table = self.param(
                "relative_attention_bias",
                jax.nn.initializers.normal(cfg.initializer_range),
                (cfg.relative_attention_num_buckets, cfg.num_attention_heads),
                self.dtype,
            )
            buckets = _relative_position_bucket(
                jnp.arange(Lx)[None, :] - jnp.arange(Lx)[:, None],
                cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance,
            )
            position_bias = jnp.transpose(rel_table[buckets], (2, 0, 1))[None]

        # the last layer's non-CLS outputs are dead when the caller pools
        # hidden[:, 0] — skip computing them (exact; see EncoderLayer)
        cls_only_last = (
            not cfg.concat_last_hidden_state and not cfg.add_inter_token_attention
        )
        for i in range(cfg.num_hidden_layers):
            last = i == cfg.num_hidden_layers - 1
            hidden = EncoderLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                hidden, attention_mask,
                target_priors=target_priors,
                inter_token_blocks=inter_token_blocks,
                lang_index=lang_index,
                position_bias=position_bias,
                deterministic=deterministic,
                cls_only=last and cls_only_last,
                inference=inference,
            )
        return hidden


class Hypernet(nn.Module):
    """target surface forms (+priors, source embeddings, lang) ->
    (emb_in, emb_out | None, bias)."""

    config: HypernetConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        if cfg.encoder_type == "t5":
            from .hypernet_t5 import T5CompatEncoder

            self.encoder = T5CompatEncoder(cfg, dtype=self.dtype)
        else:
            self.encoder = HypernetEncoder(cfg, dtype=self.dtype)
        self.fallback_embeddings = nn.Embed(
            max(cfg.n_extra_tokens, 1),
            cfg.n_in_embd,
            embedding_init=jax.nn.initializers.normal(cfg.initializer_range),
            dtype=self.dtype,
        )
        if cfg.embed_using_source_embeddings:
            self.input_projection = nn.Sequential(
                [
                    nn.Dense(cfg.hidden_size, dtype=self.dtype),
                    ProjectorBlock(cfg.hidden_size, cfg.intermediate_size, dtype=self.dtype),
                ]
            )
        head_in_dim = cfg.n_in_embd if cfg.single_head else cfg.n_embd
        self.output_projection = nn.Sequential(
            [
                ProjectorBlock(cfg.hidden_size, cfg.intermediate_size, dtype=self.dtype),
                nn.Dense(head_in_dim, dtype=self.dtype),
            ]
        )
        if not cfg.single_head and cfg.separate_out_embeddings:
            self.output_projection_out = nn.Sequential(
                [
                    ProjectorBlock(cfg.hidden_size, cfg.intermediate_size, dtype=self.dtype),
                    nn.Dense(cfg.n_embd, dtype=self.dtype),
                ]
            )
        if cfg.rescale_embeddings:
            self.in_scaler = Rescaler(cfg.n_in_embd, dtype=self.dtype)
            self.scaler = Rescaler(cfg.n_embd if not cfg.single_head else cfg.n_in_embd, dtype=self.dtype)
            if cfg.separate_out_embeddings:
                self.out_scaler = Rescaler(cfg.n_embd, dtype=self.dtype)
        if cfg.predict_bias:
            self.bias_projection = nn.Dense(1, dtype=self.dtype)

    def __call__(
        self,
        target_surface_forms,
        target_priors=None,
        source_embeddings=None,
        lang_index=None,
        deterministic: bool = True,
        inference: Optional[bool] = None,
    ):
        """inference routes the fused Pallas kernels (ops/pallas_attention):
        they win on forward-only paths (transfer/eval) and measurably lose
        inside the differentiated training step (hypernet_r5.md e2e
        ablation). None ⇒ follow `deterministic`; the Trainer passes False."""
        cfg = self.config
        attention_mask = target_surface_forms != cfg.pad_token_id

        if cfg.embed_using_source_embeddings:
            # surface-form ids index the SOURCE vocab; new byte tokens beyond
            # the original vocab fall back to a learned table
            use_fallback = target_surface_forms >= cfg.original_vocab_size
            main_ids = jnp.minimum(target_surface_forms, cfg.original_vocab_size - 1)
            # clamp into the fallback table: out-of-range jnp.take fills NaN
            fallback_ids = jnp.clip(
                target_surface_forms - cfg.original_vocab_size,
                0,
                max(cfg.n_extra_tokens, 1) - 1,
            )
            source_embeds = jnp.take(source_embeddings, main_ids, axis=0)
            if cfg.rescale_embeddings:
                source_embeds = self.in_scaler(source_embeds)
            inputs_embeds = jnp.where(
                use_fallback[..., None],
                self.fallback_embeddings(fallback_ids),
                source_embeds,
            )
            inputs_embeds = self.input_projection(inputs_embeds)
        else:
            inputs_embeds = None

        hidden_states = self.encoder(
            target_surface_forms,
            attention_mask,
            inputs_embeds=inputs_embeds,
            target_priors=target_priors,
            lang_index=lang_index,
            deterministic=deterministic,
            inference=inference,
        )

        if cfg.concat_last_hidden_state:
            pooled = hidden_states.reshape(target_surface_forms.shape[0], -1)
        else:
            pooled = hidden_states[:, 0]

        predicted = self.output_projection(pooled)
        if cfg.single_head:
            predicted_in = predicted[..., : cfg.n_embd]
            predicted_out = predicted[..., cfg.n_embd :] if cfg.separate_out_embeddings else None
        else:
            predicted_in = predicted
            predicted_out = (
                self.output_projection_out(pooled) if cfg.separate_out_embeddings else None
            )

        if cfg.rescale_embeddings:
            predicted_in = self.scaler(predicted_in)
            if predicted_out is not None:
                predicted_out = self.out_scaler(predicted_out)

        if cfg.predict_bias:
            predicted_bias = self.bias_projection(pooled)[..., 0]
        else:
            predicted_bias = jnp.zeros_like(target_surface_forms[..., 0], dtype=self.dtype)

        return predicted_in, predicted_out, predicted_bias

    def init_rescaler(
        self,
        variables,
        target_surface_forms,
        target_priors,
        source_embeddings,
        lang_index,
        target_embeddings_in,
        target_embeddings_out=None,
    ):
        """Calibrate the affine rescalers so initial predictions match the
        scale of the real embeddings (reference: zett/model/__init__.py:348-385)."""
        cfg = self.config
        if not cfg.rescale_embeddings:
            return variables
        params = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy

        win, bin_ = Rescaler.scale_to(
            source_embeddings,
            target_stds=jnp.full(source_embeddings.shape[1], cfg.initializer_range),
            target_means=jnp.zeros(source_embeddings.shape[1]),
        )
        params["params"]["in_scaler"]["w"] = win
        params["params"]["in_scaler"]["b"] = bin_

        pred_in, pred_out, _ = self.apply(
            params, target_surface_forms, target_priors, source_embeddings, lang_index
        )
        w, b = Rescaler.scale_to(pred_in, target_embeddings_in)
        params["params"]["scaler"]["w"] = w
        params["params"]["scaler"]["b"] = b
        if target_embeddings_out is not None and cfg.separate_out_embeddings:
            w_out, b_out = Rescaler.scale_to(pred_out, target_embeddings_out)
            params["params"]["out_scaler"]["w"] = w_out
            params["params"]["out_scaler"]["b"] = b_out
        return params


class PassthroughHypernet(nn.Module):
    """n-shot baseline: plain learned embedding tables indexed by token id
    (reference: zett/model/__init__.py:163-209)."""

    config: HypernetConfig
    vocab_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        target_surface_forms,
        target_priors=None,
        source_embeddings=None,
        lang_index=None,
        deterministic: bool = True,
        inference: Optional[bool] = None,  # accepted for API parity; unused
    ):
        cfg = self.config
        ids = target_surface_forms[..., 0]
        predicted_in = nn.Embed(
            self.vocab_size, cfg.n_embd, dtype=self.dtype, name="input_embeddings"
        )(ids)
        if cfg.separate_out_embeddings:
            predicted_out = nn.Embed(
                self.vocab_size, cfg.n_embd, dtype=self.dtype, name="output_embeddings"
            )(ids)
        else:
            predicted_out = None
        if cfg.predict_bias:
            predicted_bias = nn.Embed(self.vocab_size, 1, dtype=self.dtype, name="bias")(ids)[..., 0]
        else:
            predicted_bias = jnp.zeros_like(ids, dtype=self.dtype)
        return predicted_in, predicted_out, predicted_bias
