"""Shared tiny-trainer construction for engine-level tests."""

import numpy as np

import jax
import jax.numpy as jnp

from zett_tpu.models import HypernetConfig
from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
from zett_tpu.training import Trainer, TrainingConfig

V_BATCH = 64


def make_tiny_trainer(**train_kw):
    bb_cfg = GPT2Config(vocab_size=256, n_positions=32, n_embd=32, n_layer=1, n_head=2)
    backbone = GPT2LMHeadModel(bb_cfg)
    params = backbone.init(jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32))["params"]
    hn_cfg = HypernetConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=16, vocab_size=300,
        pad_token_id=0, n_embd=32, hn_surface_maxlen=8,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    defaults = dict(steps=5, learning_rate=1e-3, warmup_steps=2, logging_steps=10,
                    save_steps=0, eval_steps=0)
    defaults.update(train_kw)
    return Trainer(
        hn_config=hn_cfg, backbone_config=bb_cfg, backbone_params=params,
        model_type="gpt2", train_config=TrainingConfig(**defaults),
        vocab_batch_size=V_BATCH,
    )


def make_batch(seed=0, B=2):
    rng = np.random.default_rng(seed)
    L, V, M = 16, V_BATCH, 8
    return {
        "input_ids": rng.integers(0, V, size=(B, L)).astype(np.int32),
        "attention_mask": np.ones((B, L), dtype=np.int32),
        "labels": rng.integers(0, V, size=(B, L)).astype(np.int32),
        "target_surface_forms": rng.integers(1, 300, size=(V, M)).astype(np.int32),
        "target_priors": np.zeros(V, dtype=np.float32),
        "mask": np.ones(V, dtype=bool),
        "ids_to_embed": rng.permutation(256)[:V].astype(np.int32),
        "special_indices": np.array([0]),
        "special_indices_in_reference": np.array([0]),
        "lang_index": np.array(0),
        "byte_lengths": rng.integers(1, 8, size=(B, L)).astype(np.int32),
    }
