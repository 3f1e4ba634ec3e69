"""Multihost helpers + FSDP sharding on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from zett_tpu.parallel import make_mesh
from zett_tpu.parallel.multihost import (
    batch_seed_for_step,
    make_global_batch,
    process_slice,
)
from zett_tpu.parallel.sharding import fsdp_rules, resolve_pspec


def test_batch_seed_deterministic():
    assert batch_seed_for_step(7, 100) == batch_seed_for_step(7, 100)
    assert batch_seed_for_step(7, 100) != batch_seed_for_step(7, 101)
    assert batch_seed_for_step(7, 100) != batch_seed_for_step(8, 100)


def test_process_slice_single_process():
    sl = process_slice(64)
    assert sl == slice(0, 64)


def test_make_global_batch():
    mesh = make_mesh(n_data=8, n_model=1)
    batch = {
        "input_ids": np.arange(8 * 16, dtype=np.int32).reshape(8, 16),
        "lang_code": "en",
    }
    out = make_global_batch(batch, mesh, {"input_ids": P("data", None)})
    assert out["input_ids"].shape == (8, 16)
    assert out["lang_code"] == "en"
    np.testing.assert_array_equal(np.asarray(out["input_ids"]), batch["input_ids"])


def test_fsdp_rules_fully_shard():
    rules = fsdp_rules("llama")
    spec = resolve_pspec(("model", "layers_0", "self_attn", "q_proj", "kernel"), rules)
    assert spec == P("data", "model")
    spec = resolve_pspec(("model", "layers_0", "mlp", "down_proj", "kernel"), rules)
    assert spec == P("model", "data")
    spec = resolve_pspec(("model", "embed_tokens", "embedding"), rules)
    assert spec == P("data", None)


def test_trainer_fsdp_state_shards():
    from tests_helpers_trainer import make_batch, make_tiny_trainer

    import dataclasses

    from zett_tpu.models import HypernetConfig
    from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
    from zett_tpu.training import Trainer, TrainingConfig
    import jax.numpy as jnp

    mesh = make_mesh(n_data=4, n_model=2)
    bb_cfg = GPT2Config(vocab_size=256, n_positions=32, n_embd=32, n_layer=1, n_head=2)
    backbone = GPT2LMHeadModel(bb_cfg)
    params = backbone.init(jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32))["params"]
    hn_cfg = HypernetConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=16, vocab_size=300,
        pad_token_id=0, n_embd=32, hn_surface_maxlen=8,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    trainer = Trainer(
        hn_config=hn_cfg, backbone_config=bb_cfg, backbone_params=params,
        model_type="gpt2",
        train_config=TrainingConfig(steps=2, warmup_steps=1, logging_steps=10,
                                    save_steps=0, eval_steps=0),
        vocab_batch_size=64, mesh=mesh, fsdp=True,
    )
    # attention kernel is sharded over both axes
    kern = trainer.state.params["inner"]["transformer"]["h_0"]["attn"]["c_attn"]["kernel"]
    assert len(kern.sharding.spec) == 2
    # a train step still runs
    trainer.state, metrics = trainer.train_step(
        trainer.state, trainer._device_batch(make_batch(B=8))
    )
    assert np.isfinite(float(metrics["loss"]))
