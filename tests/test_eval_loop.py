"""Eval loop with cached embeddings + relative-position hypernet option."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zett_tpu.evaluation import eval_loop
from zett_tpu.models import Hypernet, HypernetConfig


def test_relative_position_hypernet_forward():
    cfg = HypernetConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=16, vocab_size=200,
        pad_token_id=0, n_embd=16, hn_surface_maxlen=8,
        position_embedding_type="relative",
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    model = Hypernet(cfg)
    sf = jnp.asarray(np.random.default_rng(0).integers(1, 200, size=(6, 8)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), sf, jnp.zeros(6))
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params["params"], sep="/")
    assert "encoder/relative_attention_bias" in flat
    assert not any("position_embeddings" in k for k in flat)
    out = model.apply(params, sf, jnp.zeros(6))[0]
    assert np.isfinite(np.asarray(out)).all()
    # position information flows: permuting the byte sequence changes output
    out2 = model.apply(params, sf[:, ::-1], jnp.zeros(6))[0]
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_eval_loop_cached_embeddings(trainer_fixture=None):
    from tests_helpers_trainer import make_tiny_trainer, make_batch

    trainer = make_tiny_trainer()
    batches = [dict(make_batch(i), lang_code="en") for i in range(3)]
    # fixed tokenizer: all batches share surface forms/priors
    for b in batches:
        b["target_surface_forms"] = batches[0]["target_surface_forms"]
        b["target_priors"] = batches[0]["target_priors"]
    out_cached = eval_loop(trainer, batches, fixed_tokenizer=True)
    out_plain = eval_loop(trainer, batches, fixed_tokenizer=False)
    assert out_cached["eval/eval_loss"] == pytest.approx(
        out_plain["eval/eval_loss"], rel=1e-5
    )
    assert "eval/en_eval_loss" in out_cached
