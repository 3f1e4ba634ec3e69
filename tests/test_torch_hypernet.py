"""Flax -> PyTorch hypernet conversion: numerical output parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from zett_tpu.models import Hypernet, HypernetConfig
from zett_tpu.models.torch_hypernet import convert_flax_to_torch


@pytest.mark.parametrize("features", ["basic", "full"])
def test_torch_matches_flax(features):
    if features == "basic":
        cfg = HypernetConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16, vocab_size=120,
            pad_token_id=0, n_embd=16, hn_surface_maxlen=8,
            embed_using_source_embeddings=True, original_vocab_size=100,
            n_extra_tokens=20, hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
        )
    else:
        cfg = HypernetConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, max_position_embeddings=16, vocab_size=120,
            pad_token_id=0, n_embd=16, hn_surface_maxlen=8,
            embed_using_source_embeddings=True, original_vocab_size=100,
            n_extra_tokens=20, separate_out_embeddings=True,
            embed_target_priors=True, add_inter_token_attention=True,
            inter_token_attention_bias_by_priors=True, embed_lang_id=True,
            n_langs=3, rescale_embeddings=True,
            hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
        )
    model = Hypernet(cfg)
    rng = np.random.default_rng(0)
    sf = rng.integers(1, 115, size=(6, 8)).astype(np.int32)
    priors = rng.normal(size=6).astype(np.float32)
    source = rng.normal(size=(100, cfg.n_in_embd)).astype(np.float32)
    lang = np.array(1)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sf), jnp.asarray(priors),
        jnp.asarray(source), jnp.asarray(lang),
    )["params"]
    f_in, f_out, f_bias = model.apply(
        {"params": params}, jnp.asarray(sf), jnp.asarray(priors),
        jnp.asarray(source), jnp.asarray(lang),
    )

    pt = convert_flax_to_torch(cfg, jax.tree_util.tree_map(np.asarray, params))
    pt.eval()
    t_in, t_out, t_bias = pt(
        torch.tensor(sf.astype(np.int64)), torch.tensor(priors),
        torch.tensor(source), torch.tensor(lang.astype(np.int64)),
    )
    np.testing.assert_allclose(np.asarray(f_in), t_in.numpy(), atol=2e-5)
    if f_out is not None:
        np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f_bias), t_bias.numpy(), atol=2e-5)
