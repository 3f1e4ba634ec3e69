"""Transfer pipeline tests: batched inference, sampling coverage, CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zett_tpu.constants import NEGATIVE_INF_FILL_VALUE
from zett_tpu.models import Hypernet, HypernetConfig
from zett_tpu.tokenization import Tokenizer
from zett_tpu.tokenization.convert import convert_to_byte_level
from zett_tpu.transfer import batched_inference, get_sample_indices, transfer


def _hn(n_embd=16, vocab=200):
    cfg = HypernetConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=16, vocab_size=vocab,
        pad_token_id=0, n_embd=n_embd, hn_surface_maxlen=8,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    model = Hypernet(cfg)
    sf = jnp.ones((4, 8), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), sf, jnp.zeros(4))
    return model, params, cfg


class TestSampleIndices:
    def test_coverage(self):
        n, batch, min_k = 100, 40, 2
        p = np.zeros(n)
        idx = get_sample_indices(n, p, batch, min_k, 6, rng=np.random.default_rng(0))
        assert idx.shape == (6, 40)
        counts = np.bincount(idx.ravel(), minlength=n)
        assert (counts >= min_k).all(), "not every token predicted min_k times"
        # no row repeats a token (rng.choice replace=False + disjoint chunks)
        for row in idx:
            assert len(np.unique(row)) == len(row)

    def test_masked_entries_excluded_from_sampling(self):
        n = 50
        p = np.zeros(n)
        p[40:] = NEGATIVE_INF_FILL_VALUE
        idx = get_sample_indices(n, p, 30, 1, 2, rng=np.random.default_rng(0))
        assert idx.shape == (2, 30)
        # masked tokens still appear exactly once (coverage chunks) but are
        # never drawn by the prior-weighted top-up
        counts = np.bincount(idx.ravel(), minlength=n)
        assert (counts[40:] == 1).all()
        assert (counts >= 1).all()


class TestBatchedInference:
    def test_all_tokens_covered(self):
        model, params, cfg = _hn()
        V = 50
        rng = np.random.default_rng(0)
        sf = rng.integers(1, 200, size=(V, 8)).astype(np.int32)
        priors = np.zeros(V, dtype=np.float32)

        @jax.jit
        def predict(sf, pr, src, lidx):
            return model.apply(params, sf, pr)

        emb_in, emb_out, bias = batched_inference(
            predict, sf, priors, None, None, batch_size=16,
            rng=np.random.default_rng(1),
        )
        assert emb_in.shape == (V, cfg.n_embd)
        assert np.isfinite(emb_in).all()
        # deterministic per row: identical rows of sf give identical embeddings
        emb2, _, _ = batched_inference(
            predict, sf, priors, None, None, batch_size=16,
            rng=np.random.default_rng(2),
        )
        np.testing.assert_allclose(emb_in, emb2, atol=1e-5)

    def test_length_bucketing_exact(self):
        """Trimming trailing pad columns is numerically exact (masked
        attention + CLS pooling), so the bucketed path must match the
        full-width path per token."""
        model, params, cfg = _hn()
        V = 60
        rng = np.random.default_rng(3)
        sf = rng.integers(1, 200, size=(V, 8)).astype(np.int32)
        # realistic mix: most tokens short, a few full-width
        lens = rng.choice([2, 3, 4, 8], size=V, p=[0.4, 0.3, 0.2, 0.1])
        for i in range(V):
            sf[i, lens[i]:] = 0
        sf[5] = 0  # all-pad row must not crash either path
        priors = np.zeros(V, dtype=np.float32)

        @jax.jit
        def predict(sf, pr, src, lidx):
            return model.apply(params, sf, pr)

        full, _, bias_full = batched_inference(
            predict, sf, priors, None, None, batch_size=16,
            rng=np.random.default_rng(1),
        )
        bucketed, _, bias_b = batched_inference(
            predict, sf, priors, None, None, batch_size=16,
            rng=np.random.default_rng(2), bucket_multiple=4, pad_id=0,
        )
        np.testing.assert_allclose(full, bucketed, atol=1e-5)
        np.testing.assert_allclose(bias_full, bias_b, atol=1e-5)

    def test_batch_sampling_averages(self):
        model, params, cfg = _hn()
        V = 40
        sf = np.random.default_rng(0).integers(1, 200, size=(V, 8)).astype(np.int32)
        priors = np.zeros(V, dtype=np.float32)

        @jax.jit
        def predict(sf, pr, src, lidx):
            return model.apply(params, sf, pr)

        emb_in, _, _ = batched_inference(
            predict, sf, priors, None, None, batch_size=20,
            do_batch_sampling=True, min_k=2, rng=np.random.default_rng(1),
        )
        assert emb_in.shape == (V, cfg.n_embd)
        assert np.isfinite(emb_in).all()


class TestEndToEndTransfer:
    def test_transfer_api(self, gpt2_like_json, xlmr_like_json):
        source_tok, _ = convert_to_byte_level(Tokenizer.from_json(gpt2_like_json))
        target_tok = Tokenizer.from_json(xlmr_like_json)
        n_src = len(source_tok)
        cfg = HypernetConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, max_position_embeddings=16, vocab_size=len(source_tok) + 10,
            pad_token_id=0, n_embd=16, hn_surface_maxlen=8,
            hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
        )
        model = Hypernet(cfg)
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((4, 8), dtype=jnp.int32), jnp.zeros(4)
        )["params"]
        rng = np.random.default_rng(0)
        src_emb = rng.normal(size=(n_src, 16)).astype(np.float32)

        emb_in, emb_out, bias, converted = transfer(
            hypernet=model,
            hn_params=params,
            hn_tokenizer=source_tok,
            source_tokenizer=source_tok,
            source_embeddings_in=src_emb,
            target_tokenizer=target_tok,
            batch_size=512,
        )
        assert emb_in.shape == (len(converted), 16)
        assert np.isfinite(emb_in).all()
        # special tokens carry the SOURCE embedding verbatim
        for t in converted.all_special_tokens:
            tid, sid = converted.token_to_id(t), source_tok.token_to_id(t)
            if tid is not None and sid is not None:
                np.testing.assert_allclose(emb_in[tid], src_emb[sid], atol=1e-6)
