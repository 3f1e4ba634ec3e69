"""Hypernet forward/feature tests + embedding splice into frozen backbones."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zett_tpu.models import Hypernet, HypernetConfig, PassthroughHypernet, Rescaler


def _cfg(**kw):
    base = dict(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        vocab_size=300,
        pad_token_id=0,
        n_embd=24,
        hn_surface_maxlen=8,
        hidden_dropout_prob=0.0,
        attention_dropout_prob=0.0,
    )
    base.update(kw)
    return HypernetConfig(**base)


def _inputs(cfg, n_tokens=12, seed=0):
    rng = np.random.default_rng(seed)
    sf = rng.integers(1, cfg.vocab_size, size=(n_tokens, cfg.hn_surface_maxlen)).astype(np.int32)
    sf[:, 4:] = 0  # padding
    priors = rng.normal(size=(n_tokens,)).astype(np.float32)
    return jnp.asarray(sf), jnp.asarray(priors)


class TestHypernetForward:
    def test_basic_shapes(self):
        cfg = _cfg()
        model = Hypernet(cfg)
        sf, priors = _inputs(cfg)
        params = model.init(jax.random.PRNGKey(0), sf, priors)
        emb_in, emb_out, bias = model.apply(params, sf, priors)
        assert emb_in.shape == (12, cfg.n_embd)
        assert emb_out is None
        assert bias.shape == (12,)

    def test_separate_out_embeddings(self):
        cfg = _cfg(separate_out_embeddings=True)
        model = Hypernet(cfg)
        sf, priors = _inputs(cfg)
        params = model.init(jax.random.PRNGKey(0), sf, priors)
        emb_in, emb_out, _ = model.apply(params, sf, priors)
        assert emb_in.shape == (12, cfg.n_embd)
        assert emb_out.shape == (12, cfg.n_embd)

    def test_single_head(self):
        cfg = _cfg(separate_out_embeddings=True, single_head=True)
        model = Hypernet(cfg)
        sf, priors = _inputs(cfg)
        params = model.init(jax.random.PRNGKey(0), sf, priors)
        emb_in, emb_out, _ = model.apply(params, sf, priors)
        assert emb_in.shape == (12, cfg.n_embd)
        assert emb_out.shape == (12, cfg.n_embd)

    def test_all_extensions_on(self):
        cfg = _cfg(
            embed_target_priors=True,
            add_inter_token_attention=True,
            inter_token_attention_bias_by_priors=True,
            n_inter_token_blocks=4,
            language_adapter_bottleneck_dim=8,
            embed_lang_id=True,
            n_langs=3,
        )
        model = Hypernet(cfg)
        sf, priors = _inputs(cfg)
        lang_index = jnp.array(1)
        params = model.init(jax.random.PRNGKey(0), sf, priors, None, lang_index)
        emb_in, _, bias = model.apply(params, sf, priors, None, lang_index)
        assert emb_in.shape == (12, cfg.n_embd)
        # language adapters must make lang_index matter
        emb_in2, _, _ = model.apply(params, sf, priors, None, jnp.array(2))
        assert not np.allclose(np.asarray(emb_in), np.asarray(emb_in2))

    def test_source_embedding_mode_with_fallback(self):
        cfg = _cfg(
            embed_using_source_embeddings=True,
            original_vocab_size=200,
            n_extra_tokens=100,
        )
        model = Hypernet(cfg)
        sf, priors = _inputs(cfg)
        source = jnp.asarray(np.random.default_rng(1).normal(size=(200, cfg.n_in_embd)), dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), sf, priors, source)
        emb_in, _, _ = model.apply(params, sf, priors, source)
        assert emb_in.shape == (12, cfg.n_embd)
        # ids >= original_vocab_size route to the fallback table: change the
        # source embeddings and outputs for pure-fallback rows must not change
        sf_fb = jnp.where(sf > 0, sf % 90 + cfg.original_vocab_size, 0)
        out1 = model.apply(params, sf_fb, priors, source)[0]
        out2 = model.apply(params, sf_fb, priors, source * 2.0)[0]
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    def test_priors_affect_output_when_embedded(self):
        cfg = _cfg(embed_target_priors=True)
        model = Hypernet(cfg)
        sf, priors = _inputs(cfg)
        params = model.init(jax.random.PRNGKey(0), sf, priors)
        out1 = model.apply(params, sf, priors)[0]
        out2 = model.apply(params, sf, priors + 1.0)[0]
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_rescaler_calibration(self):
        cfg = _cfg(rescale_embeddings=True, embed_using_source_embeddings=True,
                   original_vocab_size=200, n_extra_tokens=10)
        model = Hypernet(cfg)
        sf, priors = _inputs(cfg)
        rng = np.random.default_rng(2)
        source = jnp.asarray(rng.normal(size=(200, cfg.n_embd)) * 5.0, dtype=jnp.float32)
        target_in = jnp.asarray(rng.normal(size=(12, cfg.n_embd)) * 0.3 + 1.0, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), sf, priors, source)
        params = model.init_rescaler(params, sf, priors, source, None, target_in)
        pred_in, _, _ = model.apply(params, sf, priors, source)
        # calibrated predictions match target scale within tolerance
        assert abs(float(pred_in.std()) - float(target_in.std())) < 0.3
        assert abs(float(pred_in.mean()) - float(target_in.mean())) < 0.3

    def test_deterministic_flag_and_dropout(self):
        cfg = _cfg(hidden_dropout_prob=0.3, attention_dropout_prob=0.3)
        model = Hypernet(cfg)
        sf, priors = _inputs(cfg)
        params = model.init(jax.random.PRNGKey(0), sf, priors)
        out_det = model.apply(params, sf, priors, deterministic=True)[0]
        out_det2 = model.apply(params, sf, priors, deterministic=True)[0]
        np.testing.assert_array_equal(np.asarray(out_det), np.asarray(out_det2))
        out_rng = model.apply(
            params, sf, priors, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
        )[0]
        assert not np.allclose(np.asarray(out_det), np.asarray(out_rng))


class TestPassthrough:
    def test_shapes(self):
        cfg = _cfg(separate_out_embeddings=True)
        model = PassthroughHypernet(cfg, vocab_size=500)
        sf, priors = _inputs(cfg)
        params = model.init(jax.random.PRNGKey(0), sf, priors)
        emb_in, emb_out, bias = model.apply(params, sf, priors)
        assert emb_in.shape == (12, cfg.n_embd)
        assert emb_out.shape == (12, cfg.n_embd)
        assert bias.shape == (12,)


class TestSplice:
    def test_splice_into_gpt2_and_grads_flow(self):
        from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
        from zett_tpu.models.splice import extract_embeddings, splice_embeddings

        bb_cfg = GPT2Config(vocab_size=64, n_positions=16, n_embd=24, n_layer=1, n_head=2)
        backbone = GPT2LMHeadModel(bb_cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 30, size=(2, 8)))
        bb_params = backbone.init(jax.random.PRNGKey(0), ids)["params"]

        source, orig_vocab = extract_embeddings(bb_params, "gpt2", pad_to_multiple_of=16)
        assert orig_vocab == 64
        assert source.shape[0] % 16 == 0

        cfg = _cfg(n_embd=24)
        hn = Hypernet(cfg)
        sf, priors = _inputs(cfg, n_tokens=30)
        hn_params = hn.init(jax.random.PRNGKey(1), sf, priors)

        # apply-time module uses the spliced vocab size (static under jit;
        # the reference mutates config.vocab_size per batch, train.py:1346)
        import dataclasses

        spliced_backbone = GPT2LMHeadModel(dataclasses.replace(bb_cfg, vocab_size=30))

        def loss_fn(hn_p):
            emb_in, emb_out, bias = hn.apply(hn_p, sf, priors)
            params = splice_embeddings(bb_params, "gpt2", emb_in, emb_out)
            logits = spliced_backbone.apply({"params": params}, ids)
            return jnp.mean(logits**2), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(hn_params)
        assert logits.shape == (2, 8, 30)  # spliced vocab size, not original
        gnorm = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.abs(x).sum()), grads, 0.0
        )
        assert gnorm > 0, "no gradient flowed into the hypernet"
        # original tree untouched (functional splice)
        assert bb_params["transformer"]["wte"]["embedding"].shape == (64, 24)

    def test_splice_untied_llama(self):
        from zett_tpu.models.backbones.llama import LlamaConfig, LlamaForCausalLM
        from zett_tpu.models.splice import splice_embeddings

        bb_cfg = LlamaConfig(
            vocab_size=64, hidden_size=24, intermediate_size=48, num_hidden_layers=1,
            num_attention_heads=2, tie_word_embeddings=False,
        )
        backbone = LlamaForCausalLM(bb_cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 30, size=(2, 8)))
        bb_params = backbone.init(jax.random.PRNGKey(0), ids)["params"]
        emb_in = jnp.ones((30, 24))
        emb_out = jnp.ones((30, 24)) * 2
        spliced = splice_embeddings(bb_params, "llama", emb_in, emb_out)
        import dataclasses

        spliced_model = LlamaForCausalLM(dataclasses.replace(bb_cfg, vocab_size=30))
        logits = spliced_model.apply({"params": spliced}, ids)
        assert logits.shape == (2, 8, 30)

    def test_splice_roberta_bias(self):
        from zett_tpu.models.backbones.roberta import RobertaConfig, RobertaForMaskedLM
        from zett_tpu.models.splice import splice_embeddings

        bb_cfg = RobertaConfig(
            vocab_size=64, hidden_size=24, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=48, max_position_embeddings=20, pad_token_id=1,
        )
        backbone = RobertaForMaskedLM(bb_cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 30, size=(2, 8)))
        bb_params = backbone.init(jax.random.PRNGKey(0), ids)["params"]
        bias = jnp.full((30,), 7.0)
        spliced = splice_embeddings(bb_params, "xlm-roberta", jnp.ones((30, 24)), None, bias)
        import dataclasses

        spliced_model = RobertaForMaskedLM(dataclasses.replace(bb_cfg, vocab_size=30))
        logits = spliced_model.apply({"params": spliced}, ids)
        assert logits.shape == (2, 8, 30)
        assert np.asarray(spliced["lm_head_bias"]).shape == (30,)


class TestMergedHeadAttention:
    """The merged-head block-diagonal attention (zero layout copies at
    surface-form widths, experiments/profiles/hypernet_r4.md) must be
    numerically identical to the classic per-head formulation for every
    bias kind, and the per-head fallback must engage at long key lengths."""

    def _qkv(self, B=32, L=7, heads=4, d=16, seed=0):
        import numpy as np

        r = np.random.default_rng(seed)
        H = heads * d
        mk = lambda: jnp.asarray(  # noqa: E731
            r.standard_normal((B, L, H)), jnp.float32)
        return mk(), mk(), mk(), heads

    def test_matches_per_head_all_bias_kinds(self):
        import numpy as np

        import zett_tpu.models.hypernet as H

        q, k, v, heads = self._qkv()
        B, L, _ = q.shape
        r = np.random.default_rng(1)
        key_bias = jnp.asarray(r.standard_normal((B, L)), jnp.float32)
        head_bias = jnp.asarray(r.standard_normal((1, heads, L, L)), jnp.float32)
        for kb, hb in [(None, None), (key_bias, None), (None, head_bias),
                       (key_bias, head_bias)]:
            merged = H._merged_head_attention(
                q, k, v, kb, hb, heads, jnp.float32, 0.0, True)
            save = H.MERGED_ATTENTION_MAX
            H.MERGED_ATTENTION_MAX = 0  # force per-head
            try:
                per_head = H._attention(
                    q, k, v, kb, hb, heads, jnp.float32, 0.0, True)
            finally:
                H.MERGED_ATTENTION_MAX = save
            np.testing.assert_allclose(
                np.asarray(merged), np.asarray(per_head), atol=2e-5)

    def test_cls_query_only_shape(self):
        import numpy as np

        import zett_tpu.models.hypernet as H

        q, k, v, heads = self._qkv()
        merged = H._merged_head_attention(
            q[:, :1], k, v, None, None, heads, jnp.float32, 0.0, True)
        per = H._attention(q[:, :1], k, v, None, None, heads, jnp.float32, 0.0, True)
        assert merged.shape == (q.shape[0], 1, q.shape[2])
        np.testing.assert_allclose(np.asarray(merged), np.asarray(per), atol=2e-5)

    def test_long_keys_use_per_head(self):
        # inter-token exchange keys span the vocab axis: merged would blow
        # up memory h-fold there, so the dispatcher must fall back
        import zett_tpu.models.hypernet as H

        q, k, v, heads = self._qkv(B=2, L=7)
        long_k = jnp.tile(k, (1, 80, 1))  # Lk*heads = 2240 > 256
        long_v = jnp.tile(v, (1, 80, 1))
        out = H._attention(q, long_k, long_v, None, None, heads,
                           jnp.float32, 0.0, True)
        assert out.shape == q.shape
