"""Differential tests: our minimal Flax backbones vs. HF torch implementations
on tiny random models (logit parity)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from zett_tpu.models.backbones.loader import CONVERTERS  # noqa: E402
from zett_tpu.models.backbones.registry import build_model  # noqa: E402


def _torch_state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _compare(model_type, hf_model, hf_config, input_ids, attention_mask=None, atol=2e-4):
    import torch

    module, cfg = build_model(model_type, hf_config=hf_config)
    params = CONVERTERS[model_type](_torch_state_dict(hf_model), cfg)
    ours = module.apply(
        {"params": params},
        jnp.asarray(input_ids),
        attention_mask=jnp.asarray(attention_mask) if attention_mask is not None else None,
    )
    with torch.no_grad():
        theirs = hf_model(
            torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask) if attention_mask is not None else None,
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=atol, rtol=1e-3)


@pytest.fixture(scope="module")
def rng_ids():
    rng = np.random.default_rng(0)
    return rng.integers(0, 100, size=(2, 12)).astype(np.int64)


def test_gpt2_logits_match_hf(rng_ids):
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_config = GPT2Config(
        vocab_size=128, n_positions=32, n_embd=32, n_layer=2, n_head=4,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    import torch

    torch.manual_seed(0)
    model = GPT2LMHeadModel(hf_config).eval()
    _compare("gpt2", model, hf_config, rng_ids)


def test_llama_logits_match_hf(rng_ids):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_config = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_config).eval()
    _compare("llama", model, hf_config, rng_ids)


def test_mistral_gqa_logits_match_hf(rng_ids):
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    hf_config = MistralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, tie_word_embeddings=False,
        sliding_window=None,
    )
    torch.manual_seed(0)
    model = MistralForCausalLM(hf_config).eval()
    _compare("mistral", model, hf_config, rng_ids)


def test_gemma_logits_match_hf(rng_ids):
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    hf_config = GemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, head_dim=8,
        tie_word_embeddings=True, hidden_act="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    model = GemmaForCausalLM(hf_config).eval()
    _compare("gemma", model, hf_config, rng_ids, atol=5e-4)


def test_xlmr_logits_match_hf(rng_ids):
    import torch
    from transformers import XLMRobertaConfig, XLMRobertaForMaskedLM

    hf_config = XLMRobertaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=40, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = XLMRobertaForMaskedLM(hf_config).eval()
    mask = np.ones((2, 12), dtype=np.int64)
    mask[1, 8:] = 0
    _compare("xlm-roberta", model, hf_config, rng_ids, attention_mask=mask)


def test_xglm_logits_match_hf(rng_ids):
    import torch
    from transformers import XGLMConfig, XGLMForCausalLM

    hf_config = XGLMConfig(
        vocab_size=128, d_model=32, ffn_dim=64, num_layers=2, attention_heads=4,
        max_position_embeddings=64, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0,
    )
    torch.manual_seed(0)
    model = XGLMForCausalLM(hf_config).eval()
    ids = np.clip(rng_ids, 2, None)
    _compare("xglm", model, hf_config, ids, atol=5e-4)


def test_embedding_paths_resolve(rng_ids):
    from transformers import GPT2Config

    from zett_tpu.models.backbones.registry import (
        IN_EMBEDDING_PATHS,
        get_subtree,
    )

    hf_config = GPT2Config(vocab_size=64, n_positions=16, n_embd=16, n_layer=1, n_head=2)
    module, cfg = build_model("gpt2", hf_config=hf_config)
    params = module.init(jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32))["params"]
    emb = get_subtree(params, IN_EMBEDDING_PATHS["gpt2"])
    assert emb.shape == (64, 16)


def test_qwen2_gqa_logits_match_hf(rng_ids):
    """qwen2 = llama family + unconditional q/k/v biases (o_proj stays
    bias-free) — beyond the reference's seven families."""
    import torch
    from transformers import Qwen2Config
    from transformers.models.qwen2.modeling_qwen2 import Qwen2ForCausalLM

    hf_config = Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=False, use_sliding_window=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_config).eval()
    _compare("qwen2", model, hf_config, rng_ids)


def test_qwen2_tied_logits_match_hf(rng_ids):
    """the small qwen2 checkpoints tie input/output embeddings."""
    import torch
    from transformers import Qwen2Config
    from transformers.models.qwen2.modeling_qwen2 import Qwen2ForCausalLM

    hf_config = Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        tie_word_embeddings=True, use_sliding_window=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_config).eval()
    _compare("qwen2", model, hf_config, rng_ids)
