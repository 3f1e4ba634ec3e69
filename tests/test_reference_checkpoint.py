"""Numerical parity with reference-format hypernet checkpoints.

The reference code itself (under /root/reference, shimmed for the installed
jax/transformers) is the oracle: we instantiate its Hypernet, convert its
randomly-initialized param tree with zett_tpu.models.reference_io, and assert
our Hypernet reproduces (emb_in, emb_out, bias) numerically. This is exactly
what unblocks the published `benjamin/zett-hypernetwork-*` weights
(reference train.py:1541-1543 save format) the moment network access exists.
"""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zett_tpu.models import Hypernet
from zett_tpu.models.reference_io import (
    convert_reference_hypernet,
    load_reference_hypernet,
    reference_config_to_ours,
)

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_hypernet_cls(tmp_path_factory):
    """Import the reference Hypernet against the installed jax/transformers
    (PositionalSharding shim + star-import surface restore)."""
    if not os.path.isdir(REF):
        pytest.skip("reference repo not available")
    import jax.sharding as _js

    if not hasattr(_js, "PositionalSharding"):
        class _FakePS:  # removed upstream; only referenced, never used here
            def __init__(self, *a, **k):
                pass

        _js.PositionalSharding = _FakePS
    from transformers.models.roberta import modeling_flax_roberta as mfr
    from transformers.models.t5 import modeling_flax_t5 as mft

    for m in (mfr, mft):
        if hasattr(m, "__all__"):
            del m.__all__
    sys.path.insert(0, REF)
    try:
        from zett.model import Hypernet as RefHypernet
        from zett.model import HypernetArgs
    except Exception as e:  # pragma: no cover - env drift
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)

    # the hn encoder's HF config, read by HyperRobertaConfig.from_pretrained
    cfg_dir = tmp_path_factory.mktemp("ref_hn_cfg")
    with open(cfg_dir / "config.json", "w") as f:
        json.dump({
            "model_type": "roberta", "vocab_size": 300, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "intermediate_size": 64, "max_position_embeddings": 18,
            "type_vocab_size": 1, "initializer_range": 0.02,
            "layer_norm_eps": 1e-5, "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0, "pad_token_id": 0,
        }, f)
    return RefHypernet, HypernetArgs, str(cfg_dir)


def _ref_args(HypernetArgs, cfg_dir, **overrides):
    args = HypernetArgs(
        hn_model_name_or_path=cfg_dir,
        hn_surface_maxlen=7,
        hn_n_layers=2,
        n_embd=16,
        hn_hidden_size=32,
        hn_intermediate_size=64,
        hn_num_attention_heads=2,
        hn_model_type="roberta",
        n_langs=3,
    )
    # train.py copies these onto the config object (train.py:295,314,350,361)
    args.pad_token_id = 0
    args.separate_out_embeddings = True
    args.original_vocab_size = 200
    args.hn_n_extra_tokens = 40
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def _ref_args_to_dict(args):
    d = dict(vars(args))
    d["hidden_act"] = "gelu"
    return d


CASES = {
    "base": {},
    "source_embed_rescale": {
        "hn_embed_using_source_embeddings": True,
        "hn_rescale_embeddings": True,
    },
    "priors_lang_adapters_single_head": {
        "hn_embed_target_priors": True,
        "hn_embed_lang_id": True,
        "hn_language_adapter_bottleneck_dim": 8,
        "hn_single_head": True,
    },
    "tied_no_bias": {
        "separate_out_embeddings": False,
        "hn_predict_bias": False,
    },
    # the reference's `with_target_priors_with_inter_token_attn` ablation
    # (configs/zeroshot/v7:gpt2:with_target_priors_with_inter_token_attn):
    # exchanges are full residual attention blocks -> loads through the
    # inter_token_residual_ln compat mode
    "priors_inter_token_attn": {
        "hn_embed_target_priors": True,
        "hn_add_inter_token_attention": True,
        "hn_n_inter_token_blocks": 4,
    },
    "inter_token_attn_bias_by_priors": {
        "hn_add_inter_token_attention": True,
        "hn_inter_token_attention_bias_by_priors": True,
        "hn_inter_token_attention_bias_scaler": 0.5,
        "hn_n_inter_token_blocks": 4,
    },
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_reference_forward_parity(ref_hypernet_cls, case):
    RefHypernet, HypernetArgs, cfg_dir = ref_hypernet_cls
    args = _ref_args(HypernetArgs, cfg_dir, **CASES[case])

    ref_model = RefHypernet(config=args, dtype=jnp.float32)

    V, M = 12, 7
    rng = np.random.default_rng(0)
    if getattr(args, "hn_embed_using_source_embeddings", False):
        sf = rng.integers(0, args.original_vocab_size + args.hn_n_extra_tokens,
                          size=(V, M)).astype(np.int32)
    else:
        sf = rng.integers(0, 290, size=(V, M)).astype(np.int32)
    sf[:, 0] = np.maximum(sf[:, 0], 1)  # CLS position not pad
    priors = rng.normal(size=V).astype(np.float32)
    source = rng.normal(size=(args.original_vocab_size, 2 * args.n_embd)).astype(np.float32)
    lang_index = jnp.asarray(1, dtype=jnp.int32)

    ref_params = ref_model.init(
        jax.random.PRNGKey(0), jnp.asarray(sf), jnp.asarray(priors),
        jnp.asarray(source), lang_index,
    )
    ref_out = ref_model.apply(
        ref_params, jnp.asarray(sf), jnp.asarray(priors),
        jnp.asarray(source), lang_index,
    )

    from zett_tpu.models.reference_io import sync_config_to_params

    config = reference_config_to_ours(_ref_args_to_dict(args))
    ours_params = convert_reference_hypernet(
        jax.tree_util.tree_map(np.asarray, ref_params), config
    )
    config = sync_config_to_params(config, ours_params)
    ours = Hypernet(config, dtype=jnp.float32)
    our_out = ours.apply(
        {"params": ours_params}, jnp.asarray(sf), jnp.asarray(priors),
        jnp.asarray(source), lang_index,
    )

    for name, r, o in zip(("emb_in", "emb_out", "bias"), ref_out, our_out):
        if r is None:
            assert o is None or np.allclose(np.asarray(o), 0), name
            continue
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=2e-5, atol=2e-6,
            err_msg=f"{case}:{name}",
        )


def test_load_reference_hypernet_directory(ref_hypernet_cls, tmp_path):
    """End-to-end: a save_pretrained-layout directory (config.json +
    flax_model.msgpack) loads via load_reference_hypernet and reproduces the
    reference forward."""
    from flax import serialization

    RefHypernet, HypernetArgs, cfg_dir = ref_hypernet_cls
    args = _ref_args(HypernetArgs, cfg_dir, hn_embed_using_source_embeddings=True)
    ref_model = RefHypernet(config=args, dtype=jnp.float32)

    V, M = 10, 7
    rng = np.random.default_rng(1)
    sf = rng.integers(0, args.original_vocab_size + args.hn_n_extra_tokens,
                      size=(V, M)).astype(np.int32)
    sf[:, 0] = np.maximum(sf[:, 0], 1)
    priors = np.zeros(V, dtype=np.float32)
    source = rng.normal(size=(args.original_vocab_size, 2 * args.n_embd)).astype(np.float32)

    ref_params = ref_model.init(
        jax.random.PRNGKey(2), jnp.asarray(sf), jnp.asarray(priors),
        jnp.asarray(source), None,
    )
    ref_out = ref_model.apply(
        ref_params, jnp.asarray(sf), jnp.asarray(priors), jnp.asarray(source), None
    )

    ckpt = tmp_path / "ref_ckpt"
    os.makedirs(ckpt)
    with open(ckpt / "config.json", "w") as f:
        json.dump(_ref_args_to_dict(args), f)
    with open(ckpt / "flax_model.msgpack", "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, ref_params["params"])
        ))

    config, params = load_reference_hypernet(str(ckpt))
    out = Hypernet(config).apply(
        {"params": params}, jnp.asarray(sf), jnp.asarray(priors),
        jnp.asarray(source), None,
    )
    for name, r, o in zip(("emb_in", "emb_out", "bias"), ref_out, out):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=2e-5, atol=2e-6, err_msg=name
        )


T5_CASES = {
    "t5_base": {},
    # NOTE: hn_embed_using_source_embeddings + t5 has NO parity case because
    # the reference itself cannot run it: its Hypernet passes inputs_embeds
    # to FlaxHyperT5EncoderModule.__call__, which doesn't accept the kwarg
    # (TypeError, zett/model/__init__.py:417-425 with hyper_t5.py:420-433) —
    # see test_reference_t5_source_embed_broken_upstream. Our compat encoder
    # accepts inputs_embeds regardless (a working superset).
    "t5_priors_inter_token": {
        "hn_embed_target_priors": True,
        "hn_add_inter_token_attention": True,
        "hn_n_inter_token_blocks": 4,
    },
}


def test_reference_t5_source_embed_broken_upstream(ref_hypernet_cls, ref_t5_cfg_dir):
    """Pin the upstream gap that removes the t5+source-embeddings parity
    case: the reference's own forward raises TypeError for this combination,
    so no published checkpoint of that shape can exist."""
    RefHypernet, HypernetArgs, _ = ref_hypernet_cls
    args = _ref_args(HypernetArgs, ref_t5_cfg_dir, hn_model_type="t5",
                     hn_embed_using_source_embeddings=True)
    ref_model = RefHypernet(config=args, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    sf = rng.integers(0, 240, size=(4, 7)).astype(np.int32)
    source = rng.normal(size=(200, 32)).astype(np.float32)
    with pytest.raises(TypeError, match="inputs_embeds"):
        ref_model.init(jax.random.PRNGKey(0), jnp.asarray(sf),
                       jnp.zeros(4, np.float32), jnp.asarray(source), None)


@pytest.fixture(scope="module")
def ref_t5_cfg_dir(ref_hypernet_cls, tmp_path_factory):
    cfg_dir = tmp_path_factory.mktemp("ref_hn_t5_cfg")
    with open(cfg_dir / "config.json", "w") as f:
        json.dump({
            "model_type": "t5", "vocab_size": 300, "d_model": 32, "d_ff": 64,
            "num_layers": 2, "num_heads": 2, "d_kv": 16,
            "relative_attention_num_buckets": 32,
            "relative_attention_max_distance": 128,
            "layer_norm_epsilon": 1e-6, "dropout_rate": 0.0,
            "feed_forward_proj": "relu", "initializer_factor": 1.0,
            "is_encoder_decoder": False,
        }, f)
    return str(cfg_dir)


@pytest.mark.parametrize("case", sorted(T5_CASES))
def test_reference_t5_forward_parity(ref_hypernet_cls, ref_t5_cfg_dir, case):
    """hn_model_type="t5" checkpoints (reference zett/model/hyper_t5.py)
    load numerically through the T5-compat encoder
    (models/hypernet_t5.py): pre-LN RMS blocks, unscaled attention,
    relative bias in block 0, prior token with the log(1e-12)
    normalization, T5-style inter-token exchange."""
    RefHypernet, HypernetArgs, _ = ref_hypernet_cls
    args = _ref_args(HypernetArgs, ref_t5_cfg_dir,
                     hn_model_type="t5", **T5_CASES[case])

    ref_model = RefHypernet(config=args, dtype=jnp.float32)

    V, M = 12, 7
    rng = np.random.default_rng(3)
    if getattr(args, "hn_embed_using_source_embeddings", False):
        sf = rng.integers(0, args.original_vocab_size + args.hn_n_extra_tokens,
                          size=(V, M)).astype(np.int32)
    else:
        sf = rng.integers(0, 290, size=(V, M)).astype(np.int32)
    sf[:, 0] = np.maximum(sf[:, 0], 1)
    priors = rng.normal(size=V).astype(np.float32)
    source = rng.normal(size=(args.original_vocab_size, 2 * args.n_embd)).astype(np.float32)

    ref_params = ref_model.init(
        jax.random.PRNGKey(0), jnp.asarray(sf), jnp.asarray(priors),
        jnp.asarray(source), None,
    )
    ref_out = ref_model.apply(
        ref_params, jnp.asarray(sf), jnp.asarray(priors),
        jnp.asarray(source), None,
    )

    from zett_tpu.models.reference_io import sync_config_to_params

    ref_cfg_dict = dict(_ref_args_to_dict(args))
    with open(os.path.join(ref_t5_cfg_dir, "config.json")) as f:
        ref_cfg_dict.update({k: v for k, v in json.load(f).items()
                             if k not in ref_cfg_dict})
    config = reference_config_to_ours(ref_cfg_dict)
    assert config.encoder_type == "t5"
    ours_params = convert_reference_hypernet(
        jax.tree_util.tree_map(np.asarray, ref_params), config
    )
    config = sync_config_to_params(config, ours_params)
    ours = Hypernet(config, dtype=jnp.float32)
    our_out = ours.apply(
        {"params": ours_params}, jnp.asarray(sf), jnp.asarray(priors),
        jnp.asarray(source), None,
    )
    for name, r, o in zip(("emb_in", "emb_out", "bias"), ref_out, our_out):
        if r is None:
            assert o is None or np.allclose(np.asarray(o), 0), name
            continue
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=2e-5, atol=2e-6,
            err_msg=f"{case}:{name}",
        )


def test_inter_token_config_maps_to_compat_mode():
    """Loading an inter-token-attention checkpoint config turns on the
    residual+LN compat mode so the exchange matches the reference's full
    attention block (hyper_roberta.py:344-427)."""
    cfg = reference_config_to_ours({
        "hn_hidden_size": 32, "hn_intermediate_size": 64, "hn_n_layers": 2,
        "hn_num_attention_heads": 2, "n_embd": 16,
        "hn_add_inter_token_attention": True, "hn_n_inter_token_blocks": 4,
    })
    assert cfg.add_inter_token_attention
    assert cfg.inter_token_residual_ln
    assert cfg.n_inter_token_blocks == 4
