"""End-to-end CLI flow: build an HF-format backbone dir, save a hypernet
checkpoint, run the transfer CLI, then the eval CLI on the result."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory, gpt2_like_json):
    """A tiny HF-format gpt2 model directory (config + safetensors + tokenizer)."""
    from safetensors.numpy import save_file

    from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
    from zett_tpu.models.backbones.loader import invert_gpt2
    from zett_tpu.tokenization import Tokenizer

    path = tmp_path_factory.mktemp("gpt2_model")
    tok = Tokenizer.from_json(gpt2_like_json)
    vocab = len(tok)
    cfg = GPT2Config(vocab_size=vocab, n_positions=64, n_embd=32, n_layer=1, n_head=2)
    module = GPT2LMHeadModel(cfg)
    params = module.init(jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32))["params"]
    sd = invert_gpt2(jax.tree_util.tree_map(np.asarray, params), cfg)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              str(path / "model.safetensors"))
    with open(path / "config.json", "w") as f:
        json.dump({
            "model_type": "gpt2", "vocab_size": vocab, "n_positions": 64,
            "n_embd": 32, "n_layer": 1, "n_head": 2,
            "layer_norm_epsilon": 1e-5, "tie_word_embeddings": True,
        }, f)
    tok.save(str(path / "tokenizer.json"))
    return str(path)


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory, model_dir):
    """A hypernet checkpoint saved through the Trainer's checkpointing."""
    from zett_tpu.models import HypernetConfig
    from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
    from zett_tpu.tokenization import Tokenizer
    from zett_tpu.tokenization.convert import convert_to_byte_level
    from zett_tpu.training import Trainer, TrainingConfig

    path = str(tmp_path_factory.mktemp("ckpt"))
    with open(os.path.join(model_dir, "config.json")) as f:
        cj = json.load(f)
    cfg = GPT2Config(vocab_size=cj["vocab_size"], n_positions=64, n_embd=32,
                     n_layer=1, n_head=2)
    module = GPT2LMHeadModel(cfg)
    params = module.init(jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32))["params"]
    hn_cfg = HypernetConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=16,
        vocab_size=cj["vocab_size"] + 64, pad_token_id=0, n_embd=32,
        hn_surface_maxlen=8, hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    trainer = Trainer(
        hn_config=hn_cfg, backbone_config=cfg, backbone_params=params,
        model_type="gpt2",
        train_config=TrainingConfig(steps=1, warmup_steps=1, output_dir=path),
        vocab_batch_size=64,
    )
    trainer.save_checkpoint(path)
    hn_tok, _ = convert_to_byte_level(
        Tokenizer.from_file(os.path.join(model_dir, "tokenizer.json"))
    )
    hn_tok.save(os.path.join(path, "tokenizer.json"))
    return path


def test_transfer_and_eval_cli(model_dir, ckpt_dir, xlmr_like_json, tmp_path, corpus):
    from zett_tpu.tokenization import Tokenizer

    target_path = str(tmp_path / "target_tokenizer.json")
    Tokenizer.from_json(xlmr_like_json).save(target_path)
    out_dir = str(tmp_path / "transferred")

    from zett_tpu.transfer.__main__ import main as transfer_main

    transfer_main([
        "--checkpoint", ckpt_dir,
        "--model", model_dir,
        "--target-tokenizer", target_path,
        "--output", out_dir,
        "--batch-size", "512",
    ])
    assert os.path.exists(os.path.join(out_dir, "model.safetensors"))
    assert os.path.exists(os.path.join(out_dir, "tokenizer.json"))
    assert os.path.exists(os.path.join(out_dir, "bias.npy"))
    with open(os.path.join(out_dir, "config.json")) as f:
        cj = json.load(f)
    target = Tokenizer.from_file(os.path.join(out_dir, "tokenizer.json"))
    assert cj["vocab_size"] == len(target)

    # eval CLI on the transferred model
    data_path = str(tmp_path / "eval.txt")
    with open(data_path, "w") as f:
        for t in corpus[:80]:
            if t.strip():
                f.write(t.replace("\n", " ") + "\n")
    from zett_tpu.evaluation.__main__ import main as eval_main
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        eval_main([
            "--model", out_dir,
            "--data", data_path,
            "--block-size", "32",
            "--batch-size", "4",
            "--bias", os.path.join(out_dir, "bias.npy"),
        ])
    metrics = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert np.isfinite(metrics["loss"])
    assert metrics["perplexity"] > 0
    assert 0 < metrics["bits_per_char"] < 1000


def test_baselines_cli_all_methods(model_dir, xlmr_like_json, tmp_path):
    """baselines_cli writes a loadable HF dir for each non-hypernet method
    (reference: scripts/transfer_{lexical,focus,ofa}.py)."""
    from zett_tpu.tokenization import Tokenizer
    from zett_tpu.transfer.baselines_cli import main as baselines_main

    target_path = str(tmp_path / "target_tokenizer.json")
    Tokenizer.from_json(xlmr_like_json).save(target_path)

    # word2vec-format auxiliary vectors for the ofa path
    vec_path = str(tmp_path / "vectors.txt")
    rng = np.random.default_rng(0)
    words = ["the", "of", "and", "hello", "world", "der", "die", "das"]
    with open(vec_path, "w") as f:
        f.write(f"{len(words)} 6\n")
        for w in words:
            f.write(w + " " + " ".join(f"{x:.4f}" for x in rng.normal(size=6)) + "\n")

    for method, extra in [
        ("bfvt", []),
        ("focus", []),
        ("ofa", ["--word-embeddings", vec_path, "--factorize-dim", "16"]),
        ("ofa", []),  # char-n-gram fallback
    ]:
        out_dir = str(tmp_path / f"out_{method}_{len(extra)}")
        baselines_main([
            "--method", method,
            "--model", model_dir,
            "--target-tokenizer", target_path,
            "--output", out_dir,
            *extra,
        ])
        assert os.path.exists(os.path.join(out_dir, "model.safetensors"))
        with open(os.path.join(out_dir, "config.json")) as f:
            cj = json.load(f)
        target = Tokenizer.from_file(os.path.join(out_dir, "tokenizer.json"))
        assert cj["vocab_size"] == len(target)
