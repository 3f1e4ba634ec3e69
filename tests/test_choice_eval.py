"""Multiple-choice loglikelihood eval (evaluation/choice.py): differential
against torch HF GPT-2 loaded from the SAME model dir, plus CLI end-to-end.

The reference gets these numbers from the external lm_eval harness
(experiments/eval_english.sh); transferred models are standard HF dirs, so
our per-continuation log-likelihoods must match what any external harness
computes with HF transformers on the same weights.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zett_tpu.evaluation.choice import (
    evaluate_choice_task,
    score_loglikelihoods,
)
from zett_tpu.tokenization import Tokenizer


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory, gpt2_like_json):
    from safetensors.numpy import save_file

    from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
    from zett_tpu.models.backbones.loader import invert_gpt2

    path = tmp_path_factory.mktemp("gpt2_model_choice")
    tok = Tokenizer.from_json(gpt2_like_json)
    vocab = len(tok)
    cfg = GPT2Config(vocab_size=vocab, n_positions=128, n_embd=32, n_layer=2, n_head=2)
    params = GPT2LMHeadModel(cfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32)
    )["params"]
    sd = invert_gpt2(jax.tree_util.tree_map(np.asarray, params), cfg)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              str(path / "model.safetensors"))
    with open(path / "config.json", "w") as f:
        json.dump({
            "model_type": "gpt2", "vocab_size": vocab, "n_positions": 128,
            "n_embd": 32, "n_layer": 2, "n_head": 2,
            "layer_norm_epsilon": 1e-5, "tie_word_embeddings": True,
        }, f)
    tok.save(str(path / "tokenizer.json"))
    return str(path), params, cfg, tok


ITEMS = [
    {"query": "The quick brown fox jumps over the",
     "choices": [" lazy dog.", " moon rocket.", " tokenizer."], "gold": 0},
    {"query": "Hello world! This is a",
     "choices": [" test of the tokenizer.", " banana."], "gold": 0},
    {"query": "def f(x):",
     "choices": ["\n    return x ** 2", " purple elephant"], "gold": 0},
]


def test_loglikelihoods_match_torch_hf(model_dir):
    """Per-continuation LLs equal HF transformers (torch) on the same dir."""
    import torch
    from transformers import GPT2LMHeadModel as TorchGPT2

    path, params, cfg, tok = model_dir
    from zett_tpu.models.backbones.gpt2 import GPT2LMHeadModel

    module = GPT2LMHeadModel(cfg)

    def apply_fn(p, input_ids):
        return module.apply({"params": p}, input_ids)

    requests = [(it["query"], c) for it in ITEMS for c in it["choices"]]
    ours = score_loglikelihoods(apply_fn, params, tok, requests, batch_size=4)

    tm = TorchGPT2.from_pretrained(path)
    tm.eval()
    from zett_tpu.evaluation.choice import _encode_pair

    for (context, cont), got in zip(requests, ours):
        all_ids, n_ctx, cont_ids = _encode_pair(tok, context, cont)
        with torch.no_grad():
            logits = tm(torch.tensor([all_ids])).logits[0]
        lp = torch.log_softmax(logits.float(), dim=-1)
        want = sum(
            lp[t - 1, all_ids[t]].item() for t in range(n_ctx, len(all_ids))
        )
        assert got["ll"] == pytest.approx(want, rel=2e-4, abs=2e-4), (context, cont)
        assert got["n_tokens"] == len(cont_ids)


def test_choice_task_metrics(model_dir):
    path, params, cfg, tok = model_dir
    from zett_tpu.models.backbones.gpt2 import GPT2LMHeadModel

    module = GPT2LMHeadModel(cfg)
    out = evaluate_choice_task(
        lambda p, ids: module.apply({"params": p}, ids), params, tok, ITEMS
    )
    assert set(out) == {"acc", "acc_norm", "n_items"}
    assert out["n_items"] == 3
    assert 0.0 <= out["acc"] <= 1.0 and 0.0 <= out["acc_norm"] <= 1.0


def test_choice_cli_end_to_end(model_dir, tmp_path):
    from zett_tpu.evaluation.choice import main

    path = model_dir[0]
    task = tmp_path / "task.jsonl"
    with open(task, "w") as f:
        for it in ITEMS:
            f.write(json.dumps(it) + "\n")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["--model", path, "--data", str(task), "--batch-size", "2"])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["n_items"] == 3
