"""Offline end-to-end run of the multilingual zero-shot eval sweep
(experiments/eval_multilingual.sh; reference:
experiments/eval_multilingual_mistral.sh).

Everything is minted locally (no network): a small gpt2-family backbone, a
hypernet checkpoint saved through the Trainer, a per-language Unigram
tokenizer trained with the native EM trainer, and a per-language
multiple-choice task built from held-out corpus texts (query = text prefix,
gold = its true continuation, distractors = continuations of other texts —
the XCOPA jsonl shape). The sweep then composes, per language:

    transfer CLI  ->  transferred HF dir  ->  choice CLI  ->  acc/acc_norm

exactly the reference loop with lm_eval swapped for the native evaluator.
The model is untrained, so accuracies sit at chance (~1/3) — the artifact
documents the sweep running end-to-end, per language, offline; with a real
trained checkpoint the same script reports real numbers.

Usage: python experiments/eval_multilingual.py [--langs en de code]
Writes experiments/results/multilingual_eval.{json,md}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# tiny CPU workload — never touch (or block on) the shared TPU chip; the
# axon sitecustomize overrides the env var, so force in-process
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

VOCAB_TASK = 2048  # per-language tokenizer size (tiny; speed)

# subprocess stages need the same in-process override
_CPU_PRELUDE = "import jax; jax.config.update('jax_platforms', 'cpu'); "


def mint_backbone(path: str):
    import numpy as np
    from safetensors.numpy import save_file

    import jax
    import jax.numpy as jnp

    from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
    from zett_tpu.models.backbones.loader import invert_gpt2
    from zett_tpu.tokenization.spm import train_unigram

    os.makedirs(path, exist_ok=True)
    corpus = _read_corpus("en")[:400]
    tok = train_unigram(corpus, 1024, special_tokens=["<|endoftext|>"])
    vocab = len(tok)
    cfg = GPT2Config(vocab_size=vocab, n_positions=128, n_embd=64,
                     n_layer=2, n_head=2)
    params = GPT2LMHeadModel(cfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32)
    )["params"]
    sd = invert_gpt2(jax.tree_util.tree_map(np.asarray, params), cfg)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({
            "model_type": "gpt2", "vocab_size": vocab, "n_positions": 128,
            "n_embd": 64, "n_layer": 2, "n_head": 2,
            "layer_norm_epsilon": 1e-5, "tie_word_embeddings": True,
        }, f)
    tok.save(os.path.join(path, "tokenizer.json"))
    return path


def mint_checkpoint(path: str, model_dir: str):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from zett_tpu.models import HypernetConfig
    from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
    from zett_tpu.tokenization import Tokenizer
    from zett_tpu.tokenization.convert import convert_to_byte_level
    from zett_tpu.training import Trainer, TrainingConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        cj = json.load(f)
    cfg = GPT2Config(vocab_size=cj["vocab_size"], n_positions=128,
                     n_embd=64, n_layer=2, n_head=2)
    params = GPT2LMHeadModel(cfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32)
    )["params"]
    hn_cfg = HypernetConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=16,
        vocab_size=cj["vocab_size"] + 256, pad_token_id=0, n_embd=64,
        hn_surface_maxlen=8, hidden_dropout_prob=0.0,
        attention_dropout_prob=0.0,
    )
    trainer = Trainer(
        hn_config=hn_cfg, backbone_config=cfg,
        backbone_params=jax.tree_util.tree_map(np.asarray, params),
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


def _read_corpus(lang: str):
    with open(os.path.join(REPO, "tests", ".cache", "corpora", f"{lang}.txt")) as f:
        return [l.rstrip("\n") for l in f if len(l.strip()) > 120]


def mint_lang_tokenizer(path: str, lang: str):
    from zett_tpu.tokenization.spm import train_unigram

    os.makedirs(path, exist_ok=True)
    tok = train_unigram(_read_corpus(lang)[:800], VOCAB_TASK,
                        special_tokens=["<|endoftext|>"])
    tok.save(os.path.join(path, "tokenizer.json"))
    return path


def mint_task(path: str, lang: str, n_items: int = 60):
    """XCOPA-shaped jsonl: pick the true continuation of a text prefix out
    of three candidates (deterministic; held-out tail of the corpus)."""
    import numpy as np

    texts = _read_corpus(lang)[-(n_items * 2):]
    rng = np.random.default_rng(0)
    items = []
    for i in range(min(n_items, len(texts) - 2)):
        t = texts[i]
        query = t[:100]
        true_cont = t[100:160]
        d1 = texts[(i + 1) % len(texts)][100:160]
        d2 = texts[(i + 2) % len(texts)][100:160]
        choices = [true_cont, d1, d2]
        gold = int(rng.integers(0, 3))
        choices[0], choices[gold] = choices[gold], choices[0]
        items.append({"query": query, "choices": choices, "gold": gold})
    with open(path, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    return path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--langs", nargs="*", default=["en", "de", "code"])
    ap.add_argument("--out", default=os.path.join(REPO, "out", "multilingual_eval"))
    args = ap.parse_args(argv)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               HF_HUB_OFFLINE="1", TRANSFORMERS_OFFLINE="1")

    model_dir = mint_backbone(os.path.join(args.out, "model"))
    ckpt_dir = mint_checkpoint(os.path.join(args.out, "ckpt"), model_dir)

    results = {}
    for lang in args.langs:
        tok_dir = mint_lang_tokenizer(
            os.path.join(args.out, f"tok_{lang}"), lang)
        task = mint_task(os.path.join(args.out, f"copa_{lang}.jsonl"), lang)
        transferred = os.path.join(args.out, f"transferred-{lang}")
        shutil.rmtree(transferred, ignore_errors=True)
        # the same CLI calls eval_multilingual.sh makes, via subprocess so
        # each stage runs exactly as a user would run it (through the CLI
        # main(), with the CPU override the axon sitecustomize requires)
        transfer_args = [
            "--checkpoint", ckpt_dir, "--model", model_dir,
            "--target-tokenizer", tok_dir, "--output", transferred,
            "--batch-size", "512",
        ]
        subprocess.run(
            [sys.executable, "-c",
             _CPU_PRELUDE
             + "import sys; from zett_tpu.transfer.__main__ import main; "
             + "main(sys.argv[1:])", *transfer_args],
            check=True, env=env, cwd=REPO,
        )
        proc = subprocess.run(
            [sys.executable, "-c",
             _CPU_PRELUDE
             + "import sys; from zett_tpu.evaluation.choice import main; "
             + "main(sys.argv[1:])",
             "--model", transferred, "--data", task],
            check=True, env=env, cwd=REPO, capture_output=True, text=True,
        )
        line = next(l for l in reversed(proc.stdout.splitlines())
                    if l.startswith("{"))
        results[lang] = json.loads(line)
        print(f"{lang}: {results[lang]}")

    out_dir = os.path.join(REPO, "experiments", "results")
    with open(os.path.join(out_dir, "multilingual_eval.json"), "w") as f:
        json.dump(results, f, indent=1)
    lines = [
        "# Multilingual zero-shot eval sweep (VERDICT r3 item 7)",
        "",
        "Reference: `experiments/eval_multilingual_mistral.sh` (per-language",
        "XCOPA/m_MMLU over transferred models via lm_eval). Here the same",
        "sweep runs fully offline: per language, the hypernet checkpoint is",
        "zero-shot-transferred to a native-EM-trained language tokenizer",
        "(`python -m zett_tpu.transfer`), then the language's choice task is",
        "scored with the native loglikelihood evaluator",
        "(`python -m zett_tpu.evaluation.choice`, lm_eval acc/acc_norm",
        "semantics). The demo model is UNTRAINED, so accuracy sits at chance",
        "(1/3) — the artifact documents the sweep composing end-to-end;",
        "`experiments/eval_multilingual.sh` runs the identical loop on real",
        "checkpoints. Reproduce: `python experiments/eval_multilingual.py`.",
        "",
        "| lang | acc | acc_norm | n_items |",
        "|---|---|---|---|",
    ]
    for lang, r in results.items():
        lines.append(f"| {lang} | {r['acc']:.3f} | {r['acc_norm']:.3f} | {r['n_items']} |")
    lines.append("")
    with open(os.path.join(out_dir, "multilingual_eval.md"), "w") as f:
        f.write("\n".join(lines))
    return results


if __name__ == "__main__":
    main()
