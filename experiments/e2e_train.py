"""End-to-end training of the flagship config on the real chip with the REAL
data pipeline — the loop the reference ran for 200k steps
(/root/reference/train.py:1425-1561), cut to a few hundred steps.

What it proves (VERDICT r3 item 1):
  (a) decreasing train loss through the identity->CLM boundary,
  (b) steady-state step time / tokens-per-second INCLUDING input (DataLoader
      workers + per-batch tokenizer sampling + native encode) vs the
      synthetic-batch device-only number (the gap = host starvation),
  (c) a mid-run checkpoint, then a second resumed run whose post-resume
      losses are identical to the first run's (replay-based data recovery),
  (d) a profiler trace over post-resume CLM steps for host/device overlap.

Shape: gpt2-small (124M, random init — pretrained weights are
network-unavailable; FLOPs and pipeline identical), 50k-vocab byte-level BPE
source tokenizer (artifacts/tokenizers/gpt2_raw), 32k sampled vocab rows per
step, batch 128 x block 128, bf16 — configs/zeroshot/gpt2_en.json cut to
EPOCHS=steps 400 / identity 100.

Usage:  python experiments/e2e_train.py [--steps 400] [--out out/e2e]
Writes <out>/run1, <out>/run2_resume, and experiments/results/e2e_train_run.md
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def mint_model_dir(path: str) -> str:
    """gpt2-small random-init HF dir with the 50k gpt2_raw tokenizer."""
    if os.path.exists(os.path.join(path, "model.safetensors")):
        return path
    import numpy as np
    from safetensors.numpy import save_file

    import jax
    import jax.numpy as jnp

    from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
    from zett_tpu.models.backbones.loader import invert_gpt2
    from zett_tpu.tokenization import Tokenizer

    os.makedirs(path, exist_ok=True)
    tok = Tokenizer.from_file(
        os.path.join(REPO, "artifacts", "tokenizers", "gpt2_raw", "tokenizer.json")
    )
    vocab = len(tok)
    cfg = GPT2Config(vocab_size=vocab, n_positions=1024, n_embd=768,
                     n_layer=12, n_head=12)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = GPT2LMHeadModel(cfg).init(
            jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32)
        )["params"]
    sd = invert_gpt2(jax.tree_util.tree_map(np.asarray, params), cfg)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({
            "model_type": "gpt2", "vocab_size": vocab, "n_positions": 1024,
            "n_embd": 768, "n_layer": 12, "n_head": 12,
            "layer_norm_epsilon": 1e-5, "tie_word_embeddings": True,
        }, f)
    tok.save(os.path.join(path, "tokenizer.json"))
    return path


def mint_data(path: str) -> str:
    """train/valid en.txt split from the committed corpus fixtures (the
    stream is infinite — the corpus recycles with reshuffling)."""
    train = os.path.join(path, "train")
    valid = os.path.join(path, "valid")
    if os.path.exists(os.path.join(train, "en.txt")):
        return path
    os.makedirs(train, exist_ok=True)
    os.makedirs(valid, exist_ok=True)
    src = os.path.join(REPO, "tests", ".cache", "corpora", "en.txt")
    with open(src) as f:
        lines = [l for l in f if l.strip()]
    # 512 valid texts = 4 full batches at the flagship batch 128 (64 used
    # to leave ZERO full batches and the in-loop eval silently no-op'd)
    with open(os.path.join(valid, "en.txt"), "w") as f:
        f.writelines(lines[:512])
    with open(os.path.join(train, "en.txt"), "w") as f:
        f.writelines(lines[512:])
    return path


def base_config(model_dir, data_dir, out_dir, steps, identity_steps, workers):
    # configs/zeroshot/gpt2_en.json with the schedule cut down; levers
    # remat_hypernet on (the single-chip throughput configuration)
    return {
        "model_dir": model_dir,
        "train_directory": os.path.join(data_dir, "train"),
        "valid_directory": os.path.join(data_dir, "valid"),
        "output_dir": out_dir,
        "steps": steps,
        "warmup_steps": [20, 40],
        "identity_steps": identity_steps,
        "identity_n_subsample": 16384,
        "learning_rate": [3e-4, 6e-5],
        "learning_rate_alpha": 0.1,
        "weight_decay": 0.01,
        "adam_beta2": 0.95,
        "max_grad_norm": 0.1,
        "logging_steps": 10,
        "save_steps": 0,
        # in-loop eval (VERDICT r4 item 6): the sampled-tokenizer valid
        # stream plus two FIXED minted tokenizers (cached-embedding eval
        # path, reference extra_valid train.py:522-555) at step boundaries
        "eval_steps": 150,
        "extra_valid_tokenizers": [
            os.path.join(REPO, "artifacts", "tokenizers", "en_raw"),
            os.path.join(REPO, "artifacts", "tokenizers", "gpt20001"),
        ],
        "eval_at_step_zero": False,
        "loss": "clm",
        "lexical_loss_weight": 0.5,
        "lexical_loss_kind": "huber",
        "block_size": 128,
        "batch_size": 128,
        "num_workers": workers,
        "n_token_subsample": None,
        "n_valid_subsample": 512,
        "pad_to_multiple_of": 128,
        "tokenizer_sample_mean": 32768,
        "tokenizer_sample_std": 0,
        "tokenizer_sample_min": 32768,
        "tokenizer_sample_max": 32768,
        "tokenizer_noise_mean": 1e-5,
        "tokenizer_noise_std": 4.0,
        "tokenizer_batch_size": 2048,
        "langs": ["en"],
        "hidden_size": 768,
        "intermediate_size": 1536,
        "num_hidden_layers": 3,
        "num_attention_heads": 12,
        "hn_surface_maxlen": 7,
        "max_position_embeddings": 10,
        "embed_using_source_embeddings": True,
        "n_extra_tokens": 256,
        "rescale_embeddings": True,
        "predict_bias": True,
        "dtype": "bfloat16",
        "remat_hypernet": True,
        "seed": 0,
    }


def read_metrics(out_dir):
    rows = []
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--identity-steps", type=int, default=100)
    ap.add_argument("--save-at", type=int, default=200)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "out", "e2e"))
    args = ap.parse_args(argv)

    from zett_tpu.training.__main__ import run_training

    model_dir = mint_model_dir(os.path.join(args.out, "model"))
    data_dir = mint_data(os.path.join(args.out, "data"))

    # ---- run 1: full run with a mid-run checkpoint --------------------
    out1 = os.path.join(args.out, "run1")
    shutil.rmtree(out1, ignore_errors=True)
    cfg1 = base_config(model_dir, data_dir, out1, args.steps,
                       args.identity_steps, args.workers)
    cfg1["save_steps"] = args.save_at
    cfg1["save_state"] = True
    t0 = time.time()
    run_training(cfg1, "e2e_run1")
    wall1 = time.time() - t0

    # ---- run 2: resume from the mid-run checkpoint; must reproduce ----
    # run 1's post-resume losses exactly (replay-based data recovery,
    # reference do_replay train.py:1426-1479)
    out2 = os.path.join(args.out, "run2_resume")
    shutil.rmtree(out2, ignore_errors=True)
    cfg2 = base_config(model_dir, data_dir, out2, args.steps,
                       args.identity_steps, args.workers)
    cfg2["resume_from_checkpoint"] = os.path.join(out1, f"step_{args.save_at}")
    run_training(cfg2, "e2e_run2_resume")

    # ---- run 3: short resumed segment under the profiler ---------------
    # host/device overlap evidence over steady-state CLM steps (the
    # profile_dir path replays the stream, then traces the first steps)
    out3 = os.path.join(args.out, "run3_trace")
    shutil.rmtree(out3, ignore_errors=True)
    cfg3 = base_config(model_dir, data_dir, out3, args.save_at + 5,
                       args.identity_steps, args.workers)
    cfg3["resume_from_checkpoint"] = os.path.join(out1, f"step_{args.save_at}")
    cfg3["profile_dir"] = os.path.join(out3, "trace")
    cfg3["profile_steps"] = 5
    run_training(cfg3, "e2e_run3_trace")

    # ---- compare + report --------------------------------------------
    m1 = read_metrics(out1)
    m2 = read_metrics(out2)
    post1 = {r["step"]: r for r in m1 if r.get("step", 0) > args.save_at and "loss" in r}
    post2 = {r["step"]: r for r in m2 if r.get("step", 0) > args.save_at and "loss" in r}
    common = sorted(set(post1) & set(post2))
    assert common, "no overlapping post-resume logging steps"
    max_diff = max(abs(post1[s]["loss"] - post2[s]["loss"]) for s in common)

    # steady-state CLM timing from run 1 (exclude the first CLM window,
    # which contains the train_step compile)
    clm = [r for r in m1 if "loss" in r and r.get("step", 0) > args.identity_steps]
    times = [r["time"] for r in m1 if "step" in r and "time" in r]
    steps_logged = [r["step"] for r in m1 if "step" in r and "time" in r]
    window_ms = []
    for i in range(1, len(times)):
        ds = steps_logged[i] - steps_logged[i - 1]
        if ds > 0 and steps_logged[i] > args.identity_steps + 2 * 10:
            window_ms.append((times[i] - times[i - 1]) / ds * 1000)
    steady_ms = sorted(window_ms)[len(window_ms) // 2] if window_ms else float("nan")
    tokens_per_s = 128 * 128 / (steady_ms / 1000) if window_ms else float("nan")

    report = {
        "steps": args.steps,
        "identity_steps": args.identity_steps,
        "save_at": args.save_at,
        "workers": args.workers,
        "wall_s_run1": round(wall1, 1),
        "identity_loss_first": next(
            (r["identity_loss"] for r in m1 if "identity_loss" in r), None),
        "identity_loss_last": next(
            (r["identity_loss"] for r in reversed(m1) if "identity_loss" in r), None),
        "clm_loss_first": clm[0]["loss"] if clm else None,
        "clm_loss_last": clm[-1]["loss"] if clm else None,
        "steady_state_ms_per_step_incl_input": round(steady_ms, 1),
        "tokens_per_s_incl_input": round(tokens_per_s, 1),
        "resume_post_steps_compared": len(common),
        "resume_max_loss_diff": max_diff,
        # per-checkpoint eval table (in-loop eval_loop at eval_steps
        # boundaries: sampled-tokenizer stream + the two fixed minted
        # tokenizers via the cached-embedding path)
        "evals": [
            {k: v for k, v in r.items()
             if k == "step" or k.startswith("eval")}
            for r in m1
            if any(k.startswith("eval") for k in r)
        ],
        "device": None,
    }
    import jax

    report["device"] = str(jax.devices()[0])
    out_json = os.path.join(REPO, "experiments", "results", "e2e_train_run.json")
    with open(out_json, "w") as f:
        json.dump({"report": report, "run1_metrics": m1, "run2_metrics": m2},
                  f, indent=1)
    print(json.dumps(report))
    assert max_diff == 0.0 or max_diff < 1e-6, (
        f"resume diverged: max post-resume loss diff {max_diff}"
    )
    return report


if __name__ == "__main__":
    main()
