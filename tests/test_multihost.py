"""Multi-host training correctness: two REAL processes (jax.distributed over
a local coordinator, CPU backend with 4 forced devices each = 8 global) must
train to the same losses as a single 8-device process.

This is the per-process-feeding replacement for the reference's
allgather-replication crutch (train.py:1462-1465, zett/utils.py:785-798):
every host constructs the identical global batch deterministically and
materializes only its own devices' shards (zett_tpu/parallel/multihost.py).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _tiny_config(model_dir, out_dir, texts):
    return {
        "model_dir": model_dir,
        "output_dir": out_dir,
        "texts_by_lang": {"en": texts},
        "langs": ["en"],
        "steps": 3,
        "warmup_steps": 1,
        "identity_steps": 0,
        "logging_steps": 1,
        "save_steps": 0,
        "eval_steps": 0,
        "save_state": True,  # final checkpoint carries opt_state/step/rng
        "batch_size": 8,
        "block_size": 16,
        "n_token_subsample": 128,
        "pad_to_multiple_of": 128,
        "tokenizer_sample_mean": 96, "tokenizer_sample_std": 0,
        "tokenizer_sample_min": 96, "tokenizer_sample_max": 96,
        "tokenizer_batch_size": 16,
        "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 1, "num_attention_heads": 2,
        "max_position_embeddings": 16, "hn_surface_maxlen": 8,
        "hidden_dropout_prob": 0.0, "attention_dropout_prob": 0.0,
        "n_initial_texts": 16,
        "seed": 0,
    }


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory, gpt2_like_json):
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
    from zett_tpu.models.backbones.loader import invert_gpt2
    from zett_tpu.tokenization import Tokenizer

    path = tmp_path_factory.mktemp("gpt2_model_mh")
    tok = Tokenizer.from_json(gpt2_like_json)
    vocab = len(tok)
    cfg = GPT2Config(vocab_size=vocab, n_positions=64, n_embd=32, n_layer=1, n_head=2)
    params = GPT2LMHeadModel(cfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32)
    )["params"]
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


def test_two_process_training_matches_single_process(model_dir, corpus, tmp_path):
    texts = [t for t in corpus if t.strip()][:96]

    # reference run: single process, 8 CPU devices (the conftest env)
    from zett_tpu.training.__main__ import run_training

    single_out = str(tmp_path / "single")
    _, single_history = run_training(
        _tiny_config(model_dir, single_out, texts), "single"
    )
    single_losses = [h["loss"] for h in single_history if "loss" in h]
    assert len(single_losses) == 3

    # distributed run: 2 processes x 4 devices over a local coordinator
    mh_out = str(tmp_path / "mh")
    os.makedirs(mh_out, exist_ok=True)
    config = _tiny_config(model_dir, mh_out, texts)
    config_path = str(tmp_path / "mh_config.json")
    with open(config_path, "w") as f:
        json.dump(config, f)

    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "mh_worker.py"),
             config_path, str(rank), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for rank in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    histories = []
    for rank in range(2):
        with open(os.path.join(mh_out, f"history_{rank}.json")) as f:
            histories.append(json.load(f))
    losses = [[h["loss"] for h in hist if "loss" in h] for hist in histories]

    # both ranks observe the identical global loss...
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    # ...and it matches the single-process run (same global batch, same
    # sharded program; tolerance covers collective reduction order)
    np.testing.assert_allclose(losses[0], single_losses, rtol=1e-4)

    # cross-topology restore: the checkpoint the two processes wrote SHARDED
    # (each process only its own shards — no host gather, no combine step)
    # loads into a single 8-device process and reports the right step
    from zett_tpu.training.__main__ import run_training as _rt

    resume_cfg = _tiny_config(model_dir, str(tmp_path / "resumed"), texts)
    resume_cfg["resume_from_checkpoint"] = os.path.join(mh_out, "final")
    trainer_r, _ = _rt(resume_cfg, "resumed")
    assert int(trainer_r.state.step) == 3


def _lang_of(step_log):
    """Which language this step's batch belonged to (per-language metric
    keys are <lang>_loss etc.)."""
    return sorted({k.split("_")[0] for k in step_log if k.endswith("_loss")
                   and not k.startswith("lexical")})


def test_two_process_multilingual_workers_matches_single_process(
    model_dir, corpus, tmp_path
):
    """Hardening for the two determinism assumptions the per-process-feeding
    design leans on (docs/MULTIHOST.md): (a) DataLoader worker round-robin
    is identical across hosts (num_workers=2 on every process), and (b)
    multilingual runs draw the same per-language batch sequence with the
    same lang_index on every rank. Both ranks and the single-process run
    must see identical language sequences and losses."""
    texts = [t for t in corpus if t.strip()][:96]

    def cfg(out_dir):
        c = _tiny_config(model_dir, out_dir, texts)
        c["texts_by_lang"] = {"en": texts, "de": [t.upper() for t in texts]}
        c["langs"] = ["en", "de"]
        c["n_langs"] = 2
        c["num_workers"] = 2
        c["steps"] = 4
        c["save_state"] = False
        return c

    from zett_tpu.training.__main__ import run_training

    single_out = str(tmp_path / "single_ml")
    _, single_history = run_training(cfg(single_out), "single_ml")
    single_steps = [h for h in single_history if "loss" in h]
    single_losses = [h["loss"] for h in single_steps]
    single_langs = [_lang_of(h) for h in single_steps]
    assert len(single_losses) == 4
    # the run actually exercises both languages (seed chosen so it does)
    assert {l for ls in single_langs for l in ls} == {"en", "de"}, single_langs

    mh_out = str(tmp_path / "mh_ml")
    os.makedirs(mh_out, exist_ok=True)
    config_path = str(tmp_path / "mh_ml_config.json")
    with open(config_path, "w") as f:
        json.dump(cfg(mh_out), f)

    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "mh_worker.py"),
             config_path, str(rank), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for rank in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    histories = []
    for rank in range(2):
        with open(os.path.join(mh_out, f"history_{rank}.json")) as f:
            histories.append(json.load(f))
    steps = [[h for h in hist if "loss" in h] for hist in histories]
    losses = [[h["loss"] for h in s] for s in steps]
    langs = [[_lang_of(h) for h in s] for s in steps]

    # both ranks see the same per-language batch sequence and lang metrics...
    assert langs[0] == langs[1]
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    # ...identical to the single-process run (same DataLoader round-robin,
    # same seed-synchronized sampling, same global shards)
    assert langs[0] == single_langs
    np.testing.assert_allclose(losses[0], single_losses, rtol=1e-4)


def test_two_process_preemption_agrees_on_step(model_dir, corpus, tmp_path):
    """Only RANK 0 receives the preemption signal; the per-boundary
    allgather agreement (Trainer._agree_preempted) must make BOTH
    processes enter the collective checkpoint at the SAME step — the
    advisor's r4 finding was that divergent boundaries hang the pod
    inside the grace window. Asserts: both exit cleanly, one shared
    preempt_step_<K>, both histories end preempted at the same K, and no
    final/ checkpoint is written for the interrupted run."""
    import signal
    import time

    texts = [t for t in corpus if t.strip()][:96]
    mh_out = str(tmp_path / "mh_preempt")
    os.makedirs(mh_out, exist_ok=True)
    config = _tiny_config(model_dir, mh_out, texts)
    config["steps"] = 8
    config["preempt_signal"] = "SIGUSR1"
    config_path = str(tmp_path / "mh_preempt_config.json")
    with open(config_path, "w") as f:
        json.dump(config, f)

    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "mh_worker.py"),
             config_path, str(rank), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for rank in range(2)
    ]

    # wait until rank 0 has logged a couple of steps, then signal ONLY it
    metrics_path = os.path.join(mh_out, "metrics.jsonl")
    deadline = time.time() + 480
    signaled = False
    while time.time() < deadline and not signaled:
        if os.path.exists(metrics_path):
            with open(metrics_path) as f:
                steps = [json.loads(l).get("step", 0) for l in f if l.strip()]
            if steps and max(steps) >= 2:
                procs[0].send_signal(signal.SIGUSR1)
                signaled = True
                break
        if any(p.poll() is not None for p in procs):
            break
        time.sleep(1.0)
    assert signaled, "rank 0 never reached step 2"

    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    preempt_dirs = sorted(
        d for d in os.listdir(mh_out) if d.startswith("preempt_step_")
    )
    assert len(preempt_dirs) == 1, preempt_dirs
    k = int(preempt_dirs[0].rsplit("_", 1)[1])
    for rank in range(2):
        with open(os.path.join(mh_out, f"history_{rank}.json")) as f:
            hist = json.load(f)
        assert hist[-1].get("preempted") == 1.0, hist[-1]
        assert hist[-1]["step"] == k, (rank, hist[-1], k)
    assert k < config["steps"], "preemption must interrupt before the end"
    assert not os.path.exists(os.path.join(mh_out, "final")), (
        "an interrupted run must not write final/"
    )
