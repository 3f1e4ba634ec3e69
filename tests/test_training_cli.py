"""run_training end-to-end through JSON configs: the full driver path the
reference exercises via `python train.py config.json` (train.py:194-1570) —
sampled-tokenizer zeroshot, fixed-target-tokenizer n-shot (passthrough +
full backbone FT), and full-state resume."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zett_tpu.training.__main__ import run_training


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory, gpt2_like_json):
    from safetensors.numpy import save_file

    from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
    from zett_tpu.models.backbones.loader import invert_gpt2
    from zett_tpu.tokenization import Tokenizer

    path = tmp_path_factory.mktemp("gpt2_model_cli")
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


def _base_config(model_dir, out_dir, corpus):
    return {
        "model_dir": model_dir,
        "output_dir": out_dir,
        "texts_by_lang": {"en": [t for t in corpus if t.strip()][:96]},
        "langs": ["en"],
        "steps": 2,
        "warmup_steps": 1,
        "identity_steps": 0,
        "logging_steps": 1,
        "save_steps": 0,
        "eval_steps": 0,
        "batch_size": 8,  # divisible by the 8-device CPU mesh's data axis
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
    }


def test_run_training_sampled_zeroshot(model_dir, corpus, tmp_path):
    out = str(tmp_path / "zs")
    trainer, history = run_training(_base_config(model_dir, out, corpus), "zs")
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "final", "tokenizer.json"))


def test_run_training_nshot_fixed_target(model_dir, corpus, tmp_path, xlmr_like_json):
    """do_tokenizer_sampling=false + target_tokenizer: the n-shot/baseline
    path (reference configs/nshot/*, target_tokenizer_name)."""
    from zett_tpu.tokenization import Tokenizer

    target_path = str(tmp_path / "target.json")
    Tokenizer.from_json(xlmr_like_json).save(target_path)

    cfg = _base_config(model_dir, str(tmp_path / "ns"), corpus)
    cfg.update({
        "do_tokenizer_sampling": False,
        "target_tokenizer": target_path,
        "use_passthrough_hypernet": True,
        "backbone_training": "full",
        "n_token_subsample": None,
    })
    trainer, history = run_training(cfg, "ns")
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])


def test_run_training_resume_full_state(model_dir, corpus, tmp_path):
    out_a = str(tmp_path / "a")
    cfg = _base_config(model_dir, out_a, corpus)
    trainer_a, _ = run_training(cfg, "a")
    assert int(trainer_a.state.step) == 2
    # final/ carries full state (opt/step/rng) because save_state defaults on
    assert os.path.exists(os.path.join(out_a, "final", "resume"))

    cfg_b = dict(cfg)
    cfg_b["output_dir"] = str(tmp_path / "b")
    cfg_b["resume_from_checkpoint"] = os.path.join(out_a, "final")
    cfg_b["steps"] = 3
    trainer_b, history_b = run_training(cfg_b, "b")
    # resumed at step 2, so only one optimizer step happened
    assert int(trainer_b.state.step) == 3
    assert len(history_b) == 1


def test_run_training_cost_analysis(model_dir, corpus, tmp_path):
    """--do_cost_analysis prints FLOPs/params and exits before training
    (reference train.py:809-867)."""
    cfg = _base_config(model_dir, str(tmp_path / "ca"), corpus)
    cfg["do_cost_analysis"] = True
    trainer, report = run_training(cfg, "ca")
    assert report["hypernet_flops_per_token"] > 0
    assert report["backbone_flops_per_token"] > 0
    assert report["hypernet_params"] > 0
    assert int(trainer.state.step) == 0  # no training happened


def test_run_training_profile_dir_counts_steps_once(model_dir, corpus, tmp_path):
    """profile_dir traces the first steps WITHOUT training extra steps: the
    profiled steps count toward cfg.steps and the LR schedule sees a single
    contiguous run (round-1 quirk: the run trained steps + profile_steps)."""
    cfg = _base_config(model_dir, str(tmp_path / "prof"), corpus)
    cfg["steps"] = 3
    cfg["profile_dir"] = str(tmp_path / "trace")
    cfg["profile_steps"] = 2
    trainer, history = run_training(cfg, "prof")
    assert int(trainer.state.step) == 3  # not 5
    assert os.path.exists(str(tmp_path / "trace"))


def test_run_training_multilingual_per_language_batches(model_dir, corpus, tmp_path):
    """Multilingual runs use single-language batches with a real lang_index
    and disaggregate train metrics per language (reference semantics:
    per-language dataloader pool, train.py:387-465,1481-1530)."""
    texts = [t for t in corpus if t.strip()][:96]
    cfg = _base_config(model_dir, str(tmp_path / "ml"), corpus)
    cfg["texts_by_lang"] = {"en": texts, "de": [t.upper() for t in texts]}
    cfg["langs"] = ["en", "de"]
    cfg["steps"] = 4
    cfg["n_langs"] = 2
    trainer, history = run_training(cfg, "ml")
    step_logs = [h for h in history if "loss" in h]
    lang_keys = {k for h in step_logs for k in h if k.startswith(("en_", "de_"))}
    assert any(k.endswith("_loss") for k in lang_keys), lang_keys
    assert any(k.endswith("_pad_ratio") for k in lang_keys), lang_keys
    assert any(k.endswith("_avg_byte_length") for k in lang_keys), lang_keys


def test_run_training_mix_languages(model_dir, corpus, tmp_path):
    """mix_languages=True interleaves languages within a batch under the
    "all" lang code (reference train.py:268-270,387-403)."""
    texts = [t for t in corpus if t.strip()][:96]
    cfg = _base_config(model_dir, str(tmp_path / "mix"), corpus)
    cfg["texts_by_lang"] = {"en": texts, "de": [t.upper() for t in texts]}
    cfg["langs"] = ["en", "de"]
    cfg["mix_languages"] = True
    cfg["steps"] = 2
    trainer, history = run_training(cfg, "mix")
    step_logs = [h for h in history if "loss" in h]
    assert any("all_loss" in h for h in step_logs)
    # hn got n_langs = 3 ("all" + en + de)
    assert trainer.hn_config.n_langs == 3


def test_run_training_extra_valid_minted_artifacts(model_dir, corpus, tmp_path):
    """The shipped flagship config's extra_valid_tokenizers point at minted
    artifacts/tokenizers/ dirs (reference artifacts are git-lfs pointers;
    ours come from experiments/mint_artifacts.py). This runs the actual
    extra-valid eval path — fixed-tokenizer collators + cached-embedding
    eval loop — against two real minted artifacts, exactly as
    configs/zeroshot/gpt2_en.json lists them."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "configs", "zeroshot", "gpt2_en.json")) as f:
        shipped = json.load(f)
    listed = [os.path.join(repo, p) for p in shipped["extra_valid_tokenizers"]]
    # every artifact the shipped config references must exist with priors
    for p in listed:
        assert os.path.exists(os.path.join(p, "tokenizer.json")), p
        assert os.path.exists(os.path.join(p, "priors.npy")), p

    texts = [t for t in corpus if t.strip()][:96]
    cfg = _base_config(model_dir, str(tmp_path / "ev"), corpus)
    cfg.update({
        "steps": 1,
        "eval_steps": 1,
        "n_valid_subsample": 8,
        "valid_texts_by_lang": {"en": texts[:16]},
        # two artifacts keep the test fast; the loop is identical for five.
        # the driver clears n_token_subsample for the extra-valid collators
        # itself (reference train.py:526-529), so the full fixed vocabs run
        # through the cached-embedding path while the sampled main-valid
        # collator keeps its subsample config.
        "extra_valid_tokenizers": listed[:2],
    })
    trainer, history = run_training(cfg, "ev")
    eval_logs = [h for h in history if any(k.startswith("eval_") for k in h)]
    assert eval_logs, history
    names = [os.path.basename(p) for p in listed[:2]]
    for name in names:
        key = f"eval_{name}/eval_loss"
        assert any(key in h for h in eval_logs), (key, sorted(eval_logs[0]))
        val = next(h[key] for h in eval_logs if key in h)
        assert np.isfinite(val)


def test_cli_distributed_flag_overrides(monkeypatch, tmp_path):
    """The SLURM launcher (experiments/pod/run.slurm) passes per-process
    distributed identity as CLI flags on top of a shared JSON config."""
    from zett_tpu.training import __main__ as tm

    cfg_path = tmp_path / "c.json"
    with open(cfg_path, "w") as f:
        json.dump({"steps": 1}, f)
    seen = {}
    monkeypatch.setattr(tm, "run_training", lambda config, name: seen.update(config))
    tm.main([str(cfg_path), "--distributed-coordinator", "10.0.0.2:8476",
             "--distributed-num-processes", "4", "--distributed-process-id", "3"])
    assert seen["distributed"] == {
        "coordinator_address": "10.0.0.2:8476",
        "num_processes": 4,
        "process_id": 3,
    }
    with pytest.raises(SystemExit):
        tm.main([str(cfg_path), "--bogus-flag"])


@pytest.mark.parametrize("tied", [False, True])
def test_run_training_qwen2_auto_separate_out(tmp_path, tied):
    """qwen2 (llama family + q/k/v biases, beyond the reference's seven)
    trains through the CLI WITHOUT setting separate_out_embeddings: the
    driver derives it from the family's tie status like the reference
    (train.py:350). The tied variant additionally pins resolve_out_path:
    tied llama-family checkpoints carry NO lm_head, and the static
    OUT_EMBEDDING_PATHS table alone used to KeyError in
    extract_embeddings."""
    import numpy as np
    import torch
    from safetensors.torch import save_file
    from tokenizers import Tokenizer as HFTok
    from tokenizers import models as hfm
    from tokenizers import pre_tokenizers as hfp
    from tokenizers import trainers as hft
    from transformers import Qwen2Config
    from transformers.models.qwen2.modeling_qwen2 import Qwen2ForCausalLM

    from zett_tpu.training.__main__ import run_training

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    cfg = Qwen2Config(
        vocab_size=300, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=tied, use_sliding_window=False,
    )
    torch.manual_seed(0)
    m = Qwen2ForCausalLM(cfg).eval()
    sd = dict(m.state_dict())
    if tied:
        sd.pop("lm_head.weight", None)  # HF omits it for tied checkpoints
    save_file(sd, str(model_dir / "model.safetensors"))
    cfg.save_pretrained(str(model_dir))
    tok = HFTok(hfm.BPE(unk_token=None))
    tok.pre_tokenizer = hfp.ByteLevel(add_prefix_space=False)
    tok.train_from_iterator(
        ["hello world this is a test " * 50],
        hft.BpeTrainer(vocab_size=300, special_tokens=["<|endoftext|>"]),
    )
    tok.save(str(model_dir / "tokenizer.json"))

    config = {
        "model_dir": str(model_dir), "output_dir": str(tmp_path / "out"),
        "steps": 2, "warmup_steps": 1, "learning_rate": 1e-4,
        "logging_steps": 1, "save_steps": 0, "eval_steps": 0,
        "loss": "clm", "lexical_loss_weight": 0.5, "block_size": 16,
        # batch divisible by the 8-device virtual test mesh
        "batch_size": 8, "num_workers": 0, "n_token_subsample": None,
        "pad_to_multiple_of": 16, "tokenizer_sample_mean": 512,
        "tokenizer_sample_std": 0, "tokenizer_sample_min": 512,
        "tokenizer_sample_max": 512, "tokenizer_batch_size": 64,
        "langs": ["en"],
        "texts_by_lang": {"en": ["hello world this is a test " * 20] * 48},
        "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 1,
        "num_attention_heads": 2, "hn_surface_maxlen": 7,
        "max_position_embeddings": 10,
        "embed_using_source_embeddings": True, "n_extra_tokens": 16,
        "rescale_embeddings": True, "predict_bias": True, "dtype": "float32",
        "loss_chunk_size": 4,
    }
    trainer, history = run_training(config, "qwen2_mini")
    assert trainer.hn_config.separate_out_embeddings == (not tied)
    assert trainer.out_tied == tied
    losses = [h["loss"] for h in history if "loss" in h]
    assert len(losses) == 2 and all(np.isfinite(losses))
