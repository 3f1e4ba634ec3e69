"""Training CLI: hypernetwork training end-to-end.

Usage:
  python -m zett_tpu.training CONFIG.json
  python -m zett_tpu.training --model MODEL_DIR --train-data DIR --output-dir OUT [...]

A JSON config maps 1:1 onto the four config dataclasses (reference:
HfArgumentParser over ModelArguments/DataArguments/TrainingArguments/
HypernetArgs, train.py:197-212); the basename becomes the run name. Metrics
stream to <output_dir>/metrics.jsonl (process 0 only).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def load_config_file(path: str) -> dict:
    """Load a JSON config, resolving the `_base` inheritance chain (each
    config in configs/ is a small diff from a base — reference §5.6)."""
    with open(path) as f:
        config = json.load(f)
    base_name = config.pop("_base", None)
    config.pop("_diff_note", None)
    if base_name:
        base = load_config_file(os.path.join(os.path.dirname(path), base_name))
        base.update(config)
        config = base
    return config


def load_configs(config: dict):
    from ..data import DataConfig
    from ..models import HypernetConfig
    from .config import TrainingConfig

    def pick(cls):
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in config.items() if k in known})

    return pick(TrainingConfig), pick(DataConfig), pick(HypernetConfig)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    # cluster launchers (experiments/pod/run.slurm) pass per-process
    # distributed identity as flags on top of a shared JSON config
    dist_p = argparse.ArgumentParser(add_help=False)
    dist_p.add_argument("--distributed-coordinator", default=None)
    dist_p.add_argument("--distributed-num-processes", type=int, default=None)
    dist_p.add_argument("--distributed-process-id", type=int, default=None)

    if argv and argv[0].endswith(".json"):
        dist_args, rest = dist_p.parse_known_args(argv[1:])
        if rest:
            raise SystemExit(f"unknown arguments after config file: {rest}")
        config = load_config_file(argv[0])
        run_name = os.path.splitext(os.path.basename(argv[0]))[0]
    else:
        p = argparse.ArgumentParser(description=__doc__, parents=[dist_p])
        p.add_argument("--config", default=None)
        p.add_argument("--model", dest="model_dir")
        p.add_argument("--train-data", dest="train_directory")
        p.add_argument("--valid-data", dest="valid_directory", default=None)
        p.add_argument("--output-dir", dest="output_dir", default="out")
        p.add_argument("--steps", type=int, default=None)
        p.add_argument("--batch-size", dest="batch_size", type=int, default=128)
        p.add_argument("--num-workers", type=int, default=0)
        p.add_argument("--langs", nargs="*", default=["en"])
        p.add_argument(
            "--tracker", default=None, choices=["wandb", "tensorboard", "none"],
            help="mirror metrics.jsonl to an experiment tracker (no-op if the "
            "library is not installed; reference: wandb, train.py:1297-1305)",
        )
        args = p.parse_args(argv)
        dist_args = args
        config = {}
        if args.config:
            with open(args.config) as f:
                config = json.load(f)
        for k, v in vars(args).items():
            if v is not None and k != "config" and not k.startswith("distributed_"):
                config[k] = v
        run_name = os.path.basename(config.get("output_dir", "run"))

    if dist_args.distributed_coordinator is not None:
        config["distributed"] = {
            "coordinator_address": dist_args.distributed_coordinator,
            "num_processes": dist_args.distributed_num_processes,
            "process_id": dist_args.distributed_process_id,
        }

    run_training(config, run_name)


def run_training(config: dict, run_name: str = "run"):
    import jax

    from ..data import Collator, DataConfig, MLMCollator, TrainDataset
    from ..models import HypernetConfig
    from ..models.backbones.loader import load_backbone_params
    from ..models.backbones.registry import build_model
    from ..parallel import make_mesh
    from ..tokenization import Tokenizer
    from ..tokenization.convert import convert_to_byte_level, is_byte_level
    from .config import TrainingConfig
    from .engine import Trainer

    # multi-host bring-up: explicit `distributed` config section
    # ({"coordinator_address","num_processes","process_id"}, empty {} for
    # TPU-pod auto-detection) or standard coordinator env vars
    from ..parallel.multihost import initialize_distributed, should_initialize_distributed

    if should_initialize_distributed(config):
        dist = config.get("distributed") or {}
        initialize_distributed(
            dist.get("coordinator_address"),
            dist.get("num_processes"),
            dist.get("process_id"),
        )
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()}/{jax.device_count()} devices local"
        )

    train_cfg, data_cfg, hn_cfg = load_configs(config)
    os.makedirs(train_cfg.output_dir, exist_ok=True)

    model_dir = config["model_dir"]
    with open(os.path.join(model_dir, "config.json")) as f:
        bb_config_json = json.load(f)
    model_type = bb_config_json["model_type"]

    class _Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

    _, bb_config = build_model(model_type, hf_config=_Cfg(bb_config_json))
    bb_params = load_backbone_params(model_dir, model_type, bb_config)

    # reference/source tokenizer, byte-level converted
    reference = Tokenizer.from_file(os.path.join(model_dir, "tokenizer.json"))
    if not is_byte_level(reference.to_json()):
        reference, _ = convert_to_byte_level(reference)
    hn_tokenizer = reference.copy()

    # hypernet dims follow the backbone embedding dim
    from ..models.backbones.registry import IN_EMBEDDING_PATHS, get_subtree

    emb = get_subtree(bb_params, IN_EMBEDDING_PATHS[model_type])
    hn_cfg = dataclasses.replace(
        hn_cfg,
        n_embd=int(emb.shape[1]),
        n_langs=max(len(data_cfg.langs), 1),
        vocab_size=len(hn_tokenizer) + 256,
    )
    if "separate_out_embeddings" not in config:
        # follow the reference (train.py:350): untied families predict
        # separate output embeddings automatically; an explicit config key
        # still overrides (gpt2_en_untied.json)
        from ..models.backbones.registry import is_output_tied

        hn_cfg = dataclasses.replace(
            hn_cfg,
            separate_out_embeddings=not is_output_tied(model_type, bb_config),
        )

    # language list + sampling probabilities (reference train.py:248-272):
    # `langs` may be a list or a path to a .txt (one code per line, optional
    # "code,weight"); absent explicit weights, a metadata CSV provides corpus
    # sizes for the size^alpha distribution; else sampling is uniform
    from ..data.datasets import (
        language_probs_from_sizes,
        language_sizes_from_metadata,
        load_language_list,
    )

    langs_cfg = config.get("langs", data_cfg.langs)
    if isinstance(langs_cfg, str):
        langs, lang_probs = load_language_list(langs_cfg)
    else:
        langs, lang_probs = [l for l in langs_cfg if l != "all"], None
    if len(langs) == 1:
        lang_probs = np.array([1.0])
    elif lang_probs is None and config.get("language_metadata_csv"):
        sizes = language_sizes_from_metadata(langs, config["language_metadata_csv"])
        lang_probs = language_probs_from_sizes(sizes, data_cfg.language_sampling_alpha)
    mix_languages = bool(config.get("mix_languages", data_cfg.mix_languages))
    # with mixed batches "all" is a real lang_index (0), reference train.py:268-270
    data_cfg = dataclasses.replace(
        data_cfg, langs=(["all"] + langs) if mix_languages else langs,
        mix_languages=mix_languages,
    )
    hn_cfg = dataclasses.replace(hn_cfg, n_langs=len(data_cfg.langs))

    # datasets + collators
    batch_size = config.get("batch_size", 128)
    texts_by_lang = config.get("texts_by_lang")  # in-memory option for tests
    dataset = TrainDataset(
        langs=langs,
        language_probs=lang_probs,
        batch_size=batch_size,
        block_size=data_cfg.block_size,
        train_directory=config.get("train_directory"),
        texts_by_lang=texts_by_lang,
        eos_token=reference.all_special_tokens[0] if reference.all_special_tokens else None,
        mix_languages=mix_languages,
        seed=train_cfg.seed,
    )
    inner_collator = MLMCollator() if train_cfg.loss == "mlm" else None
    # n-shot / baseline runs train against ONE fixed tokenizer: the
    # `target_tokenizer` config key (byte-level converted, specials matched to
    # the source) or the source tokenizer itself
    # (reference: target_tokenizer_name, train.py / configs/nshot/*)
    fixed_tokenizer = None
    if not data_cfg.do_tokenizer_sampling:
        target_tok_path = config.get("target_tokenizer")
        if target_tok_path:
            tok_file = (
                os.path.join(target_tok_path, "tokenizer.json")
                if os.path.isdir(target_tok_path) else target_tok_path
            )
            fixed_tokenizer, _ = convert_to_byte_level(
                Tokenizer.from_file(tok_file),
                match_special_tokens_to=reference,
                make_whitespace_consistent=True,
            )
        else:
            fixed_tokenizer = reference.copy()
    n_initial = config.get("n_initial_texts", 256)
    # one sampler pool per batch lang_code: per-language pools normally, a
    # single mixed "all" pool under mix_languages (reference train.py:387-465)
    initial_texts = (
        {"all": dataset.get_texts(n_initial)}
        if mix_languages
        else dataset.get_texts_in_each_language(n_initial)
    )
    collator = Collator(
        reference=reference,
        hn_tokenizer=hn_tokenizer,
        data_config=data_cfg,
        batch_size=batch_size,
        initial_texts=initial_texts,
        fixed_tokenizer=fixed_tokenizer,
        inner_collator=inner_collator,
        seed=train_cfg.seed,
    )
    identity_collator = None
    if train_cfg.identity_steps > 0:
        id_data_cfg = dataclasses.replace(
            data_cfg, do_tokenizer_sampling=False,
            n_token_subsample=(
                data_cfg.identity_n_subsample
                if data_cfg.identity_n_subsample is not None
                else data_cfg.n_token_subsample
            ),
        )
        identity_collator = Collator(
            reference=reference,
            hn_tokenizer=hn_tokenizer,
            data_config=id_data_cfg,
            batch_size=batch_size,
            fixed_tokenizer=reference.copy(),
            lang_code=data_cfg.langs[0],
            seed=train_cfg.seed,
        )

    n_devices = len(jax.devices())
    mesh = None
    if n_devices > 1:
        n_model = train_cfg.n_model_parallel
        mesh = make_mesh(n_data=n_devices // n_model, n_model=n_model)

    if data_cfg.n_token_subsample is not None:
        vocab_batch = data_cfg.n_token_subsample
    elif fixed_tokenizer is not None:
        pad = data_cfg.pad_to_multiple_of
        vocab_batch = -(-len(fixed_tokenizer) // pad) * pad
    else:
        vocab_batch = data_cfg.tokenizer_sample_max + data_cfg.pad_to_multiple_of
    trainer = Trainer(
        hn_config=hn_cfg,
        backbone_config=bb_config,
        backbone_params=bb_params,
        model_type=model_type,
        train_config=train_cfg,
        vocab_batch_size=vocab_batch,
        mesh=mesh,
        use_passthrough_hypernet=data_cfg.use_passthrough_hypernet,
        hn_pad_token_id=hn_cfg.pad_token_id,
    )

    num_workers = config.get("num_workers", 0)
    if num_workers > 0:
        from torch.utils.data import DataLoader

        loader = DataLoader(
            dataset, batch_size=1, num_workers=num_workers, collate_fn=collator,
            persistent_workers=True,
        )
        batch_iter = iter(loader)
    else:
        def _gen():
            for item in dataset:
                yield collator([item])

        batch_iter = _gen()

    identity_iter = None
    if identity_collator is not None:
        def _id_gen():
            while True:
                yield identity_collator(None, for_identity_step=True)

        identity_iter = _id_gen()

    # extra validation: fixed tokenizers evaluated with cached embeddings
    # (reference extra_valid dataloaders, train.py:522-555)
    eval_fn = None
    valid_dir = config.get("valid_directory")
    extra_valid_tokenizers = config.get("extra_valid_tokenizers", [])
    if valid_dir or config.get("valid_texts_by_lang"):
        from ..data import ValidDataset
        from ..evaluation import eval_loop

        valid_ds = ValidDataset(
            langs=data_cfg.langs,
            batch_size=batch_size,
            n_subsample=config.get("n_valid_subsample", 64),
            valid_directory=valid_dir,
            texts_by_lang=config.get("valid_texts_by_lang"),
        )
        extra_collators = []
        for tok_path in extra_valid_tokenizers:
            fixed_tok = Tokenizer.from_file(
                os.path.join(tok_path, "tokenizer.json")
                if os.path.isdir(tok_path) else tok_path
            )
            # reference train.py:526-529: extra-valid collators never
            # subsample the fixed vocab and never span-sample the text
            fixed_cfg = dataclasses.replace(
                data_cfg, do_tokenizer_sampling=False,
                n_token_subsample=None, sample_text_span=False,
            )
            extra_collators.append(
                (os.path.basename(tok_path.rstrip("/")), Collator(
                    reference=reference, hn_tokenizer=hn_tokenizer,
                    data_config=fixed_cfg, batch_size=batch_size,
                    fixed_tokenizer=fixed_tok, is_validation=True,
                    seed=train_cfg.seed,
                ))
            )
        valid_collator = Collator(
            reference=reference, hn_tokenizer=hn_tokenizer, data_config=data_cfg,
            batch_size=batch_size,
            initial_texts={lang: texts[:64] for lang, texts in valid_ds.dataset.items()},
            is_validation=True, seed=train_cfg.seed + 1,
        )

        def eval_fn(tr):
            out = {}
            for name, coll in extra_collators:
                out.update(eval_loop(
                    tr, (coll([valid_ds[i]]) for i in range(len(valid_ds))),
                    name=f"eval_{name}", fixed_tokenizer=True,
                ))
            out.update(eval_loop(
                tr, (valid_collator([valid_ds[i]]) for i in range(len(valid_ds))),
                name="eval",
            ))
            return out

    metrics_path = os.path.join(train_cfg.output_dir, "metrics.jsonl")

    # optional tracker mirrors the same dict as metrics.jsonl (process 0
    # only, like the reference's wandb hook, train.py:1297-1305)
    from ..utils.tracking import build_tracker

    tracker = (
        build_tracker(
            config.get("tracker"), run_name=run_name, config=config,
            log_dir=os.path.join(train_cfg.output_dir, "tb"),
        )
        if jax.process_index() == 0
        else build_tracker(None)
    )

    def on_log(step, metrics):
        if jax.process_index() == 0:
            with open(metrics_path, "a") as f:
                f.write(json.dumps({"run": run_name, **metrics}) + "\n")
            tracker.log(step, metrics)
            print(f"step {step}: " + " ".join(f"{k}={v:.4g}" for k, v in metrics.items()
                                              if isinstance(v, (int, float))))

    if config.get("do_cost_analysis"):
        # print FLOPs/token + param counts and exit
        # (reference --do_cost_analysis, train.py:809-867)
        from ..utils.cost_analysis import model_cost_report

        batch = next(batch_iter)
        report = model_cost_report(
            trainer.hypernet,
            {"params": trainer.state.params["hypernet"]},
            trainer.backbone,
            trainer.backbone_params,
            batch,
            source_embeddings=trainer.state.source_embeddings,
        )
        print(json.dumps(report, indent=2))
        return trainer, report

    resume_step = 0
    resume_path = config.get("resume_from_checkpoint")
    if resume_path:
        trainer.restore_checkpoint(
            resume_path, reset_steps=bool(config.get("resume_reset_steps", False))
        )
        resume_step = int(trainer.state.step) // max(
            1, train_cfg.gradient_accumulation_steps
        )
        print(f"resumed from {resume_path} at step {resume_step}")

    if train_cfg.eval_at_step_zero and eval_fn is not None:
        on_log(0, eval_fn(trainer))

    profile_dir = config.get("profile_dir")
    if profile_dir:
        # capture a device trace of the first few steps (SURVEY §5.1); the
        # profiled steps COUNT toward the run — the main fit below resumes
        # after them (no replay: the data stream already advanced), so the
        # total step count and LR schedule are exactly those of an
        # unprofiled run
        from ..utils import trace

        n_profile = min(int(config.get("profile_steps", 3)), train_cfg.steps)
        with trace(profile_dir):
            saved_steps = train_cfg.steps
            trainer.cfg.steps = min(n_profile + resume_step, saved_steps)
            trainer.fit(
                batch_iter, identity_iter, on_log=on_log,
                resume_step=resume_step,
            )
            trainer.cfg.steps = saved_steps
        resume_step = min(n_profile + resume_step, saved_steps)
        print(f"wrote device trace for {n_profile} steps to {profile_dir}")

    # graceful preemption (TPU spot/preemptible VMs send SIGTERM with a
    # short grace window): checkpoint at the next step boundary and exit;
    # config: "preempt_signal": "SIGTERM" (any signal name, or null)
    preempt_signal = None
    if config.get("preempt_signal"):
        import signal as _signal

        preempt_signal = getattr(_signal, config["preempt_signal"])

    history = trainer.fit(
        batch_iter, identity_iter, eval_fn=eval_fn, on_log=on_log,
        resume_step=resume_step, do_replay=not profile_dir,
        preempt_signal=preempt_signal,
    )
    preempted = bool(history) and history[-1].get("preempted")
    if preempted:
        # the grace window is scarce and preempt_step_<N> already holds the
        # resumable state: a second full checkpoint would burn seconds and
        # mislabel an interrupted run as complete (final/ = finished runs
        # only)
        print(
            "preempted: state is in the preempt_step checkpoint; "
            "skipping final/ save"
        )
    else:
        trainer.save_checkpoint(
            os.path.join(train_cfg.output_dir, "final"),
            full_state=train_cfg.save_state,
        )
        hn_tokenizer.save(
            os.path.join(train_cfg.output_dir, "final", "tokenizer.json")
        )
    tracker.finish()
    return trainer, history


if __name__ == "__main__":
    main()
