"""Sequence-classification fine-tuning / zero-shot eval of transferred models
(reference: zett/adapters/run_glue.py, driven by
experiments/{train,evaluate}_xlmr_adapters.sh).

The ZeTT workflow: train a bottleneck adapter + head on the source model
(XNLI-en), `--save_adapter`; then for each language load the *transferred*
model (embeddings swapped by zett_tpu.transfer) with `--load_adapter` and
`--do_eval` — the adapter is portable because neither it nor the body moved.

Offline-first: datasets come from local csv/json/parquet files
(`--train_file/--validation_file`) or, when a hub is reachable, from
`--dataset_name/--dataset_config_name` (e.g. xnli/en) exactly like the
reference.

Usage:
    python -m zett_tpu.adapters.run_classification \
        --model_name_or_path <dir> --train_file train.json \
        --validation_file dev.json --sentence1_key premise \
        --sentence2_key hypothesis --train_adapter \
        --output_dir out --do_train --do_eval
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict, Optional

import numpy as np

from .bottleneck import (
    AdapterConfig,
    inject_adapters,
    load_adapter,
    mark_only_adapters_trainable,
    save_adapter,
)
from .metrics import glue_metrics
from .trainer_lite import FitConfig, fit, predict

logger = logging.getLogger(__name__)

# reference: zett/adapters/run_glue.py:64-74
TASK_TO_KEYS = {
    "cola": ("sentence", None),
    "mnli": ("premise", "hypothesis"),
    "mrpc": ("sentence1", "sentence2"),
    "qnli": ("question", "sentence"),
    "qqp": ("question1", "question2"),
    "rte": ("sentence1", "sentence2"),
    "sst2": ("sentence", None),
    "stsb": ("sentence1", "sentence2"),
    "wnli": ("sentence1", "sentence2"),
    "xnli": ("premise", "hypothesis"),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--tokenizer_name", default=None)
    p.add_argument("--task_name", default=None, choices=sorted(TASK_TO_KEYS))
    p.add_argument("--dataset_name", default=None)
    p.add_argument("--dataset_config_name", default=None)
    p.add_argument("--train_file", default=None)
    p.add_argument("--validation_file", default=None)
    p.add_argument("--test_file", default=None)
    p.add_argument("--sentence1_key", default=None)
    p.add_argument("--sentence2_key", default=None)
    p.add_argument("--label_key", default="label")
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--max_eval_samples", type=int, default=None)
    p.add_argument("--per_device_train_batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--num_train_epochs", type=float, default=5.0)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--do_predict", action="store_true")
    p.add_argument("--train_adapter", action="store_true")
    p.add_argument("--adapter_reduction_factor", type=int, default=16)
    p.add_argument("--load_adapter", default=None)
    return p


def _load_split(args, split: str):
    from datasets import load_dataset

    files = {
        "train": args.train_file,
        "validation": args.validation_file,
        "test": args.test_file,
    }
    if args.dataset_name is not None:
        ds = load_dataset(args.dataset_name, args.dataset_config_name)
        if split == "validation" and split not in ds:
            split = "validation_matched" if "validation_matched" in ds else split
        return ds[split]
    path = files[split]
    if path is None:
        return None
    ext = os.path.splitext(path)[1].lstrip(".")
    ext = {"jsonl": "json", "txt": "text"}.get(ext, ext)
    return load_dataset(ext, data_files={split: path})[split]


def _sentence_keys(args, dataset) -> tuple:
    if args.sentence1_key:
        return args.sentence1_key, args.sentence2_key
    if args.task_name:
        return TASK_TO_KEYS[args.task_name]
    if args.dataset_name in TASK_TO_KEYS:
        return TASK_TO_KEYS[args.dataset_name]
    cols = [c for c in dataset.column_names if c != args.label_key]
    return cols[0], (cols[1] if len(cols) > 1 else None)


def _featurize(
    dataset, tokenizer, args, label_list, s1_key: str, s2_key: Optional[str], limit
) -> Dict[str, np.ndarray]:
    if limit is not None:
        dataset = dataset.select(range(min(limit, len(dataset))))
    texts1 = list(dataset[s1_key])
    texts2 = list(dataset[s2_key]) if s2_key else None
    enc = tokenizer(
        texts1,
        texts2,
        max_length=args.max_seq_length,
        truncation=True,
        padding="max_length",
    )
    feats = {
        "input_ids": np.asarray(enc["input_ids"], dtype=np.int64),
        "attention_mask": np.asarray(enc["attention_mask"], dtype=np.int64),
    }
    if args.label_key in dataset.column_names:
        raw = dataset[args.label_key]
        if label_list is None:  # regression
            feats["labels"] = np.asarray(raw, dtype=np.float32)
        else:
            to_id = {v: i for i, v in enumerate(label_list)}
            feats["labels"] = np.asarray([to_id[v] for v in raw], dtype=np.int64)
    return feats


def main(argv=None) -> Dict[str, float]:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.output_dir, exist_ok=True)

    from transformers import AutoModelForSequenceClassification, AutoTokenizer

    is_regression = args.task_name == "stsb"
    train_ds = _load_split(args, "train") if args.do_train else None
    eval_ds = _load_split(args, "validation") if (args.do_eval or args.do_predict) else None
    probe = train_ds if train_ds is not None else eval_ds
    if probe is None:
        raise SystemExit("nothing to do: no train or validation split")
    s1_key, s2_key = _sentence_keys(args, probe)

    if is_regression:
        label_list, num_labels = None, 1
    else:
        feature = probe.features.get(args.label_key)
        if feature is not None and hasattr(feature, "names"):
            label_list = list(range(len(feature.names)))
        else:
            label_list = sorted(set(probe[args.label_key]))
        num_labels = len(label_list)

    tokenizer = AutoTokenizer.from_pretrained(
        args.tokenizer_name or args.model_name_or_path
    )
    model = AutoModelForSequenceClassification.from_pretrained(
        args.model_name_or_path, num_labels=num_labels
    )

    if args.load_adapter:
        load_adapter(model, args.load_adapter)
    elif args.train_adapter:
        inject_adapters(model, AdapterConfig(reduction_factor=args.adapter_reduction_factor))
    if args.train_adapter or args.load_adapter:
        n_trainable = mark_only_adapters_trainable(model)
        logger.info("trainable parameters: %d", n_trainable)

    results: Dict[str, float] = {}
    if args.do_train:
        feats = _featurize(
            train_ds, tokenizer, args, label_list, s1_key, s2_key, args.max_train_samples
        )
        stats = fit(
            model,
            feats,
            FitConfig(
                learning_rate=args.learning_rate,
                num_train_epochs=args.num_train_epochs,
                per_device_batch_size=args.per_device_train_batch_size,
                weight_decay=args.weight_decay,
                seed=args.seed,
                max_steps=args.max_steps,
            ),
            log=logger.info,
        )
        results.update(stats)
        if args.train_adapter:
            save_adapter(model, os.path.join(args.output_dir, "adapter"))
        else:
            model.save_pretrained(args.output_dir)
            tokenizer.save_pretrained(args.output_dir)

    if args.do_eval or args.do_predict:
        feats = _featurize(
            eval_ds, tokenizer, args, label_list, s1_key, s2_key, args.max_eval_samples
        )
        logits = predict(model, feats, args.per_device_train_batch_size)
        preds = logits[:, 0] if is_regression else logits.argmax(axis=-1)
        if "labels" in feats:
            task = args.task_name or args.dataset_name or "classification"
            metrics = glue_metrics(
                task if task in TASK_TO_KEYS else "default", preds, feats["labels"]
            )
            results.update({f"eval_{k}": v for k, v in metrics.items()})
        if args.do_predict:
            np.save(os.path.join(args.output_dir, "predictions.npy"), preds)

    with open(os.path.join(args.output_dir, "eval_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    logger.info("results: %s", results)
    return results


if __name__ == "__main__":
    main()
