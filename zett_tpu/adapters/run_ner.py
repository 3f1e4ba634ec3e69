"""NER (token-classification) fine-tuning / eval of transferred models
(reference: zett/adapters/run_ner.py — stock HF script + adapters lib).

Same adapter portability contract as run_classification: train the adapter +
head on the source model, load into a ZeTT-transferred model for zero-shot
cross-tokenizer eval. Labels are word-level BIO tags; subword alignment gives
the label to the first subword of each word and -100 elsewhere. Metrics are
entity-level span P/R/F1 (seqeval semantics, implemented natively in
metrics.span_f1).

Local data format (offline): json/jsonl with `tokens: [str]` and
`ner_tags: [int|str]` columns (conll2003-style).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict, List

import numpy as np

from .bottleneck import (
    AdapterConfig,
    inject_adapters,
    load_adapter,
    mark_only_adapters_trainable,
    save_adapter,
)
from .metrics import span_f1
from .trainer_lite import FitConfig, fit, predict

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--tokenizer_name", default=None)
    p.add_argument("--dataset_name", default=None)
    p.add_argument("--dataset_config_name", default=None)
    p.add_argument("--train_file", default=None)
    p.add_argument("--validation_file", default=None)
    p.add_argument("--text_column_name", default="tokens")
    p.add_argument("--label_column_name", default="ner_tags")
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--label_all_tokens", action="store_true")
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--max_eval_samples", type=int, default=None)
    p.add_argument("--per_device_train_batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--num_train_epochs", type=float, default=5.0)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--train_adapter", action="store_true")
    p.add_argument("--adapter_reduction_factor", type=int, default=16)
    p.add_argument("--load_adapter", default=None)
    return p


def _load_split(args, split: str):
    from datasets import load_dataset

    if args.dataset_name is not None:
        return load_dataset(args.dataset_name, args.dataset_config_name)[split]
    path = {"train": args.train_file, "validation": args.validation_file}[split]
    if path is None:
        return None
    ext = os.path.splitext(path)[1].lstrip(".")
    ext = {"jsonl": "json"}.get(ext, ext)
    return load_dataset(ext, data_files={split: path})[split]


def _label_names(dataset, label_col: str) -> List[str]:
    feature = dataset.features.get(label_col)
    seq_feature = getattr(feature, "feature", None)
    if seq_feature is not None and hasattr(seq_feature, "names"):
        return list(seq_feature.names)
    values = set()
    for tags in dataset[label_col]:
        values.update(tags)
    if all(isinstance(v, str) for v in values):
        # keep "O" first so untrained heads default to no-entity
        return sorted(values, key=lambda v: (v != "O", v))
    return [str(i) for i in range(int(max(values)) + 1)]


def _featurize(dataset, tokenizer, args, label_names, limit) -> Dict[str, np.ndarray]:
    if limit is not None:
        dataset = dataset.select(range(min(limit, len(dataset))))
    name_to_id = {n: i for i, n in enumerate(label_names)}
    enc = tokenizer(
        list(dataset[args.text_column_name]),
        is_split_into_words=True,
        max_length=args.max_seq_length,
        truncation=True,
        padding="max_length",
    )
    all_labels = []
    for i, tags in enumerate(dataset[args.label_column_name]):
        tags = [name_to_id[t] if isinstance(t, str) else int(t) for t in tags]
        word_ids = enc.word_ids(batch_index=i)
        labels, prev = [], None
        for wid in word_ids:
            if wid is None:
                labels.append(-100)
            elif wid != prev:
                labels.append(tags[wid])
            else:
                labels.append(tags[wid] if args.label_all_tokens else -100)
            prev = wid
        all_labels.append(labels)
    return {
        "input_ids": np.asarray(enc["input_ids"], dtype=np.int64),
        "attention_mask": np.asarray(enc["attention_mask"], dtype=np.int64),
        "labels": np.asarray(all_labels, dtype=np.int64),
    }


def main(argv=None) -> Dict[str, float]:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.output_dir, exist_ok=True)

    from transformers import AutoModelForTokenClassification, AutoTokenizer

    train_ds = _load_split(args, "train") if args.do_train else None
    eval_ds = _load_split(args, "validation") if args.do_eval else None
    probe = train_ds if train_ds is not None else eval_ds
    if probe is None:
        raise SystemExit("nothing to do: no train or validation split")
    label_names = _label_names(probe, args.label_column_name)

    tokenizer = AutoTokenizer.from_pretrained(
        args.tokenizer_name or args.model_name_or_path, add_prefix_space=True
    )
    model = AutoModelForTokenClassification.from_pretrained(
        args.model_name_or_path, num_labels=len(label_names)
    )
    model.config.id2label = dict(enumerate(label_names))
    model.config.label2id = {n: i for i, n in enumerate(label_names)}

    if args.load_adapter:
        load_adapter(model, args.load_adapter)
    elif args.train_adapter:
        inject_adapters(model, AdapterConfig(reduction_factor=args.adapter_reduction_factor))
    if args.train_adapter or args.load_adapter:
        n_trainable = mark_only_adapters_trainable(model)
        logger.info("trainable parameters: %d", n_trainable)

    results: Dict[str, float] = {}
    if args.do_train:
        feats = _featurize(train_ds, tokenizer, args, label_names, args.max_train_samples)
        stats = fit(
            model,
            feats,
            FitConfig(
                learning_rate=args.learning_rate,
                num_train_epochs=args.num_train_epochs,
                per_device_batch_size=args.per_device_train_batch_size,
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

    if args.do_eval:
        feats = _featurize(eval_ds, tokenizer, args, label_names, args.max_eval_samples)
        logits = predict(model, feats, args.per_device_train_batch_size)
        preds = logits.argmax(axis=-1)
        pred_tags, label_tags = [], []
        for p_row, l_row in zip(preds, feats["labels"]):
            keep = l_row != -100
            pred_tags.append([label_names[p] for p in p_row[keep]])
            label_tags.append([label_names[l] for l in l_row[keep]])
        metrics = span_f1(pred_tags, label_tags)
        results.update({f"eval_{k}": v for k, v in metrics.items()})

    with open(os.path.join(args.output_dir, "eval_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    logger.info("results: %s", results)
    return results


if __name__ == "__main__":
    main()
