"""Downstream-eval adapter subsystem (reference: zett/adapters/run_glue.py,
run_ner.py + experiments/{train,evaluate}_xlmr_adapters.sh).

Covers: near-identity injection, trainable-param selection, the portability
contract (adapter trained on model A loads into model B with swapped
embeddings and reproduces A's body behavior), the native metrics vs. known
values, and both runner CLIs end-to-end on tiny local data.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from zett_tpu.adapters import (
    AdapterConfig,
    inject_adapters,
    load_adapter,
    mark_only_adapters_trainable,
    save_adapter,
)
from zett_tpu.adapters.metrics import (
    f1_binary,
    glue_metrics,
    matthews_corrcoef,
    pearson,
    span_f1,
    spearman,
)


def tiny_roberta(num_labels=2, vocab_size=300, kind="sequence"):
    from transformers import (
        RobertaConfig,
        RobertaForSequenceClassification,
        RobertaForTokenClassification,
    )

    cfg = RobertaConfig(
        vocab_size=vocab_size,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=40,
        num_labels=num_labels,
        pad_token_id=1,
    )
    cls = (
        RobertaForSequenceClassification
        if kind == "sequence"
        else RobertaForTokenClassification
    )
    torch.manual_seed(0)
    model = cls(cfg)
    model.eval()
    return model


def make_fast_tokenizer(tmp_path, tokenizer_json):
    """Wrap a minted tokenizer.json fixture as a PreTrainedTokenizerFast dir."""
    from transformers import PreTrainedTokenizerFast

    path = os.path.join(tmp_path, "tokenizer.json")
    with open(path, "w") as f:
        json.dump(tokenizer_json, f, ensure_ascii=False)
    tok = PreTrainedTokenizerFast(
        tokenizer_file=path, pad_token="<pad>", unk_token="<unk>"
    )
    if tok.pad_token_id is None:
        tok.add_special_tokens({"pad_token": "<pad>"})
    return tok


def test_injection_is_identity_at_init():
    model = tiny_roberta()
    ids = torch.randint(0, 300, (2, 8))
    with torch.no_grad():
        before = model(input_ids=ids).logits.clone()
    inject_adapters(model, AdapterConfig(reduction_factor=4))
    with torch.no_grad():
        after = model(input_ids=ids).logits
    assert torch.allclose(before, after, atol=1e-6)
    with pytest.raises(ValueError):
        inject_adapters(model)


def test_only_adapters_and_head_trainable():
    model = tiny_roberta()
    inject_adapters(model, AdapterConfig(reduction_factor=4))
    n = mark_only_adapters_trainable(model)
    trainable = {k for k, p in model.named_parameters() if p.requires_grad}
    assert n > 0 and all(("adapter" in k) or ("classifier" in k) for k in trainable)
    assert any("adapter" in k for k in trainable)
    assert any("classifier" in k for k in trainable)
    # body frozen
    assert not model.roberta.embeddings.word_embeddings.weight.requires_grad


def test_adapter_training_learns_and_ports_across_embedding_swap(tmp_path):
    """The ZeTT contract: adapter+head trained on the source model, loaded
    into a model with different (transferred) embeddings — matching outputs
    whenever the post-embedding hidden states coincide."""
    from zett_tpu.adapters.trainer_lite import FitConfig, fit, predict

    model = tiny_roberta()
    inject_adapters(model, AdapterConfig(reduction_factor=4))
    mark_only_adapters_trainable(model)

    # trivially separable synthetic task keyed on the first token id
    rng = np.random.default_rng(0)
    n = 128
    first = rng.integers(5, 7, size=n)  # token 5 -> label 0, token 6 -> label 1
    rest = rng.integers(10, 250, size=(n, 7))
    ids = np.concatenate([first[:, None], rest], axis=1).astype(np.int64)
    feats = {
        "input_ids": ids,
        "attention_mask": np.ones_like(ids),
        "labels": (first == 6).astype(np.int64),
    }
    stats = fit(
        model, feats, FitConfig(learning_rate=5e-3, num_train_epochs=12, seed=0, logging_steps=1000)
    )
    preds = predict(model, feats, 32).argmax(-1)
    assert (preds == feats["labels"]).mean() > 0.9, stats

    save_adapter(model, tmp_path / "adapter")

    # "transferred" model: same body weights (same seed init; body was frozen
    # during adapter training), swapped embedding matrix
    target = tiny_roberta()
    with torch.no_grad():
        emb = target.roberta.embeddings.word_embeddings.weight
        # special tokens stay aligned in a real transfer (and roberta derives
        # position ids from pad-token positions) — permute only ids >= 5
        perm = torch.cat([torch.arange(5), 5 + torch.randperm(emb.shape[0] - 5)])
        target.roberta.embeddings.word_embeddings.weight.copy_(emb[perm])
    load_adapter(target, tmp_path / "adapter")

    # feeding the permuted ids must reproduce the source model's logits
    inv = torch.empty_like(perm)
    inv[perm] = torch.arange(len(perm))
    permuted_ids = inv[torch.as_tensor(ids)].numpy()
    out_src = predict(model, feats, 32)
    out_tgt = predict(
        target,
        {"input_ids": permuted_ids, "attention_mask": feats["attention_mask"]},
        32,
    )
    np.testing.assert_allclose(out_src, out_tgt, atol=1e-4)


def test_load_adapter_skips_mismatched_head(tmp_path):
    model = tiny_roberta(num_labels=2)
    inject_adapters(model, AdapterConfig(reduction_factor=4))
    save_adapter(model, tmp_path / "a")
    other = tiny_roberta(num_labels=3)
    load_adapter(other, tmp_path / "a")  # head shape mismatch tolerated
    with pytest.raises(ValueError):
        load_adapter(tiny_roberta(num_labels=3), tmp_path / "a", strict_head=True)


def test_metrics_known_values():
    assert glue_metrics("sst2", [1, 0, 1], [1, 0, 0]) == {"accuracy": pytest.approx(2 / 3)}
    assert f1_binary([1, 1, 0, 0], [1, 0, 1, 0]) == pytest.approx(0.5)
    # perfect correlation / anti-correlation
    assert pearson([1, 2, 3], [2, 4, 6]) == pytest.approx(1.0)
    assert spearman([1, 2, 3], [9, 5, 1]) == pytest.approx(-1.0)
    # sklearn-verified MCC for this confusion matrix
    assert matthews_corrcoef([1, 1, 1, 0], [1, 1, 0, 0]) == pytest.approx(0.57735, abs=1e-4)

    m = span_f1(
        [["B-PER", "I-PER", "O", "B-LOC"]],
        [["B-PER", "I-PER", "O", "B-ORG"]],
    )
    assert m["precision"] == pytest.approx(0.5)
    assert m["recall"] == pytest.approx(0.5)
    assert m["f1"] == pytest.approx(0.5)
    # entity-level: split span is not a match
    m2 = span_f1([["B-PER", "B-PER"]], [["B-PER", "I-PER"]])
    assert m2["f1"] == 0.0


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def test_run_classification_cli_end_to_end(tmp_path, gpt2_like_json):
    from transformers import PreTrainedTokenizerFast

    from zett_tpu.adapters.run_classification import main

    tok = make_fast_tokenizer(tmp_path, gpt2_like_json)
    model = tiny_roberta(vocab_size=tok.vocab_size + 10)
    model_dir = tmp_path / "model"
    model.save_pretrained(model_dir)
    tok.save_pretrained(model_dir)

    rows = []
    for i in range(64):
        label = i % 2
        text = "good day" if label else "bad night"
        rows.append({"premise": text, "hypothesis": "it is", "label": label})
    _write_jsonl(tmp_path / "train.jsonl", rows)
    _write_jsonl(tmp_path / "dev.jsonl", rows[:32])

    out = tmp_path / "out"
    results = main(
        [
            "--model_name_or_path", str(model_dir),
            "--train_file", str(tmp_path / "train.jsonl"),
            "--validation_file", str(tmp_path / "dev.jsonl"),
            "--sentence1_key", "premise",
            "--sentence2_key", "hypothesis",
            "--max_seq_length", "16",
            "--num_train_epochs", "8",
            "--learning_rate", "5e-3",
            "--train_adapter",
            "--adapter_reduction_factor", "4",
            "--do_train", "--do_eval",
            "--output_dir", str(out),
        ]
    )
    assert results["eval_accuracy"] > 0.9
    assert (out / "adapter" / "zett_adapter.bin").exists()
    assert (out / "eval_results.json").exists()

    # zero-shot reload path (evaluate_xlmr_adapters.sh flow)
    results2 = main(
        [
            "--model_name_or_path", str(model_dir),
            "--validation_file", str(tmp_path / "dev.jsonl"),
            "--sentence1_key", "premise",
            "--sentence2_key", "hypothesis",
            "--max_seq_length", "16",
            "--load_adapter", str(out / "adapter"),
            "--do_eval",
            "--output_dir", str(tmp_path / "out2"),
        ]
    )
    assert results2["eval_accuracy"] == pytest.approx(results["eval_accuracy"])


def test_run_ner_cli_end_to_end(tmp_path, gpt2_like_json):
    from zett_tpu.adapters.run_ner import main

    tok = make_fast_tokenizer(tmp_path, gpt2_like_json)
    model = tiny_roberta(vocab_size=tok.vocab_size + 10, kind="token", num_labels=3)
    model_dir = tmp_path / "model"
    model.save_pretrained(model_dir)
    tok.save_pretrained(model_dir)

    rows = []
    for i in range(48):
        rows.append(
            {
                "tokens": ["Alice", "went", "to", "Paris"],
                "ner_tags": ["B-PER", "O", "O", "B-LOC"],
            }
        )
    _write_jsonl(tmp_path / "ner.jsonl", rows)

    out = tmp_path / "ner_out"
    results = main(
        [
            "--model_name_or_path", str(model_dir),
            "--train_file", str(tmp_path / "ner.jsonl"),
            "--validation_file", str(tmp_path / "ner.jsonl"),
            "--max_seq_length", "16",
            "--num_train_epochs", "10",
            "--learning_rate", "5e-3",
            "--train_adapter",
            "--adapter_reduction_factor", "4",
            "--do_train", "--do_eval",
            "--output_dir", str(out),
        ]
    )
    assert results["eval_f1"] > 0.9
    assert (out / "adapter" / "zett_adapter.bin").exists()
