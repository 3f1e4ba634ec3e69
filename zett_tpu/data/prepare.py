"""Data preparation CLI: per-language train/valid splits.

Reference: data/prepare.py (MADLAD-400 streaming -> per-language parquet),
data/prepare_code.py:50-52 (StarCoder per-language via data_dir + `content`
column), data/prepare_flan.py:16-18 (FLAN subsample with pre-made splits).
This environment has no network, so the CLI supports a local-file source in
addition to the HF streaming sources; output layout matches what
TrainDataset/ValidDataset load (<out>/{train,valid}/<lang>.{txt,parquet}).

Usage:
  python -m zett_tpu.data.prepare --source hf --langs en de --out data/
  python -m zett_tpu.data.prepare --source code --langs python go --out data/
  python -m zett_tpu.data.prepare --source flan --out data/
  python -m zett_tpu.data.prepare --source local --input big.txt --lang en \
      --out data/ [--valid-fraction 0.01] [--max-docs N]
"""

from __future__ import annotations

import argparse
import os

# the reference's StarCoder language set (data/prepare_code.py include_langs)
CODE_LANGS = [
    "cpp", "go", "java", "javascript", "python",
    "github-issues-filtered-structured",
]


def _write_split(docs, lang: str, out_dir: str, valid_fraction: float):
    os.makedirs(os.path.join(out_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "valid"), exist_ok=True)
    n_valid = max(int(len(docs) * valid_fraction), 1)
    for split, items in (("train", docs[n_valid:]), ("valid", docs[:n_valid])):
        with open(os.path.join(out_dir, split, f"{lang}.txt"), "w") as f:
            for d in items:
                f.write(d + "\n")
    print(f"{lang}: {len(docs) - n_valid} train / {n_valid} valid docs -> {out_dir}")


def prepare_local(input_path: str, lang: str, out_dir: str,
                  valid_fraction: float = 0.01, max_docs: int | None = None):
    with open(input_path) as f:
        docs = [line.rstrip("\n") for line in f if line.strip()]
    if max_docs:
        docs = docs[:max_docs]
    _write_split(docs, lang, out_dir, valid_fraction)


def _stream_docs(stream, text_column: str, max_docs: int | None):
    docs = []
    it = iter(stream)
    seen = 0
    consecutive_errors = 0
    while not (max_docs and seen >= max_docs):
        # errors surface from the iterator advance itself (network/parse
        # failures mid-stream), not from ex.get — wrap next(), skip the
        # record, and only give up after a run of consecutive failures
        try:
            ex = next(it)
        except StopIteration:
            break
        except Exception as e:  # noqa: BLE001 - reference swallows stream errors
            print(f"Warning: stream error, skipping record: {e}")
            consecutive_errors += 1
            if consecutive_errors >= 100:
                print("Warning: 100 consecutive stream errors, stopping")
                break
            continue
        consecutive_errors = 0
        seen += 1
        text = ex.get(text_column, "")
        if text and text.strip():
            docs.append(text.replace("\n", " "))
    return docs


def prepare_hf(dataset_name: str, langs, out_dir: str, text_column: str = "text",
               max_docs: int | None = 100_000, valid_fraction: float = 0.01):
    """Per-language streaming download (MADLAD-400-style: one config per
    language, `text` column)."""
    from datasets import load_dataset

    for lang in langs:
        stream = load_dataset(dataset_name, lang, split="train", streaming=True)
        _write_split(_stream_docs(stream, text_column, max_docs), lang,
                     out_dir, valid_fraction)


def prepare_code(langs, out_dir: str, dataset_name: str = "bigcode/starcoderdata",
                 max_docs: int | None = 100_000, valid_fraction: float = 0.01):
    """StarCoder per-language prep (reference data/prepare_code.py): one
    data_dir per code language, text in the `content` column."""
    from datasets import load_dataset

    for lang in langs or CODE_LANGS:
        stream = load_dataset(
            dataset_name, data_dir=lang, split="train", streaming=True
        )
        _write_split(_stream_docs(stream, "content", max_docs), lang,
                     out_dir, valid_fraction)


def prepare_flan(out_dir: str, dataset_name: str = "benjamin/flanv2_subsample",
                 max_docs: int | None = None):
    """FLAN subsample prep (reference data/prepare_flan.py): the dataset
    ships train/valid splits; written as the `flan` language."""
    from datasets import load_dataset

    dset = load_dataset(dataset_name)
    for split_in, split_out in (("train", "train"), ("valid", "valid")):
        docs = [
            ex["text"].replace("\n", " ")
            for ex in dset[split_in]
            if ex.get("text", "").strip()
        ]
        if max_docs:
            docs = docs[:max_docs]
        os.makedirs(os.path.join(out_dir, split_out), exist_ok=True)
        with open(os.path.join(out_dir, split_out, "flan.txt"), "w") as f:
            for d in docs:
                f.write(d + "\n")
        print(f"flan/{split_out}: {len(docs)} docs -> {out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", choices=["local", "hf", "code", "flan"],
                   default="local")
    p.add_argument("--input", default=None)
    p.add_argument("--dataset", default=None)
    p.add_argument("--lang", default="en")
    p.add_argument("--langs", nargs="*", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--valid-fraction", type=float, default=0.01)
    p.add_argument("--max-docs", type=int, default=None)
    args = p.parse_args(argv)
    if args.source == "local":
        assert args.input, "--input required for local source"
        prepare_local(args.input, args.lang, args.out, args.valid_fraction,
                      args.max_docs)
    elif args.source == "code":
        prepare_code(args.langs, args.out,
                     dataset_name=args.dataset or "bigcode/starcoderdata",
                     max_docs=args.max_docs, valid_fraction=args.valid_fraction)
    elif args.source == "flan":
        prepare_flan(args.out, dataset_name=args.dataset or "benjamin/flanv2_subsample",
                     max_docs=args.max_docs)
    else:
        prepare_hf(args.dataset or "allenai/madlad-400",
                   args.langs or [args.lang], args.out,
                   max_docs=args.max_docs, valid_fraction=args.valid_fraction)


if __name__ == "__main__":
    main()
