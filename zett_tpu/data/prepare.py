"""Data preparation CLI: per-language train/valid splits.

Reference: data/prepare.py (MADLAD-400 streaming -> per-language parquet),
data/prepare_code.py (StarCoder), data/prepare_flan.py. This environment has
no network, so the CLI supports two sources: HF dataset names (streamed when
the hub is reachable) and local text/parquet files; output layout matches
what TrainDataset/ValidDataset load (<out>/<lang>.parquet or <lang>.txt).

Usage:
  python -m zett_tpu.data.prepare --source madlad --langs en de --out data/
  python -m zett_tpu.data.prepare --source local --input big.txt --lang en \
      --out data/ [--valid-fraction 0.01] [--max-docs N]
"""

from __future__ import annotations

import argparse
import os


def prepare_local(input_path: str, lang: str, out_dir: str,
                  valid_fraction: float = 0.01, max_docs: int | None = None):
    os.makedirs(os.path.join(out_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "valid"), exist_ok=True)
    with open(input_path) as f:
        docs = [line.rstrip("\n") for line in f if line.strip()]
    if max_docs:
        docs = docs[:max_docs]
    n_valid = max(int(len(docs) * valid_fraction), 1)
    valid, train = docs[:n_valid], docs[n_valid:]
    for split, items in (("train", train), ("valid", valid)):
        with open(os.path.join(out_dir, split, f"{lang}.txt"), "w") as f:
            for d in items:
                f.write(d + "\n")
    print(f"{lang}: {len(train)} train / {len(valid)} valid docs -> {out_dir}")


def prepare_hf(dataset_name: str, langs, out_dir: str, text_column: str = "text",
               max_docs: int | None = 100_000, valid_fraction: float = 0.01):
    from datasets import load_dataset

    for lang in langs:
        stream = load_dataset(dataset_name, lang, split="train", streaming=True)
        docs = []
        for i, ex in enumerate(stream):
            if max_docs and i >= max_docs:
                break
            text = ex.get(text_column, "")
            if text.strip():
                docs.append(text.replace("\n", " "))
        os.makedirs(os.path.join(out_dir, "train"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "valid"), exist_ok=True)
        n_valid = max(int(len(docs) * valid_fraction), 1)
        for split, items in (("train", docs[n_valid:]), ("valid", docs[:n_valid])):
            with open(os.path.join(out_dir, split, f"{lang}.txt"), "w") as f:
                for d in items:
                    f.write(d + "\n")
        print(f"{lang}: {len(docs)} docs -> {out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", choices=["local", "hf"], default="local")
    p.add_argument("--input", default=None)
    p.add_argument("--dataset", default="allenai/madlad-400")
    p.add_argument("--lang", default="en")
    p.add_argument("--langs", nargs="*", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--valid-fraction", type=float, default=0.01)
    p.add_argument("--max-docs", type=int, default=None)
    args = p.parse_args(argv)
    if args.source == "local":
        assert args.input, "--input required for local source"
        prepare_local(args.input, args.lang, args.out, args.valid_fraction, args.max_docs)
    else:
        prepare_hf(args.dataset, args.langs or [args.lang], args.out,
                   max_docs=args.max_docs, valid_fraction=args.valid_fraction)


if __name__ == "__main__":
    main()
