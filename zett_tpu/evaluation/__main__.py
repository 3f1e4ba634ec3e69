"""Eval CLI: perplexity / bits-per-char of a (transferred) causal LM.

Usage:
  python -m zett_tpu.evaluation --model MODEL_DIR --data TEXTFILE \
      [--tokenizer TOK] [--block-size 512] [--batch-size 8] [--bias bias.npy]

Reference: eval.py:42-209.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--data", required=True, help="text file, one document per line")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--block-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--bias", default=None, help="external lm-head bias .npy")
    p.add_argument("--max-texts", type=int, default=None)
    args = p.parse_args(argv)

    from ..models.backbones.loader import load_backbone_params
    from ..models.backbones.registry import build_model
    from ..tokenization import Tokenizer
    from .perplexity import chunked_tokenize, evaluate_lm

    with open(os.path.join(args.model, "config.json")) as f:
        config_json = json.load(f)
    model_type = config_json["model_type"]

    class _Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

    module, config = build_model(model_type, hf_config=_Cfg(config_json))
    params = load_backbone_params(args.model, model_type, config)

    tok_path = args.tokenizer or os.path.join(args.model, "tokenizer.json")
    tokenizer = Tokenizer.from_file(tok_path)

    with open(args.data) as f:
        texts = [line.rstrip("\n") for line in f if line.strip()]
    if args.max_texts:
        texts = texts[: args.max_texts]

    data = chunked_tokenize(tokenizer, texts, args.block_size)
    bias = np.load(args.bias) if args.bias else None

    def apply_fn(params, input_ids):
        return module.apply({"params": params}, input_ids)

    metrics = evaluate_lm(
        apply_fn, params, data,
        special_ids=tokenizer.all_special_ids,
        external_bias=bias,
        batch_size=args.batch_size,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
