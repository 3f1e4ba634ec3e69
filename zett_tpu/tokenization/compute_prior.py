"""Prior computation CLI (reference: zett/compute_prior.py:139-166).

Usage:
  python -m zett_tpu.tokenization.compute_prior \
      --tokenizer TOK.json --data TEXTFILE [--mode reestimate] \
      [--block-size 128] [--output priors.npy]

Writes {"substring": ..., "token": ...} to <tokenizer dir>/priors.npy.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--data", required=True, help="text file, one document per line")
    p.add_argument("--mode", default="reestimate", choices=["reestimate", "use_tokenizer"])
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--output", default=None)
    p.add_argument("--max-texts", type=int, default=None)
    args = p.parse_args(argv)

    from ..evaluation.perplexity import chunked_tokenize
    from .core import Tokenizer
    from .priors import compute_substring_prior, get_prior

    tok_path = (
        os.path.join(args.tokenizer, "tokenizer.json")
        if os.path.isdir(args.tokenizer)
        else args.tokenizer
    )
    tokenizer = Tokenizer.from_file(tok_path)
    with open(args.data) as f:
        texts = [line.rstrip("\n") for line in f if line.strip()]
    if args.max_texts:
        texts = texts[: args.max_texts]

    substring_prior = compute_substring_prior(tokenizer, texts=texts)
    data = chunked_tokenize(tokenizer, texts, args.block_size)
    token_prior = get_prior(args.mode, data["input_ids"], tokenizer)

    out = args.output or os.path.join(os.path.dirname(tok_path), "priors.npy")
    np.save(out, {"substring": substring_prior, "token": token_prior})
    print(f"wrote priors for {len(tokenizer)} tokens to {out}")


if __name__ == "__main__":
    main()
