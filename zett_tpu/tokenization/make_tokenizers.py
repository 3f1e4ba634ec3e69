"""Mint eval-tokenizer artifacts: per-language frozen tokenizers + priors
(reference: scripts/make_spm.py + scripts/make_tokenizers.sh +
make_large_tokenizers.sh produce artifacts/tokenizers/<name>/{tokenizer.json,
priors.npy}; scripts/get_sampled_tokenizer.py extracts one sampled-vocab
tokenizer — covered here by --mode sample).

Modes:
  train   — train a Unigram tokenizer on the corpus with our native EM
            trainer (the sentencepiece replacement), byte-level, optional
            whitespace-run pieces for code
  sample  — draw one noisy sampled-vocab Unigram tokenizer from the corpus
            via TokenizerSampler (what the training collator does per batch)

Both write <output>/<name>/tokenizer.json (+ priors.npy unless --no-priors).

Usage:
  python -m zett_tpu.tokenization.make_tokenizers \
      --data corpus.txt --output artifacts/tokenizers --name en_raw \
      [--mode train|sample] [--vocab-size N] [--whitespace-pieces] \
      [--noise-std S] [--no-priors] [--max-texts N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True, help="text file, one document per line")
    p.add_argument("--output", required=True)
    p.add_argument("--name", required=True)
    p.add_argument("--mode", default="train", choices=["train", "sample"])
    p.add_argument("--vocab-size", type=int, default=50_000)
    p.add_argument("--whitespace-pieces", action="store_true",
                   help="append whitespace-run pieces (code tokenizers)")
    p.add_argument("--special-tokens", nargs="*", default=["<unk>", "<s>", "</s>"])
    p.add_argument("--noise-std", type=float, default=0.0, help="sample mode")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-texts", type=int, default=None)
    p.add_argument("--no-priors", action="store_true")
    p.add_argument("--prior-block-size", type=int, default=128)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from .priors import get_prior
    from .sampler import TokenizerSampler
    from .spm import assemble_unigram_tokenizer, make_spm_tokenizer

    with open(args.data) as f:
        texts = [line.rstrip("\n") for line in f if line.strip()]
    if args.max_texts:
        texts = texts[: args.max_texts]

    if args.mode == "train":
        tok = make_spm_tokenizer(
            texts,
            vocab_size=args.vocab_size,
            with_whitespace_pieces=args.whitespace_pieces,
            special_tokens=args.special_tokens,
        )
    else:
        sampler = TokenizerSampler()
        sampled = sampler.sample_tokenizer(
            {t: 1 for t in texts},
            args.vocab_size,
            16,
            4,
            args.noise_std,
            pop_prev=True,
            push_current=False,
            rng=np.random.default_rng(args.seed),
        )
        specials = args.special_tokens
        pairs = [[t, 0.0] for t in specials] + [
            [p, float(s)] for p, s in sampled if p not in set(specials)
        ]
        tok = assemble_unigram_tokenizer(pairs, specials)

    out_dir = os.path.join(args.output, args.name)
    os.makedirs(out_dir, exist_ok=True)
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    _write_hf_sidecars(out_dir, tok)

    if not args.no_priors:
        from ..evaluation.perplexity import chunked_tokenize
        from .priors import compute_substring_prior

        # same artifact format as the reference's compute_prior CLI
        # (zett/compute_prior.py:158-166): {"substring": ..., "token": ...}
        data = chunked_tokenize(tok, texts, args.prior_block_size)
        token_prior = get_prior("reestimate", data["input_ids"], tok)
        substring_prior = compute_substring_prior(tok, texts=texts)
        np.save(
            os.path.join(out_dir, "priors.npy"),
            {"substring": substring_prior, "token": token_prior},
        )

    print(f"{args.mode}: {len(tok)}-token tokenizer at {out_dir}")


def _write_hf_sidecars(out_dir: str, tok) -> None:
    """tokenizer_config.json + special_tokens_map.json so the artifact dir
    loads with transformers' PreTrainedTokenizerFast, mirroring the
    reference's artifact layout (artifacts/tokenizers/*/)."""
    import json

    specials = tok.all_special_tokens
    named = {}
    for s in specials:
        low = s.lower()
        if "unk" in low:
            named.setdefault("unk_token", s)
        elif "pad" in low:
            named.setdefault("pad_token", s)
        elif "mask" in low:
            named.setdefault("mask_token", s)
        elif s in ("<|endoftext|>",):
            named.setdefault("eos_token", s)
            named.setdefault("bos_token", s)
        elif low in ("</s>", "[sep]"):
            named.setdefault("eos_token", s)
            if low == "[sep]":
                named.setdefault("sep_token", s)
        elif low in ("<s>", "[cls]"):
            named.setdefault("bos_token", s)
            if low == "[cls]":
                named.setdefault("cls_token", s)
    with open(os.path.join(out_dir, "special_tokens_map.json"), "w") as f:
        json.dump(named, f, indent=2)
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "clean_up_tokenization_spaces": False,
                "model_max_length": 1000000000000000019884624838656,
                **named,
            },
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
