"""Baseline-transfer CLI: non-hypernet embedding initialization methods
(reference: scripts/transfer_lexical.py, transfer_focus.py, transfer_ofa.py,
transfer_passthrough.py — each a standalone script there; one CLI with a
`--method` switch here).

Writes a ready-to-use HF model dir with swapped embeddings + the byte-level-
converted target tokenizer, exactly like the hypernet transfer CLI.

Usage:
  python -m zett_tpu.transfer.baselines_cli \
      --method {lexical,fvt,bfvt,focus,ofa,passthrough} \
      --model MODEL_DIR --target-tokenizer TOK --output OUT \
      [--word-embeddings VECS.txt] [--factorize-dim D] [--top-k K] \
      [--temperature T] [--fallback {unk,random}] [--checkpoint CKPT]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--method",
        required=True,
        choices=["lexical", "fvt", "bfvt", "focus", "ofa", "passthrough"],
    )
    p.add_argument("--model", required=True)
    p.add_argument("--target-tokenizer", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None, help="passthrough: trainer ckpt dir")
    p.add_argument(
        "--word-embeddings",
        default=None,
        help="ofa/focus auxiliary vectors: text file 'word v1 v2 ...' per line "
        "(word2vec format, header line optional); hashed char-n-grams when absent",
    )
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--factorize-dim", type=int, default=None)
    p.add_argument("--fallback", default="unk", choices=["unk", "random"])
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def load_word_vectors(path: str) -> dict:
    vectors = {}
    with open(path) as f:
        first = f.readline().split()
        if len(first) != 2:  # no word2vec header
            f.seek(0)
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) < 3:
                continue
            vectors[parts[0]] = np.asarray(parts[1:], dtype=np.float32)
    return vectors


def main(argv=None):
    args = parse_args(argv)

    from ..models.backbones.loader import load_backbone_params, save_hf_model
    from ..models.backbones.registry import (
        IN_EMBEDDING_PATHS,
        OUT_EMBEDDING_PATHS,
        resolve_out_path,
        build_model,
        get_subtree,
    )
    from ..models.splice import splice_embeddings
    from ..tokenization import Tokenizer
    from ..tokenization.convert import convert_to_byte_level, is_byte_level
    from .baselines import (
        focus_transfer,
        lexical_transfer,
        ofa_transfer,
        passthrough_transfer,
    )

    def _tok_path(path):
        return os.path.join(path, "tokenizer.json") if os.path.isdir(path) else path

    with open(os.path.join(args.model, "config.json")) as f:
        bb_config_json = json.load(f)
    model_type = bb_config_json["model_type"]

    class _Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

    _module, bb_config = build_model(model_type, hf_config=_Cfg(bb_config_json))
    bb_params = load_backbone_params(args.model, model_type, bb_config)

    source_tokenizer = Tokenizer.from_file(_tok_path(args.model))
    if not is_byte_level(source_tokenizer.to_json()):
        source_tokenizer, _ = convert_to_byte_level(source_tokenizer)
    target_tokenizer = Tokenizer.from_file(_tok_path(args.target_tokenizer))
    target_tokenizer, _ = convert_to_byte_level(
        target_tokenizer,
        match_special_tokens_to=source_tokenizer,
        make_whitespace_consistent=True,
    )

    emb_in = np.asarray(get_subtree(bb_params, IN_EMBEDDING_PATHS[model_type]))
    out_path = resolve_out_path(model_type, bb_params)
    emb_out = np.asarray(get_subtree(bb_params, out_path)).T if out_path else None

    word_embeddings = (
        load_word_vectors(args.word_embeddings) if args.word_embeddings else None
    )

    def run_method(src):
        if args.method in ("lexical", "fvt", "bfvt"):
            fvt = {"lexical": "no", "fvt": "fvt", "bfvt": "bfvt"}[args.method]
            return lexical_transfer(
                src, source_tokenizer, target_tokenizer,
                fvt_mode=fvt, fallback_mode=args.fallback, seed=args.seed,
            )[0]
        if args.method == "focus":
            aux = None
            if word_embeddings is not None:
                aux = {w: v / max(np.linalg.norm(v), 1e-8) for w, v in word_embeddings.items()}
            return focus_transfer(
                src, source_tokenizer, target_tokenizer,
                auxiliary_embeddings=aux,
                top_k=args.top_k, temperature=args.temperature,
            )[0]
        if args.method == "ofa":
            return ofa_transfer(
                src, source_tokenizer, target_tokenizer,
                word_embeddings=word_embeddings,
                top_k=args.top_k, temperature=args.temperature,
                factorize_dim=args.factorize_dim, seed=args.seed,
            )[0]
        raise AssertionError(args.method)

    if args.method == "passthrough":
        if args.checkpoint is None:
            raise SystemExit("--checkpoint required for --method passthrough")
        from ..utils.checkpoint import restore_params_portable

        state = restore_params_portable(
            os.path.abspath(os.path.join(args.checkpoint, "state"))
        )
        hn_params = state["params"]["hypernet"] if "params" in state else state
        new_in, new_out = passthrough_transfer(hn_params, len(target_tokenizer))
    else:
        new_in = run_method(emb_in)
        new_out = run_method(emb_out) if emb_out is not None else None

    import jax.numpy as jnp

    spliced = splice_embeddings(
        bb_params, model_type, jnp.asarray(new_in),
        jnp.asarray(new_out) if (new_out is not None and out_path) else None,
    )
    os.makedirs(args.output, exist_ok=True)
    bb_config_json = dict(bb_config_json, vocab_size=int(new_in.shape[0]))
    save_hf_model(args.output, spliced, model_type, bb_config, bb_config_json)
    target_tokenizer.save(os.path.join(args.output, "tokenizer.json"))
    print(
        f"{args.method}-transferred {model_type} -> {len(target_tokenizer)} tokens "
        f"at {args.output}"
    )


if __name__ == "__main__":
    main()
