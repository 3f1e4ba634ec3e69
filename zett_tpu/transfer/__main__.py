"""Transfer CLI: apply a trained hypernetwork to a new target tokenizer.

Usage:
  python -m zett_tpu.transfer \
      --checkpoint CKPT_DIR         # Trainer checkpoint (state/ + hn_config.json)
      --model MODEL_DIR             # HF backbone dir (config.json + weights)
      --target-tokenizer TOK        # tokenizer.json (or dir containing it)
      --output OUT_DIR
      [--hn-tokenizer TOK] [--batch-size N] [--do-batch-sampling] [--min-k K]
      [--lang-index I] [--revert-to-hf-format]

Reference: scripts/transfer.py:30-328.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--target-tokenizer", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--hn-tokenizer", default=None)
    p.add_argument("--batch-size", type=int, default=16384)
    p.add_argument("--do-batch-sampling", action="store_true")
    p.add_argument("--min-k", type=int, default=4)
    p.add_argument("--lang-index", type=int, default=0)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--n-model-parallel", type=int, default=1)
    return p.parse_args(argv)


def _tokenizer_path(path: str) -> str:
    if os.path.isdir(path):
        return os.path.join(path, "tokenizer.json")
    return path


def main(argv=None):
    args = parse_args(argv)
    import orbax.checkpoint as ocp

    import jax

    from ..models import Hypernet, HypernetConfig
    from ..models.backbones.loader import load_backbone_params, save_hf_model
    from ..models.backbones.registry import build_model
    from ..models.splice import splice_embeddings
    from ..parallel import make_mesh
    from ..tokenization import Tokenizer
    from ..tokenization.convert import convert_to_byte_level, is_byte_level
    from .core import transfer

    with open(os.path.join(args.checkpoint, "hn_config.json")) as f:
        hn_config = HypernetConfig.from_dict(json.load(f))
    from ..utils.checkpoint import restore_params_portable

    hn_params = restore_params_portable(
        os.path.abspath(os.path.join(args.checkpoint, "state"))
    )
    hypernet = Hypernet(hn_config)

    hn_tok_path = _tokenizer_path(args.hn_tokenizer or args.checkpoint)
    hn_tokenizer = Tokenizer.from_file(hn_tok_path)
    if not is_byte_level(hn_tokenizer.to_json()):
        hn_tokenizer, _ = convert_to_byte_level(hn_tokenizer)

    with open(os.path.join(args.model, "config.json")) as f:
        bb_config_json = json.load(f)
    model_type = bb_config_json["model_type"]

    class _Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

    module, bb_config = build_model(model_type, hf_config=_Cfg(bb_config_json))
    bb_params = load_backbone_params(args.model, model_type, bb_config)

    source_tokenizer = Tokenizer.from_file(_tokenizer_path(args.model))
    if not is_byte_level(source_tokenizer.to_json()):
        source_tokenizer, _ = convert_to_byte_level(source_tokenizer)

    from ..models.backbones.registry import (
        IN_EMBEDDING_PATHS,
        get_subtree,
        resolve_out_path,
    )

    emb_in = np.asarray(get_subtree(bb_params, IN_EMBEDDING_PATHS[model_type]))
    out_path = resolve_out_path(model_type, bb_params)
    emb_out = (
        np.asarray(get_subtree(bb_params, out_path)).T if out_path is not None else None
    )

    target_tokenizer = Tokenizer.from_file(_tokenizer_path(args.target_tokenizer))

    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1:
        mesh = make_mesh(n_data=n_dev // args.n_model_parallel,
                         n_model=args.n_model_parallel)

    new_in, new_out, bias, converted_target = transfer(
        hypernet=hypernet,
        hn_params=hn_params,
        hn_tokenizer=hn_tokenizer,
        source_tokenizer=source_tokenizer,
        source_embeddings_in=emb_in,
        source_embeddings_out=emb_out,
        target_tokenizer=target_tokenizer,
        lang_index=args.lang_index,
        batch_size=args.batch_size,
        do_batch_sampling=args.do_batch_sampling,
        min_k=args.min_k,
        mesh=mesh,
        seed=args.seed,
    )

    import jax.numpy as jnp

    spliced = splice_embeddings(
        bb_params, model_type, jnp.asarray(new_in),
        jnp.asarray(new_out) if (new_out is not None and out_path is not None) else None,
    )
    os.makedirs(args.output, exist_ok=True)
    bb_config_json["vocab_size"] = int(new_in.shape[0])
    save_hf_model(args.output, spliced, model_type, bb_config, bb_config_json)
    converted_target.save(os.path.join(args.output, "tokenizer.json"))
    # architectures without an lm-head bias get it as a side artifact
    # (reference: bias.msgpack, scripts/transfer.py:304-309)
    np.save(os.path.join(args.output, "bias.npy"), bias)
    print(f"transferred {model_type} -> {len(converted_target)} tokens at {args.output}")


if __name__ == "__main__":
    main()
