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
    p.add_argument(
        "--device", action="store_true",
        help="count token usage on-device (batched Viterbi + psum-reduced "
        "histogram over the mesh's data axis) instead of the host encode "
        "pass; Unigram tokenizers only",
    )
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
    if args.device and args.mode == "reestimate":
        # on-device counting: Viterbi + token-usage histogram on the chips,
        # psum-reduced over the mesh data axis; only (V,) counts leave the
        # devices (ops/device_viterbi.count_tokens_device)
        import jax

        from ..ops.device_viterbi import count_tokens_device
        from ..parallel import make_mesh
        from ..tokenization.bytemaps import CHARS_TO_BYTES
        from .convert import is_byte_level
        from .priors import get_pretoken_counts

        # one byte domain per tokenizer, applied uniformly to vocab pieces
        # AND pretokens: byte-level tokenizers live in byte-char space (map
        # through CHARS_TO_BYTES), everything else (metaspace/sentencepiece
        # vocabs full of '▁') in utf-8. Mixing domains per-string would
        # silently mismatch e.g. 'é' (0xE9 via the byte map vs 0xC3 0xA9 in
        # utf-8) and degrade the reestimated prior toward uniform.
        byte_level = is_byte_level(tokenizer.to_json())

        def to_bytes(s: str) -> bytes:
            return (
                bytes(CHARS_TO_BYTES[c] for c in s)
                if byte_level
                else s.encode("utf-8")
            )

        special_tokens = set(tokenizer.all_special_tokens)
        pieces = []
        scores = tokenizer.model.get_scores()
        for i in range(len(scores)):
            tok = tokenizer.id_to_token(i) or ""
            if tok in special_tokens or not tok:
                pieces.append(b"")  # specials never match inside spans
                continue
            try:
                pieces.append(to_bytes(tok))
            except KeyError:
                raise SystemExit(
                    f"vocab piece {tok!r} (id {i}) is not representable in "
                    "the tokenizer's byte domain; rerun without --device to "
                    "use the host path"
                )
        pretok_counts = {
            to_bytes(p): c
            for p, c in get_pretoken_counts(tokenizer, texts).items()
            if not byte_level or all(c in CHARS_TO_BYTES for c in p)
        }
        n_dev = len(jax.devices())
        mesh = make_mesh(n_data=n_dev, n_model=1) if n_dev > 1 else None
        # 48-byte rows: pretokens are words (GPT-2-split bounded); truncating
        # at the retokenizer's default 16 visibly skews counts of pieces in
        # long identifiers, 48 makes truncation negligible
        counts = count_tokens_device(
            pieces, scores, pretok_counts, mesh=mesh, max_pretoken_len=48
        )
        priors = counts.astype(np.float64) + 1.0  # laplace, as get_prior does
        priors /= priors.sum()
        token_prior = np.log(priors)
        # the device array is model-vocab-sized; added specials can sit at
        # ids beyond len(scores) in tokenizers with out-of-vocab added rows
        special = [i for i in tokenizer.all_special_ids if i < len(token_prior)]
        if special:
            token_prior[np.asarray(special)] = 0.0
    else:
        data = chunked_tokenize(tokenizer, texts, args.block_size)
        token_prior = get_prior(args.mode, data["input_ids"], tokenizer)

    out = args.output or os.path.join(os.path.dirname(tok_path), "priors.npy")
    np.save(out, {"substring": substring_prior, "token": token_prior})
    print(f"wrote priors for {len(tokenizer)} tokens to {out}")


if __name__ == "__main__":
    main()
