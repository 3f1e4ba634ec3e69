#!/usr/bin/env bash
# Zero-shot transfer of an XLM-R-family hypernet to per-language tokenizers
# (reference: experiments/transfer_xlmr.sh). Also produces the baseline
# variants used by the downstream adapter evals.
set -euo pipefail

CKPT=${CKPT:-out/zeroshot_xlmr_26l/final}
MODEL=${MODEL:-models/xlm-roberta-base}
TOKENIZER_DIR=${TOKENIZER_DIR:-artifacts/tokenizers}
OUT=${OUT:-out/transferred}

for lang in ar bg de el en es fr hi ru sw tr ur vi; do
  tok="$TOKENIZER_DIR/${lang}_raw"
  [ -d "$tok" ] || { echo "skip $lang (no tokenizer at $tok)"; continue; }

  python -m zett_tpu.transfer \
      --checkpoint "$CKPT" --model "$MODEL" \
      --target-tokenizer "$tok" --output "$OUT/xlmr-$lang"

  for method in focus bfvt ofa; do
    python -m zett_tpu.transfer.baselines_cli --method $method \
        --model "$MODEL" --target-tokenizer "$tok" \
        --output "$OUT/xlmr-$lang-from-$method"
  done
done
