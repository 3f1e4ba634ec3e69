#!/usr/bin/env bash
# BPE->Unigram conversion accuracy runs (reference: scripts/unigramify.sh,
# which records: bert-base-cased 99.44%, roberta-base 99.02%, gpt2 99.02%,
# mistral 99.81%, llama 99.8% — CPLEX LP; ours solves with scipy HiGHS).
set -euo pipefail

DATA=${DATA:-data/train/en.txt}
OUT=${OUT:-out/unigramify}
for tok in "$@"; do
  name=$(basename "$tok" .json)
  python -m zett_tpu.tokenization.unigramify \
      --tokenizer "$tok" --data "$DATA" --output "$OUT/$name"
done
