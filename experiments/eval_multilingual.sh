#!/usr/bin/env bash
# Multilingual zero-shot eval sweep (reference:
# experiments/eval_multilingual_mistral.sh — per-language XCOPA / m_MMLU
# loops over transferred Mistral models via lm_eval).
#
# For each language: zero-shot-transfer the checkpoint to the language's
# tokenizer, then score the language's multiple-choice task with the native
# loglikelihood evaluator (lm_eval acc/acc_norm semantics,
# zett_tpu/evaluation/choice.py). Task jsonl lines:
#   {"query": ..., "choices": [...], "gold": i}
# — the XCOPA/m_MMLU shape exported from any harness dump.
#
# Env:
#   CKPT       hypernet checkpoint dir   (default out/zeroshot_mistral/final)
#   MODEL      HF backbone dir           (default models/mistral-7b)
#   TOKENIZERS per-language tokenizer dirs, $TOKENIZERS/<lang>_raw
#   TASKS      per-language task files,   $TASKS/<task>_<lang>.jsonl
#   LANGS      language list             (default: the reference XCOPA set)
#   OUT        output root
#
# A fully-offline end-to-end demo of this sweep (tiny model, minted
# tokenizers and tasks) is experiments/eval_multilingual.py, which writes
# experiments/results/multilingual_eval.{json,md}.
set -euo pipefail

CKPT=${CKPT:-out/zeroshot_mistral/final}
MODEL=${MODEL:-models/mistral-7b}
TOKENIZERS=${TOKENIZERS:-artifacts/tokenizers}
TASKS=${TASKS:-data/tasks}
LANGS=${LANGS:-"et ht id it qu sw ta th tr vi zh"}
OUT=${OUT:-out/multilingual_eval}

mkdir -p "$OUT"
for lang in $LANGS; do
  tok="$TOKENIZERS/${lang}_raw"
  [ -d "$tok" ] || { echo "skip $lang (no tokenizer at $tok)"; continue; }

  model_dir="$OUT/transferred-$lang"
  if [ ! -d "$model_dir" ]; then
    python -m zett_tpu.transfer \
        --checkpoint "$CKPT" --model "$MODEL" \
        --target-tokenizer "$tok" --output "$model_dir"
  fi

  for task in "$TASKS"/*_"$lang".jsonl; do
    [ -e "$task" ] || continue
    echo "== $lang $(basename "$task")"
    python -m zett_tpu.evaluation.choice \
        --model "$model_dir" --data "$task" \
        | tee -a "$OUT/results_$lang.jsonl"
  done
done
