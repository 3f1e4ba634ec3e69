#!/usr/bin/env bash
# Zero-shot eval of transferred CausalLMs (reference:
# experiments/eval_english.sh runs lm_eval zero-shot tasks; transferred
# models are standard HF dirs so `lm_eval --model hf --model_args
# pretrained=<dir>` works unchanged where lm_eval is installed).
#
# In-framework equivalents:
#   perplexity/bits-per-char:  python -m zett_tpu.evaluation
#   multiple-choice tasks:     python -m zett_tpu.evaluation.choice
#     (lm_eval-style loglikelihood scoring, acc + byte-normalized acc_norm;
#      task jsonl lines: {"query": ..., "choices": [...], "gold": i} —
#      the arc/boolq/hellaswag/piqa/winogrande shape)
set -euo pipefail

DATA=${DATA:-data/valid/en.txt}
TASKS=${TASKS:-}   # optional: space-separated jsonl task files
for model in "$@"; do
  python -m zett_tpu.evaluation --model "$model" --data "$DATA"
  for task in $TASKS; do
    echo "== $task"
    python -m zett_tpu.evaluation.choice --model "$model" --data "$task"
  done
done
