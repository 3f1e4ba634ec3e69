#!/usr/bin/env bash
# Perplexity/bits-per-char of transferred CausalLMs (reference:
# experiments/eval_english.sh runs lm_eval zero-shot tasks; transferred
# models are standard HF dirs so `lm_eval --model hf --model_args
# pretrained=<dir>` works unchanged where lm_eval is installed — here we run
# the in-framework perplexity eval).
set -euo pipefail

DATA=${DATA:-data/valid/en.txt}
for model in "$@"; do
  python -m zett_tpu.evaluation --model "$model" --data "$DATA"
done
