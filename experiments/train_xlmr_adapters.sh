#!/usr/bin/env bash
# Train a bottleneck adapter + classification head on the source model
# (reference: experiments/train_xlmr_adapters.sh — adapters lib `seq_bn`;
# ours: zett_tpu.adapters). XNLI-en from the hub when online, or pass
# TRAIN_FILE/VALID_FILE jsonl with premise/hypothesis/label when offline.
set -euo pipefail

MODEL=${MODEL:-models/xlm-roberta-base}
OUT=${OUT:-out/adapters/xnli_en}

if [ -n "${TRAIN_FILE:-}" ]; then
  DATA_ARGS=(--train_file "$TRAIN_FILE" --validation_file "${VALID_FILE:-$TRAIN_FILE}"
             --sentence1_key premise --sentence2_key hypothesis)
else
  DATA_ARGS=(--dataset_name xnli --dataset_config_name en)
fi

python -m zett_tpu.adapters.run_classification \
    --model_name_or_path "$MODEL" "${DATA_ARGS[@]}" \
    --do_train --do_eval --train_adapter \
    --max_seq_length 128 --per_device_train_batch_size 32 \
    --learning_rate 1e-4 --num_train_epochs 5.0 \
    --output_dir "$OUT"
