#!/usr/bin/env bash
# Zero-shot cross-lingual eval: load the en-trained adapter into each
# language's TRANSFERRED model (reference: experiments/evaluate_xlmr_adapters.sh).
set -euo pipefail

ADAPTER=${ADAPTER:-out/adapters/xnli_en/adapter}
TRANSFERRED=${TRANSFERRED:-out/transferred}
OUT=${OUT:-out/eval_results}
VARIANTS=${VARIANTS:-"" -from-focus -from-bfvt -from-ofa}

mkdir -p "$OUT"
for lang in ar bg de el en es fr hi ru sw tr ur vi; do
  for variant in $VARIANTS; do
    model="$TRANSFERRED/xlmr-$lang$variant"
    [ -d "$model" ] || continue
    name=$(basename "$model")
    result="$OUT/eval_results_${name}.json"
    [ -f "$result" ] && { echo "skip $name"; continue; }

    if [ -n "${VALID_FILE_PATTERN:-}" ]; then
      DATA_ARGS=(--validation_file "$(printf "$VALID_FILE_PATTERN" "$lang")"
                 --sentence1_key premise --sentence2_key hypothesis)
    else
      DATA_ARGS=(--dataset_name xnli --dataset_config_name "$lang")
    fi
    python -m zett_tpu.adapters.run_classification \
        --model_name_or_path "$model" "${DATA_ARGS[@]}" \
        --load_adapter "$ADAPTER" --do_eval \
        --output_dir "$OUT/$name"
    cp "$OUT/$name/eval_results.json" "$result"
  done
done
