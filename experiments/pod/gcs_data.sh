#!/bin/bash
# Mount / sync training data from GCS (reference parity: scripts/gcsfuse.sh,
# upload_multilingual_data.sh, download_multilingual_data.sh).
# Usage: ./gcs_data.sh mount BUCKET [DIR]   — gcsfuse mount at ./bucket
#        ./gcs_data.sh pull BUCKET/PATH DIR — one-time rsync down
#        ./gcs_data.sh push DIR BUCKET/PATH — one-time rsync up
set -euo pipefail
cmd=${1:?mount|pull|push}
case "$cmd" in
  mount)
    command -v gcsfuse >/dev/null || { echo "install gcsfuse first"; exit 1; }
    mkdir -p bucket
    gcsfuse --implicit-dirs "${2:?bucket}" bucket ;;
  pull) gsutil -m rsync -r "gs://${2:?src}" "${3:?dst}" ;;
  push) gsutil -m rsync -r "${2:?src}" "gs://${3:?dst}" ;;
esac
