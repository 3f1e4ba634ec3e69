#!/bin/bash
# Launch a zett-tpu training run on every worker of a Cloud TPU pod slice
# (reference parity: scripts/update_tpu_ips.sh + run.slurm — the reference
# managed a hand-assembled VM fleet; Cloud TPU pod slices make that two
# gcloud flags). Cannot be exercised offline; semantics documented in
# docs/MULTIHOST.md.
#
# Usage: ./launch_pod.sh TPU_NAME ZONE CONFIG.json [REPO_DIR]
set -euo pipefail
TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
CONFIG=${3:?config json}
REPO_DIR=${4:-'~/zett-tpu'}

# every worker runs the same command; jax.distributed.initialize()
# auto-detects coordinator/process_id from the TPU runtime when the config
# has "distributed": {} (docs/MULTIHOST.md)
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone="$ZONE" --worker=all \
  --command="cd $REPO_DIR && git pull --ff-only && \
             nohup python -m zett_tpu.training $CONFIG \
             > train_\$(hostname).log 2>&1 &"
echo "launched on all workers of $TPU_NAME; logs: $REPO_DIR/train_<host>.log"
