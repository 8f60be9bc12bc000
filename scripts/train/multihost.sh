#!/usr/bin/env bash
# Multi-host TPU-pod launch (reference: scripts/tool/smartrun + torchrun
# recipes). Run the SAME command on every pod host — on Cloud TPU, JAX
# auto-discovers the coordinator from the TPU metadata; on manual clusters
# set DREAMLLM_COORDINATOR=host0:8476 DREAMLLM_NUM_PROCESSES=N
# DREAMLLM_PROCESS_ID=i (or torchrun-style MASTER_ADDR/WORLD_SIZE/RANK).
#
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all -- \
#       "cd dreamllm_tpu && bash scripts/train/multihost.sh"
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m dreamllm_tpu.utils.launch "${MODULE:-projects.dreamllm.train}" -- \
  --config_file "${CONFIG:-projects/dreamllm/configs/stage1.py}" "$@"
