#!/usr/bin/env bash
# Stage-1 creation-only pretraining (reference scripts/train/dreamllm/run_stage1_creation_only.sh).
# Multi-host: launch once per host; jax.distributed picks up the topology
# (set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID or rely on
# the TPU metadata server on Cloud TPU).
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m projects.dreamllm.train \
  --config_file projects/dreamllm/configs/stage1_creation.py "$@"
